package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-27 batch: experiment sizing (two-proportion power analysis),
  * weekly seasonality strength, per-source language drift (KL), the
  * Simpson's-paradox reversal check, and Newey-West HAC standard
  * errors — closing the experimentation/diagnostics surface with the
  * same one-pass + bounded-frame shapes.
  */
object R27Ops {

  val defs: Seq[QDef] = Seq(

    // TWO-PROPORTION POWER ANALYSIS: the sample size per arm needed to
    // detect the OBSERVED conversion delta at α=0.05 / power 0.8 —
    // experiment sizing from the pilot data itself. One indicator
    // aggregate; the closed form on exact integer ratios.
    QDef("x_power_analysis",
      """WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |su AS (SELECT s.user_id % 2 AS arm,
        |  CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0 THEN 1 ELSE 0 END
        |    AS conv
        |  FROM s LEFT JOIN p ON p.user_id = s.user_id),
        |c AS (SELECT
        |  sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
        |    / CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    AS pa,
        |  sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
        |    / CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    AS pb
        |  FROM su),
        |k AS (SELECT pa, pb, (pa + pb) / 2 AS pbar, abs(pa - pb) AS delta
        |  FROM c)
        |SELECT round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  round(delta, 6) AS observed_delta,
        |  CAST(ceiling(pow(1.959964e0 * sqrt(2 * pbar * (1 - pbar))
        |      + 0.8416212e0 * sqrt(pa * (1 - pa) + pb * (1 - pb)), 2)
        |    / (delta * delta)) AS BIGINT) AS n_per_arm
        |FROM k""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t0"))
      val p1 = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val su = s0.join(p1, Seq("user_id"), "left")
        .select((col("user_id") % 2).as("arm"),
          when(col("t1").isNotNull && col("t1") >= col("t0"), 1L)
            .otherwise(0L).as("conv"))
      val c = su.agg(
        (sum(when(col("arm") === 0, col("conv")).otherwise(0L))
          / sum(when(col("arm") === 0, 1L).otherwise(0L)).cast("double"))
          .as("pa"),
        (sum(when(col("arm") === 1, col("conv")).otherwise(0L))
          / sum(when(col("arm") === 1, 1L).otherwise(0L)).cast("double"))
          .as("pb"))
      val pbar = (col("pa") + col("pb")) / lit(2)
      val delta = abs(col("pa") - col("pb"))
      c.select(round(col("pa"), 6).as("p_a"), round(col("pb"), 6).as("p_b"),
        round(delta, 6).as("observed_delta"),
        ceil(pow(lit(1.959964) * sqrt(lit(2) * pbar * (lit(1) - pbar))
            + lit(0.8416212) * sqrt(col("pa") * (lit(1) - col("pa"))
              + col("pb") * (lit(1) - col("pb"))), 2)
          / (delta * delta)).cast("bigint").as("n_per_arm"))
    },

    // WEEKLY SEASONALITY STRENGTH: 1 − var(residual)/var(series) after
    // removing day-of-week means — how much of the daily variation the
    // weekly cycle explains (the scalar behind x_seasonal_dow). Weekday
    // from portable date arithmetic; dow means snapped and broadcast.
    QDef("x_seasonality_strength",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
        |      AS INTEGER) AS dow,
        |    CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY 1, 2),
        |dm AS (SELECT dow, round(avg(c), 6) AS sc FROM daily GROUP BY 1),
        |r AS (SELECT daily.c, daily.c - dm.sc AS resid
        |  FROM daily JOIN dm ON daily.dow = dm.dow),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  round(var_samp(c), 6) AS var_total,
        |  round(var_samp(resid), 6) AS var_resid FROM r)
        |SELECT n_days, var_total, var_resid,
        |  round(greatest(0, 1 - var_resid / var_total), 4) AS strength
        |FROM v""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"),
          (datediff(to_date(col("ts")),
            lit(java.sql.Date.valueOf("2024-01-01"))) % 7).cast("int")
            .as("dow"))
        .agg(count(lit(1)).cast("double").as("c"))
      val dm = daily.groupBy("dow").agg(round(avg(col("c")), 6).as("sc"))
      val r = daily.join(broadcast(dm), "dow")
        .select(col("c"), (col("c") - col("sc")).as("resid"))
      val v = r.agg(count(lit(1)).as("n_days"),
        round(var_samp(col("c")), 6).as("var_total"),
        round(var_samp(col("resid")), 6).as("var_resid"))
      v.select(col("n_days"), col("var_total"), col("var_resid"),
        round(greatest(lit(0),
          lit(1) - col("var_resid") / col("var_total")), 4).as("strength"))
    },

    // PER-SOURCE LANGUAGE DRIFT: KL(source lang distribution ‖ corpus
    // lang distribution) — which sources skew the language mix. One
    // (source, lang) contingency; corpus marginals broadcast; exact
    // integer ratios.
    QDef("x_kl_lang_drift",
      """WITH sl AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |sm AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
        |  FROM sl GROUP BY 1),
        |lm AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nl FROM sl GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sl),
        |kl AS (SELECT sl.source, max(sm.ns) AS docs,
        |  sum((sl.c / CAST(sm.ns AS DOUBLE))
        |    * ln((sl.c / CAST(sm.ns AS DOUBLE))
        |        / (lm.nl / CAST(n.n AS DOUBLE)))) AS kl
        |  FROM sl JOIN sm ON sl.source = sm.source
        |  JOIN lm ON sl.lang = lm.lang, n
        |  GROUP BY 1)
        |SELECT source, docs, round(kl, 6) AS kl_divergence
        |FROM kl""".stripMargin) { (s, d) =>
      val sl = Tables(s, d).documents
        .groupBy("source", "lang").agg(count(lit(1)).as("c"))
      val sm = sl.groupBy("source").agg(sum(col("c")).as("ns"))
      val lm = sl.groupBy("lang").agg(sum(col("c")).as("nl"))
      val n = sl.agg(sum(col("c")).as("n"))
      val p = col("c") / col("ns").cast("double")
      val q = col("nl") / col("n").cast("double")
      sl.join(broadcast(sm), "source").join(broadcast(lm), "lang")
        .crossJoin(broadcast(n))
        .groupBy("source")
        .agg(max(col("ns")).as("docs"),
          round(sum(p * log(p / q)), 6).as("kl_divergence"))
    },

    // SIMPSON'S-PARADOX CHECK: does the pooled high-priority price
    // effect reverse inside any market segment — the stratification
    // sanity check on top of x_ate_strat. One grouped indicator pass;
    // the verdict reduces on the 5-row strata frame.
    QDef("x_simpson_check",
      """WITH oc AS (
        |  SELECT c.c_mktsegment AS g, o.o_totalprice AS y,
        |    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS t
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |pool AS (SELECT
        |  sum(CASE WHEN t = 1 THEN y END) / sum(t)
        |  - sum(CASE WHEN t = 0 THEN y END) / sum(1 - t) AS pooled
        |  FROM oc),
        |st AS (SELECT g,
        |  sum(CASE WHEN t = 1 THEN y END) / sum(t)
        |  - sum(CASE WHEN t = 0 THEN y END) / sum(1 - t) AS diff
        |  FROM oc GROUP BY 1),
        |agg AS (SELECT
        |  CAST(sum(CASE WHEN st.diff * pool.pooled > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS agreeing,
        |  CAST(sum(CASE WHEN st.diff * pool.pooled < 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS reversed,
        |  max(pool.pooled) AS pooled
        |  FROM st, pool)
        |SELECT round(pooled, 4) AS pooled_diff, agreeing, reversed,
        |  reversed > 0 AS has_reversal
        |FROM agg""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("y"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("t"))
      def diff = sum(when(col("t") === 1, col("y"))) / sum(col("t")) -
        sum(when(col("t") === 0, col("y"))) / sum(lit(1) - col("t"))
      val pool = oc.agg(diff.as("pooled"))
      val st = oc.groupBy("g").agg(diff.as("diff"))
      st.crossJoin(broadcast(pool)).agg(
          sum(when(col("diff") * col("pooled") > 0, 1L).otherwise(0L))
            .as("agreeing"),
          sum(when(col("diff") * col("pooled") < 0, 1L).otherwise(0L))
            .as("reversed"),
          max(col("pooled")).as("pooled"))
        .select(round(col("pooled"), 4).as("pooled_diff"), col("agreeing"),
          col("reversed"), (col("reversed") > 0).as("has_reversal"))
    },

    // NEWEY-WEST HAC STANDARD ERROR of the daily-mean series mean:
    // autocovariances at lags 1-5 from DATE equi-joins (no window),
    // Bartlett weights, compared against the IID standard error — the
    // honest uncertainty for autocorrelated KPIs.
    QDef("x_hac_se",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, round(avg(value), 6) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT round(avg(y), 6) AS my,
        |  CAST(count(*) AS BIGINT) AS n FROM daily),
        |g0 AS (SELECT sum((y - m.my) * (y - m.my)) / max(m.n) AS g
        |  FROM daily, m),
        |lags AS (SELECT unnest([1, 2, 3, 4, 5]) AS k),
        |gk AS (SELECT lags.k,
        |  sum((a.y - m.my) * (b.y - m.my)) / max(m.n) AS g
        |  FROM lags, m, daily a, daily b
        |  WHERE b.dd = a.dd + lags.k
        |  GROUP BY 1),
        |hac AS (SELECT max(m.n) AS n, max(g0.g) AS g0,
        |  sum((1 - gk.k / 6.0e0) * gk.g) AS wsum
        |  FROM gk, g0, m)
        |SELECT n AS n_days,
        |  round(sqrt(g0 / n), 6) AS se_iid,
        |  round(sqrt((g0 + 2 * wsum) / n), 6) AS se_hac,
        |  round(sqrt((g0 + 2 * wsum) / n) / sqrt(g0 / n), 4) AS ratio
        |FROM hac""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(round(avg(col("value")), 6).as("y"))
      val m = daily.agg(round(avg(col("y")), 6).as("my"),
        count(lit(1)).as("n"))
      val g0 = daily.crossJoin(broadcast(m))
        .agg((sum((col("y") - col("my")) * (col("y") - col("my")))
          / max(col("n"))).as("g"))
      val lagged = daily
        .select(col("dd"), col("y").as("ya"),
          explode(array((1 to 5).map(lit(_)): _*)).as("k"))
        .select(date_add(col("dd"), col("k")).as("dd"), col("k"), col("ya"))
      val gk = lagged
        .join(daily.select(col("dd"), col("y").as("yb")), "dd")
        .crossJoin(broadcast(m))
        .groupBy("k")
        .agg((sum((col("ya") - col("my")) * (col("yb") - col("my")))
          / max(col("n"))).as("g"))
      val hac = gk.crossJoin(broadcast(g0.select(col("g").as("g0"))))
        .crossJoin(broadcast(m.select(col("n"))))
        .agg(max(col("n")).as("n"), max(col("g0")).as("g0"),
          sum((lit(1) - col("k") / lit(6.0)) * col("g")).as("wsum"))
      hac.select(col("n").as("n_days"),
        round(sqrt(col("g0") / col("n")), 6).as("se_iid"),
        round(sqrt((col("g0") + lit(2) * col("wsum")) / col("n")), 6)
          .as("se_hac"),
        round(sqrt((col("g0") + lit(2) * col("wsum")) / col("n"))
          / sqrt(col("g0") / col("n")), 4).as("ratio"))
    }
  )
}
