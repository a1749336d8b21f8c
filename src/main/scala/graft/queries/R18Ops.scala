package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-18 batch: time-series symbolization (SAX), the two-proportion
  * z-test, Hill-number diversity profiles, Grubbs' outlier test, and
  * the Wald-Wolfowitz runs test — series work on the calendar-bounded
  * daily frame, category work on value-domain-bounded brand/segment
  * frames, and the multi-pass snapped-moment convention throughout.
  */
object R18Ops {

  /** Grubbs' outlier test as ONE portable SQL text — oracle of `x_grubbs`
    * and whole query of the `x_sql_grubbs` twin. */
  private[queries] val GrubbsSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n, round(avg(v), 6) AS mu,
      |  round(stddev_samp(v), 6) AS sd FROM oc GROUP BY 1),
      |dev AS (SELECT oc.g, oc.v, abs(oc.v - m.mu) / m.sd AS dv
      |  FROM oc JOIN m ON oc.g = m.g),
      |mx AS (SELECT g, max(dv) AS g_stat FROM dev GROUP BY 1),
      |pick AS (SELECT dev.g, max(dev.v) AS extreme_value
      |  FROM dev JOIN mx ON dev.g = mx.g AND dev.dv = mx.g_stat
      |  GROUP BY 1)
      |SELECT m.g AS segment, m.n, round(mx.g_stat, 4) AS g_stat,
      |  pick.extreme_value
      |FROM m JOIN mx ON m.g = mx.g JOIN pick ON m.g = pick.g""".stripMargin

  /** Hill-number diversity ladder as ONE portable SQL text — oracle of
    * `x_hill_diversity` and whole query of the `x_sql_hill` twin. */
  private[queries] val HillSql =
    """WITH nb AS (
      |  SELECT n.n_name AS nation, p.p_brand AS brand,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |t AS (SELECT nation, CAST(sum(c) AS BIGINT) AS n FROM nb GROUP BY 1),
      |h AS (SELECT nb.nation, max(t.n) AS n,
      |  CAST(count(*) AS BIGINT) AS richness,
      |  -sum((c / CAST(t.n AS DOUBLE)) * ln(c / CAST(t.n AS DOUBLE)))
      |    AS shannon,
      |  sum((c / CAST(t.n AS DOUBLE)) * (c / CAST(t.n AS DOUBLE)))
      |    AS simpson
      |  FROM nb JOIN t ON nb.nation = t.nation GROUP BY 1)
      |SELECT nation, n AS items, richness,
      |  round(exp(shannon), 4) AS hill1,
      |  round(1 / simpson, 4) AS hill2,
      |  CASE WHEN richness > 1 THEN round(shannon / ln(richness), 6)
      |       ELSE CAST(NULL AS DOUBLE) END AS evenness
      |FROM h""".stripMargin


  val defs: Seq[QDef] = Seq(

    // SAX SYMBOLIZATION of the daily event-count series: 3-day PAA
    // segments, z-normalized against the 6-dp-snapped global moments,
    // mapped to a 4-symbol alphabet at the Gaussian quartile breakpoints
    // (±0.6745, 0) — the discretization that turns series into
    // shingle-able text (pairs with the MinHash/dedup family). Segment
    // index via datediff; no window anywhere.
    QDef("x_sax_symbols",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(dd) AS start, round(avg(c), 6) AS m,
        |  round(stddev_samp(c), 6) AS sd FROM daily),
        |seg AS (SELECT CAST(floor(datediff('day', d0.start, dd) / 3)
        |    AS BIGINT) AS seg,
        |  CAST(count(*) AS BIGINT) AS n_days, round(avg(c), 6) AS paa,
        |  max(d0.m) AS m, max(d0.sd) AS sd
        |  FROM daily, d0 GROUP BY 1),
        |z AS (SELECT seg, n_days, paa, (paa - m) / sd AS z FROM seg)
        |SELECT seg, n_days, paa, round(z, 4) AS z,
        |  CASE WHEN z < -0.6745e0 THEN 'a' WHEN z < 0 THEN 'b'
        |    WHEN z < 0.6745e0 THEN 'c' ELSE 'd' END AS symbol
        |FROM z""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(count(lit(1)).cast("double").as("c"))
      val d0 = daily.agg(min(col("dd")).as("start"),
        round(avg(col("c")), 6).as("m"),
        round(stddev_samp(col("c")), 6).as("sd"))
      val seg = daily.crossJoin(broadcast(d0))
        .groupBy(floor(datediff(col("dd"), col("start")) / lit(3))
          .cast("bigint").as("seg"))
        .agg(count(lit(1)).as("n_days"), round(avg(col("c")), 6).as("paa"),
          max(col("m")).as("m"), max(col("sd")).as("sd"))
      val z = (col("paa") - col("m")) / col("sd")
      seg.select(col("seg"), col("n_days"), col("paa"),
        round(z, 4).as("z"),
        when(z < -0.6745, "a").when(z < 0, "b").when(z < 0.6745, "c")
          .otherwise("d").as("symbol"))
    },

    // TWO-PROPORTION Z-TEST: does signup→purchase conversion differ
    // between the even/odd user-id arms — the discrete-outcome
    // complement of x_ab_ttest and x_logrank. Per-user conversion flags
    // from two min-ts aggregates; the pooled-variance z statistic closes
    // on a 1-row frame of exact integer counts.
    QDef("x_two_prop_z",
      """WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |su AS (SELECT s.user_id % 2 AS arm,
        |  CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0 THEN 1 ELSE 0 END
        |    AS conv
        |  FROM s LEFT JOIN p ON p.user_id = s.user_id),
        |c AS (SELECT
        |  CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |  CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS xa,
        |  CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |  CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS xb
        |  FROM su),
        |k AS (SELECT na, nb, xa / CAST(na AS DOUBLE) AS pa,
        |  xb / CAST(nb AS DOUBLE) AS pb,
        |  (xa + xb) / CAST(na + nb AS DOUBLE) AS pp
        |  FROM c)
        |SELECT na AS n_a, nb AS n_b, round(pa, 6) AS p_a,
        |  round(pb, 6) AS p_b,
        |  round((pa - pb) / sqrt(pp * (1 - pp)
        |    * (1.0e0 / na + 1.0e0 / nb)), 4) AS z
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
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("xa"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("xb"))
      val pa = col("xa") / col("na").cast("double")
      val pb = col("xb") / col("nb").cast("double")
      val pp = (col("xa") + col("xb")) / (col("na") + col("nb")).cast("double")
      c.select(col("na").as("n_a"), col("nb").as("n_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round((pa - pb) / sqrt(pp * (lit(1) - pp)
          * (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 4).as("z"))
    },

    // HILL-NUMBER DIVERSITY PROFILE of each supplier nation's sold-brand
    // portfolio: richness (q=0), exp-Shannon (q=1), inverse-Simpson
    // (q=2), and Pielou evenness — the ecology-style diversity ladder
    // over the (nation × brand) frame, which is value-domain-bounded
    // (25 nations × 25 brands) after ONE fact-scale aggregate.
    QDef("x_hill_diversity", R18Ops.HillSql) { (s, d) =>
      val t = Tables(s, d)
      val nb = t.lineitem
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation.select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.part.select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("n_name").as("nation"), col("p_brand").as("brand"))
        .agg(count(lit(1)).as("c"))
      val tot = nb.groupBy("nation").agg(sum(col("c")).as("n"))
      val p = col("c") / col("n").cast("double")
      val h = nb.join(broadcast(tot), "nation")
        .groupBy("nation").agg(max(col("n")).as("n"),
          count(lit(1)).as("richness"),
          (-sum(p * log(p))).as("shannon"),
          sum(p * p).as("simpson"))
      h.select(col("nation"), col("n").as("items"), col("richness"),
        round(exp(col("shannon")), 4).as("hill1"),
        round(lit(1) / col("simpson"), 4).as("hill2"),
        // richness=1 ⇒ ln(richness)=0 ⇒ 0/0 NaN; single-brand nations
        // have no defined evenness, so release NULL (matches the oracle).
        when(col("richness") > 1,
          round(col("shannon") / log(col("richness")), 6)).as("evenness"))
    },

    // GRUBBS' OUTLIER TEST per market segment: G = max|v−μ|/σ with the
    // attaining price — three grouped passes (snapped moments broadcast
    // back, max deviation, then the deviation-equality pick, exact
    // because both engines derive identical doubles), never a sort.
    QDef("x_grubbs", R18Ops.GrubbsSql) {
      (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val m = oc.groupBy("g").agg(count(lit(1)).as("n"),
        round(avg(col("v")), 6).as("mu"),
        round(stddev_samp(col("v")), 6).as("sd"))
      val dev = oc.join(broadcast(m), "g")
        .select(col("g"), col("v"),
          (abs(col("v") - col("mu")) / col("sd")).as("dv"))
      val mx = dev.groupBy("g").agg(max(col("dv")).as("g_stat"))
      val pick = dev.join(broadcast(mx), Seq("g"))
        .filter(col("dv") === col("g_stat"))
        .groupBy("g").agg(max(col("v")).as("extreme_value"))
      m.join(mx, "g").join(pick, "g")
        .select(col("g").as("segment"), col("n"),
          round(col("g_stat"), 4).as("g_stat"), col("extreme_value"))
    },

    // WALD-WOLFOWITZ RUNS TEST on the daily event-count series: is the
    // above/below-median sign sequence random? Signs from the
    // interpolated median (days at exactly the median drop, the standard
    // convention); run starts by a lag over the calendar frame; the
    // normal-approximation z closes on exact integer counts.
    QDef("x_runs_test",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY 1),
        |med AS (SELECT median(c) AS md FROM daily),
        |sg AS (SELECT dd, CASE WHEN c > med.md THEN 1 ELSE 0 END AS s
        |  FROM daily, med WHERE c <> med.md),
        |runs AS (SELECT s,
        |  CASE WHEN lag(s) OVER (ORDER BY dd) IS NULL
        |    OR lag(s) OVER (ORDER BY dd) <> s THEN 1 ELSE 0 END AS start
        |  FROM sg),
        |c AS (SELECT CAST(sum(s) AS BIGINT) AS n1,
        |  CAST(sum(1 - s) AS BIGINT) AS n2,
        |  CAST(sum(start) AS BIGINT) AS r FROM runs),
        |k AS (SELECT n1, n2, r,
        |  1 + 2.0e0 * n1 * n2 / (n1 + n2) AS er,
        |  2.0e0 * n1 * n2 * (2.0e0 * n1 * n2 - n1 - n2)
        |    / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0e0)) AS vr
        |  FROM c)
        |SELECT n1 AS n_above, n2 AS n_below, r AS runs,
        |  round(er, 4) AS expected_runs,
        |  round((r - er) / sqrt(vr), 4) AS z
        |FROM k""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(count(lit(1)).cast("double").as("c"))
      val med = daily.agg(expr("percentile(c, 0.5)").as("md"))
      val sg = daily.crossJoin(broadcast(med))
        .filter(col("c") =!= col("md"))
        .select(col("dd"), when(col("c") > col("md"), 1L).otherwise(0L).as("s"))
      val w = Window.orderBy("dd") // calendar-bounded daily frame
      val runs = sg.withColumn("prev", lag(col("s"), 1).over(w))
        .select(col("s"),
          when(col("prev").isNull || col("prev") =!= col("s"), 1L)
            .otherwise(0L).as("start"))
      val c = runs.agg(sum(col("s")).as("n1"),
        sum(lit(1) - col("s")).as("n2"), sum(col("start")).as("r"))
      val er = lit(1) +
        lit(2.0) * col("n1") * col("n2") / (col("n1") + col("n2"))
      val vr = (lit(2.0) * col("n1") * col("n2") *
        (lit(2.0) * col("n1") * col("n2") - col("n1") - col("n2"))) /
        ((col("n1") + col("n2")) * (col("n1") + col("n2"))
          * (col("n1") + col("n2") - lit(1.0)))
      c.select(col("n1").as("n_above"), col("n2").as("n_below"),
        col("r").as("runs"), round(er, 4).as("expected_runs"),
        round((col("r") - er) / sqrt(vr), 4).as("z"))
    }
  )
}
