package graft.queries

import graft.{QDef, Tables}
import graft.ops.BinnedRank
import org.apache.spark.sql.functions._

/** Round-16 batch: robust outlier screening (Tukey fences on exact
  * interpolated quartiles), inter-rater agreement (Cohen's kappa),
  * Markov-chain entropy rate over the event-type transition matrix,
  * extreme-value fitting (Gumbel block maxima with return levels), and
  * the model-evaluation lift/gain table — continuing the R12-R15
  * posture: exact quantiles through grouped [[graft.ops.BinnedRank]]
  * histograms, bounded contingency/transition frames, ntile closed
  * forms instead of global windows, and triangular broadcast joins for
  * small cumulative frames.
  */
object R16Ops {

  /** Markov entropy rate as ONE portable SQL text — oracle of
    * `x_entropy_rate` and whole query of the `x_sql_entropy_rate` twin. */
  private[queries] val EntropyRateSql =
    """WITH s AS (SELECT user_id, event_type,
      |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS nxt
      |  FROM events),
      |t AS (SELECT event_type AS src, nxt AS dst,
      |  CAST(count(*) AS BIGINT) AS c
      |  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |m AS (SELECT src, CAST(sum(c) AS BIGINT) AS ns FROM t GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM t),
      |ce AS (SELECT t.src, max(m.ns) AS out_transitions,
      |  -sum((c / CAST(m.ns AS DOUBLE)) * ln(c / CAST(m.ns AS DOUBLE)))
      |    AS hs
      |  FROM t JOIN m ON t.src = m.src GROUP BY 1),
      |er AS (SELECT round(sum((out_transitions / CAST(nt AS DOUBLE)) * hs),
      |    6) AS entropy_rate
      |  FROM ce, tot)
      |SELECT ce.src, ce.out_transitions, round(ce.hs, 6) AS cond_entropy,
      |  er.entropy_rate
      |FROM ce, er""".stripMargin

  /** Gumbel extreme-value fit as ONE portable SQL text — oracle of
    * `x_gumbel_extremes` and whole query of the `x_sql_gumbel` twin. */
  private[queries] val GumbelSql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS DOUBLE) AS c
      |  FROM events GROUP BY 1),
      |dm AS (SELECT CAST(h AS DATE) AS dd, max(c) AS mx
      |  FROM hourly GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n, round(avg(mx), 6) AS m,
      |  round(stddev_samp(mx), 6) AS s FROM dm),
      |fit AS (SELECT n, m, s,
      |  s * 0.7796968012336293e0 AS beta,
      |  m - 0.5772156649015329e0 * s * 0.7796968012336293e0 AS mu
      |  FROM st)
      |SELECT n AS n_blocks, round(mu, 4) AS mu, round(beta, 4) AS beta,
      |  round(mu - beta * ln(-ln(1 - 1.0e0 / 10)), 4) AS return_10,
      |  round(mu - beta * ln(-ln(1 - 1.0e0 / 100)), 4) AS return_100
      |FROM fit""".stripMargin


  /** Cohen's kappa as ONE portable SQL text — the DuckDB oracle of
    * `x_cohens_kappa` AND the whole Spark-SQL query of the
    * `x_sql_kappa` twin (the CcSql twin contract). */
  private[queries] val KappaSql =
    """WITH r AS (SELECT
      |  CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END AS a,
      |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END AS b
      |  FROM orders),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(a * b) AS BIGINT) AS n11,
      |  CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
      |  CAST(sum((1 - a) * b) AS BIGINT) AS n01,
      |  CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      |  FROM r),
      |k AS (SELECT n, (n11 + n00) / CAST(n AS DOUBLE) AS po,
      |  ((n11 + n10) / CAST(n AS DOUBLE)) * ((n11 + n01) / CAST(n AS DOUBLE))
      |    + ((n01 + n00) / CAST(n AS DOUBLE)) * ((n10 + n00) / CAST(n AS DOUBLE))
      |    AS pe
      |  FROM s)
      |SELECT n, round(po, 6) AS po, round(pe, 6) AS pe,
      |  round((po - pe) / (1 - pe), 6) AS kappa
      |FROM k""".stripMargin

  val defs: Seq[QDef] = Seq(

    // TUKEY FENCES per market segment: exact interpolated Q1/Q3
    // (quantile_cont semantics — position (n−1)q+1, linear interpolation
    // between the two straddling ranks) from the GROUPED BinnedRank
    // histogram (windows partition by (segment, bin) — no unpartitioned
    // frame), 1.5·IQR fences, then one broadcast re-join counts the
    // outliers. The interpolation fraction is exact in binary (q ∈
    // {.25, .75}), so both engines compute identical quartiles.
    QDef("x_tukey_fences",
      """WITH oc AS (
        |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |hist AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM oc GROUP BY 1, 2),
        |r AS (SELECT g, v, c,
        |  CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS below,
        |  CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM hist),
        |qs AS (SELECT g, max(n) AS n,
        |  max(CASE WHEN below < CAST(floor((n - 1) * 0.25e0 + 1) AS BIGINT)
        |    AND CAST(floor((n - 1) * 0.25e0 + 1) AS BIGINT) <= below + c
        |    THEN v END) AS q1lo,
        |  max(CASE WHEN below < CAST(ceiling((n - 1) * 0.25e0 + 1) AS BIGINT)
        |    AND CAST(ceiling((n - 1) * 0.25e0 + 1) AS BIGINT) <= below + c
        |    THEN v END) AS q1hi,
        |  max(CASE WHEN below < CAST(floor((n - 1) * 0.75e0 + 1) AS BIGINT)
        |    AND CAST(floor((n - 1) * 0.75e0 + 1) AS BIGINT) <= below + c
        |    THEN v END) AS q3lo,
        |  max(CASE WHEN below < CAST(ceiling((n - 1) * 0.75e0 + 1) AS BIGINT)
        |    AND CAST(ceiling((n - 1) * 0.75e0 + 1) AS BIGINT) <= below + c
        |    THEN v END) AS q3hi
        |  FROM r GROUP BY 1),
        |f AS (SELECT g, n,
        |  q1lo + ((n - 1) * 0.25e0 + 1 - floor((n - 1) * 0.25e0 + 1))
        |    * (q1hi - q1lo) AS q1,
        |  q3lo + ((n - 1) * 0.75e0 + 1 - floor((n - 1) * 0.75e0 + 1))
        |    * (q3hi - q3lo) AS q3
        |  FROM qs),
        |fence AS (SELECT g, n, q1, q3,
        |  q1 - 1.5e0 * (q3 - q1) AS lo_f, q3 + 1.5e0 * (q3 - q1) AS hi_f
        |  FROM f),
        |o AS (SELECT oc.g,
        |  CAST(sum(CASE WHEN oc.v < fence.lo_f OR oc.v > fence.hi_f
        |    THEN 1 ELSE 0 END) AS BIGINT) AS outliers
        |  FROM oc JOIN fence ON oc.g = fence.g GROUP BY 1)
        |SELECT fence.g AS segment, fence.n,
        |  round(fence.q1, 4) AS q1, round(fence.q3, 4) AS q3,
        |  round(fence.q3 - fence.q1, 4) AS iqr, o.outliers,
        |  round(o.outliers / CAST(fence.n AS DOUBLE), 6) AS outlier_pct
        |FROM fence JOIN o ON fence.g = o.g""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val hist = oc.groupBy("g", "v").agg(count(lit(1)).as("c"))
      val r = BinnedRank.belowAndN(hist, Seq("g"),
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")), col("c"))
      def pos(q: Double) = (col("n") - lit(1)) * lit(q) + lit(1)
      def pick(p: org.apache.spark.sql.Column) = {
        val rank = p.cast("bigint")
        max(when(col("below") < rank && rank <= col("below") + col("c"),
          col("v")))
      }
      val qs = r.groupBy("g").agg(max(col("n")).as("n"),
        pick(floor(pos(0.25))).as("q1lo"), pick(ceil(pos(0.25))).as("q1hi"),
        pick(floor(pos(0.75))).as("q3lo"), pick(ceil(pos(0.75))).as("q3hi"))
      val f = qs.select(col("g"), col("n"),
        (col("q1lo") + (pos(0.25) - floor(pos(0.25)))
          * (col("q1hi") - col("q1lo"))).as("q1"),
        (col("q3lo") + (pos(0.75) - floor(pos(0.75)))
          * (col("q3hi") - col("q3lo"))).as("q3"))
      val fence = f.select(col("g"), col("n"), col("q1"), col("q3"),
        (col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lo_f"),
        (col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("hi_f"))
      val outs = oc.join(broadcast(fence), "g")
        .groupBy("g").agg(
          sum(when(col("v") < col("lo_f") || col("v") > col("hi_f"), 1L)
            .otherwise(0L)).as("outliers"))
      fence.join(outs, "g")
        .select(col("g").as("segment"), col("n"),
          round(col("q1"), 4).as("q1"), round(col("q3"), 4).as("q3"),
          round(col("q3") - col("q1"), 4).as("iqr"), col("outliers"),
          round(col("outliers") / col("n").cast("double"), 6)
            .as("outlier_pct"))
    },

    // COHEN'S KAPPA between two deterministic order "raters" — high
    // price (≥150k) vs high priority (urgent/high): chance-corrected
    // agreement from ONE 4-cell contingency pass; every probability is
    // an exact integer ratio so both engines evaluate identical doubles.
    QDef("x_cohens_kappa", R16Ops.KappaSql) { (s, d) =>
      val r = Tables(s, d).orders.select(
        when(col("o_totalprice") >= 150000, 1L).otherwise(0L).as("a"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("b"))
      val st = r.agg(count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1) - col("b"))).as("n10"),
        sum((lit(1) - col("a")) * col("b")).as("n01"),
        sum((lit(1) - col("a")) * (lit(1) - col("b"))).as("n00"))
      val po = (col("n11") + col("n00")) / col("n").cast("double")
      val pe = (((col("n11") + col("n10")) / col("n").cast("double"))
          * ((col("n11") + col("n01")) / col("n").cast("double"))) +
        (((col("n01") + col("n00")) / col("n").cast("double"))
          * ((col("n10") + col("n00")) / col("n").cast("double")))
      st.select(col("n"), round(po, 6).as("po"), round(pe, 6).as("pe"),
        round((po - pe) / (lit(1) - pe), 6).as("kappa"))
    },

    // MARKOV ENTROPY RATE of the per-user event-type chain: conditional
    // next-symbol entropy H = Σ_s (n_s/N)·H(next|s) over the empirical
    // transition matrix — the predictability summary on top of
    // x_seq_transitions (identical transition derivation: lead over
    // (user ORDER BY ts, event_id)). Corpus work is the keyed lag window
    // + one grouped count; the entropy algebra runs on the ≤25-cell
    // transition frame.
    QDef("x_entropy_rate", R16Ops.EntropyRateSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sdf = Tables(s, d).events
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
      val tr = sdf.filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("c"))
      val m = tr.groupBy("src").agg(sum(col("c")).as("ns"))
      val tot = tr.agg(sum(col("c")).as("nt"))
      val p = col("c") / col("ns").cast("double")
      val ce = tr.join(broadcast(m), "src")
        .groupBy("src").agg(max(col("ns")).as("out_transitions"),
          (-sum(p * log(p))).as("hs"))
      val er = ce.crossJoin(broadcast(tot)).agg(
        round(sum((col("out_transitions") / col("nt").cast("double"))
          * col("hs")), 6).as("entropy_rate"))
      ce.crossJoin(broadcast(er))
        .select(col("src"), col("out_transitions"),
          round(col("hs"), 6).as("cond_entropy"), col("entropy_rate"))
    },

    // GUMBEL EXTREME-VALUE FIT on daily maxima of hourly event counts:
    // method-of-moments location/scale (β = s·√6/π, μ = m − γ·β) with
    // 10- and 100-day return levels — capacity-planning on top of the
    // hourly aggregate. Corpus work is two map-side-combined aggregates;
    // the fit runs on a 1-row stats frame with 6-dp snapped moments.
    QDef("x_gumbel_extremes", R16Ops.GumbelSql) { (s, d) =>
      val hourly = Tables(s, d).events
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).cast("double").as("c"))
      val dm = hourly.groupBy(to_date(col("h")).as("dd"))
        .agg(max(col("c")).as("mx"))
      val st = dm.agg(count(lit(1)).as("n"), round(avg(col("mx")), 6).as("m"),
        round(stddev_samp(col("mx")), 6).as("s"))
      val beta = col("s") * lit(0.7796968012336293)
      val mu = col("m") - lit(0.5772156649015329) * beta
      st.select(col("n").as("n_blocks"), round(mu, 4).as("mu"),
        round(beta, 4).as("beta"),
        round(mu - beta * log(-log(lit(1) - lit(1.0) / 10)), 4)
          .as("return_10"),
        round(mu - beta * log(-log(lit(1) - lit(1.0) / 100)), 4)
          .as("return_100"))
    },

    // LIFT / GAIN TABLE for o_totalprice as a score predicting
    // o_orderstatus = 'F': population deciles DESC by score through the
    // x_ntile_deciles closed form (BinnedRank on the negated price bin —
    // no global ntile window), per-decile positives, and cumulative
    // gain/lift from a triangular join of the 10-row decile frame — the
    // campaign-targeting view of the x_auc_rank evaluation.
    QDef("x_lift_gain",
      """WITH d AS (SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |  CAST(ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey)
        |    AS INT) AS decile
        |  FROM orders),
        |t AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS pos
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |  CAST(sum(pos) AS BIGINT) AS np FROM t),
        |c AS (SELECT a.decile, a.n, a.pos,
        |  CAST(sum(b.n) AS BIGINT) AS cum_n,
        |  CAST(sum(b.pos) AS BIGINT) AS cum_pos
        |  FROM t a JOIN t b ON b.decile <= a.decile GROUP BY 1, 2, 3)
        |SELECT c.decile, c.n, c.pos,
        |  round(cum_pos / CAST(np AS DOUBLE), 6) AS cum_gain,
        |  round((cum_pos / CAST(cum_n AS DOUBLE))
        |    / (np / CAST(nn AS DOUBLE)), 6) AS cum_lift
        |FROM c, tot""".stripMargin) { (s, d) =>
      val o = Tables(s, d).orders.select(col("o_orderkey"),
        col("o_totalprice").as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val ranked = BinnedRank.belowAndN(o, Seq.empty,
          (-floor(col("v") / lit(1000))).cast("bigint"),
          Seq(col("v").desc, col("o_orderkey")), lit(1L))
        .withColumn("r", col("below") + lit(1L))
      // ntile(10) closed form (x_ntile_deciles); doubles exact here
      val sSize = floor(col("n") / lit(10.0))
      val bRem = col("n") - sSize * lit(10.0)
      val cutoff = bRem * (sSize + lit(1.0))
      val decile = when(col("r") <= cutoff,
          floor((col("r") - lit(1.0)) / (sSize + lit(1.0))) + lit(1.0))
        .otherwise(lit(1.0) + bRem
          + floor((col("r") - cutoff - lit(1.0)) / greatest(sSize, lit(1.0))))
        .cast("int")
      val t = ranked.withColumn("decile", decile)
        .groupBy("decile").agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val tot = t.agg(sum(col("n")).as("nn"), sum(col("pos")).as("np"))
      val a = t.select(col("decile"), col("n"), col("pos"))
      val b = t.select(col("decile").as("db"), col("n").as("nb"),
        col("pos").as("pb"))
      a.join(broadcast(b), col("db") <= col("decile"))
        .groupBy("decile", "n", "pos")
        .agg(sum(col("nb")).as("cum_n"), sum(col("pb")).as("cum_pos"))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n"), col("pos"),
          round(col("cum_pos") / col("np").cast("double"), 6).as("cum_gain"),
          round((col("cum_pos") / col("cum_n").cast("double"))
            / (col("np") / col("nn").cast("double")), 6).as("cum_lift"))
    }
  )
}
