package graft.queries

import graft.{QDef, Tables}
import graft.llm.Sampling
import graft.ops.BinnedRank
import org.apache.spark.sql.functions._

/** Round-13 batch: model-evaluation and screening statistics plus a
  * mergeable distinct sketch — the continuation of R12's posture:
  * rank/CDF machinery through [[graft.ops.BinnedRank]], statistics
  * assembled from one grouped pass, integers kept BIGINT to the last
  * division, and sketches built on the repo's portable deterministic
  * hash so the DuckDB oracle replays them bit-for-bit.
  */
object R13Ops {

  /** Weight-of-evidence statistic as ONE portable SQL text — the DuckDB
    * oracle of `x_woe_iv` AND the whole Spark-SQL query of the
    * `x_sql_woe` twin (the CcSql twin contract). */
  private[queries] val WoeSql =
    """WITH cells AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pos,
      |    CAST(count(*) AS BIGINT) AS tot
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(pos) AS BIGINT) AS pos_t,
      |  CAST(sum(tot - pos) AS BIGINT) AS neg_t FROM cells)
      |SELECT priority, pos, tot - pos AS neg,
      |  round(ln((pos / CAST(pos_t AS DOUBLE))
      |    / ((tot - pos) / CAST(neg_t AS DOUBLE))), 4) AS woe,
      |  round((pos / CAST(pos_t AS DOUBLE)
      |      - (tot - pos) / CAST(neg_t AS DOUBLE))
      |    * ln((pos / CAST(pos_t AS DOUBLE))
      |      / ((tot - pos) / CAST(neg_t AS DOUBLE))), 6) AS iv_term
      |FROM cells, t""".stripMargin

  val defs: Seq[QDef] = Seq(

    // WEIGHT OF EVIDENCE + INFORMATION VALUE of order priority for
    // predicting o_orderstatus = 'F' — the classic categorical
    // feature-screening statistic (IV ≥ 0.02 "weak", ≥ 0.3 "strong").
    // ONE contingency aggregate (5 cells); totals on the cell frame; the
    // WoE log runs on exact-integer ratios so both engines evaluate the
    // identical doubles before the 4/6 dp release.
    QDef("x_woe_iv", WoeSql) { (s, d) =>
      val cells = Tables(s, d).orders
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("pos"), count(lit(1)).as("tot"))
      val t = cells.agg(sum(col("pos")).as("pos_t"),
        sum(col("tot") - col("pos")).as("neg_t"))
      val pr = col("pos") / col("pos_t").cast("double")
      val nr = (col("tot") - col("pos")) / col("neg_t").cast("double")
      cells.crossJoin(broadcast(t))
        .select(col("priority"), col("pos"),
          (col("tot") - col("pos")).as("neg"),
          round(log(pr / nr), 4).as("woe"),
          round((pr - nr) * log(pr / nr), 6).as("iv_term"))
    },

    // EXACT AUC BY RANK-SUM: area under the ROC curve of o_totalprice as
    // a score for o_orderstatus = 'F', via the Mann-Whitney identity
    // AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋) with average ranks for ties —
    // the scale story for classifier evaluation: no threshold sweep, no
    // sorted scan of N rows; ONE distinct-score histogram through
    // BinnedRank and BIGINT rank sums, exact at any corpus size. The
    // Gini coefficient (2·AUC − 1) releases beside it.
    QDef("x_auc_rank",
      """WITH hist AS (
        |  SELECT o_totalprice AS v,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |cum AS (
        |  SELECT v, p, c,
        |    CAST(coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below
        |  FROM hist),
        |stats AS (
        |  SELECT CAST(sum(p) AS BIGINT) AS npos,
        |    CAST(sum(c - p) AS BIGINT) AS nneg,
        |    CAST(sum(p * (2 * below + c + 1)) AS BIGINT) AS two_rpos
        |  FROM cum),
        |a AS (SELECT npos, nneg,
        |  (two_rpos / 2.0e0 - npos * (npos + 1) / 2.0e0) / (npos * nneg)
        |    AS auc_raw
        |  FROM stats)
        |SELECT npos, nneg, round(auc_raw, 6) AS auc,
        |  round(2.0e0 * auc_raw - 1, 6) AS gini_coef
        |FROM a""".stripMargin) { (s, d) =>
      val hist = Tables(s, d).orders
        .groupBy(col("o_totalprice").as("v"))
        .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("p"), count(lit(1)).as("c"))
      val ranked = BinnedRank.belowAndN(hist, Seq.empty,
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")), col("c"))
      val stats = ranked.agg(
        sum(col("p")).as("npos"),
        sum(col("c") - col("p")).as("nneg"),
        sum(col("p") * (lit(2) * col("below") + col("c") + lit(1)))
          .as("two_rpos"))
      stats
        .withColumn("auc_raw",
          (col("two_rpos") / lit(2.0)
            - col("npos") * (col("npos") + lit(1)) / lit(2.0))
            / (col("npos") * col("nneg")))
        .select(col("npos"), col("nneg"),
          round(col("auc_raw"), 6).as("auc"),
          round(lit(2.0) * col("auc_raw") - lit(1), 6).as("gini_coef"))
    },

    // BROWN-FORSYTHE TEST (median-centered Levene): do order-price
    // VARIANCES differ across market segments — the homoscedasticity
    // check that should precede x_anova_f. Per-group exact medians come
    // from the GROUPED BinnedRank (windows partition by (segment, bin) —
    // no unpartitioned frame anywhere); absolute deviations re-join the
    // broadcast 5-row median frame; the W statistic is the ANOVA F
    // algebra over the deviation stats.
    QDef("x_levene_bf",
      """WITH oc AS (
        |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |med AS (SELECT g, median(v) AS med FROM oc GROUP BY 1),
        |z AS (SELECT oc.g, abs(oc.v - med.med) AS z
        |  FROM oc JOIN med ON oc.g = med.g),
        |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n, avg(z) AS m,
        |  var_samp(z) AS s2 FROM z GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |  CAST(count(*) AS BIGINT) AS k, sum(n * m) / sum(n) AS gm FROM st),
        |agg AS (SELECT max(k) AS k, max(nn) AS nn,
        |  sum(n * (m - gm) * (m - gm)) AS ssb,
        |  sum((n - 1) * s2) AS ssw FROM st, tot)
        |SELECT CAST(k - 1 AS BIGINT) AS df_between,
        |  CAST(nn - k AS BIGINT) AS df_within,
        |  round((ssb / (k - 1)) / (ssw / (nn - k)), 4) AS w_stat
        |FROM agg""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val hist = oc.groupBy("g", "v").agg(count(lit(1)).as("c"))
      val ranked = BinnedRank.belowAndN(hist, Seq("g"),
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")), col("c"))
      // central ranks: lo = ⌈n/2⌉, hi = ⌊n/2⌋+1; a row carries rank r iff
      // below < r ≤ below + c. Median = mean of the two central values
      // (equal when n is odd) — same interpolation as DuckDB median().
      val lo = expr("(n + 1) div 2"); val hi = expr("(n + 2) div 2")
      val med = ranked.groupBy("g").agg(
          max(when(col("below") < lo && lo <= col("below") + col("c"),
            col("v"))).as("vlo"),
          max(when(col("below") < hi && hi <= col("below") + col("c"),
            col("v"))).as("vhi"))
        .select(col("g"), ((col("vlo") + col("vhi")) / lit(2.0)).as("med"))
      val z = oc.join(broadcast(med), "g")
        .select(col("g"), abs(col("v") - col("med")).as("z"))
      val st = z.groupBy("g").agg(count(lit(1)).as("n"),
        avg(col("z")).as("m"), var_samp(col("z")).as("s2"))
      val tot = st.agg(sum(col("n")).as("nn"), count(lit(1)).as("k"),
        (sum(col("n") * col("m")) / sum(col("n"))).as("gm"))
      val agg = st.crossJoin(broadcast(tot)).agg(
        max(col("k")).as("k"), max(col("nn")).as("nn"),
        sum(col("n") * (col("m") - col("gm")) * (col("m") - col("gm")))
          .as("ssb"),
        sum((col("n") - lit(1)) * col("s2")).as("ssw"))
      agg.select(
        (col("k") - 1).cast("bigint").as("df_between"),
        (col("nn") - col("k")).cast("bigint").as("df_within"),
        round((col("ssb") / (col("k") - lit(1)))
          / (col("ssw") / (col("nn") - col("k"))), 4).as("w_stat"))
    },

    // DFT PERIODOGRAM of the daily event-count series at candidate
    // periods 2-14 days: P(T) = (Σc'·cos(2πi/T))² + (Σc'·sin(2πi/T))²
    // over the mean-centered counts — the spectral complement of
    // x_seasonal_dow (the weekly peak shows at T=7). Day index via
    // datediff from the series start (no window needed); the 13-period
    // spine cross-joins the calendar-bounded daily frame; one grouped
    // aggregate per period. Daily mean snapped at 6dp in both engines.
    QDef("x_periodogram",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(dd) AS start, round(avg(c), 6) AS mc FROM daily),
        |pts AS (
        |  SELECT datediff('day', d0.start, daily.dd) AS i, daily.c - d0.mc
        |    AS cc
        |  FROM daily, d0),
        |spine AS (SELECT unnest([2,3,4,5,6,7,8,9,10,11,12,13,14]) AS t),
        |terms AS (
        |  SELECT spine.t,
        |    pts.cc * cos(6.283185307179586e0 * pts.i / spine.t) AS ct,
        |    pts.cc * sin(6.283185307179586e0 * pts.i / spine.t) AS st
        |  FROM pts, spine)
        |SELECT t AS period_days,
        |  round(sum(ct) * sum(ct) + sum(st) * sum(st), 2) AS power
        |FROM terms GROUP BY 1""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(count(lit(1)).cast("double").as("c"))
      val d0 = daily.agg(min(col("dd")).as("start"),
        round(avg(col("c")), 6).as("mc"))
      val pts = daily.crossJoin(broadcast(d0))
        .select(datediff(col("dd"), col("start")).as("i"),
          (col("c") - col("mc")).as("cc"))
      val spine = (2 to 14).map(lit(_))
      val terms = pts
        .select(col("i"), col("cc"),
          explode(array(spine: _*)).as("t"))
        .select(col("t"),
          (col("cc") * cos(lit(6.283185307179586) * col("i") / col("t")))
            .as("ct"),
          (col("cc") * sin(lit(6.283185307179586) * col("i") / col("t")))
            .as("st"))
      terms.groupBy(col("t").as("period_days"))
        .agg(round(sum(col("ct")) * sum(col("ct"))
          + sum(col("st")) * sum(col("st")), 2).as("power"))
    },

    // KMV (k-minimum-values) DISTINCT SKETCH: estimate the distinct
    // buyers per segment from the 64 smallest hash values — the mergeable
    // cardinality sketch family beside x_sketch_hll, on the repo's
    // PORTABLE hash (Sampling.hashBucket — injective on 31-bit keys, so
    // distinct keys ⇒ distinct hashes and the oracle replays the exact
    // integers). The k-th minimum comes from the bounded-heap TopKByScore
    // aggregate (map-side combined, 64 rows per group per partition cross
    // the wire — never the corpus); D̂ = (k−1)/U₍ₖ₎, groups with fewer
    // than k members fall back to their exact count.
    QDef("x_sketch_kmv",
      s"""WITH b AS (
        |  SELECT DISTINCT c.c_mktsegment AS g, o.o_custkey AS id
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |h AS (SELECT g, ${Sampling.hashBucketSql("id")} AS hk FROM b),
        |r AS (SELECT g, hk,
        |  row_number() OVER (PARTITION BY g ORDER BY hk) AS rn FROM h),
        |kth AS (SELECT g, max(CASE WHEN rn = 64 THEN hk END) AS h64,
        |  CAST(count(*) AS BIGINT) AS exact FROM r GROUP BY 1)
        |SELECT g AS segment, exact AS exact_distinct,
        |  round(coalesce(63.0e0 * 4294967296 / h64, exact), 2)
        |    AS kmv_estimate,
        |  round(abs(coalesce(63.0e0 * 4294967296 / h64, exact) - exact)
        |    / exact, 4) AS rel_error
        |FROM kth""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val b = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_custkey").as("id"))
        .distinct()
      val kth = b.groupBy("g").agg(
        graft.functions.TopKByScore.topKByScore(
          -Sampling.hashBucket(col("id")).cast("double"), col("id"), 64)
          .as("arr"),
        count(lit(1)).as("exact"))
        .select(col("g"),
          (-try_element_at(col("arr"), lit(64)).getField("score"))
            .as("h64"),
          col("exact"))
      val est = lit(63.0) * lit(4294967296L) / col("h64")
      kth.select(col("g").as("segment"), col("exact").as("exact_distinct"),
        round(coalesce(est, col("exact")), 2).as("kmv_estimate"),
        round(abs(coalesce(est, col("exact")) - col("exact"))
          / col("exact"), 4).as("rel_error"))
    }
  )
}
