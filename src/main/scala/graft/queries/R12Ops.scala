package graft.queries

import graft.{QDef, Tables}
import graft.ops.BinnedRank
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 batch: rank statistics, classical hypothesis tests, and data-
  * quality audits — all on the established scale postures:
  *
  *  - rank/CDF machinery rides [[graft.ops.BinnedRank]] (or the inline
  *    two-measure variant of the KsSql pattern): the only unpartitioned
  *    windows order BOUNDED value-domain bin frames, never data rows;
  *  - test statistics are assembled from per-group `(n, sum, sumsq)`-style
  *    aggregates — one map-side-combined pass over the corpus, the algebra
  *    on a group-cardinality frame;
  *  - integer statistics (rank sums, tie terms, concentration, triangle
  *    counts, FK orphans) stay in BIGINT end-to-end, so engine and oracle
  *    agree bit-for-bit with no float-summation-order exposure.
  */
object R12Ops {

  /** Mann-Whitney U text — PORTABLE, shared verbatim by the
    * `x_sql_mannwhitney` twin (the KsSql posture: the unpartitioned window
    * orders the ⌊v/1000⌋ price-bin frame; per-value cumulatives are
    * bin-partitioned). Rank sums use average ranks for ties and stay in
    * integer arithmetic throughout: 2·R₁ = Σ c₁·(2·below + c + 1), so both
    * engines compute the identical BIGINT before the one final division.
    * Headroom: the products stay under 2⁶³ up to ~3·10⁹ rows per
    * two-segment compare; beyond that, switch the rank-sum accumulator to
    * DOUBLE (the statistic is reported at 4 dp).
    */
  private[queries] val MannWhitneySql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |hist AS (
      |  SELECT v,
      |    CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c1,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM oc GROUP BY 1),
      |hb AS (SELECT v, c1, c, CAST(floor(v / 1000) AS BIGINT) AS bin
      |  FROM hist),
      |binpre AS (
      |  SELECT bin,
      |    CAST(coalesce(sum(bc) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS bb
      |  FROM (SELECT bin, CAST(sum(c) AS BIGINT) AS bc FROM hb GROUP BY 1)),
      |cum AS (
      |  SELECT hb.v, hb.c1, hb.c,
      |    bp.bb + CAST(coalesce(sum(hb.c) OVER (PARTITION BY hb.bin
      |      ORDER BY hb.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS below
      |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
      |stats AS (
      |  SELECT
      |    CAST(sum(c1) AS BIGINT) AS n1,
      |    CAST(sum(c - c1) AS BIGINT) AS n2,
      |    CAST(sum(c1 * (2 * below + c + 1)) AS BIGINT) AS two_r1,
      |    CAST(sum(c * c * c - c) AS BIGINT) AS tie3
      |  FROM cum)
      |SELECT n1, n2,
      |  round(n1 * n2 + n1 * (n1 + 1) / 2.0e0 - two_r1 / 2.0e0, 1) AS u1,
      |  round((n1 * n2 + n1 * (n1 + 1) / 2.0e0 - two_r1 / 2.0e0
      |      - n1 * n2 / 2.0e0)
      |    / sqrt(n1 * n2 / 12.0e0 * ((n1 + n2 + 1.0e0)
      |      - tie3 / ((n1 + n2) * (n1 + n2 - 1.0e0)))), 4) AS z
      |FROM stats""".stripMargin

  /** One-way ANOVA as ONE portable SQL text — oracle of `x_anova_f` and
    * whole query of the `x_sql_anova` twin (the CcSql twin contract). */
  private[queries] val AnovaSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n, avg(v) AS m,
      |  var_samp(v) AS s2 FROM oc GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
      |  CAST(count(*) AS BIGINT) AS k,
      |  sum(n * m) / sum(n) AS gm FROM st),
      |agg AS (SELECT max(k) AS k, max(nn) AS nn,
      |  sum(n * (m - gm) * (m - gm)) AS ssb,
      |  sum((n - 1) * s2) AS ssw FROM st, tot)
      |SELECT CAST(k - 1 AS BIGINT) AS df_between,
      |  CAST(nn - k AS BIGINT) AS df_within,
      |  round((ssb / (k - 1)) / (ssw / (nn - k)), 4) AS f_stat,
      |  round(ssb / (ssb + ssw), 4) AS eta_sq
      |FROM agg""".stripMargin

  val defs: Seq[QDef] = Seq(

    // MANN-WHITNEY U (Wilcoxon rank-sum): the nonparametric complement to
    // x_ab_ttest — do BUILDING and MACHINERY order prices come from the
    // same distribution? Average-rank-for-ties rank sums from the joint
    // distinct-value histogram through BinnedRank: 2·R₁ stays BIGINT, the
    // tie-corrected normal approximation divides once at the end. The
    // corpus does ONE grouped aggregate; everything after runs on the
    // distinct-price histogram, with the only unpartitioned window on the
    // ≤500-row price-bin frame.
    QDef("x_mannwhitney", MannWhitneySql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val hist = oc.groupBy("v").agg(
        sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("c"))
      val ranked = BinnedRank.belowAndN(hist, Seq.empty,
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")), col("c"))
      val st = ranked.agg(
        sum(col("c1")).as("n1"),
        sum(col("c") - col("c1")).as("n2"),
        sum(col("c1") * (lit(2) * col("below") + col("c") + lit(1)))
          .as("two_r1"),
        sum(col("c") * col("c") * col("c") - col("c")).as("tie3"))
      st.select(col("n1"), col("n2"),
        round(col("n1") * col("n2")
          + col("n1") * (col("n1") + lit(1)) / lit(2.0)
          - col("two_r1") / lit(2.0), 1).as("u1"),
        round((col("n1") * col("n2")
            + col("n1") * (col("n1") + lit(1)) / lit(2.0)
            - col("two_r1") / lit(2.0)
            - col("n1") * col("n2") / lit(2.0))
          / sqrt(col("n1") * col("n2") / lit(12.0)
            * ((col("n1") + col("n2") + lit(1.0))
              - col("tie3") / ((col("n1") + col("n2"))
                * (col("n1") + col("n2") - lit(1.0))))), 4).as("z"))
    },

    // The Mann-Whitney statistic through Spark's SQL parser — ONE portable
    // text shared verbatim with the DuckDB oracle (the SQL-twin contract).
    QDef("x_sql_mannwhitney", MannWhitneySql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(MannWhitneySql)
    },

    // ONE-WAY ANOVA F: does mean order price differ across the 5 market
    // segments? Per-group (n, mean, var) from ONE map-side-combined
    // aggregate; SSB/SSW assembled on the 5-row stats frame (the
    // x_ab_ttest posture — no row-level data leaves the executors twice).
    // F and η² are released at 4 dp, inside the repo's double-aggregate
    // parity convention.
    QDef("x_anova_f", R12Ops.AnovaSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val st = oc.groupBy("g").agg(
        count(lit(1)).as("n"), avg(col("v")).as("m"),
        var_samp(col("v")).as("s2"))
      val tot = st.agg(
        sum(col("n")).as("nn"), count(lit(1)).as("k"),
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
          / (col("ssw") / (col("nn") - col("k"))), 4).as("f_stat"),
        round(col("ssb") / (col("ssb") + col("ssw")), 4).as("eta_sq"))
    },

    // SPEARMAN RANK CORRELATION between order price and the ordering
    // customer's account balance. Average ranks for ties come from
    // BinnedRank over each variable's distinct-value histogram (price in
    // ⌊v/1000⌋ bins, balance in ⌊a/100⌋ bins — both value-domain-bounded);
    // pairs re-join their ranks by value (two hash joins, shuffle-safe at
    // any scale) and Pearson runs on the rank columns. The oracle uses the
    // naive min-rank + (ties−1)/2 window form — identical average ranks.
    QDef("x_spearman_corr",
      """WITH p AS (
        |  SELECT o.o_totalprice AS v, c.c_acctbal AS a
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |r AS (
        |  SELECT
        |    rank() OVER (ORDER BY v)
        |      + (count(*) OVER (PARTITION BY v) - 1) / 2.0 AS rv,
        |    rank() OVER (ORDER BY a)
        |      + (count(*) OVER (PARTITION BY a) - 1) / 2.0 AS ra
        |  FROM p)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(corr(rv, ra), 4) AS spearman_rho
        |FROM r""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val pairs = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_acctbal")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_totalprice").as("v"), col("c_acctbal").as("a"))
      val rp = BinnedRank.belowAndN(
          pairs.groupBy("v").agg(count(lit(1)).as("cv")),
          Seq.empty, floor(col("v") / lit(1000)).cast("bigint"),
          Seq(col("v")), col("cv"))
        .select(col("v"),
          (col("below") + (col("cv") + lit(1)) / lit(2.0)).as("rv"))
      val ra = BinnedRank.belowAndN(
          pairs.groupBy("a").agg(count(lit(1)).as("ca")),
          Seq.empty, floor(col("a") / lit(100)).cast("bigint"),
          Seq(col("a")), col("ca"))
        .select(col("a"),
          (col("below") + (col("ca") + lit(1)) / lit(2.0)).as("ra"))
      pairs.join(rp, "v").join(ra, "a")
        .agg(count(lit(1)).as("n"),
          round(corr(col("rv"), col("ra")), 4).as("spearman_rho"))
    },

    // DECISION STUMP: the best single threshold on order price predicting
    // o_orderstatus = 'F', by Gini impurity reduction — the depth-1 tree
    // learner, and the split-finding inner loop of any distributed
    // GBDT/random forest. Candidate thresholds are the distinct prices;
    // cumulative (positives, total) per candidate come from the
    // two-measure binned prefix (the KsSql pattern), so every candidate's
    // gain is pure per-row arithmetic over exact integers — bit-identical
    // across engines — and the argmax is a top-1 sort, no funnel.
    QDef("x_decision_stump",
      """WITH hist AS (
        |  SELECT o_totalprice AS v,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |cum AS (
        |  SELECT v,
        |    CAST(sum(p) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS lp,
        |    CAST(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS ln2,
        |    CAST(sum(p) OVER () AS BIGINT) AS ptot,
        |    CAST(sum(c) OVER () AS BIGINT) AS ctot
        |  FROM hist),
        |gains AS (
        |  SELECT v, lp, ln2, ptot - lp AS rp, ctot - ln2 AS rn,
        |    (1 - (ptot / ctot) * (ptot / ctot)
        |       - ((ctot - ptot) / ctot) * ((ctot - ptot) / ctot))
        |    - (ln2 / ctot) * (1 - (lp / ln2) * (lp / ln2)
        |       - ((ln2 - lp) / ln2) * ((ln2 - lp) / ln2))
        |    - ((ctot - ln2) / ctot)
        |      * (1 - ((ptot - lp) / (ctot - ln2)) * ((ptot - lp) / (ctot - ln2))
        |       - (((ctot - ln2) - (ptot - lp)) / (ctot - ln2))
        |         * (((ctot - ln2) - (ptot - lp)) / (ctot - ln2))) AS gain
        |  FROM cum WHERE ln2 < ctot)
        |SELECT round(v, 2) AS threshold, round(gain, 6) AS gain,
        |  ln2 AS left_n, lp AS left_pos, rn AS right_n, rp AS right_pos
        |FROM gains ORDER BY gain DESC, v LIMIT 1""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val hist = t.orders.groupBy(col("o_totalprice").as("v")).agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("p"),
          count(lit(1)).as("c"))
        .withColumn("bin", floor(col("v") / lit(1000)).cast("bigint"))
      val wBinPre = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy(lit(1))
      val binPre = hist.groupBy("bin")
        .agg(sum(col("p")).as("bp"), sum(col("c")).as("bc"))
        .withColumn("pb", coalesce(sum(col("bp")).over(wBinPre), lit(0L)))
        .withColumn("cb", coalesce(sum(col("bc")).over(wBinPre), lit(0L)))
        .withColumn("ptot", sum(col("bp")).over(wAll))
        .withColumn("ctot", sum(col("bc")).over(wAll))
        .select("bin", "pb", "cb", "ptot", "ctot")
      val wWithin = Window.partitionBy("bin").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = hist
        .withColumn("wp", sum(col("p")).over(wWithin))
        .withColumn("wc", sum(col("c")).over(wWithin))
        .join(binPre, "bin")
        .select(col("v"),
          (col("pb") + col("wp")).as("lp"), (col("cb") + col("wc")).as("ln2"),
          col("ptot"), col("ctot"))
        .filter(col("ln2") < col("ctot"))
      // gain written in the SAME operation order as the oracle text: exact
      // BIGINT inputs -> identical IEEE doubles row by row
      val pParent = col("ptot") / col("ctot")
      val qParent = (col("ctot") - col("ptot")) / col("ctot")
      val pL = col("lp") / col("ln2")
      val qL = (col("ln2") - col("lp")) / col("ln2")
      val pR = (col("ptot") - col("lp")) / (col("ctot") - col("ln2"))
      val qR = ((col("ctot") - col("ln2")) - (col("ptot") - col("lp"))) /
        (col("ctot") - col("ln2"))
      val gain =
        (lit(1) - pParent * pParent - qParent * qParent) -
          (col("ln2") / col("ctot")) * (lit(1) - pL * pL - qL * qL) -
          ((col("ctot") - col("ln2")) / col("ctot")) *
            (lit(1) - pR * pR - qR * qR)
      cum.withColumn("gain", gain)
        .select(round(col("v"), 2).as("threshold"),
          round(col("gain"), 6).as("gain"),
          col("ln2").as("left_n"), col("lp").as("left_pos"),
          (col("ctot") - col("ln2")).as("right_n"),
          (col("ptot") - col("lp")).as("right_pos"))
        .orderBy(desc("gain"), col("threshold")).limit(1)
    },

    // PARTIAL AUTOCORRELATION (lags 1-3) of the daily event-count series
    // via Durbin-Levinson on the x_acf correlations. The corpus does one
    // daily aggregate; the recursion runs as closed-form column algebra on
    // a ONE-ROW frame of 6-dp-rounded ACF inputs, so both engines start
    // from identical doubles and apply the identical operation sequence.
    QDef("x_pacf",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT c,
        |    lead(c, 1) OVER (ORDER BY d) AS c1,
        |    lead(c, 2) OVER (ORDER BY d) AS c2,
        |    lead(c, 3) OVER (ORDER BY d) AS c3
        |  FROM daily),
        |acf AS (SELECT lag_k, round(corr(x, y), 6) AS r FROM (
        |    SELECT 1 AS lag_k, c AS x, c1 AS y FROM lagged
        |    UNION ALL SELECT 2, c, c2 FROM lagged
        |    UNION ALL SELECT 3, c, c3 FROM lagged)
        |  WHERE y IS NOT NULL GROUP BY lag_k),
        |rv AS (SELECT
        |  max(CASE WHEN lag_k = 1 THEN r END) AS r1,
        |  max(CASE WHEN lag_k = 2 THEN r END) AS r2,
        |  max(CASE WHEN lag_k = 3 THEN r END) AS r3 FROM acf),
        |dl AS (SELECT r1, r2, r3,
        |  (r2 - r1 * r1) / (1 - r1 * r1) AS phi2 FROM rv),
        |dl2 AS (SELECT r1, r2, r3, phi2, r1 - phi2 * r1 AS phi21 FROM dl),
        |dl3 AS (SELECT r1, phi2,
        |  (r3 - phi21 * r2 - phi2 * r1)
        |    / (1 - phi21 * r1 - phi2 * r2) AS phi3 FROM dl2)
        |SELECT 1 AS lag_k, round(r1, 6) AS pacf FROM dl3
        |UNION ALL SELECT 2, round(phi2, 6) FROM dl3
        |UNION ALL SELECT 3, round(phi3, 6) FROM dl3""".stripMargin) {
      (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("c"))
      val w = Window.orderBy("d") // KB frame: one row per calendar day
      val lagged = (1 to 3).foldLeft(daily) { (df, k) =>
        df.withColumn(s"c$k", lead(col("c"), k).over(w))
      }
      val rv = lagged
        .select(expr("stack(3, 1, c, c1, 2, c, c2, 3, c, c3) AS (lag_k, x, y)"))
        .filter(col("y").isNotNull)
        .groupBy("lag_k").agg(round(corr(col("x"), col("y")), 6).as("r"))
        .agg(
          max(when(col("lag_k") === 1, col("r"))).as("r1"),
          max(when(col("lag_k") === 2, col("r"))).as("r2"),
          max(when(col("lag_k") === 3, col("r"))).as("r3"))
      val dl = rv
        .withColumn("phi2", (col("r2") - col("r1") * col("r1"))
          / (lit(1) - col("r1") * col("r1")))
        .withColumn("phi21", col("r1") - col("phi2") * col("r1"))
        .withColumn("phi3",
          (col("r3") - col("phi21") * col("r2") - col("phi2") * col("r1"))
            / (lit(1) - col("phi21") * col("r1") - col("phi2") * col("r2")))
      dl.select(expr(
        "stack(3, 1, round(r1, 6), 2, round(phi2, 6), 3, round(phi3, 6))" +
          " AS (lag_k, pacf)"))
    },

    // THEIL T INEQUALITY INDEX of per-customer spend, by market segment —
    // the decomposable inequality measure (0 = perfect equality). Spend is
    // rounded to cents at the per-customer aggregate (pinning the float
    // base in both engines), segment means at 6 dp, and the final
    // entropy-weighted mean releases at 4 dp. Two grouped aggregates and a
    // broadcast of the 5-row stats frame — no windows, no funnels.
    QDef("x_theil_index",
      """WITH sp AS (
        |  SELECT c.c_mktsegment AS segment, c.c_custkey,
        |    round(sum(o.o_totalprice), 2) AS x
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |st AS (SELECT segment, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(x) / count(*), 6) AS mu FROM sp GROUP BY 1)
        |SELECT st.segment, st.n AS n_customers,
        |  round(sum(sp.x / st.mu * ln(sp.x / st.mu)) / st.n, 4) AS theil
        |FROM sp JOIN st ON sp.segment = st.segment
        |GROUP BY st.segment, st.n""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val sp = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("x"))
      val st = sp.groupBy("segment").agg(
        count(lit(1)).as("n"),
        round(sum(col("x")) / count(lit(1)), 6).as("mu"))
      sp.join(broadcast(st), "segment")
        .groupBy(col("segment"), col("n"))
        .agg(sum(col("x") / col("mu") * log(col("x") / col("mu"))).as("s"))
        .select(col("segment"), col("n").as("n_customers"),
          round(col("s") / col("n"), 4).as("theil"))
    },

    // HERFINDAHL-HIRSCHMAN INDEX: supplier concentration of line-item
    // volume within each nation — HHI = Σᵢ(cᵢ/N)² = (Σcᵢ²)/N², kept as
    // exact BIGINT sums until the one final division (1/HHI is the
    // "effective number of suppliers"). Two grouped aggregates, dims
    // broadcast; Σc² stays under 2⁶³ until ~3·10⁹ items per single
    // supplier — far past any real cell.
    QDef("x_hhi",
      """WITH e AS (
        |  SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |agg AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_suppliers,
        |  CAST(sum(c) AS BIGINT) AS n, CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM e GROUP BY 1)
        |SELECT n.n_name AS nation, a.n_suppliers, a.n AS n_items,
        |  round(CAST(a.s2 AS DOUBLE) / (CAST(a.n AS DOUBLE) * a.n), 6)
        |    AS hhi,
        |  round(CAST(a.n AS DOUBLE) * a.n / CAST(a.s2 AS DOUBLE), 2)
        |    AS effective_suppliers
        |FROM agg a JOIN nation n ON a.nk = n.n_nationkey""".stripMargin) {
      (s, d) =>
      val t = Tables(s, d)
      val e = t.lineitem.select("l_suppkey")
        .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nk"), col("l_suppkey"))
        .agg(count(lit(1)).as("c"))
      val agg = e.groupBy("nk").agg(
        count(lit(1)).as("n_suppliers"), sum(col("c")).as("n"),
        sum(col("c") * col("c")).as("s2"))
      agg.join(broadcast(t.nation.select("n_nationkey", "n_name")),
          col("nk") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("n_suppliers"),
          col("n").as("n_items"),
          round(col("s2").cast("double")
            / (col("n").cast("double") * col("n")), 6).as("hhi"),
          round(col("n").cast("double") * col("n")
            / col("s2").cast("double"), 2).as("effective_suppliers"))
    },

    // LOCAL CLUSTERING COEFFICIENT per vertex of the symmetrized nation
    // trade graph (the x_graph_jaccard edge derivation): how close each
    // nation's trade partners are to a clique. Fact-scale work is the
    // edge derivation (broadcast dims + DISTINCT); wedges and closing
    // edges are self-joins of the nation-cardinality edge list. Pure
    // integer triangle/degree counts; one rounded division at release.
    QDef("x_graph_clustering",
      """WITH e0 AS (
        |  SELECT DISTINCT c.c_nationkey AS u, s.s_nationkey AS v
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |e AS (SELECT u, v FROM (
        |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0) t WHERE u <> v),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |wedge AS (
        |  SELECT a.u AS ctr, a.v AS x, b.v AS y
        |  FROM e a JOIN e b ON a.u = b.u AND a.v < b.v),
        |tri AS (
        |  SELECT w.ctr, CAST(count(*) AS BIGINT) AS t
        |  FROM wedge w JOIN e c ON c.u = w.x AND c.v = w.y GROUP BY 1)
        |SELECT n.n_name AS nation, deg.deg,
        |  CAST(coalesce(tri.t, 0) AS BIGINT) AS triangles,
        |  round(CASE WHEN deg.deg >= 2
        |    THEN 2.0 * coalesce(tri.t, 0) / (deg.deg * (deg.deg - 1))
        |    ELSE 0.0 END, 6) AS clustering_coef
        |FROM deg LEFT JOIN tri ON deg.u = tri.ctr
        |JOIN nation n ON deg.u = n.n_nationkey""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val e0 = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("u"), col("s_nationkey").as("v"))
        .distinct()
      val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        .distinct().filter(col("u") =!= col("v"))
      val deg = e.groupBy("u").agg(count(lit(1)).as("deg"))
      val wedge = e.as("a")
        .join(e.as("b"), col("a.u") === col("b.u") && col("a.v") < col("b.v"))
        .select(col("a.u").as("ctr"), col("a.v").as("x"), col("b.v").as("y"))
      val tri = wedge
        .join(e.as("c"), col("c.u") === col("x") && col("c.v") === col("y"))
        .groupBy("ctr").agg(count(lit(1)).as("t"))
      deg.join(tri, col("u") === col("ctr"), "left")
        .join(broadcast(t.nation.select("n_nationkey", "n_name")),
          col("u") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("deg"),
          coalesce(col("t"), lit(0L)).as("triangles"),
          round(when(col("deg") >= 2,
            lit(2.0) * coalesce(col("t"), lit(0L))
              / (col("deg") * (col("deg") - 1))).otherwise(lit(0.0)), 6)
            .as("clustering_coef"))
    },

    // FUNCTIONAL-DEPENDENCY AUDIT: does LHS → RHS hold in the denormalized
    // order frame? For each candidate, one grouped countDistinct and a
    // group-cardinality rollup — the schema-discovery primitive (nationkey
    // does NOT determine segment; custkey does). All-integer output.
    QDef("x_fd_audit",
      """WITH d AS (
        |  SELECT o.o_orderpriority, o.o_orderstatus, o.o_custkey,
        |    c.c_nationkey, c.c_mktsegment
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |f1 AS (SELECT c_nationkey AS lhs,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS k FROM d GROUP BY 1),
        |f2 AS (SELECT o_orderpriority AS lhs,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS k FROM d GROUP BY 1),
        |f3 AS (SELECT o_custkey AS lhs,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS k FROM d GROUP BY 1)
        |SELECT 'c_nationkey->c_mktsegment' AS fd,
        |  CAST(count(*) AS BIGINT) AS lhs_values,
        |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating,
        |  CAST(max(k) AS BIGINT) AS max_rhs_per_lhs FROM f1
        |UNION ALL SELECT 'o_orderpriority->o_orderstatus',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(k) AS BIGINT) FROM f2
        |UNION ALL SELECT 'o_custkey->c_mktsegment',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(k) AS BIGINT) FROM f3""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val d0 = t.orders
        .join(broadcast(t.customer
            .select("c_custkey", "c_nationkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
      def fd(name: String, lhs: String, rhs: String): DataFrame =
        d0.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("k"))
          .agg(count(lit(1)).as("lhs_values"),
            sum(when(col("k") > 1, 1L).otherwise(0L)).as("violating"),
            max(col("k")).as("max_rhs_per_lhs"))
          .select(lit(name).as("fd"), col("lhs_values"), col("violating"),
            col("max_rhs_per_lhs"))
      fd("c_nationkey->c_mktsegment", "c_nationkey", "c_mktsegment")
        .union(fd("o_orderpriority->o_orderstatus",
          "o_orderpriority", "o_orderstatus"))
        .union(fd("o_custkey->c_mktsegment", "o_custkey", "c_mktsegment"))
    },

    // REFERENTIAL-INTEGRITY AUDIT over every FK edge of the star schema:
    // child row count, distinct child keys, and orphans (left-anti join
    // against the parent). Dims stay unhinted — AQE broadcasts them when
    // they fit, and the fact→fact edge (lineitem→orders) plans the shuffle
    // anti-join it needs at 100 TB. Seven 1-row stats frames glue with
    // BroadcastNestedLoop (the sanctioned 1-row pattern) and union.
    QDef("x_ref_integrity",
      """SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS child_rows,
        |  (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
        |    AS distinct_keys,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |    WHERE o.o_orderkey IS NULL) AS orphans
        |UNION ALL SELECT 'lineitem.l_partkey->part',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |    LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |    WHERE p.p_partkey IS NULL)
        |UNION ALL SELECT 'lineitem.l_suppkey->supplier',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(DISTINCT l_suppkey) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |    WHERE s.s_suppkey IS NULL)
        |UNION ALL SELECT 'orders.o_custkey->customer',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |    WHERE c.c_custkey IS NULL)
        |UNION ALL SELECT 'customer.c_nationkey->nation',
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer),
        |  (SELECT CAST(count(DISTINCT c_nationkey) AS BIGINT) FROM customer),
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer c
        |    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |    WHERE n.n_nationkey IS NULL)
        |UNION ALL SELECT 'supplier.s_nationkey->nation',
        |  (SELECT CAST(count(*) AS BIGINT) FROM supplier),
        |  (SELECT CAST(count(DISTINCT s_nationkey) AS BIGINT) FROM supplier),
        |  (SELECT CAST(count(*) AS BIGINT) FROM supplier s
        |    LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
        |    WHERE n.n_nationkey IS NULL)
        |UNION ALL SELECT 'nation.n_regionkey->region',
        |  (SELECT CAST(count(*) AS BIGINT) FROM nation),
        |  (SELECT CAST(count(DISTINCT n_regionkey) AS BIGINT) FROM nation),
        |  (SELECT CAST(count(*) AS BIGINT) FROM nation n
        |    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |    WHERE r.r_regionkey IS NULL)""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      def edge(name: String, child: DataFrame, childKey: String,
          parent: DataFrame, parentKey: String): DataFrame = {
        val stats = child.agg(count(lit(1)).as("child_rows"),
          countDistinct(col(childKey)).as("distinct_keys"))
        val orph = child
          .join(parent.select(col(parentKey)),
            col(childKey) === col(parentKey), "left_anti")
          .agg(count(lit(1)).as("orphans"))
        stats.crossJoin(broadcast(orph))
          .select(lit(name).as("fk_edge"), col("child_rows"),
            col("distinct_keys"), col("orphans"))
      }
      edge("lineitem.l_orderkey->orders",
          t.lineitem, "l_orderkey", t.orders, "o_orderkey")
        .union(edge("lineitem.l_partkey->part",
          t.lineitem, "l_partkey", t.part, "p_partkey"))
        .union(edge("lineitem.l_suppkey->supplier",
          t.lineitem, "l_suppkey", t.supplier, "s_suppkey"))
        .union(edge("orders.o_custkey->customer",
          t.orders, "o_custkey", t.customer, "c_custkey"))
        .union(edge("customer.c_nationkey->nation",
          t.customer, "c_nationkey", t.nation, "n_nationkey"))
        .union(edge("supplier.s_nationkey->nation",
          t.supplier, "s_nationkey", t.nation, "n_nationkey"))
        .union(edge("nation.n_regionkey->region",
          t.nation, "n_regionkey", t.region, "r_regionkey"))
    }
  )
}
