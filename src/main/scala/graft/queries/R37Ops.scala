package graft.queries

import graft.{QDef, Tables}
import graft.ops.BinnedRank
import org.apache.spark.sql.functions._

/** Round-37 batch: the nonparametric-inference gaps left after R12-R33 —
  * variance homogeneity (Bartlett), the quadratic-EDF two-sample test
  * (Cramér-von Mises), ordered-alternative trend across k groups
  * (Jonckheere-Terpstra), the post-hoc that belongs to the existing
  * Kruskal-Wallis (Dunn's pairwise z), the likelihood-ratio counterpart
  * of the existing chi-square independence tests (G-test), ANOVA effect
  * sizes (eta-/omega-/epsilon-squared), and the heteroscedastic rank
  * test (Brunner-Munzel).
  *
  * Scale posture: every corpus touch is a hash aggregate (a distinct-
  * value histogram or a snapped-mean moment pass); rank prefixes ride
  * [[graft.ops.BinnedRank]] so the only unpartitioned windows order
  * bounded bin frames; pair algebra (Dunn, Jonckheere's 10 group pairs)
  * runs on k-row or bin frames. Pair-count sums go DOUBLE before any
  * product that is O(n²) — exact below 2^53, identically rounded above.
  */
object R37Ops {

  // ---- Bartlett's test of equal variances ----

  /** Bartlett as ONE portable text — oracle of `x_bartlett`. Sample
    * variances from the two-pass snapped-mean form (JbSql pattern: µ_g
    * rounded 6 dp, then Σ(v−µ)²), so both engines square the identical
    * deviations; the χ²-distributed T statistic and its Box correction
    * C run on the 5-row group frame. */
  private[queries] val BartlettSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g,
      |    CAST(round(o.o_totalprice * 100.0e0, 0) AS BIGINT) AS vc
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(vc) AS BIGINT) AS svc,
      |  CAST(sum(CAST(vc AS DECIMAL(19, 0)) * vc) AS DECIMAL(38, 0))
      |    AS sqc
      |  FROM oc GROUP BY 1),
      |s AS (SELECT g, n,
      |  round(CAST(svc AS DOUBLE) / 1.0e2 / n, 6) AS mu,
      |  CAST(svc AS DOUBLE) / 1.0e2 AS sv1,
      |  CAST(sqc AS DOUBLE) / 1.0e4 AS sv2
      |  FROM m),
      |s2 AS (SELECT g, n,
      |  sv2 - 2.0e0 * mu * sv1 + n * mu * mu AS ss
      |  FROM s),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS kg,
      |  CAST(sum(n) AS BIGINT) AS nn,
      |  sum(ss) AS ssw,
      |  sum((n - 1) * ln(ss / (n - 1))) AS sumlog,
      |  sum(1.0e0 / (n - 1)) AS sinv
      |  FROM s2)
      |SELECT kg AS groups, nn AS n, CAST(kg - 1 AS BIGINT) AS df,
      |  round(((nn - kg) * ln(ssw / (nn - kg)) - sumlog)
      |    / (1 + (sinv - 1.0e0 / (nn - kg)) / (3.0e0 * (kg - 1))), 4)
      |    AS bartlett_t
      |FROM ag""".stripMargin

  // ---- two-sample Cramér-von Mises ----

  /** CvM as ONE portable text — oracle of `x_cvm` and whole query of the
    * `x_sql_cvm` twin. Ties-weighted histogram form
    * T = (n₁n₂/N²)·Σ_v c(v)·(F₁(v)−F₂(v))² over the joint distinct-price
    * histogram, inclusive CDFs via the AndersonDarlingSql two-level
    * binned prefix (only unpartitioned window = the price-bin frame). */
  private[queries] val CvmSql =
    """WITH li AS (
      |  SELECT l_returnflag AS g, l_extendedprice AS v FROM lineitem
      |  WHERE l_returnflag IN ('A', 'R')),
      |hist AS (
      |  SELECT v,
      |    CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM li GROUP BY 1),
      |hb AS (SELECT v, c1, c, CAST(floor(v / 1000) AS BIGINT) AS bin
      |  FROM hist),
      |binpre AS (
      |  SELECT bin,
      |    CAST(coalesce(sum(b1) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS bb1,
      |    CAST(coalesce(sum(bc) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS bbc
      |  FROM (SELECT bin, CAST(sum(c1) AS BIGINT) AS b1,
      |    CAST(sum(c) AS BIGINT) AS bc FROM hb GROUP BY 1)),
      |cum AS (
      |  SELECT hb.v, hb.c1, hb.c,
      |    bp.bb1 + CAST(coalesce(sum(hb.c1) OVER (PARTITION BY hb.bin
      |      ORDER BY hb.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      + hb.c1 AS a1,
      |    bp.bbc + CAST(coalesce(sum(hb.c) OVER (PARTITION BY hb.bin
      |      ORDER BY hb.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      + hb.c AS h
      |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
      |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
      |  CAST(sum(c) AS BIGINT) AS nn FROM hist),
      |terms AS (SELECT
      |  sum(CAST(c AS DOUBLE)
      |    * (CAST(a1 AS DOUBLE) / n1 - CAST(h - a1 AS DOUBLE) / (nn - n1))
      |    * (CAST(a1 AS DOUBLE) / n1 - CAST(h - a1 AS DOUBLE) / (nn - n1)))
      |    AS s
      |  FROM cum CROSS JOIN tot)
      |SELECT tot.n1, tot.nn - tot.n1 AS n2,
      |  round(CAST(tot.n1 AS DOUBLE) * (tot.nn - tot.n1)
      |    / (CAST(tot.nn AS DOUBLE) * tot.nn) * terms.s, 6) AS cvm_t
      |FROM terms CROSS JOIN tot""".stripMargin

  // ---- Jonckheere-Terpstra ordered trend ----

  /** The 5 order priorities in their designed order — the ordered
    * alternative is "totalprice distribution shifts with priority". */
  private val JtGroups = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Jonckheere-Terpstra as ONE portable text (programmatically
    * expanded over the 5 priorities) — oracle of `x_jonckheere` and
    * whole query of the `x_sql_jonckheere` twin. J = Σ_{i<j} U_ij with
    * the tie-half convention, computed from the joint distinct-price
    * histogram carrying one count column per group: U_ij needs group i's
    * strictly-below cumulative at EVERY pooled value, so the 5
    * exclusive cumulatives ride one shared two-level binned prefix
    * (the belowAndNMany shape). Pair products go DOUBLE (J ~ N²/4). */
  private[queries] val JonckheereSql = {
    val idx = JtGroups.indices.map(_ + 1)
    val histCols = JtGroups.zip(idx).map { case (g, i) =>
      s"    CAST(sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END) AS BIGINT) AS c$i"
    }.mkString(",\n")
    val binAgg = idx.map(i => s"CAST(sum(c$i) AS BIGINT) AS b$i")
      .mkString(", ")
    val binPre = idx.map(i =>
      s"""    CAST(coalesce(sum(b$i) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS bb$i""".stripMargin).mkString(",\n")
    val cumCols = idx.map(i =>
      s"""    bp.bb$i + CAST(coalesce(sum(hb.c$i) OVER (PARTITION BY hb.bin
         |      ORDER BY hb.v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS lo$i""".stripMargin).mkString(",\n")
    val hbCols = idx.map(i => s"hb.c$i").mkString(", ")
    val jTerms = (for {
      i <- idx; j <- idx if i < j
    } yield s"CAST(c$j AS DOUBLE) * (lo$i + c$i / 2.0e0)").mkString("\n    + ")
    val totCols = idx.map(i => s"CAST(sum(c$i) AS BIGINT) AS n$i")
      .mkString(", ")
    val sumSq = idx.map(i => s"CAST(n$i AS DOUBLE) * n$i").mkString(" + ")
    val sumCube = idx.map(i =>
      s"CAST(n$i AS DOUBLE) * n$i * (2.0e0 * n$i + 3)").mkString(" + ")
    val nnSum = idx.map(i => s"n$i").mkString(" + ")
    s"""WITH oc AS (
       |  SELECT o_orderpriority AS g, o_totalprice AS v FROM orders),
       |hist AS (
       |  SELECT v,
       |$histCols
       |  FROM oc GROUP BY 1),
       |hb AS (SELECT *, CAST(floor(v / 1000) AS BIGINT) AS bin FROM hist),
       |binpre AS (
       |  SELECT bin,
       |$binPre
       |  FROM (SELECT bin, $binAgg FROM hb GROUP BY 1)),
       |cum AS (
       |  SELECT hb.v, $hbCols,
       |$cumCols
       |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
       |tot AS (SELECT $totCols FROM hist),
       |jt AS (SELECT sum(
       |    $jTerms) AS j
       |  FROM cum),
       |fin AS (SELECT j,
       |  CAST($nnSum AS DOUBLE) AS nn,
       |  $sumSq AS sq, $sumCube AS cb
       |  FROM jt CROSS JOIN tot)
       |SELECT CAST(nn AS BIGINT) AS n, round(j, 1) AS j_stat,
       |  round((nn * nn - sq) / 4.0e0, 1) AS e_j,
       |  round((nn * nn * (2 * nn + 3) - cb) / 72.0e0, 1) AS var_j,
       |  round((j - (nn * nn - sq) / 4.0e0)
       |    / sqrt((nn * nn * (2 * nn + 3) - cb) / 72.0e0), 4) AS z
       |FROM fin""".stripMargin
  }

  // ---- Dunn's post-hoc after Kruskal-Wallis ----

  /** Dunn as ONE portable text — oracle of `x_dunn_posthoc`. The rank
    * sums and tie correction are KruskalSql's own CTEs (binned prefix
    * over the distinct-price histogram); the 10 pairwise z statistics
    * are a triangular self-join of the 5-row rank-sum frame. */
  private[queries] val DunnSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |  FROM oc GROUP BY 1, 2),
      |vh AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM gv GROUP BY 1),
      |hb AS (SELECT v, cv, CAST(floor(v / 1000) AS BIGINT) AS bin
      |  FROM vh),
      |binpre AS (
      |  SELECT bin,
      |    CAST(coalesce(sum(bc) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS bb
      |  FROM (SELECT bin, CAST(sum(cv) AS BIGINT) AS bc FROM hb GROUP BY 1)),
      |r AS (SELECT hb.v, hb.cv,
      |  bp.bb + CAST(coalesce(sum(hb.cv) OVER (PARTITION BY hb.bin
      |    ORDER BY hb.v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS below
      |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
      |gr AS (SELECT gv.g, CAST(sum(gv.c) AS BIGINT) AS n_g,
      |  CAST(sum(gv.c * (2 * r.below + r.cv + 1)) AS BIGINT) AS two_r
      |  FROM gv JOIN r ON gv.v = r.v GROUP BY 1),
      |tt AS (SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS tie3,
      |  CAST(sum(cv) AS BIGINT) AS nn FROM vh)
      |SELECT a.g AS seg_a, b.g AS seg_b,
      |  round(a.two_r / 2.0e0 / a.n_g, 4) AS mean_rank_a,
      |  round(b.two_r / 2.0e0 / b.n_g, 4) AS mean_rank_b,
      |  round((a.two_r / 2.0e0 / a.n_g - b.two_r / 2.0e0 / b.n_g)
      |    / sqrt((CAST(tt.nn AS DOUBLE) * (tt.nn + 1) / 12.0e0
      |        - tt.tie3 / (12.0e0 * (tt.nn - 1)))
      |      * (1.0e0 / a.n_g + 1.0e0 / b.n_g)), 4) AS z
      |FROM gr a JOIN gr b ON a.g < b.g CROSS JOIN tt""".stripMargin

  // ---- G-test of independence ----

  /** G-test as ONE portable text — oracle of `x_g_test` and whole query
    * of the `x_sql_gtest` twin. G = 2·Σ O·ln(O/E) over the observed
    * (priority × status) cells with expected counts from the marginals —
    * the likelihood-ratio counterpart of x_cramers_v's χ² on a bounded
    * 15-cell contingency frame. */
  private[queries] val GTestSql =
    """WITH cells AS (
      |  SELECT o_orderpriority AS p, o_orderstatus AS st,
      |    CAST(count(*) AS BIGINT) AS o
      |  FROM orders GROUP BY 1, 2),
      |rm AS (SELECT p, CAST(sum(o) AS BIGINT) AS rp FROM cells GROUP BY 1),
      |cm AS (SELECT st, CAST(sum(o) AS BIGINT) AS cs FROM cells GROUP BY 1),
      |tt AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
      |  CAST(count(DISTINCT p) AS BIGINT) AS nr,
      |  CAST(count(DISTINCT st) AS BIGINT) AS nc
      |  FROM cells)
      |SELECT max(tt.nn) AS n,
      |  CAST(max((tt.nr - 1) * (tt.nc - 1)) AS BIGINT) AS df,
      |  round(sum(2.0e0 * cells.o
      |    * ln(CAST(cells.o AS DOUBLE) * tt.nn
      |        / (CAST(rm.rp AS DOUBLE) * cm.cs))), 4) AS g_stat
      |FROM cells
      |JOIN rm ON rm.p = cells.p
      |JOIN cm ON cm.st = cells.st
      |CROSS JOIN tt""".stripMargin

  // ---- ANOVA effect sizes ----

  /** Effect sizes as ONE portable text — oracle of `x_eta_squared`.
    * Two-pass snapped-mean decomposition (µ_g and the grand mean both
    * 6 dp-snapped before any deviation is squared) so SSW/SSB are the
    * same doubles in both engines; η², ω², ε² and Cohen's f from the
    * bounded decomposition frame. */
  private[queries] val EtaSquaredSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n, round(avg(v), 6) AS mu
      |  FROM oc GROUP BY 1),
      |gm AS (SELECT round(sum(n * mu) / sum(n), 6) AS mu0,
      |  CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS kg
      |  FROM m),
      |ssw AS (SELECT sum((oc.v - m.mu) * (oc.v - m.mu)) AS ssw
      |  FROM oc JOIN m ON oc.g = m.g),
      |ssb AS (SELECT sum(m.n * (m.mu - gm.mu0) * (m.mu - gm.mu0)) AS ssb
      |  FROM m CROSS JOIN gm),
      |fin AS (SELECT ssb.ssb, ssw.ssw, gm.nn, gm.kg,
      |  ssw.ssw / (gm.nn - gm.kg) AS msw
      |  FROM ssb CROSS JOIN ssw CROSS JOIN gm)
      |SELECT nn AS n, kg AS groups,
      |  round(ssb / (ssb + ssw), 6) AS eta2,
      |  round((ssb - (kg - 1) * msw) / (ssb + ssw + msw), 6) AS omega2,
      |  round((ssb - (kg - 1) * msw) / (ssb + ssw), 6) AS epsilon2,
      |  round(sqrt(ssb / ssw), 6) AS cohens_f
      |FROM fin""".stripMargin

  // ---- Brunner-Munzel heteroscedastic rank test ----

  /** Brunner-Munzel as ONE portable text — oracle of `x_brunner_munzel`
    * and whole query of the `x_sql_bm` twin. The lawstat convention:
    * pooled and internal mid-ranks, per-group placement variances, the
    * Welch-like df. Everything runs on the joint quantity histogram —
    * l_quantity's domain is 1..50 at every sf, so the frame is
    * value-domain bounded and its plain cumulative windows order ≤50
    * rows. Mid-ranks are exact half-integers in both engines. */
  private[queries] val BrunnerMunzelSql =
    """WITH li AS (
      |  SELECT l_returnflag AS g, l_quantity AS v FROM lineitem
      |  WHERE l_returnflag IN ('A', 'R')),
      |hist AS (
      |  SELECT v,
      |    CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM li GROUP BY 1),
      |cum AS (
      |  SELECT v, c1, c2,
      |    CAST(coalesce(sum(c1) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS lo1,
      |    CAST(coalesce(sum(c2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS lo2
      |  FROM hist),
      |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
      |  CAST(sum(c2) AS BIGINT) AS n2 FROM hist),
      |mid AS (
      |  SELECT c1, c2,
      |    lo1 + lo2 + (c1 + c2 + 1) / 2.0e0 AS pm,
      |    lo1 + (c1 + 1) / 2.0e0 AS im1,
      |    lo2 + (c2 + 1) / 2.0e0 AS im2
      |  FROM cum),
      |mr AS (SELECT
      |  sum(c1 * pm) / max(tot.n1) AS m1,
      |  sum(c2 * pm) / max(tot.n2) AS m2
      |  FROM mid CROSS JOIN tot),
      |vv AS (SELECT
      |  sum(c1 * (pm - im1 - mr.m1 + (tot.n1 + 1) / 2.0e0)
      |    * (pm - im1 - mr.m1 + (tot.n1 + 1) / 2.0e0)) / (max(tot.n1) - 1)
      |    AS v1,
      |  sum(c2 * (pm - im2 - mr.m2 + (tot.n2 + 1) / 2.0e0)
      |    * (pm - im2 - mr.m2 + (tot.n2 + 1) / 2.0e0)) / (max(tot.n2) - 1)
      |    AS v2,
      |  max(mr.m1) AS m1, max(mr.m2) AS m2
      |  FROM mid CROSS JOIN tot CROSS JOIN mr)
      |SELECT tot.n1, tot.n2,
      |  round((vv.m2 - (tot.n2 + 1) / 2.0e0) / tot.n1, 6) AS p_hat,
      |  round(CAST(tot.n1 AS DOUBLE) * tot.n2 * (vv.m2 - vv.m1)
      |    / (tot.n1 + tot.n2)
      |    / sqrt(tot.n1 * vv.v1 + tot.n2 * vv.v2), 4) AS bm_stat,
      |  round((tot.n1 * vv.v1 + tot.n2 * vv.v2)
      |      * (tot.n1 * vv.v1 + tot.n2 * vv.v2)
      |    / ((tot.n1 * vv.v1) * (tot.n1 * vv.v1) / (tot.n1 - 1)
      |      + (tot.n2 * vv.v2) * (tot.n2 * vv.v2) / (tot.n2 - 1)), 2)
      |    AS df
      |FROM vv CROSS JOIN tot""".stripMargin

  val defs: Seq[QDef] = Seq(

    // BARTLETT: are order-price variances equal across the 5 segments —
    // the homogeneity precondition the existing ANOVA/Tukey family
    // assumes (x_levene_bf is its robust sibling). Corpus cost: ONE
    // exact-cents moment pass (BIGINT/DECIMAL(38,0) — no second
    // deviation scan, no order-dependent double sum); the statistic
    // runs on the 5-row frame from doubles both engines derive from
    // identical integers.
    QDef("x_bartlett", BartlettSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"),
          round(col("o_totalprice") * lit(100.0), 0).cast("bigint")
            .as("vc"))
      val m = oc.groupBy("g")
        .agg(count(lit(1)).as("n"), sum("vc").as("svc"),
          sum(col("vc").cast("decimal(19,0)") * col("vc"))
            .cast("decimal(38,0)").as("sqc"))
      val sM = m.select(col("g"), col("n"),
        round(col("svc").cast("double") / 1.0e2 / col("n"), 6)
          .as("mu"),
        (col("svc").cast("double") / 1.0e2).as("sv1"),
        (col("sqc").cast("double") / 1.0e4).as("sv2"))
      val ss = sM.select(col("g"), col("n"),
        (col("sv2") - lit(2.0) * col("mu") * col("sv1")
          + col("n") * col("mu") * col("mu")).as("ss"))
      ss.agg(count(lit(1)).as("kg"), sum(col("n")).as("nn"),
          sum(col("ss")).as("ssw"),
          sum((col("n") - 1) * log(col("ss") / (col("n") - 1))).as("sumlog"),
          sum(lit(1.0) / (col("n") - 1)).as("sinv"))
        .select(col("kg").as("groups"), col("nn").as("n"),
          (col("kg") - 1).cast("bigint").as("df"),
          round(((col("nn") - col("kg")) * log(col("ssw") / (col("nn") - col("kg")))
            - col("sumlog"))
            / (lit(1) + (col("sinv") - lit(1.0) / (col("nn") - col("kg")))
              / (lit(3.0) * (col("kg") - 1))), 4).as("bartlett_t"))
    },

    // CRAMÉR-VON MISES: the quadratic-EDF two-sample test — weights the
    // whole CDF gap where x_ks_test takes only its sup and
    // x_anderson_darling tail-weights it. ONE joint histogram, inclusive
    // CDFs from a single BinnedRank multi-measure pass.
    QDef("x_cvm", CvmSql) { (s, d) =>
      val li = Tables(s, d).lineitem
        .filter(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      val hist = li.groupBy("v").agg(
        sum(when(col("g") === "A", 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("c"))
      val cum = BinnedRank.belowAndNMany(hist, Seq.empty,
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")),
        Seq("1" -> col("c1"), "c" -> col("c")))
        .select(col("c"),
          (col("below1") + col("c1")).as("a1"),
          (col("belowc") + col("c")).as("h"),
          col("n1"), col("nc").as("nn"))
      cum.agg(max(col("n1")).as("n1"), max(col("nn")).as("nn"),
          sum(col("c").cast("double")
            * (col("a1").cast("double") / col("n1")
              - (col("h") - col("a1")).cast("double") / (col("nn") - col("n1")))
            * (col("a1").cast("double") / col("n1")
              - (col("h") - col("a1")).cast("double") / (col("nn") - col("n1"))))
            .as("s"))
        .select(col("n1"), (col("nn") - col("n1")).as("n2"),
          round(col("n1").cast("double") * (col("nn") - col("n1"))
            / (col("nn").cast("double") * col("nn")) * col("s"), 6)
            .as("cvm_t"))
    },

    // CvM through Spark's SQL parser — same shared text.
    QDef("x_sql_cvm", CvmSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(CvmSql)
    },

    // JONCKHEERE-TERPSTRA: does totalprice trend DOWN the 5 ordered
    // priorities — the ordered alternative x_kruskal_wallis cannot see.
    // The 5 per-group strictly-below cumulatives at every pooled price
    // come from ONE belowAndNMany pass (one histogram shuffle); the 10
    // pairwise U_ij sums are row-local arithmetic on that frame.
    QDef("x_jonckheere", JonckheereSql) { (s, d) =>
      val idx = JtGroups.indices.map(_ + 1)
      val oc = Tables(s, d).orders
        .select(col("o_orderpriority").as("g"), col("o_totalprice").as("v"))
      val hist = oc.groupBy("v").agg(
        sum(when(col("g") === JtGroups.head, 1L).otherwise(0L)).as("c1"),
        JtGroups.tail.zipWithIndex.map { case (g, i) =>
          sum(when(col("g") === g, 1L).otherwise(0L)).as(s"c${i + 2}")
        }: _*)
      val cum = BinnedRank.belowAndNMany(hist, Seq.empty,
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")),
        idx.map(i => i.toString -> col(s"c$i")))
      val jterm = (for { i <- idx; j <- idx if i < j } yield
        col(s"c$j").cast("double")
          * (col(s"below$i") + col(s"c$i") / lit(2.0)))
        .reduce(_ + _)
      val agg = cum.agg(sum(jterm).as("j"),
        (idx.map(i => max(col(s"n$i")).cast("double")).reduce(_ + _)).as("nn"),
        (idx.map(i => max(col(s"n$i")).cast("double") * max(col(s"n$i")))
          .reduce(_ + _)).as("sq"),
        (idx.map(i => max(col(s"n$i")).cast("double") * max(col(s"n$i"))
          * (lit(2.0) * max(col(s"n$i")) + lit(3))).reduce(_ + _)).as("cb"))
      agg.select(col("nn").cast("bigint").as("n"),
        round(col("j"), 1).as("j_stat"),
        round((col("nn") * col("nn") - col("sq")) / lit(4.0), 1).as("e_j"),
        round((col("nn") * col("nn") * (lit(2) * col("nn") + lit(3))
          - col("cb")) / lit(72.0), 1).as("var_j"),
        round((col("j") - (col("nn") * col("nn") - col("sq")) / lit(4.0))
          / sqrt((col("nn") * col("nn") * (lit(2) * col("nn") + lit(3))
            - col("cb")) / lit(72.0)), 4).as("z"))
    },

    // J-T through Spark's SQL parser — same generated text (the parsed
    // plan carries the oracle's own two-level bin windows).
    QDef("x_sql_jonckheere", JonckheereSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(JonckheereSql)
    },

    // DUNN POST-HOC: which segment pairs drive a significant
    // Kruskal-Wallis — pairwise mean-rank z with the shared tie
    // correction. Rank sums ride the identical KruskalSql machinery;
    // the triangular pair join runs on the 5-row frame (broadcast both
    // sides — carve-out, x_tukey_hsd posture).
    QDef("x_dunn_posthoc", DunnSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      // r15 pins: gv feeds vh AND the rank re-join; gr feeds BOTH sides
      // of the pairwise cross — unpinned, the whole collapse+scaffold
      // replayed per reference (28 scans / 27 exchanges in the old plan,
      // the x_fligner_killeen pattern)
      val gv = oc.groupBy("g", "v").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val vh = gv.groupBy("v").agg(sum(col("c")).as("cv"))
      val r = BinnedRank.belowAndN(vh, Seq.empty,
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")), col("cv"))
      val gr = gv.join(r.select("v", "cv", "below"), "v")
        .groupBy("g").agg(sum(col("c")).as("n_g"),
          sum(col("c") * (lit(2) * col("below") + col("cv") + lit(1)))
            .as("two_r"))
        .localCheckpoint(false) // 5 rows; consumed by both pair sides
      val tt = vh.agg(
        sum(col("cv") * col("cv") * col("cv") - col("cv")).as("tie3"),
        sum(col("cv")).as("nn"))
      val a = gr.select(col("g").as("seg_a"), col("n_g").as("na"),
        col("two_r").as("ra"))
      val b = gr.select(col("g").as("seg_b"), col("n_g").as("nb"),
        col("two_r").as("rb"))
      broadcast(a).join(broadcast(b), col("seg_a") < col("seg_b"))
        .crossJoin(broadcast(tt))
        .select(col("seg_a"), col("seg_b"),
          round(col("ra") / lit(2.0) / col("na"), 4).as("mean_rank_a"),
          round(col("rb") / lit(2.0) / col("nb"), 4).as("mean_rank_b"),
          round((col("ra") / lit(2.0) / col("na")
            - col("rb") / lit(2.0) / col("nb"))
            / sqrt((col("nn").cast("double") * (col("nn") + 1) / lit(12.0)
              - col("tie3") / (lit(12.0) * (col("nn") - 1)))
              * (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 4).as("z"))
    },

    // G-TEST: likelihood-ratio independence on (priority × status) — the
    // additive-decomposable counterpart of x_cramers_v's Pearson χ², on
    // the same bounded contingency shape (15 cells from one aggregate).
    QDef("x_g_test", GTestSql) { (s, d) =>
      val cells = Tables(s, d).orders
        .groupBy(col("o_orderpriority").as("p"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("o"))
      val rm = cells.groupBy("p").agg(sum(col("o")).as("rp"))
      val cm = cells.groupBy("st").agg(sum(col("o")).as("cs"))
      val tt = cells.agg(sum(col("o")).as("nn"),
        countDistinct(col("p")).as("nr"), countDistinct(col("st")).as("nc"))
      cells.join(broadcast(rm), "p").join(broadcast(cm), "st")
        .crossJoin(broadcast(tt))
        .agg(max(col("nn")).as("n"),
          max((col("nr") - 1) * (col("nc") - 1)).cast("bigint").as("df"),
          round(sum(lit(2.0) * col("o")
            * log(col("o").cast("double") * col("nn")
              / (col("rp").cast("double") * col("cs")))), 4).as("g_stat"))
    },

    // G-test through Spark's SQL parser — same shared text.
    QDef("x_sql_gtest", GTestSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(GTestSql)
    },

    // ANOVA EFFECT SIZES: how BIG is the segment effect x_anova_f only
    // tests — η² (variance explained), the less-biased ω²/ε², Cohen's f.
    // Two snapped-mean corpus passes (the JbSql float discipline); the
    // decomposition itself is 5-row algebra.
    QDef("x_eta_squared", EtaSquaredSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val m = oc.groupBy("g")
        .agg(count(lit(1)).as("n"), round(avg(col("v")), 6).as("mu"))
      val gm = m.agg(
        round(sum(col("n") * col("mu")) / sum(col("n")), 6).as("mu0"),
        sum(col("n")).as("nn"), count(lit(1)).as("kg"))
      val ssw = oc.join(broadcast(m), "g")
        .agg(sum((col("v") - col("mu")) * (col("v") - col("mu"))).as("ssw"))
      val ssb = m.crossJoin(broadcast(gm))
        .agg(sum(col("n") * (col("mu") - col("mu0"))
          * (col("mu") - col("mu0"))).as("ssb"),
          max(col("nn")).as("nn"), max(col("kg")).as("kg"))
      ssb.crossJoin(broadcast(ssw))
        .withColumn("msw", col("ssw") / (col("nn") - col("kg")))
        .select(col("nn").as("n"), col("kg").as("groups"),
          round(col("ssb") / (col("ssb") + col("ssw")), 6).as("eta2"),
          round((col("ssb") - (col("kg") - 1) * col("msw"))
            / (col("ssb") + col("ssw") + col("msw")), 6).as("omega2"),
          round((col("ssb") - (col("kg") - 1) * col("msw"))
            / (col("ssb") + col("ssw")), 6).as("epsilon2"),
          round(sqrt(col("ssb") / col("ssw")), 6).as("cohens_f"))
    },

    // BRUNNER-MUNZEL: the rank test that drops Mann-Whitney's
    // equal-variance assumption — placements, placement variances and
    // the Welch-like df all from the ≤50-row quantity histogram
    // (value-domain bounded at every sf).
    QDef("x_brunner_munzel", BrunnerMunzelSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val li = Tables(s, d).lineitem
        .filter(col("l_returnflag").isin("A", "R"))
        .select(col("l_returnflag").as("g"), col("l_quantity").as("v"))
      val hist = li.groupBy("v").agg(
        sum(when(col("g") === "A", 1L).otherwise(0L)).as("c1"),
        sum(when(col("g") === "R", 1L).otherwise(0L)).as("c2"))
      val wLo = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = hist
        .withColumn("lo1", coalesce(sum(col("c1")).over(wLo), lit(0L)))
        .withColumn("lo2", coalesce(sum(col("c2")).over(wLo), lit(0L)))
      val tot = hist.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val mid = cum.select(col("c1"), col("c2"),
        (col("lo1") + col("lo2") + (col("c1") + col("c2") + 1) / lit(2.0))
          .as("pm"),
        (col("lo1") + (col("c1") + 1) / lit(2.0)).as("im1"),
        (col("lo2") + (col("c2") + 1) / lit(2.0)).as("im2"))
        .crossJoin(broadcast(tot))
      val mr = mid.agg(
        (sum(col("c1") * col("pm")) / max(col("n1"))).as("m1"),
        (sum(col("c2") * col("pm")) / max(col("n2"))).as("m2"))
      val vv = mid.crossJoin(broadcast(mr)).agg(
        (sum(col("c1")
          * (col("pm") - col("im1") - col("m1") + (col("n1") + 1) / lit(2.0))
          * (col("pm") - col("im1") - col("m1") + (col("n1") + 1) / lit(2.0)))
          / (max(col("n1")) - 1)).as("v1"),
        (sum(col("c2")
          * (col("pm") - col("im2") - col("m2") + (col("n2") + 1) / lit(2.0))
          * (col("pm") - col("im2") - col("m2") + (col("n2") + 1) / lit(2.0)))
          / (max(col("n2")) - 1)).as("v2"),
        max(col("m1")).as("m1"), max(col("m2")).as("m2"))
      vv.crossJoin(broadcast(tot))
        .select(col("n1"), col("n2"),
          round((col("m2") - (col("n2") + 1) / lit(2.0)) / col("n1"), 6)
            .as("p_hat"),
          round(col("n1").cast("double") * col("n2")
            * (col("m2") - col("m1")) / (col("n1") + col("n2"))
            / sqrt(col("n1") * col("v1") + col("n2") * col("v2")), 4)
            .as("bm_stat"),
          round((col("n1") * col("v1") + col("n2") * col("v2"))
            * (col("n1") * col("v1") + col("n2") * col("v2"))
            / ((col("n1") * col("v1")) * (col("n1") * col("v1"))
                / (col("n1") - 1)
              + (col("n2") * col("v2")) * (col("n2") * col("v2"))
                / (col("n2") - 1)), 2).as("df"))
    },

    // BM through Spark's SQL parser — same shared text (its cumulative
    // windows order the ≤50-row quantity histogram).
    QDef("x_sql_bm", BrunnerMunzelSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(BrunnerMunzelSql)
    }
  )
}
