package graft.queries

import graft.{QDef, Tables}
import graft.ops.BinnedRank
import org.apache.spark.sql.functions._

/** Round-42 batch: normal-scores rank tests, unlocked by a PORTABLE
  * deterministic inverse normal CDF. Φ⁻¹ is Acklam's rational
  * approximation written once as a SQL expression fragment — both
  * engines parse the identical arithmetic tree (+ − × ÷ sqrt ln over
  * e-notation double literals, all IEEE-deterministic), and the Spark
  * Dataset sides build their column with `expr()` over the SAME
  * fragment, so there is no float path to diverge anywhere. Scores are
  * evaluated scan-local on distinct-value histograms (midrank
  * conventions documented per test):
  *
  *  - van der Waerden: Kruskal-Wallis' binned-rank machinery verbatim,
  *    with ranks pushed through Φ⁻¹(m/(N+1)) before the group sums.
  *  - Fligner-Killeen: per-group medians (the x_levene_bf selection),
  *    pooled ranks of |v − med_g|, scores Φ⁻¹(½ + m/(2(N+1))).
  *  - Shapiro-Francia: Blom scores Φ⁻¹((m − 3/8)/(n + ¼)) against the
  *    ≤50-value quantity histogram (squared correlation W′).
  */
object R42Ops {

  /** Acklam's inverse normal CDF as a SQL expression over `p` (a
    * column expression string). Max abs error ~1.15e-9 — far below the
    * 4-6 dp the released statistics round to. The three branches
    * (lower tail / central / upper tail) substitute their argument
    * textually, so the fragment is self-contained. */
  private[queries] def normInvSql(p: String): String = {
    val a = Seq("-3.969683028665376e1", "2.209460984245205e2",
      "-2.759285104469687e2", "1.38357751867269e2",
      "-3.066479806614716e1", "2.506628277459239e0")
    val b = Seq("-5.447609879822406e1", "1.615858368580409e2",
      "-1.556989798598866e2", "6.680131188771972e1",
      "-1.328068155288572e1")
    val c = Seq("-7.784894002430293e-3", "-3.223964580411365e-1",
      "-2.400758277161838e0", "-2.549732539343734e0",
      "4.374664141464968e0", "2.938163982698783e0")
    val dd = Seq("7.784695709041462e-3", "3.224671290700398e-1",
      "2.445134137142996e0", "3.754408661907416e0")
    def horner(cs: Seq[String], x: String): String =
      cs.tail.foldLeft(cs.head)((acc, k) => s"($acc * $x + $k)")
    val q = s"($p - 0.5e0)"
    val r = s"($q * $q)"
    val central =
      s"${horner(a, r)} * $q / (${horner(b, r)} * $r + 1.0e0)"
    val ql = s"sqrt(-2.0e0 * ln($p))"
    val lower = s"${horner(c, ql)} / (${horner(dd, ql)} * $ql + 1.0e0)"
    val qu = s"sqrt(-2.0e0 * ln(1.0e0 - $p))"
    val upper = s"-(${horner(c, qu)} / (${horner(dd, qu)} * $qu + 1.0e0))"
    s"""(CASE WHEN $p < 0.02425e0 THEN $lower
       |  WHEN $p <= 0.97575e0 THEN $central
       |  ELSE $upper END)""".stripMargin
  }

  /** KruskalSql's histogram/rank CTE fragment (oc → gv → vh → hb →
    * binpre → r), shared verbatim so the vdW twin carries the same
    * binned two-level prefix shape. */
  /** RankCtes' corpus prefix (oc → gv), split out (r15) so the x_sql_vdw
    * twin can materialize gv once (Spark inlines CTE references — the
    * unsplit twin re-ran the orders⋈customer collapse per reference, 48
    * scans). Concatenation keeps [[RankCtes]]/[[VdwSql]] byte-identical. */
  private[queries] val RankGvCtes =
    """oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |  FROM oc GROUP BY 1, 2)""".stripMargin

  private[queries] val RankBinCtes =
    """vh AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM gv GROUP BY 1),
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
      |  FROM hb JOIN binpre bp ON hb.bin = bp.bin)""".stripMargin

  private val RankCtes = s"$RankGvCtes,\n$RankBinCtes"

  /** van der Waerden as ONE portable text — oracle of `x_vdw_test` and
    * whole query of the `x_sql_vdw` twin. */
  private[queries] val VdwTailCtes =
    s"""tt AS (SELECT CAST(sum(cv) AS BIGINT) AS nn FROM vh),
       |sc AS (SELECT r.v, r.cv,
       |  ${normInvSql(
           "((r.below + (r.cv + 1.0e0) / 2.0e0) / (tt.nn + 1.0e0))")}
       |    AS s
       |  FROM r CROSS JOIN tt),
       |ga AS (SELECT gv.g, CAST(sum(gv.c) AS BIGINT) AS n_g,
       |  sum(gv.c * sc.s) AS a_j
       |  FROM gv JOIN sc ON gv.v = sc.v GROUP BY 1),
       |s2 AS (SELECT sum(sc.cv * sc.s * sc.s) / (max(tt.nn) - 1) AS s2
       |  FROM sc CROSS JOIN tt),
       |t AS (SELECT sum(a_j * a_j / n_g) / max(s2.s2) AS t1
       |  FROM ga CROSS JOIN s2)
       |SELECT ga.g AS segment, ga.n_g AS n,
       |  round(ga.a_j / ga.n_g, 6) AS mean_score,
       |  round(t.t1, 4) AS t_stat
       |FROM ga CROSS JOIN t""".stripMargin

  private[queries] val VdwSql = s"WITH $RankCtes,\n$VdwTailCtes"

  /** Fligner-Killeen as ONE portable text — oracle of
    * `x_fligner_killeen` and whole query of the `x_sql_fk` twin.
    * median() interpolates identically in both engines (mean of the
    * two central values — the x_levene_bf contract). */
  /** FkSql's corpus prefix (oc → med → gz), split out (r15) so the
    * x_sql_fk twin can materialize gz once — the unsplit twin's plan
    * inlined the median + |residual| chain into every reference (96
    * scans / 48 ObjectHashAggregates, plans/r15/x_sql_fk_before.txt).
    * Concatenation keeps [[FkSql]] byte-identical to the pre-split text. */
  private[queries] val FkGzCtes =
    """oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |med AS (SELECT g, median(v) AS med FROM oc GROUP BY 1),
      |gz AS (SELECT oc.g, abs(oc.v - med.med) AS z,
      |  CAST(count(*) AS BIGINT) AS c
      |  FROM oc JOIN med ON oc.g = med.g GROUP BY 1, 2)""".stripMargin

  private[queries] val FkTailCtes =
    s"""zh AS (SELECT z, CAST(sum(c) AS BIGINT) AS cz FROM gz GROUP BY 1),
       |hb AS (SELECT z, cz, CAST(floor(z / 1000) AS BIGINT) AS bin
       |  FROM zh),
       |binpre AS (
       |  SELECT bin,
       |    CAST(coalesce(sum(bc) OVER (ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS bb
       |  FROM (SELECT bin, CAST(sum(cz) AS BIGINT) AS bc FROM hb GROUP BY 1)),
       |r AS (SELECT hb.z, hb.cz,
       |  bp.bb + CAST(coalesce(sum(hb.cz) OVER (PARTITION BY hb.bin
       |    ORDER BY hb.z
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS below
       |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
       |tt AS (SELECT CAST(sum(cz) AS BIGINT) AS nn FROM zh),
       |sc AS (SELECT r.z, r.cz,
       |  ${normInvSql(
           "(0.5e0 + (r.below + (r.cz + 1.0e0) / 2.0e0) " +
             "/ (2.0e0 * (tt.nn + 1.0e0)))")}
       |    AS a
       |  FROM r CROSS JOIN tt),
       |ga AS (SELECT gz.g, CAST(sum(gz.c) AS BIGINT) AS n_g,
       |  sum(gz.c * sc.a) / sum(gz.c) AS abar_j
       |  FROM gz JOIN sc ON gz.z = sc.z GROUP BY 1),
       |gl AS (SELECT sum(sc.cz * sc.a) / max(tt.nn) AS abar,
       |  (sum(sc.cz * sc.a * sc.a)
       |    - max(tt.nn) * (sum(sc.cz * sc.a) / max(tt.nn))
       |      * (sum(sc.cz * sc.a) / max(tt.nn))) / (max(tt.nn) - 1) AS s2
       |  FROM sc CROSS JOIN tt),
       |x AS (SELECT sum(ga.n_g * (ga.abar_j - gl.abar)
       |    * (ga.abar_j - gl.abar)) / max(gl.s2) AS chi2
       |  FROM ga CROSS JOIN gl)
       |SELECT ga.g AS segment, ga.n_g AS n,
       |  round(ga.abar_j, 6) AS mean_score,
       |  round(x.chi2, 4) AS fk_chi2
       |FROM ga CROSS JOIN x""".stripMargin

  private[queries] val FkSql = s"WITH $FkGzCtes,\n$FkTailCtes"

  /** Shapiro-Francia (midrank-Blom convention, documented) as ONE
    * portable text — oracle of `x_shapiro_francia` and whole query of
    * the `x_sql_sf` twin. */
  private[queries] val SfSql =
    s"""WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
       |  CAST(count(*) AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1),
       |cum AS (SELECT v, c,
       |  CAST(coalesce(sum(c) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS below,
       |  CAST(sum(c) OVER () AS BIGINT) AS nn
       |  FROM h),
       |sc AS (SELECT v, c, nn,
       |  ${normInvSql(
           "((below + (c + 1.0e0) / 2.0e0 - 0.375e0) / (nn + 0.25e0))")}
       |    AS a
       |  FROM cum),
       |ag AS (SELECT max(nn) AS n,
       |  sum(c * a * CAST(v AS DOUBLE)) AS sav,
       |  sum(c * a * a) AS saa,
       |  sum(c * CAST(v AS DOUBLE)) AS sv,
       |  sum(c * CAST(v AS DOUBLE) * v) AS svv
       |  FROM sc)
       |SELECT n,
       |  round(sav * sav / (saa * (svv - sv * sv / n)), 6) AS w_prime
       |FROM ag""".stripMargin

  val defs: Seq[QDef] = Seq(

    // VAN DER WAERDEN: Kruskal-Wallis with ranks pushed through Φ⁻¹ —
    // asymptotically the most powerful rank location test under
    // normality. The corpus work is identical to x_kruskal_wallis (one
    // (g,v) collapse, BinnedRank prefix); the scores are scan-local
    // arithmetic on the histogram.
    QDef("x_vdw_test", VdwSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      // r15: pin the multi-referenced frames — the unpinned plan replayed
      // the (g,v) collapse and the scaffold into every downstream
      // reference (the x_fligner_killeen 48-aggregate pattern)
      val gv = oc.groupBy("g", "v").agg(count(lit(1)).as("c"))
        .localCheckpoint(false) // consumed by vh AND the ga score join
      val vh = gv.groupBy("v").agg(sum(col("c")).as("cv"))
      val r = BinnedRank.belowAndN(vh, Seq.empty,
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")),
        col("cv"))
      val tt = vh.agg(sum(col("cv")).as("nn"))
      val sc = r.crossJoin(broadcast(tt))
        .withColumn("s", expr(normInvSql(
          "((below + (cv + 1.0e0) / 2.0e0) / (nn + 1.0e0))")))
        .select("v", "cv", "s")
        .localCheckpoint(false) // consumed by ga AND the s2 moment agg
      val ga = gv.join(sc.select("v", "s"), "v")
        .groupBy("g").agg(sum(col("c")).as("n_g"),
          sum(col("c") * col("s")).as("a_j"))
        .localCheckpoint(false) // 5 rows; consumed by tstat AND the final select
      val s2 = sc.crossJoin(broadcast(tt))
        .agg((sum(col("cv") * col("s") * col("s"))
          / (max(col("nn")) - 1)).as("s2"))
      val tstat = ga.crossJoin(broadcast(s2))
        .agg((sum(col("a_j") * col("a_j") / col("n_g"))
          / max(col("s2"))).as("t1"))
      ga.crossJoin(broadcast(tstat))
        .select(col("g").as("segment"), col("n_g").as("n"),
          round(col("a_j") / col("n_g"), 6).as("mean_score"),
          round(col("t1"), 4).as("t_stat"))
    },

    // van der Waerden through Spark's SQL parser — same shared text, with
    // the multiply-referenced gv collapse materialized ONCE behind a
    // localCheckpoint view (the x_sql_mp / x_sql_kcore from-birth rule;
    // r15): Spark inlines CTE references, so the one-string form re-ran
    // the orders⋈customer (g,v) collapse per reference — 48 scans / 46
    // exchanges in plans/r15/x_sql_vdw_before.txt.
    QDef("x_sql_vdw", VdwSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(s"WITH $RankGvCtes SELECT g, v, c FROM gv")
        .transform(SqlSurface.materialized("gv"))
      s.sql(s"WITH $RankBinCtes,\n$VdwTailCtes")
    },

    // FLIGNER-KILLEEN: the rank scale test robust to non-normality —
    // scores Φ⁻¹(½ + m/(2(N+1))) on pooled ranks of |v − med_g|. The
    // per-group medians ride the x_levene_bf selection; the |residual|
    // histogram is value-domain ~500 bins (the x_conformal class).
    QDef("x_fligner_killeen", FkSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      // r15: the real fligner cost was REPLAY, not the median itself —
      // the unpinned chain inlined the median + |residual| subtree into
      // every downstream reference: 48 ObjectHashAggregates / 96 scans in
      // one 410-node plan (plans/r15/..._before.txt). The multi-referenced
      // frames are now pinned (lazy localCheckpoint), so the median
      // aggregate runs ONCE. The percentile→BinnedRank-scaffold swap
      // (ops.ExactQuantile) was re-measured at local[32] per the r14
      // verdict and re-rejected: bit-identical but ~2× slower on every
      // site at this scale (AbQuantile: med stage 0.6 s → 1.3 s) — the
      // interpreted map over ≤600k rows stays below the scaffold's
      // 6-stage floor even at 32 cores. ExactQuantile remains available
      // for the 100 TB posture (near-unique measures, where the
      // O(distinct) per-group map is the scale-killer).
      val med = oc.groupBy("g").agg(expr("median(v)").as("med"))
      val gz = oc.join(broadcast(med), "g")
        .select(col("g"), abs(col("v") - col("med")).as("z"))
        .groupBy("g", "z").agg(count(lit(1)).as("c"))
        .localCheckpoint(false) // consumed by zh AND the ga score join
      val zh = gz.groupBy("z").agg(sum(col("c")).as("cz"))
      val r = BinnedRank.belowAndN(zh, Seq.empty,
        floor(col("z") / lit(1000)).cast("bigint"), Seq(col("z")),
        col("cz"))
      val tt = zh.agg(sum(col("cz")).as("nn"))
      val sc = r.crossJoin(broadcast(tt))
        .withColumn("a", expr(normInvSql(
          "(0.5e0 + (below + (cz + 1.0e0) / 2.0e0) "
            + "/ (2.0e0 * (nn + 1.0e0)))")))
        .select("z", "cz", "a")
        .localCheckpoint(false) // consumed by ga AND the gl moment agg
      val ga = gz.join(sc.select("z", "a"), "z")
        .groupBy("g").agg(sum(col("c")).as("n_g"),
          (sum(col("c") * col("a")) / sum(col("c"))).as("abar_j"))
        .localCheckpoint(false) // 5 rows; consumed by x AND the final select
      val gl = sc.crossJoin(broadcast(tt)).agg(
        (sum(col("cz") * col("a")) / max(col("nn"))).as("abar"),
        ((sum(col("cz") * col("a") * col("a"))
          - max(col("nn")) * (sum(col("cz") * col("a")) / max(col("nn")))
            * (sum(col("cz") * col("a")) / max(col("nn"))))
          / (max(col("nn")) - 1)).as("s2"))
      val x = ga.crossJoin(broadcast(gl))
        .agg((sum(col("n_g") * (col("abar_j") - col("abar"))
          * (col("abar_j") - col("abar"))) / max(col("s2"))).as("chi2"))
      ga.crossJoin(broadcast(x))
        .select(col("g").as("segment"), col("n_g").as("n"),
          round(col("abar_j"), 6).as("mean_score"),
          round(col("chi2"), 4).as("fk_chi2"))
    },

    // Fligner-Killeen through Spark's SQL parser — same shared text, with
    // the median + |residual| collapse (gz) materialized ONCE (r15): the
    // one-string form inlined it into every reference — 96 scans / 48
    // ObjectHashAggregates (plans/r15/x_sql_fk_before.txt).
    QDef("x_sql_fk", FkSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(s"WITH $FkGzCtes SELECT g, z, c FROM gz")
        .transform(SqlSurface.materialized("gz"))
      s.sql(s"WITH $FkTailCtes")
    },

    // SHAPIRO-FRANCIA: is quantity normal — the squared correlation of
    // the (midrank-averaged) sorted sample with Blom's expected normal
    // order statistics. Everything after the ≤50-row histogram is
    // bounded algebra; W′ near 0.95 for the fixture's uniform-ish
    // quantity is the expected strong rejection of normality.
    QDef("x_shapiro_francia", SfSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = Tables(s, d).lineitem
        .groupBy(col("l_quantity").cast("bigint").as("v"))
        .agg(count(lit(1)).as("c"))
      val wv = Window.orderBy("v")
      val wAll = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = h.select(col("v"), col("c"),
        coalesce(sum(col("c")).over(wv.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)).as("below"),
        sum(col("c")).over(wAll).as("nn"))
      val sc = cum.withColumn("a", expr(normInvSql(
        "((below + (c + 1.0e0) / 2.0e0 - 0.375e0) / (nn + 0.25e0))")))
      sc.agg(max(col("nn")).as("n"),
          sum(col("c") * col("a") * col("v").cast("double")).as("sav"),
          sum(col("c") * col("a") * col("a")).as("saa"),
          sum(col("c") * col("v").cast("double")).as("sv"),
          sum(col("c") * col("v").cast("double") * col("v")).as("svv"))
        .select(col("n"),
          round(col("sav") * col("sav")
            / (col("saa") * (col("svv") - col("sv") * col("sv") / col("n"))),
            6).as("w_prime"))
    },

    // Shapiro-Francia through Spark's SQL parser — same shared text.
    QDef("x_sql_sf", SfSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(SfSql)
    }
  )
}
