package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-51 batch: inter-rater agreement and clustering-evaluation
  * indexes — adjusted Rand, V-measure (homogeneity/completeness),
  * Fowlkes-Mallows, linearly-weighted Cohen's kappa, Gwet's AC1, and
  * Krippendorff's nominal alpha — all over ONE shared 9-cell pairing
  * (each order "rated" twice: its priority class 1-2/3/4-5 vs its
  * basket-size class ≤2/3-4/≥5, the x_stuart_maxwell contingency) —
  * plus a deterministic Lehmer-LCG hash sample whose arithmetic both
  * engines replay exactly.
  *
  * Scale posture: one orderkey equi-join (co-partitioned fact-fact) +
  * ONE 9-cell collapse per operator; every index is closed algebra on
  * the bounded frame. Pair counts C(x,2) go DOUBLE before products
  * (x² at 100 TB exceeds 2^53 — both engines round identically, the
  * documented posture). The LCG sampler is the deterministic answer
  * to "sample 5%" — h = (k mod p)·48271 mod p against a fixed
  * threshold, pure BIGINT arithmetic (products ≤ 1e14), identical in
  * any engine, and trivially pushed into a scan filter. */
object R51Ops {

  /** The shared pairing CTE: per-order priority class (x) vs
    * basket-size class (y), collapsed to the 9-cell contingency.
    * Verbatim prefix of every agreement text (the SmSql pairing,
    * R48Ops.scala). */
  private val pairingCte =
    """ln AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nl
      |  FROM lineitem GROUP BY 1),
      |oc AS (SELECT
      |  CASE WHEN CAST(substr(o.o_orderpriority, 1, 1) AS INT) <= 2
      |    THEN 1 WHEN CAST(substr(o.o_orderpriority, 1, 1) AS INT) = 3
      |    THEN 2 ELSE 3 END AS x,
      |  CASE WHEN ln.nl <= 2 THEN 1 WHEN ln.nl <= 4 THEN 2 ELSE 3 END
      |    AS y
      |  FROM orders o JOIN ln ON o.o_orderkey = ln.k),
      |t AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n FROM oc
      |  GROUP BY 1, 2),
      |mg AS (SELECT x, y, n,
      |  CAST(sum(n) OVER (PARTITION BY x) AS BIGINT) AS rx,
      |  CAST(sum(n) OVER (PARTITION BY y) AS BIGINT) AS cy,
      |  CAST(sum(n) OVER (PARTITION BY 1=1) AS BIGINT) AS nn
      |  FROM t)""".stripMargin

  /** Adjusted Rand index of the two 3-level "clusterings" as ONE
    * portable text — oracle of `x_adjusted_rand` and whole query of
    * the `x_sql_ari` twin. Pair-count form: (Σ C(n_ij,2) − E) /
    * (½[ΣC(a,2)+ΣC(b,2)] − E), E = ΣC(a,2)·ΣC(b,2)/C(n,2). */
  private[queries] val AriSql =
    s"""WITH $pairingCte,
       |pc AS (SELECT
       |  sum(CAST(n AS DOUBLE) * (n - 1) / 2) AS tp,
       |  max(CAST(nn AS DOUBLE) * (nn - 1) / 2) AS cn FROM mg),
       |ma AS (SELECT sum(CAST(rx AS DOUBLE) * (rx - 1) / 2) AS sa
       |  FROM (SELECT DISTINCT x, rx FROM mg) d),
       |mb AS (SELECT sum(CAST(cy AS DOUBLE) * (cy - 1) / 2) AS sb
       |  FROM (SELECT DISTINCT y, cy FROM mg) d),
       |ar AS (SELECT pc.tp, ma.sa, mb.sb, pc.cn,
       |  ma.sa * mb.sb / pc.cn AS e FROM pc, ma, mb)
       |SELECT round(tp, 1) AS pairs_together,
       |  round((tp - e) / ((sa + sb) / 2 - e), 6) AS adjusted_rand,
       |  round(tp / sqrt(sa * sb), 6) AS fowlkes_mallows
       |FROM ar""".stripMargin

  /** V-measure (homogeneity, completeness, their harmonic mean) as
    * ONE portable text — oracle of `x_v_measure` and whole query of
    * the `x_sql_vmeasure` twin. Conditional entropies from the same
    * 9-cell frame; h = 1 − H(X|Y)/H(X), c = 1 − H(Y|X)/H(Y). */
  private[queries] val VmeasureSql =
    s"""WITH $pairingCte,
       |ent AS (SELECT
       |  -sum(CAST(n AS DOUBLE) / nn
       |    * ln(CAST(n AS DOUBLE) / cy)) AS h_x_given_y,
       |  -sum(CAST(n AS DOUBLE) / nn
       |    * ln(CAST(n AS DOUBLE) / rx)) AS h_y_given_x
       |  FROM mg),
       |hx AS (SELECT -sum(CAST(rx AS DOUBLE) / nn
       |    * ln(CAST(rx AS DOUBLE) / nn)) AS h
       |  FROM (SELECT DISTINCT x, rx, nn FROM mg) d),
       |hy AS (SELECT -sum(CAST(cy AS DOUBLE) / nn
       |    * ln(CAST(cy AS DOUBLE) / nn)) AS h
       |  FROM (SELECT DISTINCT y, cy, nn FROM mg) d),
       |hc AS (SELECT 1.0e0 - ent.h_x_given_y / hx.h AS hom,
       |  1.0e0 - ent.h_y_given_x / hy.h AS com
       |  FROM ent, hx, hy)
       |SELECT round(hom, 6) AS homogeneity, round(com, 6)
       |    AS completeness,
       |  round(2.0e0 * hom * com / (hom + com), 6) AS v_measure
       |FROM hc""".stripMargin

  /** Linearly-weighted Cohen's kappa as ONE portable text — oracle of
    * `x_kappa_weighted` and whole query of the `x_sql_wkappa` twin.
    * w_ij = 1 − |i−j|/(k−1) on the ordinal 3×3; κw from weighted
    * observed vs chance agreement (exact integer-count ratios). */
  private[queries] val WkappaSql =
    s"""WITH $pairingCte,
       |po AS (SELECT sum((1.0e0 - abs(x - y) / 2.0e0)
       |  * CAST(n AS DOUBLE) / nn) AS po FROM mg),
       |pe AS (SELECT sum((1.0e0 - abs(a.x - b.y) / 2.0e0)
       |  * (CAST(a.rx AS DOUBLE) / a.nn)
       |  * (CAST(b.cy AS DOUBLE) / b.nn)) AS pe
       |  FROM (SELECT DISTINCT x, rx, nn FROM mg) a,
       |       (SELECT DISTINCT y, cy, nn FROM mg) b)
       |SELECT round(po.po, 6) AS po_weighted,
       |  round(pe.pe, 6) AS pe_weighted,
       |  round((po.po - pe.pe) / (1.0e0 - pe.pe), 6) AS kappa_w
       |FROM po, pe""".stripMargin

  /** Gwet's AC1 as ONE portable text — oracle of `x_gwet_ac1` and
    * whole query of the `x_sql_ac1` twin. The paradox-resistant
    * agreement coefficient: chance term from the MEAN marginal
    * π_q = (p_q· + p_·q)/2, pe = Σ π(1−π)/(k−1). Released beside the
    * plain (unweighted) Cohen's kappa from the same frame. */
  private[queries] val Ac1Sql =
    s"""WITH $pairingCte,
       |pa AS (SELECT sum(CASE WHEN x = y THEN CAST(n AS DOUBLE)
       |  ELSE 0 END) / max(nn) AS pa FROM mg),
       |marg AS (SELECT q, sum(r) AS r, sum(c) AS c, max(nn) AS nn
       |  FROM (
       |    SELECT x AS q, CAST(max(rx) AS DOUBLE) AS r, 0.0e0 AS c,
       |      max(nn) AS nn FROM mg GROUP BY x
       |    UNION ALL
       |    SELECT y AS q, 0.0e0 AS r, CAST(max(cy) AS DOUBLE) AS c,
       |      max(nn) AS nn FROM mg GROUP BY y) u
       |  GROUP BY q),
       |pe AS (SELECT
       |  sum(((r + c) / (2.0e0 * nn))
       |    * (1.0e0 - (r + c) / (2.0e0 * nn))) / 2.0e0 AS pe_g,
       |  sum((r / nn) * (c / nn)) AS pe_k FROM marg)
       |SELECT round(pa.pa, 6) AS pa,
       |  round((pa.pa - pe.pe_k) / (1.0e0 - pe.pe_k), 6) AS kappa,
       |  round((pa.pa - pe.pe_g) / (1.0e0 - pe.pe_g), 6) AS gwet_ac1
       |FROM pa, pe""".stripMargin

  /** Krippendorff's nominal alpha (2 raters) as ONE portable text —
    * oracle of `x_krippendorff` and whole query of the `x_sql_kripp`
    * twin. Coincidence-matrix form: o_cc = 2n_cc, margins n_c =
    * rowsum + colsum; α = 1 − D_o/D_e with D_o = Σ_{c≠k}o_ck/(2N),
    * D_e = Σ_{c≠k}n_c n_k/(2N(2N−1)) — exact integer counts into one
    * final division. */
  private[queries] val KrippSql =
    s"""WITH $pairingCte,
       |do_ AS (SELECT sum(CASE WHEN x <> y THEN 2.0e0 * n ELSE 0 END)
       |    / (2.0e0 * max(nn)) AS dobs,
       |  max(nn) AS nn FROM mg),
       |nc AS (SELECT q, sum(m) AS m FROM (
       |    SELECT x AS q, CAST(max(rx) AS DOUBLE) AS m FROM mg
       |    GROUP BY x
       |    UNION ALL
       |    SELECT y AS q, CAST(max(cy) AS DOUBLE) AS m FROM mg
       |    GROUP BY y) u GROUP BY q),
       |de AS (SELECT
       |  (sum(m) * sum(m) - sum(m * m))
       |    / (2.0e0 * do_.nn * (2.0e0 * do_.nn - 1)) AS dexp,
       |  max(do_.dobs) AS dobs
       |  FROM nc, do_ GROUP BY do_.nn)
       |SELECT round(dobs, 6) AS d_observed, round(dexp, 6)
       |    AS d_expected,
       |  round(1.0e0 - dobs / dexp, 6) AS kripp_alpha
       |FROM de""".stripMargin

  /** Deterministic Lehmer-LCG 5% hash sample of lineitem as ONE
    * portable text — oracle of `x_lcg_sample` and whole query of the
    * `x_sql_lcg` twin. TWO Lehmer steps h ← h·48271 mod (2³¹−1) over
    * key = orderkey·8 + linenumber; rows with h < p/20 are IN. One
    * step is NOT enough: sequential keys make {k·a mod p} a coarse
    * lattice whose below-threshold bands realize 9-19% at small key
    * ranges (measured); the second step lands 5.00% at every scale.
    * Pure BIGINT arithmetic (products ≤ 1.1e14), so any engine
    * replays the membership bit-exactly — the deterministic answer to
    * "give me a 5% sample" that pushes into a scan filter. Released:
    * sample vs population mean quantity and the realized rate. */
  private[queries] val LcgSql =
    """WITH k AS (SELECT CAST(l_quantity AS BIGINT) AS q,
      |  (((l_orderkey * 8 + l_linenumber) % 2147483647) * 48271
      |    % 2147483647) * 48271 % 2147483647 AS h
      |  FROM lineitem),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_pop,
      |  CAST(sum(q) AS BIGINT) AS s_pop,
      |  CAST(sum(CASE WHEN h < 107374182 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_s,
      |  CAST(sum(CASE WHEN h < 107374182 THEN q ELSE 0 END)
      |    AS BIGINT) AS s_s
      |  FROM k)
      |SELECT n_pop, n_s,
      |  round(CAST(n_s AS DOUBLE) / n_pop, 6) AS sample_rate,
      |  round(CAST(s_pop AS DOUBLE) / n_pop, 6) AS pop_mean_qty,
      |  round(CAST(s_s AS DOUBLE) / n_s, 6) AS sample_mean_qty
      |FROM ag""".stripMargin

  /** The shared pairing as a Dataset program: 9-cell frame with
    * window margins (rx, cy, nn). */
  private def pairing(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(s, d)
    val ln = t.lineitem.groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("nl"))
    val pcls = substring(col("o_orderpriority"), 1, 1).cast("int")
    val tt = t.orders.join(ln, col("o_orderkey") === col("k"))
      .select(
        when(pcls <= 2, 1).when(pcls === 3, 2).otherwise(3).as("x"),
        when(col("nl") <= 2, 1).when(col("nl") <= 4, 2).otherwise(3)
          .as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n"))
    tt.select(col("x"), col("y"), col("n"),
      sum("n").over(Window.partitionBy("x")).cast("bigint").as("rx"),
      sum("n").over(Window.partitionBy("y")).cast("bigint").as("cy"),
      sum("n").over(Window.partitionBy(lit(1)))
        .cast("bigint").as("nn"))
  }

  val defs: Seq[QDef] = Seq(

    // ADJUSTED RAND (+ Fowlkes-Mallows): do the two 3-way partitions
    // agree beyond chance — the pair-counting view.
    QDef("x_adjusted_rand", AriSql) { (s, d) =>
      val mg = pairing(s, d)
      val nD = col("n").cast("double")
      val pc = mg.agg(sum(nD * (col("n") - 1) / 2).as("tp"),
        max(col("nn").cast("double") * (col("nn") - 1) / 2).as("cn"))
      val ma = mg.select("x", "rx").distinct()
        .agg(sum(col("rx").cast("double") * (col("rx") - 1) / 2)
          .as("sa"))
      val mb = mg.select("y", "cy").distinct()
        .agg(sum(col("cy").cast("double") * (col("cy") - 1) / 2)
          .as("sb"))
      pc.crossJoin(broadcast(ma)).crossJoin(broadcast(mb))
        .select(col("tp"), col("sa"), col("sb"),
          (col("sa") * col("sb") / col("cn")).as("e"))
        .select(round(col("tp"), 1).as("pairs_together"),
          round((col("tp") - col("e"))
            / ((col("sa") + col("sb")) / 2 - col("e")), 6)
            .as("adjusted_rand"),
          round(col("tp") / sqrt(col("sa") * col("sb")), 6)
            .as("fowlkes_mallows"))
    },

    // ARI through Spark's SQL parser — same shared text.
    QDef("x_sql_ari", AriSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "lineitem")
      s.sql(AriSql)
    },

    // V-MEASURE: the entropy view of the same question — homogeneity
    // and completeness with their harmonic mean.
    QDef("x_v_measure", VmeasureSql) { (s, d) =>
      val mg = pairing(s, d)
      val nD = col("n").cast("double")
      val ent = mg.agg(
        (-sum(nD / col("nn") * log(nD / col("cy")))).as("hxy"),
        (-sum(nD / col("nn") * log(nD / col("rx")))).as("hyx"))
      val hx = mg.select("x", "rx", "nn").distinct()
        .agg((-sum(col("rx").cast("double") / col("nn")
          * log(col("rx").cast("double") / col("nn")))).as("h"))
      val hy = mg.select("y", "cy", "nn").distinct()
        .agg((-sum(col("cy").cast("double") / col("nn")
          * log(col("cy").cast("double") / col("nn")))).as("h"))
      ent.crossJoin(broadcast(hx.select(col("h").as("hx"))))
        .crossJoin(broadcast(hy.select(col("h").as("hy"))))
        .select((lit(1.0) - col("hxy") / col("hx")).as("hom"),
          (lit(1.0) - col("hyx") / col("hy")).as("com"))
        .select(round(col("hom"), 6).as("homogeneity"),
          round(col("com"), 6).as("completeness"),
          round(lit(2.0) * col("hom") * col("com")
            / (col("hom") + col("com")), 6).as("v_measure"))
    },

    // V-measure through Spark's SQL parser — same shared text.
    QDef("x_sql_vmeasure", VmeasureSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "lineitem")
      s.sql(VmeasureSql)
    },

    // WEIGHTED KAPPA: ordinal agreement — near-misses count, with
    // linear weights on the 3×3.
    QDef("x_kappa_weighted", WkappaSql) { (s, d) =>
      val mg = pairing(s, d)
      val po = mg.agg(sum((lit(1.0) - abs(col("x") - col("y")) / 2.0)
        * col("n").cast("double") / col("nn")).as("po"))
      val a = mg.select(col("x"), col("rx"), col("nn")).distinct()
      val b = mg.select(col("y"), col("cy"),
        col("nn").as("nn2")).distinct()
      val pe = a.crossJoin(broadcast(b))
        .agg(sum((lit(1.0) - abs(col("x") - col("y")) / 2.0)
          * (col("rx").cast("double") / col("nn"))
          * (col("cy").cast("double") / col("nn2"))).as("pe"))
      po.crossJoin(broadcast(pe))
        .select(round(col("po"), 6).as("po_weighted"),
          round(col("pe"), 6).as("pe_weighted"),
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6)
            .as("kappa_w"))
    },

    // Weighted kappa through Spark's SQL parser — same shared text.
    QDef("x_sql_wkappa", WkappaSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "lineitem")
      s.sql(WkappaSql)
    },

    // GWET AC1: the kappa-paradox fix — stable when marginals are
    // skewed; released beside plain kappa for the contrast. Dataset
    // side: the shared 9-cell pairing frame, union-margin pivot and
    // chance agreements in Column algebra on the bounded frame.
    QDef("x_gwet_ac1", Ac1Sql) { (s, d) =>
      val mg = pairing(s, d)
      val pa = mg.agg(
        (sum(when(col("x") === col("y"), col("n").cast("double"))
          .otherwise(0)) / max("nn")).as("pa"))
      val ua = mg.groupBy(col("x").as("q"))
        .agg(max("rx").cast("double").as("r"), max("nn").as("nn"))
        .select(col("q"), col("r"), lit(0.0).as("c"), col("nn"))
      val ub = mg.groupBy(col("y").as("q"))
        .agg(max("cy").cast("double").as("c"), max("nn").as("nn"))
        .select(col("q"), lit(0.0).as("r"), col("c"), col("nn"))
      val marg = ua.union(ub).groupBy("q")
        .agg(sum("r").as("r"), sum("c").as("c"), max("nn").as("nn"))
      val pe = marg.agg(
        (sum(((col("r") + col("c")) / (lit(2.0) * col("nn")))
          * (lit(1.0)
            - (col("r") + col("c")) / (lit(2.0) * col("nn"))))
          / lit(2.0)).as("pe_g"),
        sum((col("r") / col("nn")) * (col("c") / col("nn")))
          .as("pe_k"))
      pa.crossJoin(pe).select(round(col("pa"), 6).as("pa"),
        round((col("pa") - col("pe_k")) / (lit(1.0) - col("pe_k")), 6)
          .as("kappa"),
        round((col("pa") - col("pe_g")) / (lit(1.0) - col("pe_g")), 6)
          .as("gwet_ac1"))
    },

    // AC1 through Spark's SQL parser — same shared text; the spec
    // also recomputes from the collected contingency.
    QDef("x_sql_ac1", Ac1Sql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "lineitem")
      s.sql(Ac1Sql)
    },

    // KRIPPENDORFF: the content-analysis standard — coincidence-matrix
    // disagreement against its permutation expectation. Dataset side:
    // same pairing frame; D_o and the margin frame in Column algebra.
    QDef("x_krippendorff", KrippSql) { (s, d) =>
      val mg = pairing(s, d)
      val dObs = mg.agg(
        (sum(when(col("x") =!= col("y"), lit(2.0) * col("n"))
          .otherwise(0)) / (lit(2.0) * max("nn"))).as("dobs"),
        max("nn").as("nn"))
      val nc = mg.groupBy(col("x").as("q"))
        .agg(max("rx").cast("double").as("m"))
        .union(mg.groupBy(col("y").as("q"))
          .agg(max("cy").cast("double").as("m")))
        .groupBy("q").agg(sum("m").as("m"))
      val de = nc.crossJoin(broadcast(dObs)).groupBy("nn")
        .agg(((sum("m") * sum("m") - sum(col("m") * col("m")))
          / (lit(2.0) * max("nn") * (lit(2.0) * max("nn") - 1)))
          .as("dexp"),
          max("dobs").as("dobs"))
      de.select(round(col("dobs"), 6).as("d_observed"),
        round(col("dexp"), 6).as("d_expected"),
        round(lit(1.0) - col("dobs") / col("dexp"), 6)
          .as("kripp_alpha"))
    },

    // Krippendorff through Spark's SQL parser — same shared text.
    QDef("x_sql_kripp", KrippSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "lineitem")
      s.sql(KrippSql)
    },

    // LCG SAMPLE: deterministic portable 5% sampling — membership is
    // integer arithmetic any engine replays; the filter pushes into
    // the scan.
    QDef("x_lcg_sample", LcgSql) { (s, d) =>
      val k = Tables(s, d).lineitem.select(
        col("l_quantity").cast("bigint").as("q"),
        ((((col("l_orderkey") * 8 + col("l_linenumber"))
          % 2147483647L) * 48271L % 2147483647L)
          * 48271L % 2147483647L).as("h"))
      val ag = k.agg(count(lit(1)).as("n_pop"),
        sum("q").cast("bigint").as("s_pop"),
        sum(when(col("h") < 107374182L, 1L).otherwise(0L))
          .cast("bigint").as("n_s"),
        sum(when(col("h") < 107374182L, col("q")).otherwise(0L))
          .cast("bigint").as("s_s"))
      ag.select(col("n_pop"), col("n_s"),
        round(col("n_s").cast("double") / col("n_pop"), 6)
          .as("sample_rate"),
        round(col("s_pop").cast("double") / col("n_pop"), 6)
          .as("pop_mean_qty"),
        round(col("s_s").cast("double") / col("n_s"), 6)
          .as("sample_mean_qty"))
    },

    // LCG sample through Spark's SQL parser — same shared text.
    QDef("x_sql_lcg", LcgSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(LcgSql)
    })
}
