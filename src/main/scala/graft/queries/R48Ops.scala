package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-48 batch: robust location estimators and omnibus rank tests —
  * the Hodges-Lehmann pseudo-median, exact trimmed/winsorized means,
  * the Lepage joint location-scale test, D'Agostino's K² normality
  * omnibus, the Quade blocked test, Filliben's probability-plot
  * correlation, Stuart-Maxwell marginal homogeneity, and the Cucconi
  * location-scale test.
  *
  * Scale posture: every operator collapses the corpus in ONE
  * map-side-combined aggregate (the ≤50-value quantity histogram, the
  * 60-cell month×priority frame, or a ≤9-cell paired contingency); all
  * test algebra is bounded-frame work. Selections (medians, trim
  * boundaries) are integer rank conditions on histogram cumulatives —
  * no percentile interpolation for engines to disagree on. Pair-count
  * weights (Walsh averages, tie series) go DOUBLE before products: at
  * sf ≤ 1 the doubles hold exact integers; above 2^53 both engines
  * round identically (the x_ansari_bradley posture, documented there).
  *
  * The only windows order the ≤50-row quantity histogram or ≤99-row
  * Walsh-sum frame (carved out + growth-probed); χ²(2) p-values use
  * the EXACT survival function exp(−x/2) — no approximation at all. */
object R48Ops {

  /** Hodges-Lehmann one-sample pseudo-median of l_quantity as ONE
    * portable text — oracle of `x_hodges_lehmann` and whole query of
    * the `x_sql_hl` twin. The median of all N(N+1)/2 Walsh averages
    * (vᵢ+vⱼ)/2, i ≤ j, computed from the ≤50-value histogram: distinct
    * Walsh SUMS s = vₐ+v_b (kept integral — ordering and cumulating
    * never touch a float) carry pair multiplicities cₐ·c_b (a < b) and
    * c(c+1)/2 (a = b); lower/upper medians by integer rank selection
    * over the ≤99-row cumulative; the estimate averages the two
    * (standard even-count convention). The plain sample median rides
    * the same machinery for contrast. */
  private[queries] val HlSql =
    """WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
      |  CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
      |walsh AS (
      |  SELECT /*+ BROADCAST(b) */ a.v + b.v AS s,
      |    CAST(a.c AS DOUBLE) * b.c AS m
      |  FROM h a JOIN h b ON a.v < b.v
      |  UNION ALL
      |  SELECT v + v AS s, CAST(c AS DOUBLE) * (c + 1) / 2.0e0 AS m
      |  FROM h),
      |ws AS (SELECT s, sum(m) AS m FROM walsh GROUP BY 1),
      |cw AS (SELECT s, sum(m) OVER (ORDER BY s
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
      |  sum(m) OVER () AS t FROM ws),
      |lo AS (SELECT min(s) AS s FROM cw WHERE 2 * cm >= t),
      |hi AS (SELECT min(s) AS s FROM cw
      |  WHERE cm >= floor(t / 2.0e0) + 1),
      |cv AS (SELECT v, sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ci,
      |  sum(c) OVER () AS n FROM h),
      |mlo AS (SELECT min(v) AS v FROM cv WHERE 2 * ci >= n),
      |mhi AS (SELECT min(v) AS v FROM cv
      |  WHERE ci >= CAST(floor(n / 2.0e0) AS BIGINT) + 1),
      |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h)
      |SELECT nn.n,
      |  round((mlo.v + mhi.v) / 2.0e0, 1) AS median,
      |  round((lo.s + hi.s) / 4.0e0, 2) AS hl_pseudo_median
      |FROM nn, lo, hi, mlo, mhi""".stripMargin

  /** Exact 10% trimmed and winsorized means of l_quantity as ONE
    * portable text — oracle of `x_winsor_trim` and whole query of the
    * `x_sql_trimmed` twin. k = ⌊n/10⌋ observations clipped from each
    * end BY RANK on the histogram cumulative: each distinct value
    * contributes max(0, min(ci, n−k) − max(ci−c, k)) surviving copies
    * (pure BIGINT arithmetic); the winsorized mean adds k copies of
    * the (k+1)-th and (n−k)-th order statistics, both integer rank
    * selections. One double division per released mean. */
  private[queries] val TrimmedSql =
    """WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
      |  CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
      |cum AS (SELECT v, c,
      |  CAST(sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS ci,
      |  CAST(sum(c) OVER () AS BIGINT) AS n FROM h),
      |k AS (SELECT max(n) AS n,
      |  CAST(floor(max(n) / 10.0e0) AS BIGINT) AS k FROM cum),
      |w AS (SELECT cum.v, cum.c, cum.ci, k.n, k.k,
      |  greatest(CAST(0 AS BIGINT),
      |    least(cum.ci, k.n - k.k) - greatest(cum.ci - cum.c, k.k))
      |    AS keep
      |  FROM cum, k),
      |lo AS (SELECT min(v) AS v FROM w WHERE ci >= k + 1),
      |hi AS (SELECT min(v) AS v FROM w WHERE ci >= n - k),
      |ag AS (SELECT max(n) AS n, max(k) AS k,
      |  CAST(sum(v * keep) AS BIGINT) AS ts,
      |  CAST(sum(v * c) AS BIGINT) AS fs
      |  FROM w)
      |SELECT ag.n, ag.k,
      |  round(CAST(ag.fs AS DOUBLE) / ag.n, 6) AS mean,
      |  round(CAST(ag.ts AS DOUBLE) / (ag.n - 2 * ag.k), 6)
      |    AS trimmed_mean,
      |  round((CAST(ag.ts AS DOUBLE) + CAST(ag.k AS DOUBLE)
      |    * (lo.v + hi.v)) / ag.n, 6) AS winsor_mean
      |FROM ag, lo, hi""".stripMargin

  /** Lepage joint location-scale test (Wilcoxon² + Ansari-Bradley²)
    * as ONE portable text — oracle of `x_lepage` and whole query of
    * the `x_sql_lepage` twin. Do 'F' and 'O' lineitems differ in
    * location OR scale of quantity? Both linear rank statistics come
    * from the SAME pooled ≤50-value histogram pass: Wilcoxon W from
    * integral doubled midranks (2·below + c + 1) with the standard
    * tie-corrected variance; the AB half reuses x_ansari_bradley's
    * exact two-arithmetic-series tie-run score sums and conditional
    * variance verbatim (R40Ops.scala:210). L = z_W² + z_AB² is χ²(2)
    * under H₀, so p = exp(−L/2) EXACTLY — no CDF approximation. */
  private[queries] val LepageSql =
    """WITH base AS (SELECT l_linestatus AS g,
      |  CAST(l_quantity AS BIGINT) AS v FROM lineitem),
      |h AS (SELECT v,
      |  CAST(sum(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |  CAST(count(*) AS BIGINT) AS c
      |  FROM base GROUP BY 1),
      |cum AS (SELECT v, ca, c,
      |  CAST(coalesce(sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS below,
      |  CAST(sum(c) OVER () AS BIGINT) AS nn,
      |  CAST(sum(ca) OVER () AS BIGINT) AS na
      |  FROM h),
      |sc AS (SELECT v, ca, c, nn, na,
      |  CAST(floor((nn + 1) / 2.0e0) AS BIGINT) AS th,
      |  below + 1 AS lo, below + c AS hi,
      |  2 * below + c + 1 AS mr2
      |  FROM cum),
      |s2 AS (SELECT v, ca, c, nn, na, mr2,
      |  (CASE WHEN least(hi, th) >= lo
      |     THEN CAST(least(hi, th) - lo + 1 AS DOUBLE)
      |       * (lo + least(hi, th)) / 2
      |     ELSE 0.0e0 END)
      |  + (CASE WHEN hi >= greatest(lo, th + 1)
      |     THEN CAST(hi - greatest(lo, th + 1) + 1 AS DOUBLE) * (nn + 1)
      |       - CAST(greatest(lo, th + 1) + hi AS DOUBLE)
      |         * (hi - greatest(lo, th + 1) + 1) / 2
      |     ELSE 0.0e0 END) AS ssum
      |  FROM sc),
      |ag AS (SELECT max(nn) AS nn, max(na) AS na,
      |  sum(ca * CAST(mr2 AS DOUBLE)) / 2 AS w,
      |  sum(CAST(c AS DOUBLE) * (CAST(c AS DOUBLE) * c - 1)) AS tie,
      |  sum(ca * ssum / c) AS a,
      |  sum(ssum) AS sa,
      |  sum(ssum * ssum / c) AS sa2
      |  FROM s2),
      |z AS (SELECT nn, na,
      |  (w - CAST(na AS DOUBLE) * (nn + 1) / 2)
      |    / sqrt(CAST(na AS DOUBLE) * (nn - na) / 12.0e0
      |      * ((nn + 1) - tie / (CAST(nn AS DOUBLE) * (nn - 1)))) AS zw,
      |  (a - CAST(na AS DOUBLE) * sa / nn)
      |    / sqrt(CAST(na AS DOUBLE) * (nn - na) * (nn * sa2 - sa * sa)
      |      / (CAST(nn AS DOUBLE) * nn * (nn - 1))) AS zab
      |  FROM ag)
      |SELECT nn AS n, na AS n_f, round(zw, 4) AS z_wilcoxon,
      |  round(zab, 4) AS z_ansari,
      |  round(zw * zw + zab * zab, 4) AS lepage_l,
      |  round(exp(-(zw * zw + zab * zab) / 2.0e0), 6) AS p_value
      |FROM z""".stripMargin

  /** Shared closed-form fragments of D'Agostino's K² — written once,
    * parsed by BOTH engines (the DuckDB oracle text and the Spark twin
    * carry them verbatim; the Dataset side applies them with `expr()`
    * on identically-named moment columns, so there is no float path to
    * diverge beyond libm ulps, absorbed by the 4-6 dp release).
    * Inputs: columns `n` (DOUBLE), `g1` (skewness), `b2` (kurtosis). */
  private[queries] val zSkewExpr: String =
    """(1.0e0 / sqrt(ln(sqrt(-1.0e0 + sqrt(2.0e0
      |  * (3.0e0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
      |     / ((n - 2) * (n + 5) * (n + 7) * (n + 9)) - 1.0e0))))))
      |* ln(g1 * sqrt((n + 1) * (n + 3) / (6.0e0 * (n - 2)))
      |    / sqrt(2.0e0 / (-2.0e0 + sqrt(2.0e0
      |      * (3.0e0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
      |         / ((n - 2) * (n + 5) * (n + 7) * (n + 9)) - 1.0e0))))
      |  + sqrt(g1 * g1 * ((n + 1) * (n + 3) / (6.0e0 * (n - 2)))
      |      / (2.0e0 / (-2.0e0 + sqrt(2.0e0
      |        * (3.0e0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
      |           / ((n - 2) * (n + 5) * (n + 7) * (n + 9)) - 1.0e0))))
      |    + 1.0e0))""".stripMargin.replace("\n", " ")

  /** Anscombe-Glynn kurtosis z — input columns `n`, `b2`; the cube
    * root is sign(y)·power(|y|, ⅓) with the same literal exponent in
    * both engines. Intermediate `sb` = √β₁(b₂), `aa` = A. */
  private[queries] val zKurtExpr: String = {
    val sb =
      """(6.0e0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        |  * sqrt(6.0e0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))))"""
        .stripMargin.replace("\n", " ")
    val aa =
      s"""(6.0e0 + 8.0e0 / $sb
         |  * (2.0e0 / $sb + sqrt(1.0e0 + 4.0e0 / ($sb * $sb))))"""
        .stripMargin.replace("\n", " ")
    val x =
      """((b2 - 3.0e0 * (n - 1) / (n + 1))
        |  / sqrt(24.0e0 * n * (n - 2) * (n - 3)
        |    / ((n + 1) * (n + 1) * (n + 3) * (n + 5))))"""
        .stripMargin.replace("\n", " ")
    val inner = s"((1.0e0 - 2.0e0 / $aa) " +
      s"/ (1.0e0 + $x * sqrt(2.0e0 / ($aa - 4.0e0))))"
    val cbrt = s"(CASE WHEN $inner >= 0 " +
      s"THEN power($inner, 0.3333333333333333e0) " +
      s"ELSE -power(-($inner), 0.3333333333333333e0) END)"
    s"((1.0e0 - 2.0e0 / (9.0e0 * $aa)) - $cbrt) " +
      s"/ sqrt(2.0e0 / (9.0e0 * $aa))"
  }

  /** D'Agostino-Pearson K² normality omnibus on l_quantity as ONE
    * portable text — oracle of `x_dagostino_k2` and whole query of the
    * `x_sql_k2` twin. Sample skewness/kurtosis from exact BIGINT power
    * sums over the ≤50-value histogram (v ≤ 50 keeps Σv⁴c within
    * BIGINT through sf 100; the moment algebra is DOUBLE); the
    * D'Agostino (1970) and Anscombe-Glynn (1983) transformed z's via
    * the shared fragments above; K² is χ²(2) so p = exp(−K²/2)
    * exactly. */
  private[queries] val K2Sql =
    s"""WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
       |  CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
       |mo AS (SELECT CAST(sum(c) AS BIGINT) AS n,
       |  CAST(sum(v * c) AS BIGINT) AS s1,
       |  CAST(sum(v * v * c) AS BIGINT) AS s2,
       |  CAST(sum(v * v * v * c) AS BIGINT) AS s3,
       |  CAST(sum(v * v * v * v * c) AS BIGINT) AS s4
       |  FROM h),
       |ce AS (SELECT CAST(n AS DOUBLE) AS n,
       |  CAST(s1 AS DOUBLE) / n AS m1,
       |  CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
       |    * (CAST(s1 AS DOUBLE) / n) AS m2,
       |  CAST(s3 AS DOUBLE) / n
       |    - 3.0e0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
       |    + 2.0e0 * (CAST(s1 AS DOUBLE) / n)
       |      * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m3,
       |  CAST(s4 AS DOUBLE) / n
       |    - 4.0e0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
       |    + 6.0e0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
       |      * (CAST(s2 AS DOUBLE) / n)
       |    - 3.0e0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
       |      * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
       |  FROM mo),
       |gg AS (SELECT n, m3 / (m2 * sqrt(m2)) AS g1,
       |  m4 / (m2 * m2) AS b2 FROM ce),
       |zz AS (SELECT n, g1, b2,
       |  $zSkewExpr AS z1,
       |  $zKurtExpr AS z2
       |  FROM gg)
       |SELECT CAST(n AS BIGINT) AS n, round(g1, 6) AS skew_g1,
       |  round(b2, 6) AS kurt_b2, round(z1, 4) AS z_skew,
       |  round(z2, 4) AS z_kurt,
       |  round(z1 * z1 + z2 * z2, 4) AS k2_stat,
       |  round(exp(-(z1 * z1 + z2 * z2) / 2.0e0), 6) AS p_value
       |FROM zz""".stripMargin

  /** Quade blocked test as ONE portable text — oracle of `x_quade` and
    * whole query of the `x_sql_quade` twin. Blocks = order months,
    * treatments = the 5 priorities, responses = 6 dp-snapped cell mean
    * totalprice (the x_friedman frame). Within-block midranks via the
    * cell self-join; block WEIGHTS Q_b = midranks of the block ranges
    * across the 12 blocks; S_bj = Q_b(r_bj − (k+1)/2); Quade's F from
    * A = ΣS², B = ΣS_j²/n with df (k−1, (n−1)(k−1)). */
  private[queries] val QuadeSql =
    """WITH oc AS (SELECT CAST(month(o_orderdate) AS INT) AS b,
      |  CAST(substr(o_orderpriority, 1, 1) AS INT) AS j,
      |  o_totalprice AS v FROM orders),
      |cells AS (SELECT b, j, round(avg(v), 6) AS m FROM oc
      |  GROUP BY 1, 2),
      |r AS (SELECT a.b, a.j,
      |  sum(CASE WHEN c2.m < a.m THEN 1.0e0
      |       WHEN c2.m = a.m THEN 0.5e0 ELSE 0 END) + 0.5e0 AS rk
      |  FROM cells a JOIN cells c2 ON a.b = c2.b GROUP BY 1, 2),
      |rng AS (SELECT b, round(max(m) - min(m), 6) AS rg FROM cells
      |  GROUP BY 1),
      |q AS (SELECT /*+ BROADCAST(r2) */ r1.b,
      |  sum(CASE WHEN r2.rg < r1.rg THEN 1.0e0
      |       WHEN r2.rg = r1.rg THEN 0.5e0 ELSE 0 END) + 0.5e0 AS qb
      |  FROM rng r1 JOIN rng r2 ON 1 = 1 GROUP BY 1),
      |dims AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS n,
      |  CAST(count(DISTINCT j) AS DOUBLE) AS k FROM cells),
      |s AS (SELECT /*+ BROADCAST(q), BROADCAST(dims) */ r.b, r.j,
      |  q.qb * (r.rk - (dims.k + 1) / 2.0e0) AS sbj
      |  FROM r JOIN q ON r.b = q.b, dims),
      |sj AS (SELECT j, sum(sbj) AS sj FROM s GROUP BY 1),
      |aa AS (SELECT sum(sbj * sbj) AS a2 FROM s),
      |bb AS (SELECT sum(sj * sj) AS bsum FROM sj),
      |f AS (SELECT dims.n, dims.k, aa.a2, bb.bsum / dims.n AS b2
      |  FROM dims, aa, bb)
      |SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT)
      |    AS n_treatments,
      |  round((n - 1) * b2 / (a2 - b2), 4) AS quade_f,
      |  CAST(k - 1 AS BIGINT) AS df1,
      |  CAST((n - 1) * (k - 1) AS BIGINT) AS df2
      |FROM f""".stripMargin

  /** Filliben probability-plot correlation on l_quantity as ONE
    * portable text — oracle of `x_ppcc` and whole query of the
    * `x_sql_ppcc` twin. Tie-run midrank plotting positions
    * p = (mr − 0.375)/(n + 0.25) (Blom) pushed through the R42 Acklam
    * Φ⁻¹ fragment; count-weighted Pearson correlation between v and
    * its normal score on the ≤50-row histogram. r² near 1 ⇒ normal;
    * the uniform-ish quantity column scores visibly below. */
  private[queries] val PpccSql =
    s"""WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
       |  CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
       |cum AS (SELECT v, c,
       |  CAST(coalesce(sum(c) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS below,
       |  CAST(sum(c) OVER () AS BIGINT) AS n FROM h),
       |pp AS (SELECT v, c, n,
       |  (below + (c + 1) / 2.0e0 - 0.375e0) / (n + 0.25e0) AS p
       |  FROM cum),
       |sc AS (SELECT v, c, n, ${R42Ops.normInvSql("p")} AS s FROM pp),
       |mo AS (SELECT max(n) AS n,
       |  sum(CAST(c AS DOUBLE) * v) AS sx,
       |  sum(CAST(c AS DOUBLE) * s) AS sy,
       |  sum(CAST(c AS DOUBLE) * v * v) AS sxx,
       |  sum(CAST(c AS DOUBLE) * s * s) AS syy,
       |  sum(CAST(c AS DOUBLE) * v * s) AS sxy
       |  FROM sc),
       |r AS (SELECT n, (n * sxy - sx * sy)
       |  / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r
       |  FROM mo)
       |SELECT CAST(n AS BIGINT) AS n, round(r, 6) AS ppcc_r,
       |  round(r * r, 6) AS ppcc_r2
       |FROM r""".stripMargin

  /** Stuart-Maxwell marginal homogeneity as ONE portable text — oracle
    * of `x_stuart_maxwell` and whole query of the `x_sql_sm` twin. Per
    * order, two 3-level classifications: priority class (1-2 / 3 /
    * 4-5) vs basket-size class (≤2 / 3-4 / ≥5 lineitems). Is the
    * marginal distribution the same on both axes? One orderkey
    * equi-join (co-partitioned fact-fact) + ONE 9-cell collapse; the
    * 2-df quadratic form d′S⁻¹d via the closed 2×2 inverse, all
    * margins exact BIGINTs; p = exp(−χ²/2) exactly. */
  private[queries] val SmSql =
    """WITH ln AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT)
      |    AS nl
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
      |w AS (SELECT
      |  CAST(sum(CASE WHEN x = 1 THEN n ELSE 0 END) AS BIGINT) AS r1,
      |  CAST(sum(CASE WHEN x = 2 THEN n ELSE 0 END) AS BIGINT) AS r2,
      |  CAST(sum(CASE WHEN y = 1 THEN n ELSE 0 END) AS BIGINT) AS c1,
      |  CAST(sum(CASE WHEN y = 2 THEN n ELSE 0 END) AS BIGINT) AS c2,
      |  CAST(sum(CASE WHEN x = 1 AND y = 1 THEN n ELSE 0 END)
      |    AS BIGINT) AS n11,
      |  CAST(sum(CASE WHEN x = 2 AND y = 2 THEN n ELSE 0 END)
      |    AS BIGINT) AS n22,
      |  CAST(sum(CASE WHEN x = 1 AND y = 2 THEN n ELSE 0 END)
      |    AS BIGINT) AS n12,
      |  CAST(sum(CASE WHEN x = 2 AND y = 1 THEN n ELSE 0 END)
      |    AS BIGINT) AS n21
      |  FROM t),
      |m AS (SELECT CAST(r1 - c1 AS DOUBLE) AS d1,
      |  CAST(r2 - c2 AS DOUBLE) AS d2,
      |  CAST(r1 + c1 - 2 * n11 AS DOUBLE) AS s11,
      |  CAST(r2 + c2 - 2 * n22 AS DOUBLE) AS s22,
      |  -CAST(n12 + n21 AS DOUBLE) AS s12,
      |  r1, r2, c1, c2 FROM w),
      |x2 AS (SELECT r1, r2, c1, c2, d1, d2,
      |  (s22 * d1 * d1 - 2 * s12 * d1 * d2 + s11 * d2 * d2)
      |    / (s11 * s22 - s12 * s12) AS chi2
      |  FROM m)
      |SELECT r1 AS row1, r2 AS row2, c1 AS col1, c2 AS col2,
      |  round(chi2, 4) AS chi2,
      |  round(exp(-chi2 / 2.0e0), 6) AS p_value
      |FROM x2""".stripMargin

  /** Cucconi joint location-scale test as ONE portable text — oracle
    * of `x_cucconi` and whole query of the `x_sql_cucconi` twin. The
    * 1968 test that predates (and often beats) Lepage: U from squared
    * pooled midranks of the 'O' sample, V from squared CONTRARY ranks
    * (N+1−R), combined through their exact negative correlation ρ.
    * Midranks stay integral as 2·below+c+1 on the ≤50-value histogram
    * (tie convention documented — classical Cucconi assumes no ties);
    * C is exponential(1)-tailed under H₀: p = exp(−C) exactly. */
  private[queries] val CucconiSql =
    """WITH base AS (SELECT l_linestatus AS g,
      |  CAST(l_quantity AS BIGINT) AS v FROM lineitem),
      |h AS (SELECT v,
      |  CAST(sum(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cb,
      |  CAST(count(*) AS BIGINT) AS c
      |  FROM base GROUP BY 1),
      |cum AS (SELECT v, cb, c,
      |  CAST(coalesce(sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS below,
      |  CAST(sum(c) OVER () AS BIGINT) AS nn,
      |  CAST(sum(cb) OVER () AS BIGINT) AS nb
      |  FROM h),
      |sq AS (SELECT nn, nb,
      |  sum(cb * (CAST(2 * below + c + 1 AS DOUBLE) / 2)
      |    * (CAST(2 * below + c + 1 AS DOUBLE) / 2)) AS sr2,
      |  sum(cb * (CAST(nn AS DOUBLE) + 1
      |      - CAST(2 * below + c + 1 AS DOUBLE) / 2)
      |    * (CAST(nn AS DOUBLE) + 1
      |      - CAST(2 * below + c + 1 AS DOUBLE) / 2)) AS sc2
      |  FROM cum GROUP BY 1, 2),
      |uv AS (SELECT nn, nb,
      |  (6.0e0 * sr2 - CAST(nb AS DOUBLE) * (nn + 1)
      |    * (2.0e0 * nn + 1))
      |  / sqrt(CAST(nb AS DOUBLE) * (nn - nb) * (nn + 1)
      |    * (2.0e0 * nn + 1) * (8.0e0 * nn + 11) / 5.0e0) AS u,
      |  (6.0e0 * sc2 - CAST(nb AS DOUBLE) * (nn + 1)
      |    * (2.0e0 * nn + 1))
      |  / sqrt(CAST(nb AS DOUBLE) * (nn - nb) * (nn + 1)
      |    * (2.0e0 * nn + 1) * (8.0e0 * nn + 11) / 5.0e0) AS vv
      |  FROM sq),
      |ro AS (SELECT nn, nb, u, vv,
      |  2.0e0 * (CAST(nn AS DOUBLE) * nn - 4)
      |    / ((2.0e0 * nn + 1) * (8.0e0 * nn + 11)) - 1.0e0 AS rho
      |  FROM uv),
      |cc AS (SELECT nn, nb, u, vv, rho,
      |  (u * u + vv * vv - 2.0e0 * rho * u * vv)
      |    / (2.0e0 * (1.0e0 - rho * rho)) AS c
      |  FROM ro)
      |SELECT nn AS n, nb AS n_o, round(u, 4) AS u_stat,
      |  round(vv, 4) AS v_stat, round(c, 4) AS cucconi_c,
      |  round(exp(-c), 6) AS p_value
      |FROM cc""".stripMargin

  private def quantityHist(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    Tables(s, d).lineitem
      .groupBy(col("l_quantity").cast("bigint").as("v"))
      .agg(count(lit(1)).as("c"))

  val defs: Seq[QDef] = Seq(

    // HODGES-LEHMANN: the rank-world point estimate (the estimator
    // behind the Wilcoxon CI) — all N(N+1)/2 Walsh averages reduced to
    // a ≤99-row integral-sum frame; medians by integer rank selection.
    QDef("x_hodges_lehmann", HlSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = quantityHist(s, d)
      val a = h.select(col("v").as("va"), col("c").as("ca"))
      val b = h.select(col("v").as("vb"), col("c").as("cb"))
      val cross = a.join(broadcast(b), col("va") < col("vb"))
        .select((col("va") + col("vb")).as("s"),
          (col("ca").cast("double") * col("cb")).as("m"))
      val diag = h.select((col("v") + col("v")).as("s"),
        (col("c").cast("double") * (col("c") + 1) / 2.0).as("m"))
      val ws = cross.union(diag).groupBy("s").agg(sum("m").as("m"))
      val wOrd = Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cw = ws.select(col("s"), sum("m").over(wOrd).as("cm"),
        sum("m").over(Window.partitionBy()).as("t"))
      val lo = cw.filter(col("cm") * 2 >= col("t")).agg(min("s").as("s"))
      val hi = cw.filter(col("cm") >= floor(col("t") / 2.0) + 1)
        .agg(min("s").as("s"))
      val cv = h.select(col("v"), sum("c").over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("ci"),
        sum("c").over(Window.partitionBy()).as("n"))
      val mlo = cv.filter(col("ci") * 2 >= col("n")).agg(min("v").as("v"))
      val mhi = cv.filter(col("ci") >=
          floor(col("n") / 2.0).cast("bigint") + 1)
        .agg(min("v").as("v"))
      val nn = h.agg(sum("c").cast("bigint").as("n"))
      nn.crossJoin(broadcast(lo.select(col("s").as("slo"))))
        .crossJoin(broadcast(hi.select(col("s").as("shi"))))
        .crossJoin(broadcast(mlo.select(col("v").as("vlo"))))
        .crossJoin(broadcast(mhi.select(col("v").as("vhi"))))
        .select(col("n"),
          round((col("vlo") + col("vhi")) / 2.0, 1).as("median"),
          round((col("slo") + col("shi")) / 4.0, 2)
            .as("hl_pseudo_median"))
    },

    // Hodges-Lehmann through Spark's SQL parser — same shared text.
    QDef("x_sql_hl", HlSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(HlSql)
    },

    // TRIMMED/WINSORIZED MEANS: exact by-rank clipping — the robust
    // location pair every profiler wants, with zero percentile
    // interpolation (pure BIGINT keep-counts from the cumulative).
    QDef("x_winsor_trim", TrimmedSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = quantityHist(s, d)
      val wOrd = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.select(col("v"), col("c"),
        sum("c").over(wOrd).cast("bigint").as("ci"),
        sum("c").over(Window.partitionBy()).cast("bigint").as("n"))
      val k = cum.agg(max("n").as("n"),
        floor(max("n") / 10.0).cast("bigint").as("k"))
      val w = cum.crossJoin(broadcast(k.select(col("n").as("nn"),
          col("k"))))
        .select(col("v"), col("c"), col("ci"), col("nn"), col("k"),
          greatest(lit(0L),
            least(col("ci"), col("nn") - col("k"))
              - greatest(col("ci") - col("c"), col("k"))).as("keep"))
      val lo = w.filter(col("ci") >= col("k") + 1).agg(min("v").as("v"))
      val hi = w.filter(col("ci") >= col("nn") - col("k"))
        .agg(min("v").as("v"))
      val ag = w.agg(max("nn").as("n"), max("k").as("k"),
        sum(col("v") * col("keep")).cast("bigint").as("ts"),
        sum(col("v") * col("c")).cast("bigint").as("fs"))
      ag.crossJoin(broadcast(lo.select(col("v").as("vlo"))))
        .crossJoin(broadcast(hi.select(col("v").as("vhi"))))
        .select(col("n"), col("k"),
          round(col("fs").cast("double") / col("n"), 6).as("mean"),
          round(col("ts").cast("double") / (col("n") - col("k") * 2), 6)
            .as("trimmed_mean"),
          round((col("ts").cast("double") + col("k").cast("double")
            * (col("vlo") + col("vhi"))) / col("n"), 6)
            .as("winsor_mean"))
    },

    // Trimmed mean through Spark's SQL parser — same shared text.
    QDef("x_sql_trimmed", TrimmedSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(TrimmedSql)
    },

    // LEPAGE: location AND scale in one omnibus — Wilcoxon and
    // Ansari-Bradley z's from the SAME histogram pass, combined as
    // χ²(2) with its exact exp(−L/2) tail. Dataset side: the ≤50-row
    // quantity histogram with cumulative/global windows (carved-out
    // bounded frame), tie-corrected closed forms in Column algebra.
    QDef("x_lepage", LepageSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val base = Tables(s, d).lineitem.select(
        col("l_linestatus").as("g"),
        col("l_quantity").cast("bigint").as("v"))
      val h = base.groupBy("v")
        .agg(sum(when(col("g") === "F", 1).otherwise(0)).cast("bigint")
          .as("ca"),
          count(lit(1)).as("c"))
      val wcum = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wall = Window.partitionBy()
      val cum = h.select(col("v"), col("ca"), col("c"),
        coalesce(sum("c").over(wcum), lit(0)).cast("bigint")
          .as("below"),
        sum("c").over(wall).cast("bigint").as("nn"),
        sum("ca").over(wall).cast("bigint").as("na"))
      val sc = cum.select(col("v"), col("ca"), col("c"), col("nn"),
        col("na"),
        floor((col("nn") + 1) / lit(2.0)).cast("bigint").as("th"),
        (col("below") + 1).as("lo"), (col("below") + col("c")).as("hi"),
        (lit(2) * col("below") + col("c") + 1).as("mr2"))
      val loC = col("lo"); val hiC = col("hi"); val thC = col("th")
      val s2 = sc.select(col("v"), col("ca"), col("c"), col("nn"),
        col("na"), col("mr2"),
        (when(least(hiC, thC) >= loC,
          (least(hiC, thC) - loC + 1).cast("double")
            * (loC + least(hiC, thC)) / 2)
          .otherwise(lit(0.0))
        + when(hiC >= greatest(loC, thC + 1),
            (hiC - greatest(loC, thC + 1) + 1).cast("double")
              * (col("nn") + 1)
            - (greatest(loC, thC + 1) + hiC).cast("double")
              * (hiC - greatest(loC, thC + 1) + 1) / 2)
          .otherwise(lit(0.0))).as("ssum"))
      val ag = s2.agg(max("nn").as("nn"), max("na").as("na"),
        (sum(col("ca") * col("mr2").cast("double")) / 2).as("w"),
        sum(col("c").cast("double")
          * (col("c").cast("double") * col("c") - 1)).as("tie"),
        sum(col("ca") * col("ssum") / col("c")).as("a"),
        sum("ssum").as("sa"),
        sum(col("ssum") * col("ssum") / col("c")).as("sa2"))
      val z = ag.select(col("nn"), col("na"),
        ((col("w") - col("na").cast("double") * (col("nn") + 1) / 2)
          / sqrt(col("na").cast("double") * (col("nn") - col("na"))
            / lit(12.0)
            * ((col("nn") + 1) - col("tie")
              / (col("nn").cast("double") * (col("nn") - 1)))))
          .as("zw"),
        ((col("a") - col("na").cast("double") * col("sa") / col("nn"))
          / sqrt(col("na").cast("double") * (col("nn") - col("na"))
            * (col("nn") * col("sa2") - col("sa") * col("sa"))
            / (col("nn").cast("double") * col("nn")
              * (col("nn") - 1)))).as("zab"))
      z.select(col("nn").as("n"), col("na").as("n_f"),
        round(col("zw"), 4).as("z_wilcoxon"),
        round(col("zab"), 4).as("z_ansari"),
        round(col("zw") * col("zw") + col("zab") * col("zab"), 4)
          .as("lepage_l"),
        round(exp(-(col("zw") * col("zw") + col("zab") * col("zab"))
          / lit(2.0)), 6).as("p_value"))
    },

    // Lepage through Spark's SQL parser — same shared text; the spec
    // also cross-checks the z's against x_ansari_bradley and a
    // brute-force Wilcoxon.
    QDef("x_sql_lepage", LepageSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(LepageSql)
    },

    // D'AGOSTINO K²: the moment-based normality omnibus — exact BIGINT
    // power sums, the two classical z transforms as shared fragments,
    // χ²(2) tail exact.
    QDef("x_dagostino_k2", K2Sql) { (s, d) =>
      val h = quantityHist(s, d)
      val mo = h.agg(sum("c").cast("bigint").as("n"),
        sum(col("v") * col("c")).cast("bigint").as("s1"),
        sum(col("v") * col("v") * col("c")).cast("bigint").as("s2"),
        sum(col("v") * col("v") * col("v") * col("c")).cast("bigint")
          .as("s3"),
        sum(col("v") * col("v") * col("v") * col("v") * col("c"))
          .cast("bigint").as("s4"))
      val m1 = col("s1").cast("double") / col("n")
      val ce = mo.select(col("n").cast("double").as("n"),
        (col("s2").cast("double") / col("n") - m1 * m1).as("m2"),
        (col("s3").cast("double") / col("n")
          - lit(3.0) * m1 * (col("s2").cast("double") / col("n"))
          + lit(2.0) * m1 * m1 * m1).as("m3"),
        (col("s4").cast("double") / col("n")
          - lit(4.0) * m1 * (col("s3").cast("double") / col("n"))
          + lit(6.0) * m1 * m1 * (col("s2").cast("double") / col("n"))
          - lit(3.0) * m1 * m1 * m1 * m1).as("m4"))
      val gg = ce.select(col("n"),
        (col("m3") / (col("m2") * sqrt(col("m2")))).as("g1"),
        (col("m4") / (col("m2") * col("m2"))).as("b2"))
      val zz = gg.select(col("n"), col("g1"), col("b2"),
        expr(zSkewExpr).as("z1"), expr(zKurtExpr).as("z2"))
      zz.select(col("n").cast("bigint").as("n"),
        round(col("g1"), 6).as("skew_g1"),
        round(col("b2"), 6).as("kurt_b2"),
        round(col("z1"), 4).as("z_skew"),
        round(col("z2"), 4).as("z_kurt"),
        round(col("z1") * col("z1") + col("z2") * col("z2"), 4)
          .as("k2_stat"),
        round(exp(-(col("z1") * col("z1") + col("z2") * col("z2"))
          / 2.0), 6).as("p_value"))
    },

    // K² through Spark's SQL parser — same shared text.
    QDef("x_sql_k2", K2Sql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(K2Sql)
    },

    // QUADE: the range-weighted Friedman — blocks with more spread
    // count for more; the weighting is exactly what Friedman throws
    // away. Same 60-cell frame, one extra 12-row range ranking.
    QDef("x_quade", QuadeSql) { (s, d) =>
      val cells = Tables(s, d).orders.select(
          month(col("o_orderdate")).cast("int").as("b"),
          substring(col("o_orderpriority"), 1, 1).cast("int").as("j"),
          col("o_totalprice").as("v"))
        .groupBy("b", "j").agg(round(avg("v"), 6).as("m"))
      val c2 = cells.select(col("b").as("b2"), col("m").as("m2"))
      val r = cells.join(c2, col("b") === col("b2"))
        .groupBy("b", "j")
        .agg((sum(when(col("m2") < col("m"), 1.0)
          .when(col("m2") === col("m"), 0.5).otherwise(0.0)) + 0.5)
          .as("rk"))
      val rng = cells.groupBy("b")
        .agg(round(max("m") - min("m"), 6).as("rg"))
      val rng2 = rng.select(col("rg").as("rg2"))
      val q = rng.join(broadcast(rng2))
        .groupBy("b")
        .agg((sum(when(col("rg2") < col("rg"), 1.0)
          .when(col("rg2") === col("rg"), 0.5).otherwise(0.0)) + 0.5)
          .as("qb"))
      val dims = cells.agg(
        countDistinct("b").cast("double").as("n"),
        countDistinct("j").cast("double").as("k"))
      val sF = r.join(broadcast(q), "b").crossJoin(broadcast(dims))
        .select(col("j"),
          (col("qb") * (col("rk") - (col("k") + 1) / 2.0)).as("sbj"))
      val sj = sF.groupBy("j").agg(sum("sbj").as("sj"))
      val aa = sF.agg(sum(col("sbj") * col("sbj")).as("a2"))
      val bb = sj.agg(sum(col("sj") * col("sj")).as("bsum"))
      dims.crossJoin(broadcast(aa)).crossJoin(broadcast(bb))
        .select(col("n").cast("bigint").as("n_blocks"),
          col("k").cast("bigint").as("n_treatments"),
          round((col("n") - 1) * (col("bsum") / col("n"))
            / (col("a2") - col("bsum") / col("n")), 4).as("quade_f"),
          (col("k") - 1).cast("bigint").as("df1"),
          ((col("n") - 1) * (col("k") - 1)).cast("bigint").as("df2"))
    },

    // Quade through Spark's SQL parser — same shared text.
    QDef("x_sql_quade", QuadeSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(QuadeSql)
    },

    // PPCC: the probability-plot correlation — "how straight is the
    // Q-Q plot" as a single number, scores via the shared Acklam Φ⁻¹.
    QDef("x_ppcc", PpccSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = quantityHist(s, d)
      val cum = h.select(col("v"), col("c"),
        coalesce(sum("c").over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast("bigint").as("below"),
        sum("c").over(Window.partitionBy()).cast("bigint").as("n"))
      val pp = cum.select(col("v"), col("c"), col("n"),
        ((col("below") + (col("c") + 1) / 2.0 - 0.375)
          / (col("n") + 0.25)).as("p"))
      val sc = pp.select(col("v"), col("c"), col("n"),
        expr(R42Ops.normInvSql("p")).as("s"))
      val cd = col("c").cast("double")
      val mo = sc.agg(max("n").as("n"),
        sum(cd * col("v")).as("sx"), sum(cd * col("s")).as("sy"),
        sum(cd * col("v") * col("v")).as("sxx"),
        sum(cd * col("s") * col("s")).as("syy"),
        sum(cd * col("v") * col("s")).as("sxy"))
      mo.select(col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy"))
            / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              * (col("n") * col("syy") - col("sy") * col("sy"))))
            .as("r"))
        .select(col("n").cast("bigint").as("n"),
          round(col("r"), 6).as("ppcc_r"),
          round(col("r") * col("r"), 6).as("ppcc_r2"))
    },

    // PPCC through Spark's SQL parser — same shared text.
    QDef("x_sql_ppcc", PpccSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(PpccSql)
    },

    // STUART-MAXWELL: marginal homogeneity for paired 3-level
    // classifications — the k×k generalization of McNemar, closed 2×2
    // solve on exact margins.
    QDef("x_stuart_maxwell", SmSql) { (s, d) =>
      val t = Tables(s, d)
      val ln = t.lineitem.groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("nl"))
      val pcls = substring(col("o_orderpriority"), 1, 1).cast("int")
      val oc = t.orders.join(ln, col("o_orderkey") === col("k"))
        .select(
          when(pcls <= 2, 1).when(pcls === 3, 2).otherwise(3).as("x"),
          when(col("nl") <= 2, 1).when(col("nl") <= 4, 2).otherwise(3)
            .as("y"))
      val tt = oc.groupBy("x", "y").agg(count(lit(1)).as("n"))
      def cs(c: org.apache.spark.sql.Column) =
        sum(when(c, col("n")).otherwise(0L)).cast("bigint")
      val w = tt.agg(
        cs(col("x") === 1).as("r1"), cs(col("x") === 2).as("r2"),
        cs(col("y") === 1).as("c1"), cs(col("y") === 2).as("c2"),
        cs(col("x") === 1 && col("y") === 1).as("n11"),
        cs(col("x") === 2 && col("y") === 2).as("n22"),
        cs(col("x") === 1 && col("y") === 2).as("n12"),
        cs(col("x") === 2 && col("y") === 1).as("n21"))
      val m = w.select(col("r1"), col("r2"), col("c1"), col("c2"),
        (col("r1") - col("c1")).cast("double").as("d1"),
        (col("r2") - col("c2")).cast("double").as("d2"),
        (col("r1") + col("c1") - col("n11") * 2).cast("double")
          .as("s11"),
        (col("r2") + col("c2") - col("n22") * 2).cast("double")
          .as("s22"),
        (-(col("n12") + col("n21")).cast("double")).as("s12"))
      m.select(col("r1").as("row1"), col("r2").as("row2"),
          col("c1").as("col1"), col("c2").as("col2"),
          ((col("s22") * col("d1") * col("d1")
            - lit(2.0) * col("s12") * col("d1") * col("d2")
            + col("s11") * col("d2") * col("d2"))
            / (col("s11") * col("s22") - col("s12") * col("s12")))
            .as("chi2"))
        .select(col("row1"), col("row2"), col("col1"), col("col2"),
          round(col("chi2"), 4).as("chi2"),
          round(exp(-col("chi2") / 2.0), 6).as("p_value"))
    },

    // Stuart-Maxwell through Spark's SQL parser — same shared text.
    QDef("x_sql_sm", SmSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "lineitem")
      s.sql(SmSql)
    },

    // CUCCONI: the elegant 1968 location-scale omnibus — squared ranks
    // against squared contrary ranks, exact exponential tail.
    QDef("x_cucconi", CucconiSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = Tables(s, d).lineitem
        .groupBy(col("l_quantity").cast("bigint").as("v"))
        .agg(sum(when(col("l_linestatus") === "O", 1L).otherwise(0L))
          .cast("bigint").as("cb"),
          count(lit(1)).as("c"))
      val cum = h.select(col("v"), col("cb"), col("c"),
        coalesce(sum("c").over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast("bigint").as("below"),
        sum("c").over(Window.partitionBy()).cast("bigint").as("nn"),
        sum("cb").over(Window.partitionBy()).cast("bigint").as("nb"))
      val mr = (col("below") * 2 + col("c") + 1).cast("double") / 2.0
      val sq = cum.groupBy("nn", "nb").agg(
        sum(col("cb") * mr * mr).as("sr2"),
        sum(col("cb") * (col("nn").cast("double") + 1 - mr)
          * (col("nn").cast("double") + 1 - mr)).as("sc2"))
      val nnD = col("nn").cast("double")
      val nbD = col("nb").cast("double")
      val den = sqrt(nbD * (col("nn") - col("nb"))
        * (nnD + 1) * (nnD * 2 + 1) * (nnD * 8 + 11) / 5.0)
      val uv = sq.select(col("nn"), col("nb"),
        ((col("sr2") * 6.0 - nbD * (nnD + 1) * (nnD * 2 + 1)) / den)
          .as("u"),
        ((col("sc2") * 6.0 - nbD * (nnD + 1) * (nnD * 2 + 1)) / den)
          .as("vv"),
        (lit(2.0) * (nnD * nnD - 4)
          / ((nnD * 2 + 1) * (nnD * 8 + 11)) - 1.0).as("rho"))
      val cc = uv.select(col("nn"), col("nb"), col("u"), col("vv"),
        ((col("u") * col("u") + col("vv") * col("vv")
          - lit(2.0) * col("rho") * col("u") * col("vv"))
          / (lit(2.0) * (lit(1.0) - col("rho") * col("rho")))).as("c"))
      cc.select(col("nn").as("n"), col("nb").as("n_o"),
        round(col("u"), 4).as("u_stat"),
        round(col("vv"), 4).as("v_stat"),
        round(col("c"), 4).as("cucconi_c"),
        round(exp(-col("c")), 6).as("p_value"))
    },

    // Cucconi through Spark's SQL parser — same shared text.
    QDef("x_sql_cucconi", CucconiSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(CucconiSql)
    })
}
