package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-45 batch: multiple testing + distribution diagnostics built on a
  * portable normal CDF — Benjamini-Hochberg FDR over a per-brand z-test
  * family, Lilliefors composite normality, TOST equivalence, two-sample
  * energy distance, exact sample L-moments via hockey-stick binomial
  * sums, the grouped jackknife, and inverse-variance meta-analysis
  * (DerSimonian-Laird).
  *
  * The enabling piece is [[R45Ops.erfcSql]]: the Abramowitz-Stegun
  * 7.1.26 rational erfc approximation as a shared SQL fragment whose
  * every operation (+ − × ÷ exp on double literals) is
  * IEEE-deterministic, the upper-tail complement of R42's Acklam Φ⁻¹ —
  * DuckDB parses the oracle text, Spark's twin parses the same text,
  * and the Dataset sides build their p-value columns with `expr()` over
  * the SAME fragment, so there is no float path to diverge.
  *
  * Scale posture: every operator collapses the corpus in ONE
  * map-side-combined aggregate (per-brand / per-group / quantity-
  * histogram / per-nation / per-region sufficient statistics from
  * exact BIGINT sums where the measure is integer-valued); all test
  * algebra runs on the bounded frame. The only unpartitioned windows
  * order the 25-row p-value frame and the ≤50-row quantity histogram
  * (both carved out + growth-probed); the only broadcasts are 1-row
  * global aggregates and the ≤50-row histograms of the energy cross. */
object R45Ops {

  /** erfc(x) for x ≥ 0 as a portable SQL fragment (A&S 7.1.26,
    * |ε| ≤ 1.5e-7): t = 1/(1 + 0.3275911 x),
    * erfc = (a1 t + a2 t² + a3 t³ + a4 t⁴ + a5 t⁵)·exp(−x²).
    * `x` must be a simple column reference (it appears three times).
    * Two-sided normal p-value of z is erfc(|z|/√2). */
  private[queries] def erfcSql(x: String): String =
    s"""(((((1.061405429e0 * (1.0e0 / (1.0e0 + 0.3275911e0 * $x))
       |  - 1.453152027e0) * (1.0e0 / (1.0e0 + 0.3275911e0 * $x))
       |  + 1.421413741e0) * (1.0e0 / (1.0e0 + 0.3275911e0 * $x))
       |  - 0.284496736e0) * (1.0e0 / (1.0e0 + 0.3275911e0 * $x))
       |  + 0.254829592e0) * (1.0e0 / (1.0e0 + 0.3275911e0 * $x)))
       |  * exp(-($x) * ($x))""".stripMargin.replace("\n", " ")

  /** Φ(z) for a possibly-negative simple column reference `z`, via the
    * erfc fragment: Φ(z) = 1 − erfc(z/√2)/2 for z ≥ 0, erfc(−z/√2)/2
    * for z < 0. Callers must provide columns `${z}p = $z/√2` and
    * `${z}m = −$z/√2` is NOT needed — we substitute abs forms inline. */
  private[queries] def normCdfSql(zHalf: String): String =
    s"""(CASE WHEN $zHalf >= 0 THEN 1.0e0 - 0.5e0 * ${erfcSql(zHalf)}
       |  ELSE 0.5e0 * ${erfcSql(s"(-$zHalf)")} END)""".stripMargin
      .replace("\n", " ")

  // NB normCdfSql’s argument is z/√2 (the erfc argument), precomputed by
  // callers as a named column so the fragment’s repeated references stay
  // cheap and bit-identical.

  /** Benjamini-Hochberg FDR over the per-brand quantity z-test family as
    * ONE portable text — oracle of `x_fdr_bh` and whole query of the
    * `x_sql_fdr` twin. 25 two-sided z-tests (brand mean quantity vs the
    * rest, pooled global variance from exact BIGINT sums), p-values via
    * the erfc fragment, then the step-up rule at α = 0.05: reject the
    * smallest k* p-values where k* = max{k : p_(k) ≤ 0.05·k/25}. Both
    * engines compute identical doubles from identical integers, so the
    * order and every threshold comparison agree exactly. */
  /** The brand z-test p-value family (g → tot → v → z → ze → p) as a
    * shared CTE prefix — consumed by FdrSql here and by R52's Holm
    * step-down (same 25 tests, the FWER complement of BH). */
  private[queries] val BrandPvalCtes =
    s"""g AS (
       |  SELECT p.p_brand AS b, CAST(count(*) AS BIGINT) AS n_b,
       |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS s_b,
       |    CAST(sum(CAST(l.l_quantity AS BIGINT)
       |      * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q_b
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |  GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n,
       |  CAST(sum(s_b) AS BIGINT) AS s, CAST(sum(q_b) AS BIGINT) AS q
       |  FROM g),
       |v AS (SELECT n, s, q,
       |  (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
       |    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
       |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0)) AS s2
       |  FROM tot),
       |z AS (SELECT g.b, g.n_b,
       |  (CAST(g.s_b AS DOUBLE) / g.n_b
       |    - CAST(v.s - g.s_b AS DOUBLE) / (v.n - g.n_b))
       |   / sqrt(v.s2 * (1.0e0 / g.n_b + 1.0e0 / (v.n - g.n_b))) AS zs
       |  FROM g, v),
       |ze AS (SELECT b, n_b, zs,
       |  abs(zs) / 1.4142135623730951e0 AS az FROM z),
       |p AS (SELECT b, n_b, zs, ${erfcSql("az")} AS pv FROM ze)"""
      .stripMargin

  private[queries] val FdrSql =
    s"""WITH $BrandPvalCtes,
       |r AS (SELECT b, n_b, zs, pv,
       |  CAST(row_number() OVER (ORDER BY pv, b) AS BIGINT) AS k,
       |  CAST(count(*) OVER () AS BIGINT) AS m FROM p),
       |kmax AS (SELECT coalesce(max(CASE
       |    WHEN pv * m <= 0.05e0 * k THEN k END), 0) AS kstar
       |  FROM r)
       |SELECT r.b AS brand, r.n_b AS n, round(r.zs, 4) AS z,
       |  round(r.pv, 6) AS p_value, r.k AS p_rank,
       |  CAST(CASE WHEN r.k <= kmax.kstar THEN 1 ELSE 0 END AS INT)
       |    AS rejected
       |FROM r, kmax ORDER BY r.k""".stripMargin

  /** Lilliefors composite normality as ONE portable text — oracle of
    * `x_lilliefors` and whole query of the `x_sql_lilliefors` twin.
    * KS distance of the l_quantity EDF from N(μ̂, σ̂²) fitted on the
    * same data; μ̂/σ̂² from exact BIGINT sums, Φ via the erfc fragment,
    * D = max over the ≤50-row histogram of both one-sided gaps at each
    * step (EDF before and at each distinct value). The released scaled
    * statistic uses Stephens' small-sample factor √n − 0.01 + 0.85/√n. */
  private[queries] val LillieforsSql =
    s"""WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
       |  CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
       |mo AS (SELECT CAST(sum(c) AS BIGINT) AS n,
       |  CAST(sum(v * c) AS BIGINT) AS s,
       |  CAST(sum(v * v * c) AS BIGINT) AS q FROM h),
       |ms AS (SELECT n, CAST(s AS DOUBLE) / n AS mu,
       |  sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
       |    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
       |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0))) AS sd
       |  FROM mo),
       |cum AS (SELECT h.v, h.c,
       |  CAST(sum(h.c) OVER (ORDER BY h.v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS ci
       |  FROM h),
       |zz AS (SELECT cum.v, cum.c, cum.ci, ms.n,
       |  (cum.v - ms.mu) / ms.sd / 1.4142135623730951e0 AS zh
       |  FROM cum, ms),
       |gaps AS (SELECT n, ${normCdfSql("zh")} AS phi,
       |  CAST(ci AS DOUBLE) / n AS fi, CAST(ci - c AS DOUBLE) / n AS fp
       |  FROM zz),
       |d AS (SELECT max(n) AS n,
       |  max(CASE WHEN fi - phi > phi - fp THEN fi - phi
       |    ELSE phi - fp END) AS dstat
       |  FROM gaps)
       |SELECT d.n AS n, round(ms.mu, 6) AS mu, round(ms.sd, 6) AS sd,
       |  round(d.dstat, 6) AS d_stat,
       |  round(d.dstat * (sqrt(CAST(d.n AS DOUBLE)) - 0.01e0
       |    + 0.85e0 / sqrt(CAST(d.n AS DOUBLE))), 4) AS d_scaled
       |FROM d, ms""".stripMargin

  /** TOST equivalence as ONE portable text — oracle of `x_tost_equiv`
    * and whole query of the `x_sql_tost` twin. Are mean quantities of
    * returned (R) vs delivered-clean (N) lineitems equivalent within
    * δ = 0.25 units? Welch z for both one-sided tests from exact BIGINT
    * group sums; one-sided p-values via the erfc fragment; equivalence
    * declared iff max(p_lower, p_upper) < 0.05. */
  private[queries] val TostSql =
    s"""WITH g AS (SELECT l_returnflag AS f,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
       |  CAST(sum(CAST(l_quantity AS BIGINT)
       |    * CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
       |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
       |w AS (SELECT
       |  max(CASE WHEN f = 'R' THEN n END) AS na,
       |  max(CASE WHEN f = 'R' THEN s END) AS sa,
       |  max(CASE WHEN f = 'R' THEN q END) AS qa,
       |  max(CASE WHEN f = 'N' THEN n END) AS nb,
       |  max(CASE WHEN f = 'N' THEN s END) AS sb,
       |  max(CASE WHEN f = 'N' THEN q END) AS qb
       |  FROM g),
       |e AS (SELECT na, nb,
       |  CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb AS diff,
       |  sqrt(((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
       |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
       |      / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0e0))) / na
       |    + ((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
       |      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
       |      / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0e0))) / nb)
       |    AS se
       |  FROM w),
       |t AS (SELECT na, nb, diff, se,
       |  (diff + 0.25e0) / se / 1.4142135623730951e0 AS t1h,
       |  -((diff - 0.25e0) / se) / 1.4142135623730951e0 AS t2h
       |  FROM e),
       |p AS (SELECT na, nb, diff, se,
       |  1.0e0 - ${normCdfSql("t1h")} AS p_lo,
       |  1.0e0 - ${normCdfSql("t2h")} AS p_hi
       |  FROM t)
       |SELECT na AS n_r, nb AS n_n, round(diff, 6) AS mean_diff,
       |  round(se, 6) AS se, round(p_lo, 6) AS p_lower,
       |  round(p_hi, 6) AS p_upper,
       |  CAST(CASE WHEN p_lo < 0.05e0 AND p_hi < 0.05e0
       |    THEN 1 ELSE 0 END AS INT) AS equivalent
       |FROM p""".stripMargin

  /** Two-sample energy distance as ONE portable text — oracle of
    * `x_energy_dist` and whole query of the `x_sql_energy` twin.
    * E = 2·E|X−Y| − E|X−X'| − E|Y−Y'| between returned (R) and clean
    * (N) quantity distributions, every expectation an exact weighted
    * sum over ≤50×50 histogram crosses (counts go DOUBLE before the
    * pair product — BIGINT would overflow at corpus scale). The
    * Spark-only BROADCAST hints keep the parser's ON-TRUE pair joins
    * off CartesianProduct; DuckDB reads them as comments. */
  private[queries] val EnergySql =
    """WITH hx AS (SELECT CAST(l_quantity AS BIGINT) AS v,
      |  CAST(count(*) AS BIGINT) AS c FROM lineitem
      |  WHERE l_returnflag = 'R' GROUP BY 1),
      |hy AS (SELECT CAST(l_quantity AS BIGINT) AS v,
      |  CAST(count(*) AS BIGINT) AS c FROM lineitem
      |  WHERE l_returnflag = 'N' GROUP BY 1),
      |nx AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hx),
      |ny AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hy),
      |exy AS (SELECT /*+ BROADCAST(hy) */
      |  sum(CAST(hx.c AS DOUBLE) * CAST(hy.c AS DOUBLE)
      |    * abs(hx.v - hy.v)) AS e
      |  FROM hx JOIN hy ON 1 = 1),
      |exx AS (SELECT /*+ BROADCAST(b) */
      |  sum(CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)
      |    * abs(a.v - b.v)) AS e
      |  FROM hx a JOIN hx b ON 1 = 1),
      |eyy AS (SELECT /*+ BROADCAST(b) */
      |  sum(CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)
      |    * abs(a.v - b.v)) AS e
      |  FROM hy a JOIN hy b ON 1 = 1)
      |SELECT nx.n AS n_x, ny.n AS n_y,
      |  round(exy.e / CAST(nx.n AS DOUBLE) / CAST(ny.n AS DOUBLE), 6)
      |    AS mean_cross_dist,
      |  round(2.0e0 * exy.e / CAST(nx.n AS DOUBLE) / CAST(ny.n AS DOUBLE)
      |    - exx.e / CAST(nx.n AS DOUBLE) / CAST(nx.n AS DOUBLE)
      |    - eyy.e / CAST(ny.n AS DOUBLE) / CAST(ny.n AS DOUBLE), 6)
      |    AS energy_dist
      |FROM nx, ny, exy, exx, eyy""".stripMargin

  /** Sample L-moments λ₁..λ₄ (+ L-CV, L-skew, L-kurt) as ONE portable
    * text — oracle of `x_lmoments` and whole query of the
    * `x_sql_lmoments` twin. Probability-weighted moments
    * b_r = (1/n)Σ x₍ᵢ₎·C(i−1,r)/C(n−1,r) need sums of binomial
    * coefficients over each tie run of the sorted sample; over the run
    * at positions a..b the hockey-stick identity collapses them exactly:
    * Σ C(i−1,r) = C(b,r+1) − C(a−1,r+1). So one ≤50-row histogram
    * cumulative gives every b_r in closed form — the whole-corpus order
    * statistics WITHOUT a corpus sort. Binomials go DOUBLE (C(n,4)
    * overflows BIGINT at corpus scale; both engines evaluate the same
    * product/quotient chain). */
  private[queries] val LmomentsSql =
    """WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
      |  CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
      |cum AS (SELECT v, c,
      |  CAST(sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS b,
      |  CAST(sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
      |    AS BIGINT) AS a0
      |  FROM h),
      |runs AS (SELECT CAST(v AS DOUBLE) AS v, CAST(c AS DOUBLE) AS c,
      |  CAST(b AS DOUBLE) AS hb, CAST(a0 AS DOUBLE) AS ha FROM cum),
      |pw AS (SELECT
      |  sum(v * c) AS t0,
      |  sum(v * (hb * (hb - 1) / 2 - ha * (ha - 1) / 2)) AS t1,
      |  sum(v * (hb * (hb - 1) * (hb - 2) / 6
      |    - ha * (ha - 1) * (ha - 2) / 6)) AS t2,
      |  sum(v * (hb * (hb - 1) * (hb - 2) * (hb - 3) / 24
      |    - ha * (ha - 1) * (ha - 2) * (ha - 3) / 24)) AS t3,
      |  max(hb) AS n
      |  FROM runs),
      |bb AS (SELECT n, t0 / n AS b0,
      |  t1 / (n * (n - 1)) AS b1,
      |  t2 * 2 / (n * (n - 1) * (n - 2)) AS b2,
      |  t3 * 6 / (n * (n - 1) * (n - 2) * (n - 3)) AS b3
      |  FROM pw),
      |lm AS (SELECT CAST(n AS BIGINT) AS n, b0 AS l1,
      |  2 * b1 - b0 AS l2, 6 * b2 - 6 * b1 + b0 AS l3,
      |  20 * b3 - 30 * b2 + 12 * b1 - b0 AS l4
      |  FROM bb)
      |SELECT n, round(l1, 6) AS l1, round(l2, 6) AS l2,
      |  round(l3, 6) AS l3, round(l4, 6) AS l4,
      |  round(l2 / l1, 6) AS l_cv, round(l3 / l2, 6) AS l_skew,
      |  round(l4 / l2, 6) AS l_kurt
      |FROM lm""".stripMargin

  /** Grouped (delete-one-nation) jackknife for the mean order value as
    * ONE portable text — oracle of `x_jackknife` and whole query of the
    * `x_sql_jackknife` twin. Leave-one-out replicates θ₍ᵢ₎ come free
    * from the per-nation (count, cents-snapped sum) frame; SE² =
    * (g−1)/g · Σ(θ₍ᵢ₎ − θ̄)², bias = (g−1)(θ̄ − θ̂). θ₍ᵢ₎ is snapped
    * 9 dp before the deviation pass so both engines square identical
    * replicates. */
  private[queries] val JackknifeSql =
    """WITH g AS (
      |  SELECT c.c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_i,
      |    round(sum(o.o_totalprice), 2) AS s_i
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_i) AS BIGINT) AS n,
      |  round(sum(s_i), 2) AS s, CAST(count(*) AS BIGINT) AS grp
      |  FROM g),
      |rep AS (SELECT g.nk,
      |  round((tot.s - g.s_i) / (tot.n - g.n_i), 9) AS theta_i,
      |  tot.n, tot.s, tot.grp
      |  FROM g, tot),
      |jb AS (SELECT max(grp) AS g, max(n) AS n,
      |  round(max(s) / max(n), 6) AS theta,
      |  round(avg(theta_i), 9) AS theta_jack,
      |  round(var_samp(theta_i), 9) AS v_rep
      |  FROM rep)
      |SELECT g AS n_groups, n, theta AS theta_hat,
      |  round(theta_jack, 6) AS theta_jack,
      |  round(sqrt(v_rep * (g - 1) * (g - 1) / g), 6) AS se_jack,
      |  round((g - 1) * (theta_jack - theta), 6) AS bias_jack
      |FROM jb""".stripMargin

  /** Inverse-variance meta-analysis (fixed + DerSimonian-Laird random
    * effects) as ONE portable text — oracle of `x_meta_analysis` and
    * whole query of the `x_sql_meta` twin. Five "studies" = regions;
    * effect = mean URGENT − non-URGENT order value with Welch SE from
    * snapped per-(region, arm) moments; Q, τ², I², and both pooled
    * estimates on the 5-row frame. θ_FE is snapped 9 dp before it
    * enters the Q deviations. */
  private[queries] val MetaSql =
    """WITH oc AS (
      |  SELECT r.r_name AS reg,
      |    CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
      |      AS arm,
      |    o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey),
      |st AS (SELECT reg, arm, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(v), 6) AS m, round(var_samp(v), 4) AS s2
      |  FROM oc GROUP BY 1, 2),
      |eff AS (SELECT reg,
      |  max(CASE WHEN arm = 1 THEN m END)
      |    - max(CASE WHEN arm = 0 THEN m END) AS e,
      |  max(CASE WHEN arm = 1 THEN s2 END)
      |    / max(CASE WHEN arm = 1 THEN n END)
      |  + max(CASE WHEN arm = 0 THEN s2 END)
      |    / max(CASE WHEN arm = 0 THEN n END) AS se2
      |  FROM st GROUP BY 1),
      |fe AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |  sum(1.0e0 / se2) AS sw, sum(e / se2) AS swe,
      |  sum(1.0e0 / (se2 * se2)) AS sw2
      |  FROM eff),
      |q AS (SELECT fe.k, fe.sw, fe.sw2,
      |  round(fe.swe / fe.sw, 9) AS th_fe,
      |  sum((eff.e - round(fe.swe / fe.sw, 9))
      |    * (eff.e - round(fe.swe / fe.sw, 9)) / eff.se2) AS qstat
      |  FROM eff, fe GROUP BY 1, 2, 3, 4),
      |tau AS (SELECT k, th_fe, qstat,
      |  CASE WHEN qstat > k - 1
      |    THEN (qstat - (k - 1)) / (sw - sw2 / sw) ELSE 0.0e0 END
      |    AS tau2
      |  FROM q),
      |re AS (SELECT /*+ BROADCAST(tau) */
      |  tau.k, tau.th_fe, tau.qstat, tau.tau2,
      |  sum(eff.e / (eff.se2 + tau.tau2))
      |    / sum(1.0e0 / (eff.se2 + tau.tau2)) AS th_re
      |  FROM eff, tau GROUP BY 1, 2, 3, 4)
      |SELECT k AS n_studies, round(th_fe, 4) AS theta_fixed,
      |  round(th_re, 4) AS theta_random, round(qstat, 4) AS q_stat,
      |  round(tau2, 4) AS tau2,
      |  round(CASE WHEN qstat > k - 1
      |    THEN (qstat - (k - 1)) / qstat ELSE 0.0e0 END, 6) AS i2
      |FROM re""".stripMargin

  /** The brand z-test p-value family as a DataFrame — the Column-algebra
    * mirror of [[BrandPvalCtes]] (columns b, n_b, zs, pv), shared by the
    * x_fdr_bh step-up and the R52 x_holm step-down Dataset sides so both
    * FWER/FDR controllers close over the SAME 25 tests. */
  private[queries] def brandPvalDf(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val t = Tables(s, d)
    val g = t.lineitem
      .join(broadcast(t.part.select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("b"))
      .agg(count(lit(1)).as("n_b"),
        sum(col("l_quantity").cast("bigint")).as("s_b"),
        sum(col("l_quantity").cast("bigint")
          * col("l_quantity").cast("bigint")).as("q_b"))
    val tot = g.agg(sum(col("n_b")).as("n"), sum(col("s_b")).as("s"),
      sum(col("q_b")).as("q"))
    val v = tot.select(col("n"), col("s"),
      ((col("n").cast("double") * col("q").cast("double")
        - col("s").cast("double") * col("s").cast("double"))
        / (col("n").cast("double") * (col("n").cast("double") - 1.0)))
        .as("s2"))
    val z = g.crossJoin(broadcast(v))
      .select(col("b"), col("n_b"),
        ((col("s_b").cast("double") / col("n_b")
          - (col("s") - col("s_b")).cast("double")
            / (col("n") - col("n_b")))
          / sqrt(col("s2") * (lit(1.0) / col("n_b")
            + lit(1.0) / (col("n") - col("n_b"))))).as("zs"))
      .withColumn("az", abs(col("zs")) / lit(1.4142135623730951))
    z.select(col("b"), col("n_b"), col("zs"),
      expr(erfcSql("az")).as("pv"))
  }

  val defs: Seq[QDef] = Seq(

    // BENJAMINI-HOCHBERG: the multiple-testing controller every
    // screening pipeline needs — 25 brand-vs-rest z-tests from ONE
    // corpus collapse to exact BIGINT sufficient statistics, p-values
    // through the shared erfc fragment, step-up selection on the 25-row
    // frame (its row_number/count windows are the only unpartitioned
    // exchanges — carved out).
    QDef("x_fdr_bh", FdrSql) { (s, d) =>
      val p = brandPvalDf(s, d)
      val r = p
        .withColumn("k",
          row_number().over(Window.orderBy("pv", "b")).cast("bigint"))
        .withColumn("m", count(lit(1))
          .over(Window.partitionBy()).cast("bigint"))
      val kmax = r.agg(coalesce(max(when(
        col("pv") * col("m") <= lit(0.05) * col("k"), col("k"))), lit(0L))
        .as("kstar"))
      r.crossJoin(broadcast(kmax))
        .select(col("b").as("brand"), col("n_b").as("n"),
          round(col("zs"), 4).as("z"), round(col("pv"), 6).as("p_value"),
          col("k").as("p_rank"),
          when(col("k") <= col("kstar"), 1).otherwise(0).cast("int")
            .as("rejected"))
        .orderBy("p_rank")
    },

    // BH through Spark's SQL parser — same shared text.
    QDef("x_sql_fdr", FdrSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "part")
      s.sql(FdrSql)
    },

    // LILLIEFORS: composite normality (parameters estimated from the
    // sample) — the one-sample complement of x_ks_test. Corpus work is
    // the ≤50-row quantity histogram + one exact-integer moment pass;
    // Φ at the step points via the erfc fragment.
    QDef("x_lilliefors", LillieforsSql) { (s, d) =>
      val h = Tables(s, d).lineitem
        .groupBy(col("l_quantity").cast("bigint").as("v"))
        .agg(count(lit(1)).as("c"))
      val mo = h.agg(sum(col("c")).as("n"),
        sum(col("v") * col("c")).as("s"),
        sum(col("v") * col("v") * col("c")).as("q"))
      val ms = mo.select(col("n"),
        (col("s").cast("double") / col("n")).as("mu"),
        sqrt((col("n").cast("double") * col("q").cast("double")
          - col("s").cast("double") * col("s").cast("double"))
          / (col("n").cast("double") * (col("n").cast("double") - 1.0)))
          .as("sd"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.select(col("v"), col("c"),
        sum(col("c")).over(w).cast("bigint").as("ci"))
      val zz = cum.crossJoin(broadcast(ms))
        .select(col("v"), col("c"), col("ci"), col("n"),
          ((col("v") - col("mu")) / col("sd")
            / lit(1.4142135623730951)).as("zh"))
      val gaps = zz.select(col("n"), expr(normCdfSql("zh")).as("phi"),
        (col("ci").cast("double") / col("n")).as("fi"),
        ((col("ci") - col("c")).cast("double") / col("n")).as("fp"))
      val dd = gaps.agg(max(col("n")).as("n"),
        max(when(col("fi") - col("phi") > col("phi") - col("fp"),
          col("fi") - col("phi")).otherwise(col("phi") - col("fp")))
          .as("dstat"))
      dd.crossJoin(broadcast(ms.select(col("mu"), col("sd"))))
        .select(col("n"), round(col("mu"), 6).as("mu"),
          round(col("sd"), 6).as("sd"),
          round(col("dstat"), 6).as("d_stat"),
          round(col("dstat") * (sqrt(col("n").cast("double")) - 0.01
            + lit(0.85) / sqrt(col("n").cast("double"))), 4)
            .as("d_scaled"))
    },

    // Lilliefors through Spark's SQL parser — same shared text.
    QDef("x_sql_lilliefors", LillieforsSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(LillieforsSql)
    },

    // TOST: equivalence testing — the right tool when "no difference"
    // is the claim. Two one-sided Welch z-tests against ±0.25 units,
    // everything from ONE conditional-sum collapse.
    QDef("x_tost_equiv", TostSql) { (s, d) =>
      val g = Tables(s, d).lineitem
        .filter(col("l_returnflag").isin("R", "N"))
        .groupBy(col("l_returnflag").as("f"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("bigint")).as("s"),
          sum(col("l_quantity").cast("bigint")
            * col("l_quantity").cast("bigint")).as("q"))
      val w = g.agg(
        max(when(col("f") === "R", col("n"))).as("na"),
        max(when(col("f") === "R", col("s"))).as("sa"),
        max(when(col("f") === "R", col("q"))).as("qa"),
        max(when(col("f") === "N", col("n"))).as("nb"),
        max(when(col("f") === "N", col("s"))).as("sb"),
        max(when(col("f") === "N", col("q"))).as("qb"))
      def svar(n: String, s: String, q: String) =
        (col(n).cast("double") * col(q).cast("double")
          - col(s).cast("double") * col(s).cast("double")) /
          (col(n).cast("double") * (col(n).cast("double") - 1.0))
      val e = w.select(col("na"), col("nb"),
        (col("sa").cast("double") / col("na")
          - col("sb").cast("double") / col("nb")).as("diff"),
        sqrt(svar("na", "sa", "qa") / col("na")
          + svar("nb", "sb", "qb") / col("nb")).as("se"))
      val t = e.select(col("na"), col("nb"), col("diff"), col("se"),
        ((col("diff") + 0.25) / col("se") / lit(1.4142135623730951))
          .as("t1h"),
        (-((col("diff") - 0.25) / col("se")) / lit(1.4142135623730951))
          .as("t2h"))
      val p = t.select(col("na"), col("nb"), col("diff"), col("se"),
        (lit(1.0) - expr(normCdfSql("t1h"))).as("p_lo"),
        (lit(1.0) - expr(normCdfSql("t2h"))).as("p_hi"))
      p.select(col("na").as("n_r"), col("nb").as("n_n"),
        round(col("diff"), 6).as("mean_diff"),
        round(col("se"), 6).as("se"),
        round(col("p_lo"), 6).as("p_lower"),
        round(col("p_hi"), 6).as("p_upper"),
        when(col("p_lo") < 0.05 && col("p_hi") < 0.05, 1).otherwise(0)
          .cast("int").as("equivalent"))
    },

    // TOST through Spark's SQL parser — same shared text.
    QDef("x_sql_tost", TostSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(TostSql)
    },

    // ENERGY DISTANCE: the metric two-sample distance (zero iff equal
    // distributions) — exact from ≤50×50 histogram crosses; the corpus
    // is touched by exactly two conditional histogram collapses.
    QDef("x_energy_dist", EnergySql) { (s, d) =>
      val li = Tables(s, d).lineitem
      def hist(flag: String) = li.filter(col("l_returnflag") === flag)
        .groupBy(col("l_quantity").cast("bigint").as("v"))
        .agg(count(lit(1)).as("c"))
      val hx = hist("R")
      val hy = hist("N")
      def pairSum(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame) =
        a.select(col("v").as("va"), col("c").as("ca"))
          .crossJoin(broadcast(
            b.select(col("v").as("vb"), col("c").as("cb"))))
          .agg(sum(col("ca").cast("double") * col("cb").cast("double")
            * abs(col("va") - col("vb"))).as("e"))
      val nx = hx.agg(sum(col("c")).as("n"))
      val ny = hy.agg(sum(col("c")).as("n"))
      nx.select(col("n").as("n_x"))
        .crossJoin(broadcast(ny.select(col("n").as("n_y"))))
        .crossJoin(broadcast(pairSum(hx, hy).select(col("e").as("exy"))))
        .crossJoin(broadcast(pairSum(hx, hx).select(col("e").as("exx"))))
        .crossJoin(broadcast(pairSum(hy, hy).select(col("e").as("eyy"))))
        .select(col("n_x"), col("n_y"),
          round(col("exy") / col("n_x").cast("double")
            / col("n_y").cast("double"), 6).as("mean_cross_dist"),
          round(lit(2.0) * col("exy") / col("n_x").cast("double")
            / col("n_y").cast("double")
            - col("exx") / col("n_x").cast("double")
              / col("n_x").cast("double")
            - col("eyy") / col("n_y").cast("double")
              / col("n_y").cast("double"), 6).as("energy_dist"))
    },

    // Energy distance through Spark's SQL parser — same shared text
    // (the hint comments keep the ON-TRUE crosses off CartesianProduct).
    QDef("x_sql_energy", EnergySql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(EnergySql)
    },

    // L-MOMENTS: robust distribution shape (L-CV/L-skew/L-kurt, the
    // hydrology-standard alternative to classical moments) — exact
    // whole-corpus order statistics from the histogram cumulative via
    // hockey-stick binomial sums, NO corpus sort anywhere.
    QDef("x_lmoments", LmomentsSql) { (s, d) =>
      val h = Tables(s, d).lineitem
        .groupBy(col("l_quantity").cast("bigint").as("v"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.select(col("v"), col("c"),
        sum(col("c")).over(w).cast("bigint").as("b"),
        (sum(col("c")).over(w) - col("c")).cast("bigint").as("a0"))
      val runs = cum.select(col("v").cast("double").as("v"),
        col("c").cast("double").as("c"),
        col("b").cast("double").as("hb"), col("a0").cast("double").as("ha"))
      def hs2(x: org.apache.spark.sql.Column) = x * (x - 1) / 2
      def hs3(x: org.apache.spark.sql.Column) = x * (x - 1) * (x - 2) / 6
      def hs4(x: org.apache.spark.sql.Column) =
        x * (x - 1) * (x - 2) * (x - 3) / 24
      val pw = runs.agg(
        sum(col("v") * col("c")).as("t0"),
        sum(col("v") * (hs2(col("hb")) - hs2(col("ha")))).as("t1"),
        sum(col("v") * (hs3(col("hb")) - hs3(col("ha")))).as("t2"),
        sum(col("v") * (hs4(col("hb")) - hs4(col("ha")))).as("t3"),
        max(col("hb")).as("n"))
      val bb = pw.select(col("n"), (col("t0") / col("n")).as("b0"),
        (col("t1") / (col("n") * (col("n") - 1))).as("b1"),
        (col("t2") * 2 / (col("n") * (col("n") - 1) * (col("n") - 2)))
          .as("b2"),
        (col("t3") * 6
          / (col("n") * (col("n") - 1) * (col("n") - 2) * (col("n") - 3)))
          .as("b3"))
      val lm = bb.select(col("n").cast("bigint").as("n"),
        col("b0").as("l1"), (lit(2) * col("b1") - col("b0")).as("l2"),
        (lit(6) * col("b2") - lit(6) * col("b1") + col("b0")).as("l3"),
        (lit(20) * col("b3") - lit(30) * col("b2") + lit(12) * col("b1")
          - col("b0")).as("l4"))
      lm.select(col("n"), round(col("l1"), 6).as("l1"),
        round(col("l2"), 6).as("l2"), round(col("l3"), 6).as("l3"),
        round(col("l4"), 6).as("l4"),
        round(col("l2") / col("l1"), 6).as("l_cv"),
        round(col("l3") / col("l2"), 6).as("l_skew"),
        round(col("l4") / col("l2"), 6).as("l_kurt"))
    },

    // L-moments through Spark's SQL parser — same shared text.
    QDef("x_sql_lmoments", LmomentsSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(LmomentsSql)
    },

    // JACKKNIFE: delete-one-group resampling variance — the replicates
    // are pure algebra on the per-nation (count, snapped sum) frame, so
    // the whole estimator costs ONE corpus collapse.
    QDef("x_jackknife", JackknifeSql) { (s, d) =>
      val t = Tables(s, d)
      val g = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_i"),
          round(sum(col("o_totalprice")), 2).as("s_i"))
      val tot = g.agg(sum(col("n_i")).as("n"),
        round(sum(col("s_i")), 2).as("s"), count(lit(1)).as("grp"))
      val rep = g.crossJoin(broadcast(tot))
        .select(col("nk"),
          round((col("s") - col("s_i")) / (col("n") - col("n_i")), 9)
            .as("theta_i"),
          col("n"), col("s"), col("grp"))
      val jb = rep.agg(max(col("grp")).as("g"), max(col("n")).as("n"),
        round(max(col("s")) / max(col("n")), 6).as("theta"),
        round(avg(col("theta_i")), 9).as("theta_jack"),
        round(var_samp(col("theta_i")), 9).as("v_rep"))
      jb.select(col("g").as("n_groups"), col("n"),
        col("theta").as("theta_hat"),
        round(col("theta_jack"), 6).as("theta_jack"),
        round(sqrt(col("v_rep") * (col("g") - 1) * (col("g") - 1)
          / col("g")), 6).as("se_jack"),
        round((col("g") - 1) * (col("theta_jack") - col("theta")), 6)
          .as("bias_jack"))
    },

    // Jackknife through Spark's SQL parser — same shared text.
    QDef("x_sql_jackknife", JackknifeSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(JackknifeSql)
    },

    // META-ANALYSIS: inverse-variance pooling with DerSimonian-Laird
    // heterogeneity — five regional URGENT-effect "studies" from ONE
    // (region × arm) moment collapse; Q/τ²/I² and both pooled
    // estimates on the 5-row frame.
    QDef("x_meta_analysis", MetaSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("reg"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
            .as("arm"),
          col("o_totalprice").as("v"))
      val st = oc.groupBy("reg", "arm")
        .agg(count(lit(1)).as("n"), round(avg(col("v")), 6).as("m"),
          round(var_samp(col("v")), 4).as("s2"))
      val eff = st.groupBy("reg")
        .agg((max(when(col("arm") === 1, col("m")))
          - max(when(col("arm") === 0, col("m")))).as("e"),
          (max(when(col("arm") === 1, col("s2")))
            / max(when(col("arm") === 1, col("n")))
            + max(when(col("arm") === 0, col("s2")))
              / max(when(col("arm") === 0, col("n")))).as("se2"))
      val fe = eff.agg(count(lit(1)).as("k"),
        sum(lit(1.0) / col("se2")).as("sw"),
        sum(col("e") / col("se2")).as("swe"),
        sum(lit(1.0) / (col("se2") * col("se2"))).as("sw2"))
      val q = eff.crossJoin(broadcast(fe))
        .groupBy(col("k"), col("sw"), col("sw2"),
          round(col("swe") / col("sw"), 9).as("th_fe"))
        .agg(sum((col("e") - round(col("swe") / col("sw"), 9))
          * (col("e") - round(col("swe") / col("sw"), 9)) / col("se2"))
          .as("qstat"))
      val tau = q.select(col("k"), col("th_fe"), col("qstat"),
        when(col("qstat") > col("k") - 1,
          (col("qstat") - (col("k") - 1)) / (col("sw") - col("sw2") / col("sw")))
          .otherwise(lit(0.0)).as("tau2"))
      val re = eff.crossJoin(broadcast(tau))
        .groupBy(col("k"), col("th_fe"), col("qstat"), col("tau2"))
        .agg((sum(col("e") / (col("se2") + col("tau2")))
          / sum(lit(1.0) / (col("se2") + col("tau2")))).as("th_re"))
      re.select(col("k").as("n_studies"),
        round(col("th_fe"), 4).as("theta_fixed"),
        round(col("th_re"), 4).as("theta_random"),
        round(col("qstat"), 4).as("q_stat"),
        round(col("tau2"), 4).as("tau2"),
        round(when(col("qstat") > col("k") - 1,
          (col("qstat") - (col("k") - 1)) / col("qstat"))
          .otherwise(lit(0.0)), 6).as("i2"))
    },

    // Meta-analysis through Spark's SQL parser — same shared text.
    QDef("x_sql_meta", MetaSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer", "nation", "region")
      s.sql(MetaSql)
    })
}
