package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-47 batch: extreme-value theory on the L-moment machinery,
  * dependence beyond correlation, and ordered/seasonal trend tests —
  * GEV fit on monthly block maxima (L-moment/Hosking estimators with a
  * portable Γ(1+x) fragment), peaks-over-threshold GPD, normal-scores
  * (Gaussian copula) correlation on R42's Φ⁻¹ fragment, lag-1 transfer
  * entropy between the order-count and revenue direction series,
  * dynamic-time-warping distance between weekday profiles (a 7×7 DP
  * unrolled through lateral column aliases — both engines support
  * them), Page's L trend test, and the seasonal Mann-Kendall test.
  *
  * Scale posture: every operator's corpus cost is the ONE daily /
  * monthly / (month × priority)-cell collapse; the EVT fits, DP, and
  * trend algebra run on 7-84-row frames. The only unpartitioned
  * windows order those bounded frames (carved out + growth-probed). */
object R47Ops {

  /** Γ(1+x) for −1 < x ≤ 1 as a portable SQL fragment (A&S 6.1.36
    * eighth-order polynomial, |ε| ≤ 3e-7 on [0,1]; reflected onto
    * (−1,0) via Γ(1+x) = Γ(2+x)/(1+x)). `x` must be a simple column
    * reference. */
  private[queries] def gamma1pSql(x: String): String = {
    val cs = Seq("0.035868343e0", "-0.193527818e0", "0.482199394e0",
      "-0.756704078e0", "0.918206857e0", "-0.897056937e0",
      "0.988205891e0", "-0.577191652e0")
    def poly(v: String): String =
      cs.foldLeft("0.0e0")((acc, k) => s"(($acc + $k) * $v)") + " + 1.0e0"
    s"""(CASE WHEN $x >= 0 THEN (${poly(x)})
       |  ELSE ((${poly(s"(1.0e0 + $x)")}) / (1.0e0 + $x)) END)"""
      .stripMargin.replace("\n", " ")
  }

  /** GEV fit on monthly block maxima of daily revenue as ONE portable
    * text — oracle of `x_gev_lmom` and whole query of the `x_sql_gev`
    * twin. Hosking's L-moment estimators: κ from τ₃ via the rational
    * approximation 7.8590c + 2.9554c², σ and μ through the Γ(1+κ)
    * fragment; 100-block return level released. PWMs come from exact
    * row_number index sums over the 84-row maxima frame (value then
    * month tie-break). b-moments snapped 9 dp before the κ/σ/μ chain
    * so both engines run identical algebra. */
  private[queries] val GevSql = {
    val g = gamma1pSql("k")
    s"""WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
       |  round(sum(o_totalprice), 2) AS r FROM orders GROUP BY 1),
       |bm AS (SELECT CAST(date_trunc('month', d) AS DATE) AS mo,
       |  max(r) AS mx FROM cal GROUP BY 1),
       |rk AS (SELECT mx,
       |  CAST(row_number() OVER (ORDER BY mx, mo) AS BIGINT) AS i,
       |  CAST(count(*) OVER () AS BIGINT) AS n FROM bm),
       |pw AS (SELECT max(n) AS n, round(avg(mx), 9) AS b0,
       |  round(sum(mx * (i - 1))
       |    / (max(n) * (max(n) - 1.0e0)), 9) AS b1,
       |  round(sum(mx * (i - 1) * (i - 2))
       |    / (max(n) * (max(n) - 1.0e0) * (max(n) - 2.0e0)), 9) AS b2
       |  FROM rk),
       |lm AS (SELECT n, b0 AS l1, 2 * b1 - b0 AS l2,
       |  (6 * b2 - 6 * b1 + b0) / (2 * b1 - b0) AS t3 FROM pw),
       |kk AS (SELECT n, l1, l2, t3,
       |  7.859e0 * (2.0e0 / (3.0e0 + t3) - 0.6309297535714574e0)
       |  + 2.9554e0 * (2.0e0 / (3.0e0 + t3) - 0.6309297535714574e0)
       |    * (2.0e0 / (3.0e0 + t3) - 0.6309297535714574e0) AS k
       |  FROM lm),
       |fit AS (SELECT n, l1, l2, t3, k,
       |  l2 * k / ((1.0e0 - pow(2.0e0, -k)) * $g) AS sigma
       |  FROM kk),
       |par AS (SELECT n, l1, l2, t3, k, sigma,
       |  l1 - sigma * (1.0e0 - $g) / k AS mu
       |  FROM fit)
       |SELECT n AS n_blocks, round(l1, 2) AS l1, round(l2, 2) AS l2,
       |  round(t3, 6) AS l_skew, round(k, 6) AS shape_k,
       |  round(sigma, 2) AS sigma, round(mu, 2) AS mu,
       |  round(mu + sigma * (1.0e0 - pow(-ln(0.99e0), k)) / k, 2)
       |    AS return_level_100
       |FROM par""".stripMargin
  }

  /** Peaks-over-threshold GPD fit as ONE portable text — oracle of
    * `x_pot_gpd` and whole query of the `x_sql_gpd` twin. Threshold =
    * the 90th-percentile daily revenue by integer rank selection
    * (i·10 ≥ n·9 — no interpolation); GPD on the exceedances via
    * Hosking-Wallis L-moment estimators κ = λ₁/λ₂ − 2, σ = λ₁(1+κ);
    * the 99th-percentile exceedance and implied return level close
    * it. */
  private[queries] val GpdSql =
    """WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  round(sum(o_totalprice), 2) AS r FROM orders GROUP BY 1),
      |rk AS (SELECT d, r,
      |  CAST(row_number() OVER (ORDER BY r, d) AS BIGINT) AS i,
      |  CAST(count(*) OVER () AS BIGINT) AS n FROM cal),
      |th AS (SELECT min(r) AS u FROM rk WHERE i * 10 >= n * 9),
      |ex AS (SELECT cal.r - th.u AS y, cal.d
      |  FROM cal, th WHERE cal.r > th.u),
      |er AS (SELECT y,
      |  CAST(row_number() OVER (ORDER BY y, d) AS BIGINT) AS i,
      |  CAST(count(*) OVER () AS BIGINT) AS m FROM ex),
      |pw AS (SELECT max(m) AS m, round(avg(y), 9) AS b0,
      |  round(sum(y * (i - 1)) / (max(m) * (max(m) - 1.0e0)), 9) AS b1
      |  FROM er),
      |lm AS (SELECT m, b0 AS l1, 2 * b1 - b0 AS l2 FROM pw),
      |fit AS (SELECT m, l1, l2, l1 / l2 - 2.0e0 AS k,
      |  l1 * (l1 / l2 - 1.0e0) AS sigma FROM lm)
      |SELECT th.u AS threshold, fit.m AS n_exceed,
      |  round(fit.k, 6) AS shape_k, round(fit.sigma, 2) AS sigma,
      |  round(fit.sigma * (1.0e0 - pow(0.01e0, fit.k)) / fit.k, 2)
      |    AS p99_excess,
      |  round(th.u + fit.sigma * (1.0e0 - pow(0.01e0, fit.k)) / fit.k,
      |    2) AS return_level
      |FROM fit, th""".stripMargin

  /** Normal-scores (Gaussian copula) correlation between daily order
    * count and daily revenue as ONE portable text — oracle of
    * `x_copula_corr` and whole query of the `x_sql_copula` twin.
    * Midranks via RANGE-frame tie-exact counts, scores Φ⁻¹(r/(n+1))
    * through R42's Acklam fragment, Pearson on the scores. Released
    * beside the raw-value Pearson so the copula-vs-linear gap is
    * visible. */
  private[queries] val CopulaSql = {
    val zx = R42Ops.normInvSql("ux")
    val zy = R42Ops.normInvSql("uy")
    s"""WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
       |  CAST(count(*) AS DOUBLE) AS x, round(sum(o_totalprice), 2)
       |    AS y
       |  FROM orders GROUP BY 1),
       |rk AS (SELECT x, y,
       |  (CAST(count(*) OVER (ORDER BY x
       |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |     AS DOUBLE)
       |   + CAST(count(*) OVER () AS DOUBLE)
       |   - CAST(count(*) OVER (ORDER BY x DESC
       |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |     AS DOUBLE) + 1.0e0) / 2 AS rx,
       |  (CAST(count(*) OVER (ORDER BY y
       |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |     AS DOUBLE)
       |   + CAST(count(*) OVER () AS DOUBLE)
       |   - CAST(count(*) OVER (ORDER BY y DESC
       |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |     AS DOUBLE) + 1.0e0) / 2 AS ry,
       |  CAST(count(*) OVER () AS DOUBLE) AS n
       |  FROM cal),
       |uu AS (SELECT x, y, n, rx / (n + 1.0e0) AS ux,
       |  ry / (n + 1.0e0) AS uy FROM rk),
       |sc AS (SELECT x, y, n, $zx AS zx, $zy AS zy FROM uu),
       |mo AS (SELECT max(n) AS n,
       |  sum(zx) AS sx, sum(zy) AS sy, sum(zx * zy) AS sxy,
       |  sum(zx * zx) AS sxx, sum(zy * zy) AS syy,
       |  sum(x) AS vx, sum(y) AS vy, sum(x * y) AS vxy,
       |  sum(x * x) AS vxx, sum(y * y) AS vyy
       |  FROM sc)
       |SELECT CAST(n AS BIGINT) AS n_days,
       |  round((n * sxy - sx * sy)
       |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       |    AS copula_corr,
       |  round((n * vxy - vx * vy)
       |    / sqrt((n * vxx - vx * vx) * (n * vyy - vy * vy)), 6)
       |    AS pearson_corr
       |FROM mo""".stripMargin
  }

  /** Lag-1 transfer entropy between the daily up/down direction series
    * of order count (X) and revenue (Y) as ONE portable text — oracle
    * of `x_transfer_entropy` and whole query of the `x_sql_te` twin.
    * One 16-cell (x_t, y_t, x_{t−1}, y_{t−1}) joint-count collapse;
    * every conditional in TE(Y→X) = Σ p ln[p(x_t|x₁,y₁)/p(x_t|x₁)]
    * (and the X→Y mirror) is a ratio of EXACT integer counts obtained
    * from partitioned window sums over the 16-row frame. */
  private[queries] val TeSql =
    """WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  CAST(count(*) AS BIGINT) AS c, round(sum(o_totalprice), 2) AS r
      |  FROM orders GROUP BY 1),
      |dir0 AS (SELECT d,
      |  CASE WHEN c > lag(c, 1) OVER (ORDER BY d) THEN 1 ELSE 0 END
      |    AS xt,
      |  CASE WHEN r > lag(r, 1) OVER (ORDER BY d) THEN 1 ELSE 0 END
      |    AS yt,
      |  row_number() OVER (ORDER BY d) AS rn
      |  FROM cal),
      |dir AS (SELECT d, xt, yt,
      |  lag(xt, 1) OVER (ORDER BY d) AS x1,
      |  lag(yt, 1) OVER (ORDER BY d) AS y1,
      |  rn FROM dir0),
      |jc AS (SELECT xt, yt, x1, y1, CAST(count(*) AS BIGINT) AS c
      |  FROM dir WHERE rn >= 3 GROUP BY 1, 2, 3, 4),
      |mg AS (SELECT xt, yt, x1, y1, c,
      |  CAST(sum(c) OVER () AS BIGINT) AS nn,
      |  CAST(sum(c) OVER (PARTITION BY xt, x1, y1) AS BIGINT) AS c_xt_x1y1,
      |  CAST(sum(c) OVER (PARTITION BY x1, y1) AS BIGINT) AS c_x1y1,
      |  CAST(sum(c) OVER (PARTITION BY xt, x1) AS BIGINT) AS c_xt_x1,
      |  CAST(sum(c) OVER (PARTITION BY x1) AS BIGINT) AS c_x1,
      |  CAST(sum(c) OVER (PARTITION BY yt, x1, y1) AS BIGINT) AS c_yt_x1y1,
      |  CAST(sum(c) OVER (PARTITION BY yt, y1) AS BIGINT) AS c_yt_y1,
      |  CAST(sum(c) OVER (PARTITION BY y1) AS BIGINT) AS c_y1
      |  FROM jc),
      |te AS (SELECT max(nn) AS n,
      |  sum(CAST(c AS DOUBLE) / nn
      |    * ln((CAST(c_xt_x1y1 AS DOUBLE) / c_x1y1)
      |        / (CAST(c_xt_x1 AS DOUBLE) / c_x1))) AS te_yx,
      |  sum(CAST(c AS DOUBLE) / nn
      |    * ln((CAST(c_yt_x1y1 AS DOUBLE) / c_x1y1)
      |        / (CAST(c_yt_y1 AS DOUBLE) / c_y1))) AS te_xy
      |  FROM mg)
      |SELECT CAST(n AS BIGINT) AS n, round(te_yx, 6) AS te_y_to_x,
      |  round(te_xy, 6) AS te_x_to_y,
      |  round(te_yx - te_xy, 6) AS te_asymmetry
      |FROM te""".stripMargin

  /** DTW distance between the BUILDING and MACHINERY monthly revenue
    * profiles as ONE portable text — oracle of `x_dtw_profile` and
    * whole query of the `x_sql_dtw` twin. Profiles = mean order value
    * per calendar month (month() is engine-portable where weekday
    * numbering is not), normalized by their own mean and 6 dp-snapped;
    * the 12×12 DP runs as twelve unrolled row CTEs whose within-row
    * recurrence uses lateral column aliases (supported by both
    * engines), so the whole DP is plain scalar algebra on pivoted
    * one-row frames. */
  private[queries] val DtwSql = {
    val w = 12
    def pivotRow(i: Int): String =
      s"""c$i AS (SELECT
         |  ${(1 to w).map(j =>
               s"max(CASE WHEN j = $j THEN c END) AS c$j")
               .mkString(", ")}
         |  FROM cost WHERE i = $i)""".stripMargin
    // The previous row is re-aliased d1..d12 → p1..p12 before the
    // lateral-alias recurrence reads it: with the names distinct, the
    // bare d${j-1} references below are unambiguous lateral column
    // aliases in BOTH engines (Spark resolves a name conflict to the
    // TABLE column, silently dropping the DP's "left" move — caught by
    // the twin spec, 1.085372 vs the true 1.058366).
    def dpRow(i: Int): String = {
      val cols = (1 to w).map { j =>
        if (j == 1) s"c$i.c1 + p.p1 AS d1"
        else s"c$i.c$j + least(p.p$j, p.p${j - 1}, d${j - 1}) AS d$j"
      }.mkString(",\n  ")
      val renames =
        (1 to w).map(j => s"d$j AS p$j").mkString(", ")
      s"""r$i AS (SELECT
         |  $cols
         |  FROM c$i, (SELECT $renames FROM r${i - 1}) p)""".stripMargin
    }
    s"""WITH seg AS (
       |  SELECT c.c_mktsegment AS g,
       |    CAST(month(o.o_orderdate) AS INT) AS mn,
       |    round(avg(o.o_totalprice), 6) AS m
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
       |  GROUP BY 1, 2),
       |norm AS (SELECT g, mn,
       |  round(m / avg(m) OVER (PARTITION BY g), 6) AS p FROM seg),
       |pa AS (SELECT mn AS i, p AS a FROM norm WHERE g = 'BUILDING'),
       |pb AS (SELECT mn AS j, p AS b FROM norm WHERE g = 'MACHINERY'),
       |cost AS (SELECT /*+ BROADCAST(pb) */ pa.i, pb.j,
       |  abs(pa.a - pb.b) AS c FROM pa JOIN pb ON 1 = 1),
       |${(1 to w).map(pivotRow).mkString(",\n")},
       |r1 AS (SELECT
       |  ${(1 to w).map(j => (1 to j).map(k => s"c1.c$k")
            .mkString(" + ") + s" AS d$j").mkString(", ")}
       |  FROM c1),
       |${(2 to w).map(dpRow).mkString(",\n")}
       |SELECT round(r$w.d$w, 6) AS dtw_distance,
       |  round(r$w.d$w / ${2 * w - 1}.0e0, 6) AS dtw_per_step
       |FROM r$w""".stripMargin
  }

  /** Page's L trend test (ordered alternatives in a blocked design) as
    * ONE portable text — oracle of `x_page_l` and whole query of the
    * `x_sql_page` twin. Blocks = order months (12), ordered treatments
    * = the 5 priorities; within-block midranks of the 6 dp-snapped
    * cell means via the Friedman cell self-join; L = Σ j·R_j with the
    * closed-form normal approximation. */
  private[queries] val PageSql =
    """WITH oc AS (
      |  SELECT CAST(month(o_orderdate) AS INT) AS b,
      |    CAST(substr(o_orderpriority, 1, 1) AS INT) AS j,
      |    o_totalprice AS v
      |  FROM orders),
      |cells AS (SELECT b, j, round(avg(v), 6) AS m FROM oc
      |  GROUP BY 1, 2),
      |r AS (SELECT a.b, a.j,
      |  sum(CASE WHEN c2.m < a.m THEN 1.0e0
      |           WHEN c2.m = a.m THEN 0.5e0 ELSE 0 END) + 0.5e0 AS rk
      |  FROM cells a JOIN cells c2 ON a.b = c2.b GROUP BY 1, 2),
      |rs AS (SELECT j, sum(rk) AS rj FROM r GROUP BY 1),
      |dims AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS n,
      |  CAST(count(DISTINCT j) AS DOUBLE) AS k FROM cells),
      |l AS (SELECT sum(j * rj) AS lstat FROM rs),
      |z AS (SELECT l.lstat, dims.n, dims.k,
      |  (l.lstat - dims.n * dims.k * (dims.k + 1) * (dims.k + 1)
      |    / 4.0e0)
      |  / sqrt(dims.n * dims.k * dims.k * (dims.k + 1)
      |    * (dims.k * dims.k - 1) / 144.0e0) AS zs
      |  FROM l, dims)
      |SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT)
      |    AS n_treatments,
      |  round(lstat, 1) AS page_l, round(zs, 4) AS z
      |FROM z""".stripMargin

  /** Seasonal Mann-Kendall trend test on monthly revenue as ONE
    * portable text — oracle of `x_seasonal_mk` and whole query of the
    * `x_sql_smk` twin. Within each calendar month, S sums pairwise
    * signs across years (year-ordered pairs of the 84-row monthly
    * frame — an equi-join on the month key, so it partitions); the
    * no-tie-correction variance Σ n(n−1)(2n+5)/18 and the
    * continuity-corrected Z close it. */
  private[queries] val SmkSql =
    """WITH mo AS (SELECT CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(month(o_orderdate) AS INT) AS mn,
      |  round(sum(o_totalprice), 2) AS v
      |  FROM orders GROUP BY 1, 2),
      |pairs AS (SELECT a.mn,
      |  CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END
      |    AS sg
      |  FROM mo a JOIN mo b ON a.mn = b.mn AND a.yr < b.yr),
      |s AS (SELECT CAST(sum(sg) AS DOUBLE) AS s FROM pairs),
      |vv AS (SELECT sum(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5))
      |    / 18.0e0 AS vars,
      |  CAST(sum(n) AS BIGINT) AS n_obs
      |  FROM (SELECT mn, CAST(count(*) AS BIGINT) AS n FROM mo
      |    GROUP BY 1) t)
      |SELECT vv.n_obs, CAST(s.s AS BIGINT) AS s_stat,
      |  round(vv.vars, 2) AS var_s,
      |  round(CASE WHEN s.s > 0 THEN (s.s - 1) / sqrt(vv.vars)
      |    WHEN s.s < 0 THEN (s.s + 1) / sqrt(vv.vars)
      |    ELSE 0.0e0 END, 4) AS z
      |FROM s, vv""".stripMargin

  val defs: Seq[QDef] = Seq(

    // GEV BLOCK MAXIMA: the extreme-value workhorse — L-moment fit
    // (built on R45's hockey-stick PWM idea, here via exact row_number
    // index sums on the 84-row maxima frame) with the portable Γ(1+κ)
    // fragment; 100-month return level released.
    QDef("x_gev_lmom", GevSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(round(sum(col("o_totalprice")), 2).as("r"))
      val bm = cal
        .groupBy(date_trunc("month", col("d")).cast("date").as("mo"))
        .agg(max(col("r")).as("mx"))
      val rk = bm.select(col("mx"),
        row_number().over(Window.orderBy("mx", "mo")).cast("bigint")
          .as("i"),
        count(lit(1)).over(Window.partitionBy()).cast("bigint").as("n"))
      val pw = rk.agg(max(col("n")).as("n"),
        round(avg(col("mx")), 9).as("b0"),
        round(sum(col("mx") * (col("i") - 1))
          / (max(col("n")) * (max(col("n")) - 1.0)), 9).as("b1"),
        round(sum(col("mx") * (col("i") - 1) * (col("i") - 2))
          / (max(col("n")) * (max(col("n")) - 1.0)
            * (max(col("n")) - 2.0)), 9).as("b2"))
      val lm = pw.select(col("n"), col("b0").as("l1"),
        (lit(2) * col("b1") - col("b0")).as("l2"),
        ((lit(6) * col("b2") - lit(6) * col("b1") + col("b0"))
          / (lit(2) * col("b1") - col("b0"))).as("t3"))
      val cExp = lit(2.0) / (lit(3.0) + col("t3")) -
        lit(0.6309297535714574)
      val kk = lm.select(col("n"), col("l1"), col("l2"), col("t3"),
        (lit(7.859) * cExp + lit(2.9554) * cExp * cExp).as("k"))
      val g = expr(gamma1pSql("k"))
      val fit = kk.select(col("n"), col("l1"), col("l2"), col("t3"),
        col("k"),
        (col("l2") * col("k")
          / ((lit(1.0) - pow(lit(2.0), -col("k"))) * g)).as("sigma"))
      val par = fit.select(col("n"), col("l1"), col("l2"), col("t3"),
        col("k"), col("sigma"),
        (col("l1") - col("sigma") * (lit(1.0) - g) / col("k")).as("mu"))
      par.select(col("n").as("n_blocks"), round(col("l1"), 2).as("l1"),
        round(col("l2"), 2).as("l2"), round(col("t3"), 6).as("l_skew"),
        round(col("k"), 6).as("shape_k"),
        round(col("sigma"), 2).as("sigma"), round(col("mu"), 2).as("mu"),
        round(col("mu") + col("sigma")
          * (lit(1.0) - pow(-log(lit(0.99)), col("k"))) / col("k"), 2)
          .as("return_level_100"))
    },

    // GEV through Spark's SQL parser — same shared text.
    QDef("x_sql_gev", GevSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(GevSql)
    },

    // POT / GPD: the other EVT pillar — exceedances over the
    // rank-selected 90th-percentile threshold, Hosking-Wallis
    // L-moment closed forms, no special function needed.
    QDef("x_pot_gpd", GpdSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(round(sum(col("o_totalprice")), 2).as("r"))
      val wAll = Window.orderBy("r", "d")
      val rk = cal.select(col("d"), col("r"),
        row_number().over(wAll).cast("bigint").as("i"),
        count(lit(1)).over(Window.partitionBy()).cast("bigint").as("n"))
      val th = rk.filter(col("i") * 10 >= col("n") * 9)
        .agg(min(col("r")).as("u"))
      val ex = cal.crossJoin(broadcast(th))
        .filter(col("r") > col("u"))
        .select((col("r") - col("u")).as("y"), col("d"))
      val wEx = Window.orderBy("y", "d")
      val er = ex.select(col("y"),
        row_number().over(wEx).cast("bigint").as("i"),
        count(lit(1)).over(Window.partitionBy()).cast("bigint").as("m"))
      val pw = er.agg(max(col("m")).as("m"),
        round(avg(col("y")), 9).as("b0"),
        round(sum(col("y") * (col("i") - 1))
          / (max(col("m")) * (max(col("m")) - 1.0)), 9).as("b1"))
      val fit = pw.select(col("m"), col("b0").as("l1"),
        (lit(2) * col("b1") - col("b0")).as("l2"))
        .select(col("m"), col("l1"), col("l2"),
          (col("l1") / col("l2") - 2.0).as("k"),
          (col("l1") * (col("l1") / col("l2") - 1.0)).as("sigma"))
      fit.crossJoin(broadcast(th))
        .select(col("u").as("threshold"), col("m").as("n_exceed"),
          round(col("k"), 6).as("shape_k"),
          round(col("sigma"), 2).as("sigma"),
          round(col("sigma") * (lit(1.0) - pow(lit(0.01), col("k")))
            / col("k"), 2).as("p99_excess"),
          round(col("u") + col("sigma")
            * (lit(1.0) - pow(lit(0.01), col("k"))) / col("k"), 2)
            .as("return_level"))
    },

    // GPD through Spark's SQL parser — same shared text.
    QDef("x_sql_gpd", GpdSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(GpdSql)
    },

    // COPULA CORRELATION: rank-transform to uniform, Φ⁻¹ to normal
    // scores, Pearson on the scores — the dependence measure invariant
    // to monotone marginal transforms; released beside raw Pearson so
    // the gap is the nonlinearity diagnostic.
    QDef("x_copula_corr", CopulaSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).cast("double").as("x"),
          round(sum(col("o_totalprice")), 2).as("y"))
      def mid(c: String) = {
        val le = count(lit(1)).over(Window.orderBy(c)
          .rangeBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double")
        val ge = count(lit(1)).over(Window.orderBy(col(c).desc)
          .rangeBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double")
        val n = count(lit(1)).over(Window.partitionBy()).cast("double")
        (le + n - ge + 1.0) / 2
      }
      val rk = cal.select(col("x"), col("y"), mid("x").as("rx"),
        mid("y").as("ry"),
        count(lit(1)).over(Window.partitionBy()).cast("double").as("n"))
      val uu = rk.select(col("x"), col("y"), col("n"),
        (col("rx") / (col("n") + 1.0)).as("ux"),
        (col("ry") / (col("n") + 1.0)).as("uy"))
      val sc = uu.select(col("x"), col("y"), col("n"),
        expr(R42Ops.normInvSql("ux")).as("zx"),
        expr(R42Ops.normInvSql("uy")).as("zy"))
      val mo = sc.agg(max(col("n")).as("n"), sum(col("zx")).as("sx"),
        sum(col("zy")).as("sy"), sum(col("zx") * col("zy")).as("sxy"),
        sum(col("zx") * col("zx")).as("sxx"),
        sum(col("zy") * col("zy")).as("syy"),
        sum(col("x")).as("vx"), sum(col("y")).as("vy"),
        sum(col("x") * col("y")).as("vxy"),
        sum(col("x") * col("x")).as("vxx"),
        sum(col("y") * col("y")).as("vyy"))
      mo.select(col("n").cast("bigint").as("n_days"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("copula_corr"),
        round((col("n") * col("vxy") - col("vx") * col("vy"))
          / sqrt((col("n") * col("vxx") - col("vx") * col("vx"))
            * (col("n") * col("vyy") - col("vy") * col("vy"))), 6)
          .as("pearson_corr"))
    },

    // Copula correlation through Spark's SQL parser — same shared text.
    QDef("x_sql_copula", CopulaSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(CopulaSql)
    },

    // TRANSFER ENTROPY: directed information flow between the two
    // direction series — all conditionals are exact integer-count
    // ratios from ONE 16-cell collapse; the asymmetry is the causal
    // signal the symmetric measures can't see.
    QDef("x_transfer_entropy", TeSql) { (s, d) =>
      val w = Window.orderBy("d")
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).as("c"), round(sum(col("o_totalprice")), 2)
          .as("r"))
      val xt = when(col("c") > lag(col("c"), 1).over(w), 1).otherwise(0)
      val yt = when(col("r") > lag(col("r"), 1).over(w), 1).otherwise(0)
      val dir = cal.select(col("d"), xt.as("xt"), yt.as("yt"),
        lag(xt, 1).over(w).as("x1"), lag(yt, 1).over(w).as("y1"),
        row_number().over(w).as("rn"))
      val jc = dir.filter(col("rn") >= 3)
        .groupBy("xt", "yt", "x1", "y1").agg(count(lit(1)).as("c"))
      def m(cols: String*) = sum(col("c"))
        .over(Window.partitionBy(cols.map(col): _*)).cast("bigint")
      val mg = jc.select(col("xt"), col("yt"), col("x1"), col("y1"),
        col("c"),
        sum(col("c")).over(Window.partitionBy()).cast("bigint").as("nn"),
        m("xt", "x1", "y1").as("c_xt_x1y1"), m("x1", "y1").as("c_x1y1"),
        m("xt", "x1").as("c_xt_x1"), m("x1").as("c_x1"),
        m("yt", "x1", "y1").as("c_yt_x1y1"), m("yt", "y1").as("c_yt_y1"),
        m("y1").as("c_y1"))
      val te = mg.agg(max(col("nn")).as("n"),
        sum(col("c").cast("double") / col("nn")
          * log((col("c_xt_x1y1").cast("double") / col("c_x1y1"))
            / (col("c_xt_x1").cast("double") / col("c_x1")))).as("te_yx"),
        sum(col("c").cast("double") / col("nn")
          * log((col("c_yt_x1y1").cast("double") / col("c_x1y1"))
            / (col("c_yt_y1").cast("double") / col("c_y1")))).as("te_xy"))
      te.select(col("n").cast("bigint").as("n"),
        round(col("te_yx"), 6).as("te_y_to_x"),
        round(col("te_xy"), 6).as("te_x_to_y"),
        round(col("te_yx") - col("te_xy"), 6).as("te_asymmetry"))
    },

    // TE through Spark's SQL parser — same shared text.
    QDef("x_sql_te", TeSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(TeSql)
    },

    // DTW: the classic elastic profile distance — the corpus collapses
    // to 24 (segment × month) cells; the 12×12 DP runs driver-side on
    // the collected bounded profile (the x_als_factor pinned-artifact
    // posture) with arithmetic identical to the oracle's unrolled
    // lateral-alias CTEs.
    QDef("x_dtw_profile", DtwSql) { (s, d) =>
      val t = Tables(s, d)
      val seg = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy(col("c_mktsegment").as("g"),
          month(col("o_orderdate")).cast("int").as("mn"))
        .agg(round(avg(col("o_totalprice")), 6).as("m"))
      val norm = seg.select(col("g"), col("mn"),
        round(col("m") / avg(col("m")).over(Window.partitionBy("g")), 6)
          .as("p"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      def profile(g: String): Array[Double] =
        norm.filter(_._1 == g).sortBy(_._2).map(_._3)
      val (a, b) = (profile("BUILDING"), profile("MACHINERY"))
      val w = 12
      // the oracle's DP row by row: d(1,j) prefix, then
      // d(i,j) = c + least(up, diag, left)
      var prev = Array.tabulate(w)(j =>
        (0 to j).map(k => math.abs(a(0) - b(k))).sum)
      for (i <- 1 until w) {
        val cur = new Array[Double](w)
        cur(0) = math.abs(a(i) - b(0)) + prev(0)
        for (j <- 1 until w)
          cur(j) = math.abs(a(i) - b(j)) +
            math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
        prev = cur
      }
      val dtw = prev(w - 1)
      val rnd = (v: Double, p: Int) => BigDecimal(v).setScale(p,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      import s.implicits._
      Seq((rnd(dtw, 6), rnd(dtw / (2 * w - 1), 6)))
        .toDF("dtw_distance", "dtw_per_step")
    },

    // DTW through Spark's SQL parser — same shared text (the unrolled
    // lateral-alias DP). Spark resolves ONE lateral-alias level per
    // analyzer iteration, so the 12-deep within-row chains across 12
    // unrolled rows exceed the default 100-iteration fixpoint budget;
    // raise it for this one analysis (the fixpoint exits early once
    // resolved — the knob adds no cost) and restore.
    QDef("x_sql_dtw", DtwSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      val k = "spark.sql.analyzer.maxIterations"
      val prev = s.conf.getOption(k)
      s.conf.set(k, "2000")
      try s.sql(DtwSql)
      finally prev match {
        case Some(v) => s.conf.set(k, v)
        case None    => s.conf.unset(k)
      }
    },

    // PAGE'S L: the ordered-alternative sharpening of Friedman — same
    // cell machinery, treatment index j weights the rank sums, closed
    // normal approximation.
    QDef("x_page_l", PageSql) { (s, d) =>
      val oc = Tables(s, d).orders.select(
        month(col("o_orderdate")).cast("int").as("b"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("j"),
        col("o_totalprice").as("v"))
      val cells = oc.groupBy("b", "j").agg(round(avg(col("v")), 6).as("m"))
      val r = cells.as("a")
        .join(cells.as("c2"), col("a.b") === col("c2.b"))
        .groupBy(col("a.b"), col("a.j"))
        .agg((sum(when(col("c2.m") < col("a.m"), 1.0)
          .when(col("c2.m") === col("a.m"), 0.5).otherwise(0.0))
          + 0.5).as("rk"))
      val rs = r.groupBy(col("j")).agg(sum(col("rk")).as("rj"))
      val dims = cells.agg(
        countDistinct(col("b")).cast("double").as("n"),
        countDistinct(col("j")).cast("double").as("k"))
      val l = rs.agg(sum(col("j") * col("rj")).as("lstat"))
      l.crossJoin(broadcast(dims))
        .select(col("n").cast("bigint").as("n_blocks"),
          col("k").cast("bigint").as("n_treatments"),
          round(col("lstat"), 1).as("page_l"),
          round((col("lstat") - col("n") * col("k") * (col("k") + 1)
            * (col("k") + 1) / 4.0)
            / sqrt(col("n") * col("k") * col("k") * (col("k") + 1)
              * (col("k") * col("k") - 1) / 144.0), 4).as("z"))
    },

    // Page through Spark's SQL parser — same shared text.
    QDef("x_sql_page", PageSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(PageSql)
    },

    // SEASONAL MANN-KENDALL: the deseasonalized trend test — pairwise
    // signs within each calendar month across years (equi-join on the
    // month key, so the pair stage partitions and scales out even at
    // many seasons × years).
    QDef("x_seasonal_mk", SmkSql) { (s, d) =>
      val mo = Tables(s, d).orders
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"),
          month(col("o_orderdate")).cast("int").as("mn"))
        .agg(round(sum(col("o_totalprice")), 2).as("v"))
      val pairs = mo.as("a")
        .join(mo.as("b"),
          col("a.mn") === col("b.mn") && col("a.yr") < col("b.yr"))
        .select(when(col("b.v") > col("a.v"), 1)
          .when(col("b.v") < col("a.v"), -1).otherwise(0).as("sg"))
      val s1 = pairs.agg(sum(col("sg")).cast("double").as("s"))
      val vv = mo.groupBy("mn").agg(count(lit(1)).as("n"))
        .agg((sum(col("n").cast("double") * (col("n") - 1)
          * (lit(2) * col("n") + 5)) / 18.0).as("vars"),
          sum(col("n")).cast("bigint").as("n_obs"))
      s1.crossJoin(broadcast(vv))
        .select(col("n_obs"), col("s").cast("bigint").as("s_stat"),
          round(col("vars"), 2).as("var_s"),
          round(when(col("s") > 0, (col("s") - 1) / sqrt(col("vars")))
            .when(col("s") < 0, (col("s") + 1) / sqrt(col("vars")))
            .otherwise(0.0), 4).as("z"))
    },

    // Seasonal MK through Spark's SQL parser — same shared text.
    QDef("x_sql_smk", SmkSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(SmkSql)
    })
}
