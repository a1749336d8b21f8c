package graft.queries

import graft.{QDef, Tables}
import graft.ops.BinnedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-33 batch: survival/robust/epidemiology statistics — Cox
  * proportional hazards (Breslow ties, binary covariate), two-sample
  * Anderson-Darling, binned Huber IRLS regression, Bowker's symmetry
  * test, Mantel-Haenszel pooled odds ratio, Breusch-Pagan
  * heteroscedasticity, the Chow structural-break test, and a
  * zero-inflation regime diagnostic.
  *
  * Scale posture, same as R30/R31: the corpus contributes one or two
  * grouped/moment aggregates; iterative fits (Newton on the Cox partial
  * likelihood, IRLS rounds) run on BOUNDED frames (duration-horizon,
  * value-domain histograms) with fixed unrolled iteration counts and a
  * 9 dp parameter snap per round; rank machinery rides BinnedRank (the
  * new multi-measure variant — AD needs the group AND combined
  * cumulatives from ONE shuffle).
  */
object R33Ops {

  // ---- Cox proportional hazards (binary covariate, Breslow ties) ----

  /** Cox PH oracle (DuckDB dialect; MATERIALIZED — `ev` is read by every
    * Newton step, and inlining would replay the corpus chain per step).
    * Cohort z = user_id % 2; duration/event definitions shared verbatim
    * with x_survival_km. With a binary covariate the partial-likelihood
    * score and information are closed forms of the per-duration frame
    * (d, dz, n0, n1): U = Σ dz − d·n1e^β/(n0+n1e^β),
    * I = Σ d·n0n1e^β/(n0+n1e^β)². */
  private[queries] val CoxPhSql = {
    val steps = (1 to 3).map { i =>
      s"""g$i AS (SELECT
         |  sum(dz - d * n1 * exp(b${i - 1}.b) / (n0 + n1 * exp(b${i - 1}.b)))
         |    AS u,
         |  sum(d * n0 * n1 * exp(b${i - 1}.b)
         |    / ((n0 + n1 * exp(b${i - 1}.b)) * (n0 + n1 * exp(b${i - 1}.b))))
         |    AS i
         |  FROM ev, b${i - 1}),
         |b$i AS (SELECT round(b${i - 1}.b + g$i.u / g$i.i, 9) AS b
         |  FROM b${i - 1}, g$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS MATERIALIZED (SELECT user_id, min(ts) AS t0 FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |p AS MATERIALIZED (SELECT user_id, min(ts) AS t1 FROM events
       |  WHERE event_type = 'purchase' GROUP BY 1),
       |obs AS (SELECT max(ts) AS tmax FROM events),
       |su AS MATERIALIZED (
       |  SELECT s.user_id, CAST(s.user_id % 2 AS BIGINT) AS z,
       |    CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0
       |      THEN CAST(date_diff('hour', s.t0, p.t1) AS BIGINT)
       |      ELSE CAST(date_diff('hour', s.t0, obs.tmax) AS BIGINT) END
       |      AS dur,
       |    CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0 THEN 1 ELSE 0 END
       |      AS ev
       |  FROM s LEFT JOIN p ON p.user_id = s.user_id, obs),
       |dr AS MATERIALIZED (SELECT dur AS t,
       |  CAST(sum(ev) AS BIGINT) AS d, CAST(sum(ev * z) AS BIGINT) AS dz,
       |  CAST(sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
       |  CAST(sum(z) AS BIGINT) AS c1
       |  FROM su GROUP BY 1),
       |rs AS MATERIALIZED (SELECT t, d, dz,
       |  CAST(sum(c0) OVER (ORDER BY t
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
       |    AS n0,
       |  CAST(sum(c1) OVER (ORDER BY t
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
       |    AS n1
       |  FROM dr),
       |ev AS MATERIALIZED (SELECT * FROM rs WHERE d > 0),
       |b0 AS (SELECT 0.0e0 AS b),
       |$steps,
       |gf AS (SELECT
       |  sum(d * n0 * n1 * exp(b3.b)
       |    / ((n0 + n1 * exp(b3.b)) * (n0 + n1 * exp(b3.b)))) AS i
       |  FROM ev, b3),
       |ne AS (SELECT CAST(sum(d) AS BIGINT) AS n_events FROM ev)
       |SELECT round(b3.b, 6) AS beta, round(exp(b3.b), 6) AS hazard_ratio,
       |  ne.n_events, round(1 / sqrt(gf.i), 6) AS se
       |FROM b3, gf, ne""".stripMargin
  }

  // ---- two-sample Anderson-Darling ----

  /** Two-sample Anderson-Darling as ONE portable SQL text — oracle of
    * `x_anderson_darling` and whole query of the `x_sql_ad` twin.
    * Scholz-Stephens right-continuous form on the joint distinct-value
    * histogram; for TWO samples the per-sample numerators coincide
    * ((N·A₂ − n₂·H) = −(N·A₁ − n₁·H)), so A² = S/(n₁·n₂) with one term
    * sum S. Inclusive cumulatives ride the CliffsSql two-level binned
    * prefix; products go DOUBLE before squaring (N·A ~ n² overflows
    * BIGINT when squared at scale). */
  private[queries] val AndersonDarlingSql =
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
      |  sum(c * (CAST(nn AS DOUBLE) * a1 - CAST(n1 AS DOUBLE) * h)
      |        * (CAST(nn AS DOUBLE) * a1 - CAST(n1 AS DOUBLE) * h)
      |      / (CAST(h AS DOUBLE) * (nn - h))) AS s
      |  FROM cum CROSS JOIN tot WHERE h < nn)
      |SELECT tot.n1, tot.nn - tot.n1 AS n2,
      |  round(terms.s / (CAST(tot.n1 AS DOUBLE) * (tot.nn - tot.n1)), 6)
      |    AS a2
      |FROM terms CROSS JOIN tot""".stripMargin

  // ---- binned Huber IRLS regression ----

  /** Corpus half: the 2-D (quantity, 0.1k$-snapped price) histogram —
    * value-domain bounded (50 quantities × ~1000 price bins saturating
    * under data growth). */
  private[queries] val HuberHistCtes =
    """hraw AS (SELECT l_quantity AS x, l_extendedprice / 1000.0e0 AS y
      |  FROM lineitem),
      |hist AS (SELECT x, round(y, 1) AS yb, CAST(count(*) AS BIGINT) AS n
      |  FROM hraw GROUP BY 1, 2)""".stripMargin

  /** One IRLS round given params a,b from `$prev`: Huber weights
    * w = min(1, k/|r|) with k = 5 (k$ units), closed weighted-least-
    * squares solve, 9 dp snap. */
  private def huberRound(i: Int): String = {
    val p = s"hb${i - 1}"
    val r = s"(hist.yb - $p.a - $p.b * hist.x)"
    val w = s"(CASE WHEN abs($r) <= 5.0e0 THEN 1.0e0 ELSE 5.0e0 / abs($r) END)"
    s"""hw$i AS (SELECT
       |  sum(n * $w) AS sw, sum(n * $w * hist.x) AS swx,
       |  sum(n * $w * hist.yb) AS swy,
       |  sum(n * $w * hist.x * hist.x) AS swxx,
       |  sum(n * $w * hist.x * hist.yb) AS swxy
       |  FROM hist, $p),
       |hb$i AS (SELECT
       |  round((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 9) AS b,
       |  round((swy - (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
       |    * swx) / sw, 9) AS a
       |  FROM hw$i)""".stripMargin
  }

  /** Fit half over a relation named `hist`: OLS init, 3 IRLS rounds, and
    * the downweighted-mass share at the final parameters. */
  private[queries] val HuberFitBody = {
    val rounds = (1 to 3).map(huberRound).mkString(",\n")
    s"""h0 AS (SELECT sum(CAST(n AS DOUBLE)) AS sw, sum(n * x) AS swx,
       |  sum(n * yb) AS swy, sum(n * x * x) AS swxx, sum(n * x * yb) AS swxy
       |  FROM hist),
       |hb0 AS (SELECT
       |  round((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 9) AS b,
       |  round((swy - (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
       |    * swx) / sw, 9) AS a
       |  FROM h0),
       |$rounds,
       |mass AS (SELECT
       |  sum(n * (1 - (CASE WHEN abs(hist.yb - hb3.a - hb3.b * hist.x)
       |      <= 5.0e0 THEN 1.0e0
       |    ELSE 5.0e0 / abs(hist.yb - hb3.a - hb3.b * hist.x) END)))
       |    / sum(CAST(n AS DOUBLE)) AS dwm,
       |  CAST(sum(n) AS BIGINT) AS n_obs,
       |  CAST(count(*) AS BIGINT) AS n_bins
       |  FROM hist, hb3)
       |SELECT round(hb3.a, 6) AS intercept, round(hb3.b, 6) AS slope,
       |  mass.n_obs, mass.n_bins, round(mass.dwm, 6) AS downweighted_mass
       |FROM hb3, mass""".stripMargin
  }

  /** Binned Huber regression as ONE portable SQL text — oracle of
    * `x_huber_irls` and whole query of the `x_sql_huber` twin. */
  private[queries] val HuberSql =
    s"""WITH $HuberHistCtes,
       |$HuberFitBody""".stripMargin

  // ---- Bowker symmetry test ----

  /** Bowker's test of symmetry as ONE portable SQL text — oracle of
    * `x_bowker` and whole query of the `x_sql_bowker` twin. Paired
    * categorical = each user's (first, last) event type, made
    * deterministic under timestamp ties by the (ts, event_id) row_number
    * (user-partitioned windows — scale-safe); χ² = Σ_{i<j}
    * (n_ij−n_ji)²/(n_ij+n_ji) over the K×K contingency. */
  private[queries] val BowkerSql =
    """WITH fl AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rf,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rl
      |  FROM events),
      |f AS (SELECT user_id, event_type AS ft FROM fl WHERE rf = 1),
      |l AS (SELECT user_id, event_type AS lt FROM fl WHERE rl = 1),
      |ct AS (SELECT ft, lt, CAST(count(*) AS BIGINT) AS n
      |  FROM f JOIN l USING (user_id) GROUP BY 1, 2),
      |pp AS (SELECT
      |    CASE WHEN ft < lt THEN ft ELSE lt END AS i,
      |    CASE WHEN ft < lt THEN lt ELSE ft END AS j,
      |    CAST(sum(CASE WHEN ft < lt THEN n ELSE 0 END) AS BIGINT) AS nij,
      |    CAST(sum(CASE WHEN ft > lt THEN n ELSE 0 END) AS BIGINT) AS nji
      |  FROM ct WHERE ft <> lt GROUP BY 1, 2)
      |SELECT round(sum((nij - nji) * (nij - nji)
      |    / CAST(nij + nji AS DOUBLE)), 6) AS chi2,
      |  CAST(count(*) AS BIGINT) AS df
      |FROM pp""".stripMargin

  // ---- Mantel-Haenszel pooled odds ratio ----

  /** Mantel-Haenszel pooled odds ratio as ONE portable SQL text — oracle
    * of `x_mh_odds` and whole query of the `x_sql_mh` twin. Strata =
    * market segment; one grouped indicator pass to the 5×(2×2) frame;
    * OR_MH = Σ(a·d/n)/Σ(b·c/n) vs the crude pooled OR (the confounding
    * screen: MH ≠ crude ⇒ the strata matter). */
  private[queries] val MhOddsSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g,
      |    CASE WHEN o.o_totalprice > 200000 THEN 1 ELSE 0 END AS e,
      |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |st AS (SELECT g,
      |  CAST(sum(e * y) AS BIGINT) AS a,
      |  CAST(sum(e * (1 - y)) AS BIGINT) AS b,
      |  CAST(sum((1 - e) * y) AS BIGINT) AS c,
      |  CAST(sum((1 - e) * (1 - y)) AS BIGINT) AS dd,
      |  CAST(count(*) AS BIGINT) AS n
      |  FROM oc GROUP BY 1),
      |mh AS (SELECT
      |  sum(a * dd / CAST(n AS DOUBLE)) AS num,
      |  sum(b * c / CAST(n AS DOUBLE)) AS den,
      |  CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
      |  CAST(sum(c) AS BIGINT) AS sc, CAST(sum(dd) AS BIGINT) AS sdd,
      |  CAST(count(*) AS BIGINT) AS k
      |  FROM st)
      |SELECT round(num / den, 6) AS or_mh,
      |  round(sa * CAST(sdd AS DOUBLE) / (CAST(sb AS DOUBLE) * sc), 6)
      |    AS crude_or,
      |  k
      |FROM mh""".stripMargin

  // ---- Breusch-Pagan heteroscedasticity test ----

  /** Breusch-Pagan as ONE portable SQL text — oracle of
    * `x_breusch_pagan`. Two corpus passes by construction: pass 1 fits
    * OLS (snapped 9 dp), pass 2 folds the squared residuals against the
    * regressor (LM = n·R² of the u² ~ x auxiliary regression). */
  private[queries] val BreuschPaganSql =
    """WITH m AS (SELECT
      |  covar_samp(l_quantity, l_extendedprice / 100000.0e0)
      |    / var_samp(l_quantity) AS braw,
      |  avg(l_extendedprice / 100000.0e0) AS my, avg(l_quantity) AS mx
      |  FROM lineitem),
      |ab AS (SELECT round(braw, 9) AS b,
      |  round(my - braw * mx, 9) AS a FROM m),
      |aux AS (SELECT
      |  CAST(count(*) AS BIGINT) AS n,
      |  covar_samp((l_extendedprice / 100000.0e0 - ab.a
      |      - ab.b * l_quantity)
      |    * (l_extendedprice / 100000.0e0 - ab.a - ab.b * l_quantity),
      |    l_quantity) AS cu2x,
      |  var_samp((l_extendedprice / 100000.0e0 - ab.a - ab.b * l_quantity)
      |    * (l_extendedprice / 100000.0e0 - ab.a - ab.b * l_quantity))
      |    AS vu2,
      |  var_samp(l_quantity) AS vx
      |  FROM lineitem CROSS JOIN ab)
      |SELECT n, round(cu2x * cu2x / (vu2 * vx), 6) AS r2_aux,
      |  round(n * cu2x * cu2x / (vu2 * vx), 4) AS lm_stat
      |FROM aux""".stripMargin

  // ---- Chow structural-break test ----

  /** Chow test as ONE portable SQL text — oracle of `x_chow_test`. One
    * grouped moment pass split at the 1997 ship-year; per-regime and
    * pooled SSRs in closed form from the 2-row frame (centered stats
    * snapped 6 dp before the algebra). */
  private[queries] val ChowSql =
    """WITH grp AS (SELECT
      |  CASE WHEN year(l_shipdate) <= 1997 THEN 0 ELSE 1 END AS s,
      |  l_quantity AS x, l_extendedprice / 1000.0e0 AS y
      |  FROM lineitem),
      |st AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
      |  sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
      |  sum(x * y) AS sxy, sum(y * y) AS syy
      |  FROM grp GROUP BY 1),
      |cg AS (SELECT s, n,
      |  round(sxx - sx * sx / n, 6) AS cxx,
      |  round(sxy - sx * sy / n, 6) AS cxy,
      |  round(syy - sy * sy / n, 6) AS cyy
      |  FROM st),
      |ssr AS (SELECT s, n, round(cyy - cxy * cxy / cxx, 6) AS ssr FROM cg),
      |pool AS (SELECT CAST(sum(n) AS BIGINT) AS n,
      |  round(sum(sxx) - sum(sx) * sum(sx) / sum(n), 6) AS cxx,
      |  round(sum(sxy) - sum(sx) * sum(sy) / sum(n), 6) AS cxy,
      |  round(sum(syy) - sum(sy) * sum(sy) / sum(n), 6) AS cyy
      |  FROM st),
      |parts AS (SELECT
      |  (SELECT round(cyy - cxy * cxy / cxx, 6) FROM pool) AS ssr_p,
      |  sum(ssr.ssr) AS ssr_u, max(pool.n) AS n
      |  FROM ssr CROSS JOIN pool)
      |SELECT round((ssr_p - ssr_u) / 2
      |    / (ssr_u / (n - 4)), 4) AS f_chow,
      |  CAST(n - 4 AS BIGINT) AS df2,
      |  round(ssr_p, 4) AS ssr_pooled, round(ssr_u, 4) AS ssr_split
      |FROM parts""".stripMargin

  // ---- zero-inflation regime diagnostic ----

  /** Zero-inflation diagnostic as ONE portable SQL text — oracle of
    * `x_zero_inflation`. (user × active-day) purchase-count cells with
    * zeros recovered ALGEBRAICALLY from the totals (n_cells = users×days
    * — the spine is never materialized, the 100 TB-safe form); ZIP
    * moment estimates λ = v/m + m − 1, π = 1 − m/λ and a CASE verdict —
    * on under-dispersed data π comes out negative and the verdict says
    * so (a diagnostic, not a fit). */
  private[queries] val ZeroInflationSql =
    """WITH nd AS (SELECT
      |  CAST(count(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
      |    AS days,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS users
      |  FROM events),
      |pc AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
      |  CAST(count(*) AS BIGINT) AS c
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |sm AS (SELECT CAST(count(*) AS BIGINT) AS nz,
      |  CAST(sum(c) AS BIGINT) AS tot, CAST(sum(c * c) AS BIGINT) AS sq
      |  FROM pc),
      |alg AS (SELECT days * users AS ncells, days * users - nz AS zc,
      |  tot / CAST(days * users AS DOUBLE) AS m,
      |  (sq - days * users
      |      * (tot / CAST(days * users AS DOUBLE))
      |      * (tot / CAST(days * users AS DOUBLE)))
      |    / (days * users - 1) AS v
      |  FROM nd, sm),
      |zip AS (SELECT ncells, zc, m, v, v / m + m - 1 AS lam FROM alg)
      |SELECT CAST(ncells AS BIGINT) AS n_cells, CAST(zc AS BIGINT)
      |    AS zero_cells,
      |  round(m, 6) AS mean_c, round(v, 6) AS var_c,
      |  round(lam, 6) AS lambda_hat, round(1 - m / lam, 6) AS pi_hat,
      |  CASE WHEN 1 - m / lam > 0.01 THEN 'zero-inflated'
      |    WHEN v / m < 0.95 THEN 'underdispersed'
      |    ELSE 'poisson-like' END AS verdict
      |FROM zip""".stripMargin

  private def snap9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Lazy localCheckpoint — the Dedup.pin posture (materialize once on
    * first action, reuse across the fit's driver-side steps). */
  private def pin(df: org.apache.spark.sql.DataFrame) =
    df.localCheckpoint(eager = false)

  val defs: Seq[QDef] = Seq(

    // COX PROPORTIONAL HAZARDS: does cohort membership (z = user_id % 2)
    // change the signup→purchase hazard. The corpus collapses to the
    // duration-horizon frame (the x_survival_km histogram + reverse
    // cumulative risk sets by cohort); 3 Newton steps on the collected
    // bounded frame (driver-side, pinned-training pattern) with a 9 dp
    // snap; releases beta, the hazard ratio, and the information-based SE.
    QDef("x_cox_ph", CoxPhSql) { (s, d) =>
      val ev = Tables(s, d).events
      def hourOf(c: org.apache.spark.sql.Column) =
        graft.functions.TimeCols.eventMicros(date_trunc("hour", c)) / 3600000000L
      val s0 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t0"))
      val p1 = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val obs = ev.agg(max(col("ts")).as("tmax"))
      val converted = col("t1").isNotNull && col("t1") >= col("t0")
      val su = s0.join(p1, Seq("user_id"), "left")
        .crossJoin(broadcast(obs))
        .select((col("user_id") % 2).cast("long").as("z"),
          when(converted, hourOf(col("t1")) - hourOf(col("t0")))
            .otherwise(hourOf(col("tmax")) - hourOf(col("t0")))
            .cast("long").as("dur"),
          when(converted, 1L).otherwise(0L).as("ev"))
      val dr = su.groupBy(col("dur").as("t")).agg(
        sum(col("ev")).as("d"), sum(col("ev") * col("z")).as("dz"),
        sum(when(col("z") === 0, 1L).otherwise(0L)).as("c0"),
        sum(col("z")).as("c1"))
      // duration-horizon frame: the reverse-cumulative windows order
      // <= horizon-hours rows (the x_survival_km carve-out class)
      val atRisk = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val rs = dr
        .withColumn("n0", sum(col("c0")).over(atRisk))
        .withColumn("n1", sum(col("c1")).over(atRisk))
        .filter(col("d") > 0)
        .select("d", "dz", "n0", "n1")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      var beta = 0.0
      for (_ <- 1 to 3) {
        var (u, i) = (0.0, 0.0)
        for ((dd, dz, n0, n1) <- rs) {
          val eb = math.exp(beta)
          u += dz - dd * n1 * eb / (n0 + n1 * eb)
          i += dd * n0 * n1 * eb / ((n0 + n1 * eb) * (n0 + n1 * eb))
        }
        beta = snap9(beta + u / i)
      }
      val iFinal = rs.map { case (dd, _, n0, n1) =>
        val eb = math.exp(beta)
        dd * n0 * n1 * eb / ((n0 + n1 * eb) * (n0 + n1 * eb))
      }.sum
      import s.implicits._
      Seq((beta, rs.map(_._1).sum, iFinal)).toDF("b", "ne", "i")
        .select(round(col("b"), 6).as("beta"),
          round(exp(col("b")), 6).as("hazard_ratio"),
          col("ne").as("n_events"),
          round(lit(1) / sqrt(col("i")), 6).as("se"))
    },

    // TWO-SAMPLE ANDERSON-DARLING: the tail-sensitive complement of
    // x_ks_test on the same segment pair. ONE joint histogram aggregate;
    // both inclusive cumulatives (group + combined) come from a SINGLE
    // BinnedRank multi-measure pass (one shuffle); term products go
    // DOUBLE before squaring (BIGINT would overflow at scale).
    QDef("x_anderson_darling", AndersonDarlingSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val hist = oc.groupBy("v").agg(
        sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("c"))
      val cum = BinnedRank.belowAndNMany(hist, Seq.empty,
        floor(col("v") / lit(1000)).cast("bigint"), Seq(col("v")),
        Seq("1" -> col("c1"), "c" -> col("c")))
        .select(col("c"),
          (col("below1") + col("c1")).as("a1"),
          (col("belowc") + col("c")).as("h"),
          col("n1"), col("nc").as("nn"))
      cum.filter(col("h") < col("nn"))
        .agg(max(col("n1")).as("n1"), max(col("nn")).as("nn"),
          sum(col("c")
            * (col("nn").cast("double") * col("a1")
              - col("n1").cast("double") * col("h"))
            * (col("nn").cast("double") * col("a1")
              - col("n1").cast("double") * col("h"))
            / (col("h").cast("double") * (col("nn") - col("h")))).as("s"))
        .select(col("n1"), (col("nn") - col("n1")).as("n2"),
          round(col("s") / (col("n1").cast("double")
            * (col("nn") - col("n1"))), 6).as("a2"))
    },

    // AD through Spark's SQL parser — same shared text (the parsed plan
    // carries the oracle's two-level bin windows).
    QDef("x_sql_ad", AndersonDarlingSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(AndersonDarlingSql)
    },

    // BINNED HUBER IRLS: robust price ~ quantity regression — OLS init,
    // 3 IRLS rounds with Huber weights (k = 5 k$) on the value-domain-
    // bounded 2-D histogram, closed weighted solves, 9 dp snap per round;
    // releases the downweighted-mass share (how much the data pulled
    // against the robust line).
    QDef("x_huber_irls", HuberSql) { (s, d) =>
      val hist = pin(Tables(s, d).lineitem
        .select(col("l_quantity").as("x"),
          (col("l_extendedprice") / 1000.0).as("y"))
        .groupBy(col("x"), round(col("y"), 1).as("yb"))
        .agg(count(lit(1)).as("n")))
      def wls(w: org.apache.spark.sql.Column) = hist.agg(
        sum(col("n") * w).as("sw"),
        sum(col("n") * w * col("x")).as("swx"),
        sum(col("n") * w * col("yb")).as("swy"),
        sum(col("n") * w * col("x") * col("x")).as("swxx"),
        sum(col("n") * w * col("x") * col("yb")).as("swxy")).head()
      def solve(r: org.apache.spark.sql.Row) = {
        val (sw, swx, swy, swxx, swxy) = (r.getDouble(0), r.getDouble(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4))
        val b = snap9((sw * swxy - swx * swy) / (sw * swxx - swx * swx))
        (snap9((swy - (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
          * swx) / sw), b)
      }
      var (a, b) = solve(wls(lit(1.0).cast("double")))
      def wCol(a0: Double, b0: Double) = {
        val r = col("yb") - lit(a0) - lit(b0) * col("x")
        when(abs(r) <= 5.0, 1.0).otherwise(lit(5.0) / abs(r))
      }
      for (_ <- 1 to 3) {
        val p = solve(wls(wCol(a, b)))
        a = p._1; b = p._2
      }
      hist.agg(
        (sum(col("n") * (lit(1) - wCol(a, b)))
          / sum(col("n").cast("double"))).as("dwm"),
        sum(col("n")).as("n_obs"), count(lit(1)).as("n_bins"))
        .select(round(lit(a), 6).as("intercept"),
          round(lit(b), 6).as("slope"), col("n_obs"), col("n_bins"),
          round(col("dwm"), 6).as("downweighted_mass"))
    },

    // Huber through Spark's SQL parser — the 2-D histogram materializes
    // once behind a temp view (every IRLS round re-reads it and Spark
    // re-evaluates multiply-referenced CTEs); fit half verbatim.
    QDef("x_sql_huber", HuberSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(s"""WITH ${R33Ops.HuberHistCtes}
               |SELECT x, yb, n FROM hist""".stripMargin)
        .transform(SqlSurface.materialized("hist"))
      s.sql(s"WITH ${R33Ops.HuberFitBody}")
    },

    // BOWKER'S SYMMETRY TEST: is the user journey's (first, last)
    // event-type transition matrix symmetric. Deterministic endpoints via
    // user-partitioned (ts, event_id) row_numbers; chi-square on the
    // folded K×K contingency, all counts BIGINT until the released ratio.
    QDef("x_bowker", BowkerSql) { (s, d) =>
      val ev = Tables(s, d).events
      val wf = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val wl = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val fl = ev.select(col("user_id"), col("event_type"),
        row_number().over(wf).as("rf"), row_number().over(wl).as("rl"))
      val f = fl.filter(col("rf") === 1)
        .select(col("user_id"), col("event_type").as("ft"))
      val l = fl.filter(col("rl") === 1)
        .select(col("user_id"), col("event_type").as("lt"))
      val ct = f.join(l, Seq("user_id"))
        .groupBy("ft", "lt").agg(count(lit(1)).as("n"))
      ct.filter(col("ft") =!= col("lt"))
        .groupBy(
          when(col("ft") < col("lt"), col("ft")).otherwise(col("lt")).as("i"),
          when(col("ft") < col("lt"), col("lt")).otherwise(col("ft")).as("j"))
        .agg(sum(when(col("ft") < col("lt"), col("n")).otherwise(0L))
          .as("nij"),
          sum(when(col("ft") > col("lt"), col("n")).otherwise(0L))
            .as("nji"))
        .agg(round(sum((col("nij") - col("nji")) * (col("nij") - col("nji"))
          / (col("nij") + col("nji")).cast("double")), 6).as("chi2"),
          count(lit(1)).as("df"))
    },

    // Bowker through Spark's SQL parser, same shared text.
    QDef("x_sql_bowker", BowkerSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(BowkerSql)
    },

    // MANTEL-HAENSZEL POOLED ODDS RATIO: the stratified confounding
    // screen — high-price exposure vs finished-status outcome pooled
    // across market segments. ONE grouped indicator pass to the 5×(2×2)
    // frame; MH weights and the crude OR from the same bounded frame.
    QDef("x_mh_odds", MhOddsSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"),
          when(col("o_totalprice") > 200000, 1L).otherwise(0L).as("e"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val st = oc.groupBy("g").agg(
        sum(col("e") * col("y")).as("a"),
        sum(col("e") * (lit(1) - col("y"))).as("b"),
        sum((lit(1) - col("e")) * col("y")).as("c"),
        sum((lit(1) - col("e")) * (lit(1) - col("y"))).as("dd"),
        count(lit(1)).as("n"))
      st.agg(
        sum(col("a") * col("dd") / col("n").cast("double")).as("num"),
        sum(col("b") * col("c") / col("n").cast("double")).as("den"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("c")).as("sc"), sum(col("dd")).as("sdd"),
        count(lit(1)).as("k"))
        .select(round(col("num") / col("den"), 6).as("or_mh"),
          round(col("sa") * col("sdd").cast("double")
            / (col("sb").cast("double") * col("sc")), 6).as("crude_or"),
          col("k"))
    },

    // MH through Spark's SQL parser, same shared text.
    QDef("x_sql_mh", MhOddsSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(MhOddsSql)
    },

    // BREUSCH-PAGAN: does residual variance move with the regressor.
    // Two corpus passes by construction (fit, then the u²~x fold with the
    // snapped coefficients folded in scan-local) — LM = n·R²_aux.
    QDef("x_breusch_pagan", BreuschPaganSql) { (s, d) =>
      val li = Tables(s, d).lineitem
      val m = li.agg(
        (covar_samp(col("l_quantity"), col("l_extendedprice") / 100000.0)
          / var_samp(col("l_quantity"))).as("braw"),
        avg(col("l_extendedprice") / 100000.0).as("my"),
        avg(col("l_quantity")).as("mx")).head()
      val b = snap9(m.getDouble(0))
      val a = snap9(m.getDouble(1) - m.getDouble(0) * m.getDouble(2))
      val u2 = (col("l_extendedprice") / 100000.0 - lit(a)
        - lit(b) * col("l_quantity"))
      li.agg(count(lit(1)).as("n"),
        covar_samp(u2 * u2, col("l_quantity")).as("cu2x"),
        var_samp(u2 * u2).as("vu2"),
        var_samp(col("l_quantity")).as("vx"))
        .select(col("n"),
          round(col("cu2x") * col("cu2x") / (col("vu2") * col("vx")), 6)
            .as("r2_aux"),
          round(col("n") * col("cu2x") * col("cu2x")
            / (col("vu2") * col("vx")), 4).as("lm_stat"))
    },

    // CHOW TEST: did the price ~ quantity relationship break at the 1997
    // ship-year boundary. ONE grouped moment pass; per-regime and pooled
    // SSRs in closed form on the snapped 2-row frame.
    QDef("x_chow_test", ChowSql) { (s, d) =>
      val grp = Tables(s, d).lineitem.select(
        when(year(col("l_shipdate")) <= 1997, 0).otherwise(1).as("s"),
        col("l_quantity").as("x"),
        (col("l_extendedprice") / 1000.0).as("y"))
      val st = grp.groupBy("s").agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      val cg = st.select(col("n"),
        round(col("sxx") - col("sx") * col("sx") / col("n"), 6).as("cxx"),
        round(col("sxy") - col("sx") * col("sy") / col("n"), 6).as("cxy"),
        round(col("syy") - col("sy") * col("sy") / col("n"), 6).as("cyy"))
      val ssrU = cg.agg(
        sum(round(col("cyy") - col("cxy") * col("cxy") / col("cxx"), 6))
          .as("ssr_u"))
      val pool = st.agg(sum(col("n")).as("n"),
        round(sum(col("sxx")) - sum(col("sx")) * sum(col("sx"))
          / sum(col("n")), 6).as("cxx"),
        round(sum(col("sxy")) - sum(col("sx")) * sum(col("sy"))
          / sum(col("n")), 6).as("cxy"),
        round(sum(col("syy")) - sum(col("sy")) * sum(col("sy"))
          / sum(col("n")), 6).as("cyy"))
        .select(col("n"),
          round(col("cyy") - col("cxy") * col("cxy") / col("cxx"), 6)
            .as("ssr_p"))
      pool.crossJoin(broadcast(ssrU))
        .select(
          round((col("ssr_p") - col("ssr_u")) / 2
            / (col("ssr_u") / (col("n") - 4)), 4).as("f_chow"),
          (col("n") - 4).cast("bigint").as("df2"),
          round(col("ssr_p"), 4).as("ssr_pooled"),
          round(col("ssr_u"), 4).as("ssr_split"))
    },

    // ZERO-INFLATION DIAGNOSTIC: is the per-(user, day) purchase process
    // ZIP-shaped. Zeros recovered algebraically (n_cells = users × days,
    // no spine materialization — the 100 TB-safe form); ZIP moment
    // estimates + a regime verdict (this fixture is under-dispersed and
    // the verdict says so).
    QDef("x_zero_inflation", ZeroInflationSql) { (s, d) =>
      val ev = Tables(s, d).events
      val nd = ev.agg(
        countDistinct(date_trunc("day", col("ts")).cast("date")).as("days"),
        countDistinct(col("user_id")).as("users"))
      val sm = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date")
          .as("d"))
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("nz"), sum(col("c")).as("tot"),
          sum(col("c") * col("c")).as("sq"))
      val ncells = col("days") * col("users")
      val mC = col("tot") / ncells.cast("double")
      val vC = (col("sq") - ncells * mC * mC) / (ncells - 1)
      val lam = vC / mC + mC - 1
      nd.crossJoin(broadcast(sm))
        .select(ncells.cast("bigint").as("n_cells"),
          (ncells - col("nz")).cast("bigint").as("zero_cells"),
          round(mC, 6).as("mean_c"), round(vC, 6).as("var_c"),
          round(lam, 6).as("lambda_hat"),
          round(lit(1) - mC / lam, 6).as("pi_hat"),
          when(lit(1) - mC / lam > 0.01, "zero-inflated")
            .when(vC / mC < 0.95, "underdispersed")
            .otherwise("poisson-like").as("verdict"))
    }
  )
}
