package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-30 batch: in-database model fitting — GLMs and spectral algebra
  * expressed as the scalable sufficient-statistics pattern. The corpus
  * contributes ONE histogram/moment aggregate; the iterative fit (IRLS /
  * Newton / power iteration) runs on the BOUNDED collapsed frame with a
  * fixed unrolled iteration count and a snapped-coefficient cadence
  * (round 9 dp per round, the x_embed_pca convention), so a DuckDB
  * oracle replays every step bit-stably. This is how a 100 TB GLM
  * actually runs: collapse to sufficient statistics map-side, fit on KBs.
  *
  * Twin posture: the iterative texts reference their collapsed frame
  * once per unrolled step, and Spark re-evaluates multiply-referenced
  * CTEs — so each twin materializes the corpus-scale prefix ONCE behind
  * a `localCheckpoint` temp view (the x_sql_kcore refactor) and runs the
  * fit half verbatim; the oracle text is the same two fragments joined.
  */
object R30Ops {

  // ---- binned logistic regression (URGENT ~ price) ----

  /** One IRLS/Newton step on the price-bin sufficient-stats frame
    * `bins(x, n, yb)`: mu from the previous betas, closed-form 2x2
    * solve, betas snapped at 9 dp. */
  private def logitStep(i: Int): String = {
    val prev = s"b${i - 1}"
    s"""g$i AS (
       |  SELECT
       |    sum(n * (yb / CAST(n AS DOUBLE)
       |      - 1 / (1 + exp(-($prev.b0 + $prev.b1 * x))))) AS g0,
       |    sum(n * x * (yb / CAST(n AS DOUBLE)
       |      - 1 / (1 + exp(-($prev.b0 + $prev.b1 * x))))) AS g1,
       |    sum(n * (1 / (1 + exp(-($prev.b0 + $prev.b1 * x))))
       |      * (1 - 1 / (1 + exp(-($prev.b0 + $prev.b1 * x))))) AS h00,
       |    sum(n * x * (1 / (1 + exp(-($prev.b0 + $prev.b1 * x))))
       |      * (1 - 1 / (1 + exp(-($prev.b0 + $prev.b1 * x))))) AS h01,
       |    sum(n * x * x * (1 / (1 + exp(-($prev.b0 + $prev.b1 * x))))
       |      * (1 - 1 / (1 + exp(-($prev.b0 + $prev.b1 * x))))) AS h11
       |  FROM bins, $prev),
       |b$i AS (
       |  SELECT
       |    round($prev.b0 + (h11 * g0 - h01 * g1)
       |      / (h00 * h11 - h01 * h01), 9) AS b0,
       |    round($prev.b1 + (h00 * g1 - h01 * g0)
       |      / (h00 * h11 - h01 * h01), 9) AS b1
       |  FROM g$i, b${i - 1})""".stripMargin
  }

  /** Corpus half: collapse orders to the price-bin sufficient-stats
    * frame. Shared verbatim by the oracle and the twin's materialized
    * prefix. */
  private[queries] val LogisticBinsCtes =
    """raw AS (
      |  SELECT o_totalprice / 100000.0e0 AS xs,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      |  FROM orders),
      |bins AS (
      |  SELECT CAST(floor(xs * 100) AS BIGINT) AS b,
      |    round(avg(xs), 6) AS x,
      |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS yb
      |  FROM raw GROUP BY 1)""".stripMargin

  /** Fit half: 3 unrolled Newton steps + deviance over a relation named
    * `bins` (a CTE in the oracle; a checkpointed temp view in the twin). */
  private[queries] val LogisticFitBody = {
    val steps = (1 to 3).map(logitStep).mkString(",\n")
    s"""b0 AS (SELECT 0.0e0 AS b0, 0.0e0 AS b1),
       |$steps,
       |dev AS (
       |  SELECT round(-2 * sum(
       |      yb * ln(1 / (1 + exp(-(b3.b0 + b3.b1 * x))))
       |      + (n - yb) * ln(1 - 1 / (1 + exp(-(b3.b0 + b3.b1 * x))))), 4)
       |    AS deviance,
       |    CAST(sum(n) AS BIGINT) AS n_obs,
       |    CAST(count(*) AS BIGINT) AS n_bins
       |  FROM bins, b3)
       |SELECT round(b3.b0, 6) AS beta0, round(b3.b1, 6) AS beta1,
       |  dev.n_obs, dev.n_bins, dev.deviance
       |FROM b3, dev""".stripMargin
  }

  /** Binned logistic regression as ONE portable SQL text — oracle of
    * `x_logistic_glm` and whole query of the `x_sql_logistic` twin. */
  private[queries] val LogisticSql =
    s"""WITH $LogisticBinsCtes,
       |$LogisticFitBody""".stripMargin

  // ---- Poisson regression (daily count ~ day index) ----

  private def poisStep(i: Int): String = {
    val prev = s"b${i - 1}"
    s"""g$i AS (
       |  SELECT
       |    sum(y - exp($prev.b0 + $prev.b1 * i)) AS g0,
       |    sum((y - exp($prev.b0 + $prev.b1 * i)) * i) AS g1,
       |    sum(exp($prev.b0 + $prev.b1 * i)) AS h00,
       |    sum(exp($prev.b0 + $prev.b1 * i) * i) AS h01,
       |    sum(exp($prev.b0 + $prev.b1 * i) * i * i) AS h11
       |  FROM idx, $prev),
       |b$i AS (
       |  SELECT
       |    round($prev.b0 + (h11 * g0 - h01 * g1)
       |      / (h00 * h11 - h01 * h01), 9) AS b0,
       |    round($prev.b1 + (h00 * g1 - h01 * g0)
       |      / (h00 * h11 - h01 * h01), 9) AS b1
       |  FROM g$i, b${i - 1})""".stripMargin
  }

  /** Corpus half: the daily-count frame (day index assigned portably in
    * the fit half — DuckDB's 3-arg datediff doesn't parse in Spark). */
  private[queries] val PoissonDailyCtes =
    """daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
      |    CAST(count(*) AS DOUBLE) AS y
      |  FROM events GROUP BY 1)""".stripMargin

  /** Fit half over a relation named `daily`: observed-day index from a
    * row_number over the calendar-bounded frame (portable in both
    * dialects), then 3 Newton steps. */
  private[queries] val PoissonFitBody = {
    val steps = (1 to 3).map(poisStep).mkString(",\n")
    s"""idx AS (
       |  SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS DOUBLE) AS i, y
       |  FROM daily),
       |b0 AS (SELECT round(ln(avg(y)), 9) AS b0, 0.0e0 AS b1 FROM idx),
       |$steps
       |SELECT round(b3.b0, 6) AS beta0, round(b3.b1, 6) AS beta1,
       |  round(exp(b3.b0 + b3.b1 * 30), 4) AS forecast_day30
       |FROM b3""".stripMargin
  }

  /** Poisson trend GLM as ONE portable SQL text — oracle of
    * `x_poisson_glm` and whole query of the `x_sql_poisson_glm` twin. */
  private[queries] val PoissonGlmSql =
    s"""WITH $PoissonDailyCtes,
       |$PoissonFitBody""".stripMargin

  // ---- Markov stationary distribution (event-type chain) ----

  private def piStep(i: Int): String =
    s"""pi$i AS (
       |  SELECT p.dst AS state, round(sum(pi${i - 1}.pr * p.p), 9) AS pr
       |  FROM p JOIN pi${i - 1} ON p.src = pi${i - 1}.state
       |  GROUP BY 1)""".stripMargin

  /** Corpus half: the row-normalized K x K transition frame. */
  private[queries] val StationaryPCtes =
    """s AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS nxt
      |  FROM events),
      |t AS (SELECT event_type AS src, nxt AS dst,
      |  CAST(count(*) AS BIGINT) AS c
      |  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |m AS (SELECT src, CAST(sum(c) AS BIGINT) AS ns FROM t GROUP BY 1),
      |p AS (SELECT t.src, t.dst, t.c / CAST(m.ns AS DOUBLE) AS p
      |  FROM t JOIN m ON t.src = m.src)""".stripMargin

  /** Fit half over a relation named `p`: 8 unrolled power-iteration
    * rounds from the uniform start, 9 dp snap per round. */
  private[queries] val StationaryPiBody = {
    val steps = (1 to 8).map(piStep).mkString(",\n")
    s"""k AS (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS k FROM p),
       |pi0 AS (SELECT src AS state, round(1 / k.k, 9) AS pr
       |  FROM (SELECT DISTINCT src FROM p), k),
       |$steps
       |SELECT state, round(pr, 6) AS pi FROM pi8""".stripMargin
  }

  /** Markov stationary distribution as ONE portable SQL text — oracle of
    * `x_markov_stationary` and whole query of the `x_sql_stationary`
    * twin. */
  private[queries] val StationarySql =
    s"""WITH $StationaryPCtes,
       |$StationaryPiBody""".stripMargin

  // ---- closed-form 3x3 PCA (correlation eigenvalues) ----

  /** Closed-form symmetric-3x3 eigenvalues as ONE portable SQL text —
    * oracle of `x_pca3_closed` and whole query of the `x_sql_pca3` twin.
    * The trigonometric method on the 6-dp-snapped correlation matrix of
    * (quantity, discount, tax): with unit diagonal, q = 1 and
    * det(A - I) = 2 a12 a13 a23, so r = a12 a13 a23 / p^3 with
    * p = sqrt((a12^2 + a13^2 + a23^2) / 3); eigenvalues are
    * 1 + 2 p cos(phi + 2 pi k / 3), phi = acos(clamp(r)) / 3. Every
    * input is a snapped double, so both engines trace identical IEEE
    * arithmetic. */
  private[queries] val Pca3Sql =
    """WITH c AS (SELECT
      |  round(corr(l_quantity, l_discount), 6) AS a12,
      |  round(corr(l_quantity, l_tax), 6) AS a13,
      |  round(corr(l_discount, l_tax), 6) AS a23
      |  FROM lineitem),
      |pq AS (SELECT a12, a13, a23,
      |  sqrt((a12 * a12 + a13 * a13 + a23 * a23) / 3.0e0) AS p
      |  FROM c),
      |r AS (SELECT p,
      |  a12 * a13 * a23 / (p * p * p) AS rr
      |  FROM pq),
      |phi AS (SELECT p,
      |  acos(greatest(-1.0e0, least(1.0e0, rr))) / 3.0e0 AS phi
      |  FROM r),
      |eig AS (SELECT
      |  1 + 2 * p * cos(phi) AS e1,
      |  1 + 2 * p * cos(phi + 2.0943951023931953e0) AS e3
      |  FROM phi)
      |SELECT round(e1, 6) AS eig1, round(3 - e1 - e3, 6) AS eig2,
      |  round(e3, 6) AS eig3,
      |  round(e1 / 3, 6) AS explained_1,
      |  round((e1 + (3 - e1 - e3)) / 3, 6) AS explained_top2
      |FROM eig""".stripMargin

  // ---- closed-form 2-predictor ridge ----

  /** Two-predictor ridge regression as ONE portable SQL text — oracle of
    * `x_ridge` and whole query of the `x_sql_ridge` twin. Centered form:
    * solve (S + lambda I) beta = s_y with the 2x2 closed inverse on the
    * snapped covariance frame (lambda = 0.01 on the covariance scale);
    * intercept recovered from the means (not penalized). */
  private[queries] val RidgeSql =
    """WITH m AS (SELECT
      |  round(avg(l_quantity), 6) AS m1, round(avg(l_discount), 6) AS m2,
      |  round(avg(l_extendedprice), 6) AS my,
      |  round(var_samp(l_quantity), 6) AS s11,
      |  round(var_samp(l_discount), 6) AS s22,
      |  round(covar_samp(l_quantity, l_discount), 6) AS s12,
      |  round(covar_samp(l_quantity, l_extendedprice), 6) AS s1y,
      |  round(covar_samp(l_discount, l_extendedprice), 6) AS s2y,
      |  CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem),
      |b AS (SELECT n, m1, m2, my,
      |  ((s22 + 0.01e0) * s1y - s12 * s2y)
      |    / ((s11 + 0.01e0) * (s22 + 0.01e0) - s12 * s12) AS b1,
      |  ((s11 + 0.01e0) * s2y - s12 * s1y)
      |    / ((s11 + 0.01e0) * (s22 + 0.01e0) - s12 * s12) AS b2
      |  FROM m)
      |SELECT n, round(my - b1 * m1 - b2 * m2, 4) AS beta0,
      |  round(b1, 6) AS beta_quantity, round(b2, 6) AS beta_discount
      |FROM b""".stripMargin

  /** Lazy localCheckpoint — the Dedup.pin posture (materialize once on
    * first action, reuse across the fit's driver-side steps). */
  private def pin(df: org.apache.spark.sql.DataFrame) =
    df.localCheckpoint(eager = false)

  private def snap9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  val defs: Seq[QDef] = Seq(

    // BINNED LOGISTIC REGRESSION: P(order is URGENT | price) — the
    // in-database GLM at corpus scale. ONE histogram aggregate collapses
    // the corpus to ~600 price-bin sufficient-stats rows (x = bin mean,
    // n, successes); 3 Newton steps with closed-form 2x2 solves run on
    // that bounded frame (driver-side loop over KB aggregates — the
    // pinned-training pattern of the sim/PQ family), coefficients
    // snapped at 9 dp per step so the oracle replays them exactly.
    QDef("x_logistic_glm", LogisticSql) { (s, d) =>
      val raw = Tables(s, d).orders.select(
        (col("o_totalprice") / lit(100000.0)).as("xs"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y"))
      val bins = pin(
        raw.groupBy(floor(col("xs") * 100).cast("bigint").as("b"))
          .agg(round(avg(col("xs")), 6).as("x"), count(lit(1)).as("n"),
            sum(col("y")).as("yb")))
      var beta = (0.0, 0.0)
      for (_ <- 1 to 3) {
        val (b0, b1) = beta
        val mu = lit(1.0) / (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x"))))
        val g = bins.agg(
          sum(col("n") * (col("yb") / col("n").cast("double") - mu)).as("g0"),
          sum(col("n") * col("x")
            * (col("yb") / col("n").cast("double") - mu)).as("g1"),
          sum(col("n") * mu * (lit(1) - mu)).as("h00"),
          sum(col("n") * col("x") * mu * (lit(1) - mu)).as("h01"),
          sum(col("n") * col("x") * col("x") * mu * (lit(1) - mu)).as("h11"))
          .head()
        val (g0, g1, h00, h01, h11) = (g.getDouble(0), g.getDouble(1),
          g.getDouble(2), g.getDouble(3), g.getDouble(4))
        val det = h00 * h11 - h01 * h01
        beta = (snap9(b0 + (h11 * g0 - h01 * g1) / det),
          snap9(b1 + (h00 * g1 - h01 * g0) / det))
      }
      val (b0, b1) = beta
      val mu = lit(1.0) / (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x"))))
      bins.agg(
        round(lit(-2) * sum(col("yb") * log(mu)
          + (col("n") - col("yb")) * log(lit(1) - mu)), 4).as("deviance"),
        sum(col("n")).as("n_obs"), count(lit(1)).as("n_bins"))
        .select(round(lit(b0), 6).as("beta0"), round(lit(b1), 6).as("beta1"),
          col("n_obs"), col("n_bins"), col("deviance"))
    },

    // The logistic fit through Spark's SQL parser — both halves are the
    // oracle's own fragments; the bin frame materializes ONCE behind a
    // temp view so the 3 Newton steps + deviance don't re-collapse the
    // corpus (Spark re-evaluates multiply-referenced CTEs — the
    // x_sql_kcore refactor).
    QDef("x_sql_logistic", LogisticSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(s"""WITH ${R30Ops.LogisticBinsCtes}
               |SELECT b, x, n, yb FROM bins""".stripMargin)
        .transform(SqlSurface.materialized("bins"))
      s.sql(s"WITH ${R30Ops.LogisticFitBody}")
    },

    // POISSON TREND GLM: daily event volume ~ day index with a log link
    // — the count-data complement of the OLS trend queries. The daily
    // frame is calendar-bounded; 3 Newton steps, snapped 9 dp.
    QDef("x_poisson_glm", PoissonGlmSql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dc = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).cast("double").as("y"))
      // observed-day index: row_number over the calendar-bounded daily
      // frame (matches the portable fit text; carve-out class of x_cusum)
      val daily = pin(dc
        .select((row_number().over(Window.orderBy("d")) - 1)
          .cast("double").as("i"), col("y")))
      val mean = daily.agg(avg(col("y"))).head().getDouble(0)
      var beta = (snap9(math.log(mean)), 0.0)
      for (_ <- 1 to 3) {
        val (b0, b1) = beta
        val muc = exp(lit(b0) + lit(b1) * col("i"))
        val g = daily.agg(
          sum(col("y") - muc).as("g0"),
          sum((col("y") - muc) * col("i")).as("g1"),
          sum(muc).as("h00"), sum(muc * col("i")).as("h01"),
          sum(muc * col("i") * col("i")).as("h11")).head()
        val (g0, g1, h00, h01, h11) = (g.getDouble(0), g.getDouble(1),
          g.getDouble(2), g.getDouble(3), g.getDouble(4))
        val det = h00 * h11 - h01 * h01
        beta = (snap9(b0 + (h11 * g0 - h01 * g1) / det),
          snap9(b1 + (h00 * g1 - h01 * g0) / det))
      }
      import s.implicits._
      Seq(beta).toDF("b0", "b1")
        .select(round(col("b0"), 6).as("beta0"),
          round(col("b1"), 6).as("beta1"),
          round(exp(col("b0") + col("b1") * lit(30)), 4).as("forecast_day30"))
    },

    // The Poisson fit through Spark's SQL parser — daily frame
    // materialized once, fit half verbatim.
    QDef("x_sql_poisson_glm", PoissonGlmSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(s"""WITH ${R30Ops.PoissonDailyCtes}
               |SELECT d, y FROM daily""".stripMargin)
        .transform(SqlSurface.materialized("daily"))
      s.sql(s"WITH ${R30Ops.PoissonFitBody}")
    },

    // MARKOV STATIONARY DISTRIBUTION of the event-type chain: 8 power-
    // iteration rounds pi' = pi P on the K x K transition frame
    // (K = event-type domain), per-round 9 dp snap — where does the
    // clickstream settle in the long run. The steady-state complement of
    // x_seq_transitions / x_entropy_rate; iteration frames are K-row,
    // localCheckpoint truncates lineage per round (GraphMetrics pattern).
    QDef("x_markov_stationary", StationarySql) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tr = Tables(s, d).events
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("c"))
      val m = tr.groupBy("src").agg(sum(col("c")).as("ns"))
      val p = pin(tr.join(m, "src")
        .select(col("src"), col("dst"),
          (col("c") / col("ns").cast("double")).as("p")))
      val k = p.select("src").distinct().count().toDouble
      var pi = p.select(col("src").as("state")).distinct()
        .withColumn("pr", round(lit(1.0) / lit(k), 9))
      for (_ <- 1 to 8) {
        pi = p.join(pi, col("src") === col("state"))
          .groupBy(col("dst").as("state2"))
          .agg(round(sum(col("pr") * col("p")), 9).as("pr"))
          .select(col("state2").as("state"), col("pr"))
          .localCheckpoint()
      }
      pi.select(col("state"), round(col("pr"), 6).as("pi"))
    },

    // The stationary distribution through Spark's SQL parser — the
    // transition frame materializes once; 8 unrolled rounds verbatim.
    QDef("x_sql_stationary", StationarySql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(s"""WITH ${R30Ops.StationaryPCtes}
               |SELECT src, dst, p FROM p""".stripMargin)
        .transform(SqlSurface.materialized("p"))
      s.sql(s"WITH ${R30Ops.StationaryPiBody}")
    },

    // CLOSED-FORM 3-VARIABLE PCA: eigenvalues of the (quantity, discount,
    // tax) correlation matrix by the symmetric-3x3 trigonometric formula
    // — spectral analysis without any iteration (x_embed_pca's power
    // method is for 64-dim; at 3 dims the exact closed form wins). ONE
    // corr pass; the cubic-root trig runs on a 1-row frame.
    QDef("x_pca3_closed", Pca3Sql) { (s, d) =>
      val c = Tables(s, d).lineitem.agg(
        round(corr(col("l_quantity"), col("l_discount")), 6).as("a12"),
        round(corr(col("l_quantity"), col("l_tax")), 6).as("a13"),
        round(corr(col("l_discount"), col("l_tax")), 6).as("a23"))
      val pq = c.select(col("a12"), col("a13"), col("a23"),
        sqrt((col("a12") * col("a12") + col("a13") * col("a13")
          + col("a23") * col("a23")) / lit(3.0)).as("p"))
      val r = pq.select(col("p"),
        (col("a12") * col("a13") * col("a23")
          / (col("p") * col("p") * col("p"))).as("rr"))
      val phi = r.select(col("p"),
        (acos(greatest(lit(-1.0), least(lit(1.0), col("rr"))))
          / lit(3.0)).as("phi"))
      val eig = phi.select(
        (lit(1) + lit(2) * col("p") * cos(col("phi"))).as("e1"),
        (lit(1) + lit(2) * col("p")
          * cos(col("phi") + lit(2.0943951023931953))).as("e3"))
      eig.select(round(col("e1"), 6).as("eig1"),
        round(lit(3) - col("e1") - col("e3"), 6).as("eig2"),
        round(col("e3"), 6).as("eig3"),
        round(col("e1") / lit(3), 6).as("explained_1"),
        round((col("e1") + (lit(3) - col("e1") - col("e3"))) / lit(3), 6)
          .as("explained_top2"))
    },

    // The closed-form PCA through Spark's SQL parser, same shared text.
    QDef("x_sql_pca3", Pca3Sql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(Pca3Sql)
    },

    // RIDGE REGRESSION (2 predictors, lambda = 0.01 on the covariance
    // scale): extendedprice ~ quantity + discount with the closed 2x2
    // solve on ONE snapped moment pass — regularized in-database OLS,
    // the multicollinearity-safe sibling of x_regr_by_group / x_vif.
    QDef("x_ridge", RidgeSql) { (s, d) =>
      val m = Tables(s, d).lineitem.agg(
        round(avg(col("l_quantity")), 6).as("m1"),
        round(avg(col("l_discount")), 6).as("m2"),
        round(avg(col("l_extendedprice")), 6).as("my"),
        round(var_samp(col("l_quantity")), 6).as("s11"),
        round(var_samp(col("l_discount")), 6).as("s22"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("s12"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6)
          .as("s1y"),
        round(covar_samp(col("l_discount"), col("l_extendedprice")), 6)
          .as("s2y"),
        count(lit(1)).as("n"))
      val det = (col("s11") + lit(0.01)) * (col("s22") + lit(0.01)) -
        col("s12") * col("s12")
      val b1 = ((col("s22") + lit(0.01)) * col("s1y")
        - col("s12") * col("s2y")) / det
      val b2 = ((col("s11") + lit(0.01)) * col("s2y")
        - col("s12") * col("s1y")) / det
      m.select(col("n"),
        round(col("my") - b1 * col("m1") - b2 * col("m2"), 4).as("beta0"),
        round(b1, 6).as("beta_quantity"), round(b2, 6).as("beta_discount"))
    },

    // The ridge solve through Spark's SQL parser, same shared text.
    QDef("x_sql_ridge", RidgeSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(RidgeSql)
    }
  )
}
