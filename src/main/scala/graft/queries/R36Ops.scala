package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-36 batch: survival-curve extensions (Nelson-Aalen cumulative
  * hazard, the Weibull probability-plot fit, an actuarial life table),
  * inverse-propensity-weighted ATE, cohort CLV — plus a SQL-twin wave
  * pushing seven already-portable R33-R35 texts through Spark's parser
  * (conformal, Mahalanobis, SPRT, AR(2), Cochrane-Orcutt, Dirichlet,
  * Holt).
  *
  * Scale posture: the survival family shares x_survival_km's
  * duration-horizon frame (corpus → three grouped aggregates, everything
  * after on the bounded frame); IPW folds a 12-row propensity frame back
  * scan-local; CLV is user-week grouped aggregates with user-partitioned
  * leads.
  */
object R36Ops {

  /** Shared corpus half of the survival family (x_survival_km's
    * definitions verbatim): per-user duration-to-purchase with
    * right-censoring at the observation horizon, collapsed to the
    * duration-hours frame `d(t, d, c)`. */
  private[queries] val SurvivalBaseCtes =
    """s AS (SELECT user_id, min(ts) AS t0 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |p AS (SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |obs AS (SELECT max(ts) AS tmax FROM events),
      |su AS (
      |  SELECT s.user_id,
      |    CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0
      |      THEN CAST(date_diff('hour', s.t0, p.t1) AS BIGINT)
      |      ELSE CAST(date_diff('hour', s.t0, obs.tmax) AS BIGINT) END
      |      AS dur,
      |    CASE WHEN p.t1 IS NOT NULL AND p.t1 >= s.t0 THEN 1 ELSE 0 END
      |      AS ev
      |  FROM s LEFT JOIN p ON p.user_id = s.user_id, obs),
      |d AS (SELECT dur AS t, CAST(sum(ev) AS DOUBLE) AS d,
      |  CAST(count(*) AS DOUBLE) AS c FROM su GROUP BY 1)""".stripMargin

  /** Nelson-Aalen oracle: cumulative hazard H(t) = Σ d/n over event
    * times + the Fleming-Harrington survival exp(−H) — the
    * variance-friendlier sibling of the KM product. Same float path in
    * both engines (prefix sums of d/n over the duration frame). */
  private[queries] val NelsonAalenSql =
    s"""WITH $SurvivalBaseCtes,
       |r AS (SELECT t, d,
       |  sum(c) OVER (ORDER BY t
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
       |  FROM d),
       |na AS (SELECT t, d, n,
       |  sum(d / n) OVER (ORDER BY t
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
       |  FROM r WHERE d > 0)
       |SELECT t AS hours, CAST(d AS BIGINT) AS events,
       |  CAST(n AS BIGINT) AS at_risk, round(h, 6) AS cum_hazard,
       |  round(exp(-h), 6) AS survival_fh
       |FROM na""".stripMargin

  /** Weibull probability-plot oracle: ln H(t) = k·ln t − k·ln λ is
    * linear for Weibull durations, so the shape/scale come from ONE OLS
    * on the (ln t, ln H) pairs of the bounded Nelson-Aalen frame. */
  private[queries] val WeibullPlotSql =
    s"""WITH $SurvivalBaseCtes,
       |r AS (SELECT t, d,
       |  sum(c) OVER (ORDER BY t
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
       |  FROM d),
       |na AS (SELECT t,
       |  sum(d / n) OVER (ORDER BY t
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
       |  FROM r WHERE d > 0),
       |pts AS (SELECT ln(CAST(t AS DOUBLE)) AS x, ln(h) AS y
       |  FROM na WHERE t > 0 AND h > 0),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n_pts,
       |  round(covar_samp(x, y) / var_samp(x), 9) AS k,
       |  round(avg(y), 9) AS my, round(avg(x), 9) AS mx,
       |  round(corr(x, y) * corr(x, y), 6) AS r2
       |  FROM pts)
       |SELECT n_pts, round(k, 6) AS shape_k,
       |  round(exp(mx - my / k), 4) AS scale_lambda, r2
       |FROM m""".stripMargin

  /** Actuarial life-table oracle: 100-hour intervals; actuarial exposure
    * n − w/2 (half-credit for in-interval censoring), conditional
    * q = d/exposure, cumulative survival as exp∘cumsum∘ln (the KM float
    * path) over the ≤ horizon/100 interval frame. */
  private[queries] val LifeTableSql =
    s"""WITH $SurvivalBaseCtes,
       |iv AS (SELECT CAST(floor(dur / 100) AS BIGINT) AS iv,
       |  CAST(sum(ev) AS DOUBLE) AS d,
       |  CAST(sum(1 - ev) AS DOUBLE) AS w
       |  FROM su GROUP BY 1),
       |en AS (SELECT iv, d, w,
       |  sum(d + w) OVER (ORDER BY iv
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS entering
       |  FROM iv),
       |q AS (SELECT iv, d, w, entering,
       |  CASE WHEN entering - w / 2 > 0 THEN d / (entering - w / 2)
       |    ELSE 0 END AS qx
       |  FROM en),
       |lt AS (SELECT iv, d, w, entering, qx,
       |  exp(sum(ln(1 - qx)) OVER (ORDER BY iv
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS surv
       |  FROM q WHERE qx < 1)
       |SELECT iv AS interval_100h, CAST(d AS BIGINT) AS deaths,
       |  CAST(w AS BIGINT) AS censored, CAST(entering AS BIGINT)
       |    AS entering,
       |  round(qx, 6) AS q_x, round(surv, 6) AS survival
       |FROM lt""".stripMargin

  /** IPW ATE as ONE portable SQL text — oracle of `x_ate_ipw` and whole
    * query of the `x_sql_ipw` twin. Treatment = high-price order,
    * outcome = URGENT, confounder = order month; the propensity is the
    * per-month treatment rate (12-row frame) folded back scan-local;
    * Horvitz-Thompson ATE vs the naive difference. */
  private[queries] val IpwSql =
    """WITH base AS (SELECT
      |  CASE WHEN o_totalprice > 200000 THEN 1.0e0 ELSE 0.0e0 END AS e,
      |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0e0 ELSE 0.0e0 END
      |    AS y,
      |  month(o_orderdate) AS mo
      |  FROM orders),
      |ps AS (SELECT mo, round(avg(e), 6) AS p,
      |  CAST(count(*) AS BIGINT) AS n
      |  FROM base GROUP BY 1),
      |ag AS (SELECT
      |  sum(base.e * base.y / ps.p) / sum(base.e / ps.p) AS mu1,
      |  sum((1 - base.e) * base.y / (1 - ps.p))
      |    / sum((1 - base.e) / (1 - ps.p)) AS mu0,
      |  avg(CASE WHEN base.e = 1 THEN base.y END)
      |    - avg(CASE WHEN base.e = 0 THEN base.y END) AS naive,
      |  CAST(count(*) AS BIGINT) AS n
      |  FROM base JOIN ps ON ps.mo = base.mo)
      |SELECT n, round(mu1, 6) AS mean_treated_ipw,
      |  round(mu0, 6) AS mean_control_ipw,
      |  round(mu1 - mu0, 6) AS ate_ipw, round(naive, 6) AS naive_diff
      |FROM ag""".stripMargin

  /** Cohort CLV oracle: weekly purchase-activity retention (lead over
    * user-partitioned active weeks), average weekly purchase value, and
    * the geometric-retention CLV m·r/(1 + d − r) with d = 1% weekly. */
  private[queries] val ClvSql =
    """WITH pw AS (SELECT user_id,
      |  CAST(floor(CAST(date_diff('day', DATE '2020-01-01',
      |    CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) / 7) AS BIGINT)
      |    AS wk,
      |  sum(value) AS rev
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |seq AS (SELECT user_id, wk, rev,
      |  lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nwk
      |  FROM pw),
      |mx AS (SELECT max(wk) AS maxwk FROM pw),
      |r AS (SELECT
      |  CAST(sum(CASE WHEN nwk = wk + 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS retained,
      |  CAST(count(*) AS BIGINT) AS weeks_obs
      |  FROM seq CROSS JOIN mx WHERE wk < maxwk),
      |m AS (SELECT round(avg(rev), 6) AS avg_weekly_rev FROM pw),
      |rr AS (SELECT retained, weeks_obs,
      |  retained / CAST(weeks_obs AS DOUBLE) AS ret FROM r)
      |SELECT weeks_obs, round(ret, 6) AS retention,
      |  m.avg_weekly_rev,
      |  round(m.avg_weekly_rev * ret / (1 + 0.01e0 - ret), 4) AS clv
      |FROM rr, m""".stripMargin

  val defs: Seq[QDef] = Seq(

    // NELSON-AALEN: the cumulative-hazard estimator — additive where KM
    // is multiplicative, so its variance and plotting behave better near
    // the tail. Shares x_survival_km's corpus half verbatim; the hazard
    // prefix runs on the duration-horizon frame.
    QDef("x_nelson_aalen", NelsonAalenSql) { (s, d) =>
      val su = survivalBase(s, d)
      val byDur = su.groupBy(col("dur").as("t"))
        .agg(sum(col("ev")).cast("double").as("d"),
          count(lit(1)).cast("double").as("c"))
      val atRisk = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prefix = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDur.withColumn("n", sum(col("c")).over(atRisk))
        .filter(col("d") > 0)
        .withColumn("h", sum(col("d") / col("n")).over(prefix))
        .select(col("t").as("hours"), col("d").cast("bigint").as("events"),
          col("n").cast("bigint").as("at_risk"),
          round(col("h"), 6).as("cum_hazard"),
          round(exp(-col("h")), 6).as("survival_fh"))
    },

    // WEIBULL PROBABILITY PLOT: is the signup→purchase hazard rising or
    // falling — shape k from ONE OLS on the (ln t, ln H) Nelson-Aalen
    // pairs (bounded frame), scale from the intercept.
    QDef("x_weibull_plot", WeibullPlotSql) { (s, d) =>
      val su = survivalBase(s, d)
      val byDur = su.groupBy(col("dur").as("t"))
        .agg(sum(col("ev")).cast("double").as("d"),
          count(lit(1)).cast("double").as("c"))
      val atRisk = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prefix = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pts = byDur.withColumn("n", sum(col("c")).over(atRisk))
        .filter(col("d") > 0)
        .withColumn("h", sum(col("d") / col("n")).over(prefix))
        .filter(col("t") > 0 && col("h") > 0)
        .select(log(col("t").cast("double")).as("x"), log(col("h")).as("y"))
      val m = pts.agg(count(lit(1)).as("n_pts"),
        round(covar_samp(col("x"), col("y")) / var_samp(col("x")), 9)
          .as("k"),
        round(avg(col("y")), 9).as("my"), round(avg(col("x")), 9).as("mx"),
        round(corr(col("x"), col("y")) * corr(col("x"), col("y")), 6)
          .as("r2"))
      m.select(col("n_pts"), round(col("k"), 6).as("shape_k"),
        round(exp(col("mx") - col("my") / col("k")), 4).as("scale_lambda"),
        col("r2"))
    },

    // ACTUARIAL LIFE TABLE: 100-hour intervals with the classical
    // half-credit exposure for in-interval censoring; conditional q_x and
    // the cumulative survival via the exp∘cumsum∘ln float path both
    // engines share.
    QDef("x_life_table", LifeTableSql) { (s, d) =>
      val su = survivalBase(s, d)
      val iv = su.groupBy(floor(col("dur") / 100).cast("bigint").as("iv"))
        .agg(sum(col("ev")).cast("double").as("d"),
          sum(lit(1) - col("ev")).cast("double").as("w"))
      val entering = Window.orderBy("iv")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prefix = Window.orderBy("iv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      iv.withColumn("entering", sum(col("d") + col("w")).over(entering))
        .withColumn("qx",
          when(col("entering") - col("w") / 2 > 0,
            col("d") / (col("entering") - col("w") / 2)).otherwise(0.0))
        .filter(col("qx") < 1)
        .withColumn("surv", exp(sum(log(lit(1) - col("qx"))).over(prefix)))
        .select(col("iv").as("interval_100h"),
          col("d").cast("bigint").as("deaths"),
          col("w").cast("bigint").as("censored"),
          col("entering").cast("bigint").as("entering"),
          round(col("qx"), 6).as("q_x"), round(col("surv"), 6).as("survival"))
    },

    // IPW ATE: the Horvitz-Thompson causal estimate with a 12-row
    // nonparametric propensity folded back scan-local — the weighting
    // counterpart of x_ate_strat (stratification) on the same design.
    QDef("x_ate_ipw", IpwSql) { (s, d) =>
      val base = Tables(s, d).orders.select(
        when(col("o_totalprice") > 200000, 1.0).otherwise(0.0).as("e"),
        when(col("o_orderpriority") === "1-URGENT", 1.0).otherwise(0.0)
          .as("y"),
        month(col("o_orderdate")).as("mo"))
      val ps = base.groupBy("mo")
        .agg(round(avg(col("e")), 6).as("p"), count(lit(1)).as("n_mo"))
      base.join(ps.select("mo", "p"), Seq("mo"))
        .agg(
          (sum(col("e") * col("y") / col("p"))
            / sum(col("e") / col("p"))).as("mu1"),
          (sum((lit(1) - col("e")) * col("y") / (lit(1) - col("p")))
            / sum((lit(1) - col("e")) / (lit(1) - col("p")))).as("mu0"),
          (avg(when(col("e") === 1, col("y")))
            - avg(when(col("e") === 0, col("y")))).as("naive"),
          count(lit(1)).as("n"))
        .select(col("n"), round(col("mu1"), 6).as("mean_treated_ipw"),
          round(col("mu0"), 6).as("mean_control_ipw"),
          round(col("mu1") - col("mu0"), 6).as("ate_ipw"),
          round(col("naive"), 6).as("naive_diff"))
    },

    // IPW through Spark's SQL parser, same shared text.
    QDef("x_sql_ipw", IpwSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(IpwSql)
    },

    // COHORT CLV: weekly purchase retention (user-partitioned leads over
    // active weeks — never a global window), average weekly purchase
    // value, geometric-retention CLV.
    QDef("x_clv", ClvSql) { (s, d) =>
      val ev = Tables(s, d).events
      val pw = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          floor(datediff(date_trunc("day", col("ts")).cast("date"),
            lit(java.sql.Date.valueOf("2020-01-01"))) / 7).cast("bigint")
            .as("wk"))
        .agg(sum(col("value")).as("rev"))
      val seq0 = pw.select(col("user_id"), col("wk"), col("rev"),
        lead(col("wk"), 1).over(Window.partitionBy("user_id")
          .orderBy("wk")).as("nwk"))
      val mx = pw.agg(max(col("wk")).as("maxwk"))
      val r = seq0.crossJoin(broadcast(mx)).filter(col("wk") < col("maxwk"))
        .agg(sum(when(col("nwk") === col("wk") + 1, 1L).otherwise(0L))
          .as("retained"), count(lit(1)).as("weeks_obs"))
      val m = pw.agg(round(avg(col("rev")), 6).as("avg_weekly_rev"))
      r.crossJoin(broadcast(m))
        .select(col("weeks_obs"),
          round(col("retained") / col("weeks_obs").cast("double"), 6)
            .as("retention"),
          col("avg_weekly_rev"),
          round(col("avg_weekly_rev")
            * (col("retained") / col("weeks_obs").cast("double"))
            / (lit(1.01) - col("retained") / col("weeks_obs").cast("double")),
            4).as("clv"))
    },

    // ---- SQL-twin wave over the portable R33-R35 texts ----

    // Split-conformal through Spark's SQL parser (the parsed plan
    // carries the oracle's residual-bin cumulative).
    QDef("x_sql_conformal", R31Ops.ConformalOracle) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(R31Ops.ConformalOracle)
    },

    // Mahalanobis through the parser — moment CTE, adjugate inverse,
    // scan-local d², TakeOrdered.
    QDef("x_sql_mahalanobis", R35Ops.MahalanobisSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(R35Ops.MahalanobisSql)
    },

    // SPRT through the parser — calendar-bounded LLR prefix.
    QDef("x_sql_sprt", R34Ops.SprtSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(R34Ops.SprtSql)
    },

    // Yule-Walker AR(2) through the parser.
    QDef("x_sql_ar2", R34Ops.Ar2Sql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(R34Ops.Ar2Sql)
    },

    // Cochrane-Orcutt through the parser — the whole two-pass transform
    // is one text, so the parsed plan replays OLS → ρ → refit.
    QDef("x_sql_cochrane", R34Ops.CochraneOrcuttSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(R34Ops.CochraneOrcuttSql)
    },

    // Dirichlet concentration through the parser.
    QDef("x_sql_dirichlet", R35Ops.DirichletSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(R35Ops.DirichletSql)
    },

    // Holt double-EWMA through the parser (named WINDOW clause).
    QDef("x_sql_holt", R34Ops.HoltSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(R34Ops.HoltSql)
    }
  )

  /** Dataset mirror of [[SurvivalBaseCtes]] — the x_survival_km
    * duration/censoring definitions. */
  private def survivalBase(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables(s, d).events
    def hourOf(c: org.apache.spark.sql.Column) =
      graft.functions.TimeCols.eventMicros(date_trunc("hour", c)) / 3600000000L
    val s0 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    val p1 = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val obs = ev.agg(max(col("ts")).as("tmax"))
    val converted = col("t1").isNotNull && col("t1") >= col("t0")
    s0.join(p1, Seq("user_id"), "left")
      .crossJoin(broadcast(obs))
      .select(
        when(converted, hourOf(col("t1")) - hourOf(col("t0")))
          .otherwise(hourOf(col("tmax")) - hourOf(col("t0")))
          .cast("long").as("dur"),
        when(converted, 1L).otherwise(0L).as("ev"))
  }
}
