package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-38 batch: evaluation statistics — the restricted-mean summary
  * of the survival family (RMST), concordance of a risk score against
  * censored outcomes (Harrell's C), retrieval MAP/MRR beside the
  * existing NDCG, probabilistic-forecast quality (Brier + Murphy
  * decomposition, log loss), the Engle-Granger cointegration step for
  * the daily-series pair, and the Atkinson inequality family.
  *
  * Scale posture: survival ops share x_survival_km's corpus collapse
  * (three grouped aggregates → the horizon-bounded duration frame);
  * Harrell's C rides a 6-bucket belowAndNMany pass over that frame;
  * MAP/MRR reuses the capped-probe cosine top-k shape (windows
  * partitioned by qid); Brier/Atkinson are pure aggregates with a
  * bounded propensity frame folded back scan-local.
  */
object R38Ops {

  /** x_survival_km's corpus half with user_id kept (for the Harrell
    * predictor join): per-user duration-to-purchase, right-censored at
    * the horizon. */
  private def survivalUsers(s: org.apache.spark.sql.SparkSession,
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
      .select(col("user_id"),
        when(converted, hourOf(col("t1")) - hourOf(col("t0")))
          .otherwise(hourOf(col("tmax")) - hourOf(col("t0")))
          .cast("long").as("dur"),
        when(converted, 1L).otherwise(0L).as("ev"))
  }

  /** Shared survival CTEs (x_survival_km's text verbatim — R36Ops
    * carries the same fragment). */
  private val SurvCtes =
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
      |  FROM s LEFT JOIN p ON p.user_id = s.user_id, obs)""".stripMargin

  /** RMST as ONE portable text — oracle of `x_rmst` and whole query of
    * the `x_sql_rmst` twin. Area under the KM step function truncated
    * at τ = 500 h: Σ S(t_{k-1})·(t_k − t_{k-1}) over event times ≤ τ
    * plus the carry S(t_last)·(τ − t_last); the KM product uses the
    * exp∘cumsum∘ln float path both engines share. */
  private[queries] val RmstSql =
    s"""WITH $SurvCtes,
       |d AS (SELECT dur AS t, CAST(sum(ev) AS DOUBLE) AS d,
       |  CAST(count(*) AS DOUBLE) AS c FROM su GROUP BY 1),
       |r AS (SELECT t, d,
       |  sum(c) OVER (ORDER BY t
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
       |  FROM d),
       |km AS (SELECT t,
       |  exp(sum(ln(1 - d / n)) OVER (ORDER BY t
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS surv
       |  FROM r WHERE d > 0),
       |seg AS (SELECT t, surv,
       |  coalesce(lag(t) OVER (ORDER BY t), 0) AS pt,
       |  coalesce(lag(surv) OVER (ORDER BY t), 1.0e0) AS ps
       |  FROM km WHERE t <= 500),
       |a AS (SELECT sum(ps * (t - pt)) AS area, max(t) AS tlast,
       |  CAST(count(*) AS BIGINT) AS n_events FROM seg),
       |sl AS (SELECT surv AS slast FROM km
       |  WHERE t = (SELECT max(t) FROM km WHERE t <= 500))
       |SELECT CAST(500 AS BIGINT) AS tau_hours, a.n_events,
       |  round(a.area + sl.slast * (500 - a.tlast), 4) AS rmst_hours,
       |  round(sl.slast, 6) AS survival_at_tau
       |FROM a CROSS JOIN sl""".stripMargin

  /** Harrell's C buckets: the risk score is per-user total activity,
    * collapsed to the 6-value domain least(floor(cnt/5), 5). */
  private val CBuckets = 0 to 5

  /** Harrell's C as ONE portable text (programmatically expanded over
    * the 6 activity buckets) — oracle of `x_harrell_c`. Usable pairs
    * (dur_i < dur_j, ev_i = 1) are counted from the duration-horizon
    * histogram carrying per-bucket totals + per-bucket event counts:
    * above_b(t) = n_b − incl_b(t) needs every bucket's cumulative at
    * every duration, one belowAndNMany-shaped binned prefix (6
    * measures). Pair products go DOUBLE (pairs ~ n²). */
  private[queries] val HarrellSql = {
    val bs = CBuckets
    val histCols = bs.map(b =>
      s"""    CAST(sum(CASE WHEN b = $b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cb$b,
         |    CAST(sum(CASE WHEN b = $b THEN ev ELSE 0 END) AS BIGINT)
         |      AS eb$b""".stripMargin).mkString(",\n")
    val binAgg = bs.map(b => s"CAST(sum(cb$b) AS BIGINT) AS bc$b")
      .mkString(", ")
    val binPre = bs.map(b =>
      s"""    CAST(coalesce(sum(bc$b) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS bb$b""".stripMargin).mkString(",\n")
    val cumCols = bs.map(b =>
      s"""    bp.bb$b + CAST(coalesce(sum(hb.cb$b) OVER (PARTITION BY hb.bin
         |      ORDER BY hb.t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      + hb.cb$b AS incl$b""".stripMargin).mkString(",\n")
    val hbCols = bs.flatMap(b => Seq(s"hb.cb$b", s"hb.eb$b")).mkString(", ")
    val totCols = bs.map(b => s"CAST(sum(cb$b) AS BIGINT) AS n$b")
      .mkString(", ")
    def above(b: Int) = s"(n$b - incl$b)"
    val conc = (for { b <- bs; lo <- bs if lo < b } yield
      s"CAST(eb$b AS DOUBLE) * ${above(lo)}").mkString("\n    + ")
    val disc = (for { b <- bs; hi <- bs if hi > b } yield
      s"CAST(eb$b AS DOUBLE) * ${above(hi)}").mkString("\n    + ")
    val tied = bs.map(b => s"CAST(eb$b AS DOUBLE) * ${above(b)}")
      .mkString("\n    + ")
    s"""WITH $SurvCtes,
       |act AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1),
       |sb AS (SELECT su.dur, su.ev,
       |  CAST(least(CAST(floor(act.cnt / 5) AS BIGINT), 5) AS BIGINT) AS b
       |  FROM su JOIN act ON act.user_id = su.user_id),
       |hist AS (
       |  SELECT dur AS t,
       |$histCols
       |  FROM sb GROUP BY 1),
       |hb AS (SELECT *, CAST(floor(t / 100) AS BIGINT) AS bin FROM hist),
       |binpre AS (
       |  SELECT bin,
       |$binPre
       |  FROM (SELECT bin, $binAgg FROM hb GROUP BY 1)),
       |cum AS (
       |  SELECT hb.t, $hbCols,
       |$cumCols
       |  FROM hb JOIN binpre bp ON hb.bin = bp.bin),
       |tot AS (SELECT $totCols FROM hist),
       |pairs AS (SELECT
       |  sum($conc) AS conc,
       |  sum($disc) AS disc,
       |  sum($tied) AS tied
       |  FROM cum CROSS JOIN tot)
       |SELECT CAST(conc AS BIGINT) AS concordant,
       |  CAST(disc AS BIGINT) AS discordant,
       |  CAST(tied AS BIGINT) AS tied_risk,
       |  round((conc + 0.5e0 * tied) / (conc + disc + tied), 6) AS c_index
       |FROM pairs""".stripMargin
  }

  /** MAP@10 / MRR as ONE portable text — oracle of `x_map_mrr`. Same
    * capped-probe exact-cosine top-10 as ndcgOracle; AP@10 uses the
    * in-list relevant count as denominator (self-contained convention,
    * documented), RR = 1/rank of the first relevant. */
  private[queries] def mapMrrOracle: String =
    s"""WITH ${StarExt.EmbExpl},
       |${StarExt.NormsCte},
       |lab AS (SELECT vec_id, label FROM embeddings),
       |dots AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.e * b.e) AS dot
       |  FROM ee a JOIN ee b ON b.j = a.j
       |    AND a.vec_id < 10 AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT qid, cid,
       |    round(dot / (sqrt(nq.n2) * sqrt(nc.n2)), 6) AS cos
       |  FROM dots
       |  JOIN norms nq ON nq.vec_id = qid
       |  JOIN norms nc ON nc.vec_id = cid),
       |ranked AS (
       |  SELECT qid, cid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid)
       |      AS rank
       |  FROM scored),
       |top AS (SELECT r.qid, r.rank,
       |  CASE WHEN lq.label = lc.label THEN 1.0e0 ELSE 0.0e0 END AS rel
       |  FROM ranked r
       |  JOIN lab lq ON lq.vec_id = r.qid
       |  JOIN lab lc ON lc.vec_id = r.cid
       |  WHERE r.rank <= 10),
       |cums AS (SELECT qid, rank, rel,
       |  sum(rel) OVER (PARTITION BY qid ORDER BY rank
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr
       |  FROM top)
       |SELECT qid,
       |  round(CASE WHEN sum(rel) > 0
       |    THEN sum(CASE WHEN rel > 0 THEN cr / rank ELSE 0 END) / sum(rel)
       |    ELSE 0 END, 6) AS ap10,
       |  round(CASE WHEN sum(rel) > 0
       |    THEN 1.0e0 / min(CASE WHEN rel > 0 THEN rank END)
       |    ELSE 0 END, 6) AS rr
       |FROM cums GROUP BY qid""".stripMargin

  /** Brier + Murphy decomposition as ONE portable text — oracle of
    * `x_brier_decomp` and whole query of the `x_sql_brier` twin. The
    * forecast is the 6 dp-snapped per-month URGENT rate (x_ate_ipw's
    * 12-row propensity frame) folded back scan-local; with bin-mean
    * forecasts, reliability collapses to the snap residue, so the
    * released identity is brier ≈ uncertainty − resolution. */
  private[queries] val BrierSql =
    """WITH base AS (SELECT
      |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0e0 ELSE 0.0e0 END
      |    AS y,
      |  month(o_orderdate) AS mo
      |  FROM orders),
      |ps AS (SELECT mo, round(avg(y), 6) AS p,
      |  CAST(count(*) AS BIGINT) AS n
      |  FROM base GROUP BY 1),
      |g AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
      |  sum(n * p) / sum(n) AS ybar FROM ps),
      |res AS (SELECT
      |  sum(n * (p - g.ybar) * (p - g.ybar)) / max(g.nn) AS resolution,
      |  max(g.ybar) AS ybar, max(g.nn) AS nn
      |  FROM ps CROSS JOIN g),
      |br AS (SELECT
      |  sum((ps.p - base.y) * (ps.p - base.y)) / count(*) AS brier,
      |  -sum(base.y * ln(ps.p) + (1 - base.y) * ln(1 - ps.p)) / count(*)
      |    AS log_loss
      |  FROM base JOIN ps ON ps.mo = base.mo)
      |SELECT res.nn AS n, round(br.brier, 6) AS brier,
      |  round(br.log_loss, 6) AS log_loss,
      |  round(res.resolution, 6) AS resolution,
      |  round(res.ybar * (1 - res.ybar), 6) AS uncertainty
      |FROM br CROSS JOIN res""".stripMargin

  /** Engle-Granger as ONE portable text — oracle of `x_coint_eg` and
    * whole query of the `x_sql_coint` twin. Step 1: OLS of daily order
    * revenue (in 100 k$) on daily order count — two series sharing the
    * order calendar, collapsed in ONE aggregate (9 dp-snapped betas);
    * step 2: the Dickey-Fuller t on the residuals (Δe = ρ·e₋₁ through
    * the origin). Calendar-bounded frames throughout. */
  private[queries] val CointSql =
    """WITH j AS (SELECT CAST(date_trunc('day', o_orderdate) AS DATE)
      |    AS d,
      |  CAST(count(*) AS BIGINT) AS x,
      |  CAST(round(sum(o_totalprice) * 100.0e0, 0) AS BIGINT) AS yc
      |  FROM orders GROUP BY 1),
      |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(x) AS BIGINT) AS sx,
      |  CAST(sum(yc) AS BIGINT) AS sy,
      |  CAST(sum(CAST(x AS DECIMAL(19, 0)) * x) AS DECIMAL(38, 0))
      |    AS sxx,
      |  CAST(sum(CAST(x AS DECIMAL(19, 0)) * yc) AS DECIMAL(38, 0))
      |    AS sxy
      |  FROM j),
      |m AS (SELECT
      |  round((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1.0e7)
      |      - CAST(sx AS DOUBLE) * (CAST(sy AS DOUBLE) / 1.0e7))
      |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS b,
      |  round(CAST(sy AS DOUBLE) / 1.0e7 / n, 9) AS my,
      |  round(CAST(sx AS DOUBLE) / n, 9) AS mx FROM mo),
      |e AS (SELECT j.d,
      |  CAST(floor((CAST(j.yc AS DOUBLE) / 1.0e7
      |    - (m.my - m.b * m.mx) - m.b * j.x) * 1.0e6 + 0.5e0)
      |    AS BIGINT) AS eq
      |  FROM j CROSS JOIN m),
      |l AS (SELECT d, eq, lag(eq) OVER (ORDER BY d) AS pe FROM e),
      |ag AS (SELECT CAST(count(pe) AS BIGINT) AS n,
      |  CAST(sum(CAST(pe AS DECIMAL(19, 0)) * (eq - pe))
      |    AS DECIMAL(38, 0)) AS s1,
      |  CAST(sum(CAST(pe AS DECIMAL(19, 0)) * pe) AS DECIMAL(38, 0))
      |    AS s2,
      |  CAST(sum(CAST(eq - pe AS DECIMAL(19, 0)) * (eq - pe))
      |    AS DECIMAL(38, 0)) AS sd2
      |  FROM l WHERE pe IS NOT NULL),
      |fin AS (SELECT n,
      |  round(CAST(s1 AS DOUBLE) / CAST(s2 AS DOUBLE), 9) AS rho,
      |  CAST(s2 AS DOUBLE) / 1.0e12 AS spp,
      |  CAST(sd2 AS DOUBLE) / 1.0e12 AS sdd,
      |  CAST(s1 AS DOUBLE) / 1.0e12 AS s1d
      |  FROM ag)
      |SELECT n AS n_days, round(rho, 6) AS rho,
      |  round(rho / sqrt(((sdd - 2.0e0 * rho * s1d
      |    + rho * rho * spp) / (n - 1)) / spp), 4) AS df_t
      |FROM fin""".stripMargin

  /** Atkinson inequality as ONE portable text — oracle of `x_atkinson`
    * and whole query of the `x_sql_atkinson` twin. ε = 1 (geometric
    * mean) and ε = ½ on per-customer spend; one grouped collapse + one
    * global aggregate — no windows, no bounded-frame machinery. */
  private[queries] val AtkinsonSql =
    """WITH cs AS (SELECT o_custkey, sum(o_totalprice) AS s
      |  FROM orders GROUP BY 1),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(s) AS mean,
      |  exp(avg(ln(s))) AS geo, avg(sqrt(s)) AS msq FROM cs)
      |SELECT n AS customers, round(mean, 4) AS mean_spend,
      |  round(1 - geo / mean, 6) AS atkinson_1,
      |  round(1 - (msq * msq) / mean, 6) AS atkinson_05
      |FROM a""".stripMargin

  val defs: Seq[QDef] = Seq(

    // RMST: "average event-free hours in the first 500" — the
    // clinically-preferred scalar summary of the KM curve (hazard
    // ratios need proportionality, RMST doesn't). Shares x_survival_km's
    // collapse; the step-function integral is lag algebra on the
    // horizon-bounded frame.
    QDef("x_rmst", RmstSql) { (s, d) =>
      val su = survivalUsers(s, d)
      val byDur = su.groupBy(col("dur").as("t"))
        .agg(sum(col("ev")).cast("double").as("d"),
          count(lit(1)).cast("double").as("c"))
      val atRisk = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prefix = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val km = byDur.withColumn("n", sum(col("c")).over(atRisk))
        .filter(col("d") > 0)
        .withColumn("surv", exp(sum(log(lit(1) - col("d") / col("n")))
          .over(prefix)))
        .select("t", "surv")
      val w = Window.orderBy("t")
      val seg = km.filter(col("t") <= 500)
        .withColumn("pt", coalesce(lag(col("t"), 1).over(w), lit(0L)))
        .withColumn("ps", coalesce(lag(col("surv"), 1).over(w), lit(1.0)))
      val a = seg.agg(sum(col("ps") * (col("t") - col("pt"))).as("area"),
        max(col("t")).as("tlast"), count(lit(1)).as("n_events"))
      val sl = seg.orderBy(col("t").desc).limit(1)
        .select(col("surv").as("slast"))
      a.crossJoin(broadcast(sl))
        .select(lit(500L).as("tau_hours"), col("n_events"),
          round(col("area") + col("slast") * (lit(500) - col("tlast")), 4)
            .as("rmst_hours"),
          round(col("slast"), 6).as("survival_at_tau"))
    },

    // (no x_sql_rmst twin: the survival CTEs use DuckDB's quoted
    // date_diff('hour', ...) unit, which Spark's parser rejects — the
    // whole KM family is Dataset-API-only for the same reason.)

    // HARRELL'S C: does user activity predict time-to-purchase — the
    // censoring-aware concordance the Cox fit (x_cox_ph) is usually
    // reported with. Risk buckets are value-domain bounded (6), so all
    // pair counting is prefix algebra over the duration-horizon frame:
    // ONE belowAndNMany pass, pair products in DOUBLE.
    QDef("x_harrell_c", HarrellSql) { (s, d) =>
      val bs = CBuckets
      val ev = Tables(s, d).events
      val act = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      val sb = survivalUsers(s, d).join(act, "user_id")
        .select(col("dur"), col("ev"),
          least(floor(col("cnt") / 5).cast("bigint"), lit(5L)).as("b"))
      val hist = sb.groupBy(col("dur").as("t")).agg(
        sum(when(col("b") === bs.head, 1L).otherwise(0L)).as(s"cb${bs.head}"),
        (bs.map(b =>
          sum(when(col("b") === b, col("ev")).otherwise(0L)).as(s"eb$b")) ++
          bs.tail.map(b =>
            sum(when(col("b") === b, 1L).otherwise(0L)).as(s"cb$b"))): _*)
      val cum = graft.ops.BinnedRank.belowAndNMany(hist, Seq.empty,
        floor(col("t") / 100).cast("bigint"), Seq(col("t")),
        bs.map(b => b.toString -> col(s"cb$b")))
      def above(b: Int) = col(s"n$b") - col(s"below$b") - col(s"cb$b")
      val conc = (for { b <- bs; lo <- bs if lo < b } yield
        col(s"eb$b").cast("double") * above(lo)).reduce(_ + _)
      val disc = (for { b <- bs; hi <- bs if hi > b } yield
        col(s"eb$b").cast("double") * above(hi)).reduce(_ + _)
      val tied = bs.map(b => col(s"eb$b").cast("double") * above(b))
        .reduce(_ + _)
      cum.agg(sum(conc).as("conc"), sum(disc).as("disc"),
          sum(tied).as("tied"))
        .select(col("conc").cast("bigint").as("concordant"),
          col("disc").cast("bigint").as("discordant"),
          col("tied").cast("bigint").as("tied_risk"),
          round((col("conc") + lit(0.5) * col("tied"))
            / (col("conc") + col("disc") + col("tied")), 6).as("c_index"))
    },

    // MAP@10 / MRR: the order-sensitive retrieval metrics beside
    // x_ndcg's graded gain — same capped probes, same exact-cosine
    // top-10, per-qid windows only.
    QDef("x_map_mrr", mapMrrOracle) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val top = graft.llm.Similarity
        .cosineTopK(emb.filter(col("vec_id") < 10), emb, 10)
        .join(emb.select(col("vec_id").as("qid"), col("label").as("lq")),
          Seq("qid"))
        .join(emb.select(col("vec_id").as("cid"), col("label").as("lc")),
          Seq("cid"))
        .select(col("qid"), col("rank"),
          when(col("lq") === col("lc"), 1.0).otherwise(0.0).as("rel"))
      val wCum = Window.partitionBy("qid").orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.withColumn("cr", sum(col("rel")).over(wCum))
        .groupBy("qid")
        .agg(
          round(when(sum(col("rel")) > 0,
            sum(when(col("rel") > 0, col("cr") / col("rank")).otherwise(0.0))
              / sum(col("rel"))).otherwise(0.0), 6).as("ap10"),
          round(when(sum(col("rel")) > 0,
            lit(1.0) / min(when(col("rel") > 0, col("rank"))))
            .otherwise(0.0), 6).as("rr"))
    },

    // BRIER + MURPHY DECOMPOSITION: quality of the monthly-propensity
    // URGENT forecast — the calibration-vs-sharpness split x_calibration
    // doesn't give. 12-row propensity folded scan-local, one weighted
    // pass.
    QDef("x_brier_decomp", BrierSql) { (s, d) =>
      val base = Tables(s, d).orders.select(
        when(col("o_orderpriority") === "1-URGENT", 1.0).otherwise(0.0)
          .as("y"),
        month(col("o_orderdate")).as("mo"))
      val ps = base.groupBy("mo")
        .agg(round(avg(col("y")), 6).as("p"), count(lit(1)).as("n"))
      val g = ps.agg(sum(col("n")).as("nn"),
        (sum(col("n") * col("p")) / sum(col("n"))).as("ybar"))
      val res = ps.crossJoin(broadcast(g))
        .agg((sum(col("n") * (col("p") - col("ybar"))
          * (col("p") - col("ybar"))) / max(col("nn"))).as("resolution"),
          max(col("ybar")).as("ybar"), max(col("nn")).as("nn"))
      val br = base.join(broadcast(ps.select("mo", "p")), "mo")
        .agg((sum((col("p") - col("y")) * (col("p") - col("y")))
          / count(lit(1))).as("brier"),
          (-sum(col("y") * log(col("p"))
            + (lit(1) - col("y")) * log(lit(1) - col("p")))
            / count(lit(1))).as("log_loss"))
      br.crossJoin(broadcast(res))
        .select(col("nn").as("n"), round(col("brier"), 6).as("brier"),
          round(col("log_loss"), 6).as("log_loss"),
          round(col("resolution"), 6).as("resolution"),
          round(col("ybar") * (lit(1) - col("ybar")), 6).as("uncertainty"))
    },

    // Brier through Spark's SQL parser — same shared text.
    QDef("x_sql_brier", BrierSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(BrierSql)
    },

    // ENGLE-GRANGER: are the two daily volumes cointegrated — OLS
    // residuals + the Dickey-Fuller t, the stationarity step before
    // trusting any levels-on-levels regression between series
    // (x_granger_lag1 is the differenced-side sibling).
    QDef("x_coint_eg", CointSql) { (s, d) =>
      // Exact-integer moment form (the KfoldSql/BreakSql pattern):
      // daily totals quantized to cents, OLS beta from BIGINT/DECIMAL
      // sums, residuals micro-quantized so the Dickey-Fuller sums are
      // exact integers — no driver collect()s and no order-dependent
      // double sum anywhere.
      val j = Tables(s, d).orders
        .groupBy(date_trunc("day", col("o_orderdate")).cast("date")
          .as("d"))
        .agg(count(lit(1)).as("x"),
          round(sum("o_totalprice") * lit(100.0), 0).cast("bigint")
            .as("yc"))
      val mo = j.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("yc").as("sy"),
        sum(col("x").cast("decimal(19,0)") * col("x"))
          .cast("decimal(38,0)").as("sxx"),
        sum(col("x").cast("decimal(19,0)") * col("yc"))
          .cast("decimal(38,0)").as("sxy"))
      val m = mo.select(
        round((col("n").cast("double")
            * (col("sxy").cast("double") / 1.0e7)
          - col("sx").cast("double")
            * (col("sy").cast("double") / 1.0e7))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")), 9)
          .as("b"),
        round(col("sy").cast("double") / 1.0e7 / col("n"), 9).as("my"),
        round(col("sx").cast("double") / col("n"), 9).as("mx"))
      val e = j.crossJoin(broadcast(m))
        .select(col("d"),
          floor((col("yc").cast("double") / 1.0e7
            - (col("my") - col("b") * col("mx"))
            - col("b") * col("x")) * 1.0e6 + lit(0.5)).cast("bigint")
            .as("eq"))
      val w = Window.orderBy("d")
      val l = e.select(col("d"), col("eq"),
          lag("eq", 1).over(w).as("pe"))
        .filter(col("pe").isNotNull)
      val ag = l.agg(count(col("pe")).as("n"),
        sum(col("pe").cast("decimal(19,0)") * (col("eq") - col("pe")))
          .cast("decimal(38,0)").as("s1"),
        sum(col("pe").cast("decimal(19,0)") * col("pe"))
          .cast("decimal(38,0)").as("s2"),
        sum((col("eq") - col("pe")).cast("decimal(19,0)")
          * (col("eq") - col("pe"))).cast("decimal(38,0)").as("sd2"))
      val fin = ag.select(col("n"),
        round(col("s1").cast("double") / col("s2").cast("double"), 9)
          .as("rho"),
        (col("s2").cast("double") / 1.0e12).as("spp"),
        (col("sd2").cast("double") / 1.0e12).as("sdd"),
        (col("s1").cast("double") / 1.0e12).as("s1d"))
      fin.select(col("n").as("n_days"), round(col("rho"), 6).as("rho"),
        round(col("rho") / sqrt(((col("sdd")
          - lit(2.0) * col("rho") * col("s1d")
          + col("rho") * col("rho") * col("spp")) / (col("n") - 1))
          / col("spp")), 4).as("df_t"))
    },

    // Engle-Granger through Spark's SQL parser — same shared text.
    QDef("x_sql_coint", CointSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(CointSql)
    },

    // ATKINSON: the welfare-theoretic inequality family beside x_gini /
    // x_theil_index — ε = 1 and ε = ½ on per-customer spend, two chained
    // aggregates, no windows at all.
    QDef("x_atkinson", AtkinsonSql) { (s, d) =>
      val cs = Tables(s, d).orders
        .groupBy("o_custkey").agg(sum(col("o_totalprice")).as("s"))
      cs.agg(count(lit(1)).as("n"), avg(col("s")).as("mean"),
          exp(avg(log(col("s")))).as("geo"),
          avg(sqrt(col("s"))).as("msq"))
        .select(col("n").as("customers"),
          round(col("mean"), 4).as("mean_spend"),
          round(lit(1) - col("geo") / col("mean"), 6).as("atkinson_1"),
          round(lit(1) - (col("msq") * col("msq")) / col("mean"), 6)
            .as("atkinson_05"))
    },

    // Atkinson through Spark's SQL parser — same shared text.
    QDef("x_sql_atkinson", AtkinsonSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(AtkinsonSql)
    }
  )
}
