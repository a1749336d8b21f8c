package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-34 batch: embedding-geometry and time-series diagnostics —
  * Two-NN intrinsic-dimension estimation, rich-club coefficients on the
  * high-value trade graph, Brown's double-exponential (Holt) forecast,
  * the sequential probability ratio test trajectory, NDCG retrieval
  * quality, Yule-Walker AR(2), and Cochrane-Orcutt autocorrelation-
  * corrected regression.
  *
  * Scale posture: ANN-style passes use an absolutely-capped probe set
  * broadcast into a single corpus scan with a bounded-heap top-k (the
  * x_sim_cosine_topk shape — the corpus never shuffles); everything
  * time-series runs on the calendar-bounded daily frame (the x_acf
  * carve-out class); the graph algebra runs on the 25-nation frame.
  */
object R34Ops {

  // ---- Two-NN intrinsic dimension ----

  /** Two-NN (Facco et al. 2017) intrinsic-dimension oracle: for each of
    * the ≤200 capped probes, the two nearest DISTINCT-position neighbors
    * by (6 dp-rounded L2², id tiebreak) over the full corpus;
    * ID̂ = n / Σ ln μ with μ = r2/r1 (ln μ = ½ ln(d2₂/d2₁) — exact-dup
    * clones are excluded by the d2 > 0 filter). */
  private[queries] def intrinsicDimOracle: String =
    s"""WITH ${StarExt.EmbExpl},
       |dd AS (
       |  SELECT a.vec_id AS q, b.vec_id AS c,
       |    round(sum((a.e - b.e) * (a.e - b.e)), 6) AS d2
       |  FROM ee a JOIN ee b ON b.j = a.j
       |    AND a.vec_id < 200 AND b.vec_id <> a.vec_id
       |  GROUP BY 1, 2),
       |rk AS (SELECT q, d2,
       |  row_number() OVER (PARTITION BY q ORDER BY d2, c) AS rn
       |  FROM dd WHERE d2 > 0),
       |mu AS (SELECT a.q, 0.5e0 * ln(b.d2 / a.d2) AS lnmu
       |  FROM rk a JOIN rk b ON b.q = a.q AND b.rn = 2
       |  WHERE a.rn = 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_probes,
       |  round(count(*) / sum(lnmu), 4) AS id_hat
       |FROM mu""".stripMargin

  // ---- rich-club coefficient ----

  /** The g4-family high-value trade graph (the x_graph_closeness edge
    * set) with per-vertex degrees — shared by `x_rich_club` and R35's
    * `x_ppr`. `mat = true` marks the CTEs `AS MATERIALIZED` for
    * DuckDB-dialect oracles whose fit rounds re-read them. */
  private[queries] def tradeEdgeCtes(mat: Boolean = false): String = {
    val m = if (mat) " MATERIALIZED" else ""
    s"""e0 AS$m (
       |  SELECT DISTINCT c.c_nationkey AS u, s.s_nationkey AS v
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  WHERE l.l_extendedprice > 104500),
       |e AS$m (SELECT u, v FROM (
       |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0) t WHERE u <> v),
       |deg AS$m (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e
       |  GROUP BY 1)""".stripMargin
  }

  /** Rich-club oracle: φ(k) = 2·E_k / (n_k (n_k − 1)) over nodes with
    * degree > k — all algebra on the 25-vertex frame. */
  private[queries] val RichClubSql =
    s"""WITH ${tradeEdgeCtes()},
      |ks AS (SELECT DISTINCT deg - 1 AS k FROM deg),
      |nk AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS n_k
      |  FROM ks JOIN deg ON deg.deg > ks.k GROUP BY 1),
      |ek AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS e2_k
      |  FROM ks
      |  JOIN e ON 1 = 1
      |  JOIN deg da ON da.u = e.u AND da.deg > ks.k
      |  JOIN deg db ON db.u = e.v AND db.deg > ks.k
      |  GROUP BY 1)
      |SELECT nk.k, nk.n_k,
      |  CAST(coalesce(ek.e2_k, 0) / 2 AS BIGINT) AS edges_k,
      |  round(coalesce(ek.e2_k, 0) / (CAST(nk.n_k AS DOUBLE)
      |    * (nk.n_k - 1)), 6) AS phi
      |FROM nk LEFT JOIN ek ON ek.k = nk.k
      |WHERE nk.n_k >= 2""".stripMargin

  // ---- Brown's double exponential smoothing (Holt forecast) ----

  /** Holt/Brown forecast oracle: daily event counts → truncated-window
    * EWMA (α = 0.3, K = 14, adaptive normalizer — the x_ewma kernel) →
    * the SAME smoother applied to the s1 series → level/trend/forecast
    * at the last observed day. Both windows order the calendar-bounded
    * daily frame. */
  private[queries] val HoltSql: String = {
    val K = 14
    def kernel(v: String) = {
      val num = (1 until K).map(k =>
        s"coalesce(lag($v, $k) OVER w, 0) * power(0.7e0, $k)")
        .mkString(s"$v + ", " + ", "")
      val den = (1 until K).map(k =>
        s"CASE WHEN lag($v, $k) OVER w IS NOT NULL THEN power(0.7e0, $k) ELSE 0 END")
        .mkString("1 + ", " + ", "")
      s"($num) / ($den)"
    }
    s"""WITH daily AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
       |    CAST(count(*) AS DOUBLE) AS y
       |  FROM events GROUP BY 1),
       |s1 AS (SELECT d, y, round(${kernel("y")}, 9) AS s1
       |  FROM daily WINDOW w AS (ORDER BY d)),
       |s2 AS (SELECT d, y, s1, round(${kernel("s1")}, 9) AS s2
       |  FROM s1 WINDOW w AS (ORDER BY d)),
       |last AS (SELECT * FROM s2 WHERE d = (SELECT max(d) FROM s2))
       |SELECT round(2 * s1 - s2, 6) AS level,
       |  round((0.3e0 / 0.7e0) * (s1 - s2), 6) AS trend,
       |  round((2 * s1 - s2) + 7 * (0.3e0 / 0.7e0) * (s1 - s2), 6)
       |    AS forecast_7d,
       |  round(y, 1) AS last_y
       |FROM last""".stripMargin
  }

  // ---- sequential probability ratio test ----

  /** SPRT oracle: Wald's sequential test of the URGENT rate (H0 p=0.18
    * vs H1 p=0.22, α = β = 0.05) replayed over the order-date calendar —
    * the "when could we have stopped" audit of a fixed-horizon
    * experiment. Cumulative LLR over the calendar-bounded daily frame;
    * releases the first boundary crossing and the final state. */
  private[queries] val SprtSql =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
      |      END) AS BIGINT) AS k,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1),
      |llr AS (SELECT d,
      |  sum(k * ln(0.22e0 / 0.18e0)
      |    + (n - k) * ln(0.78e0 / 0.82e0))
      |    OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
      |      ROW) AS llr
      |  FROM daily),
      |bounds AS (SELECT ln(0.95e0 / 0.05e0) AS a),
      |crossed AS (SELECT
      |  min(CASE WHEN llr >= (SELECT a FROM bounds) THEN d END) AS d_h1,
      |  min(CASE WHEN llr <= -(SELECT a FROM bounds) THEN d END) AS d_h0,
      |  CAST(count(*) AS BIGINT) AS n_days
      |  FROM llr),
      |fin AS (SELECT llr AS final_llr FROM llr
      |  WHERE d = (SELECT max(d) FROM llr))
      |SELECT crossed.n_days,
      |  CAST(coalesce(crossed.d_h1, crossed.d_h0) AS DATE) AS first_cross,
      |  CASE WHEN crossed.d_h1 IS NOT NULL
      |      AND (crossed.d_h0 IS NULL OR crossed.d_h1 <= crossed.d_h0)
      |    THEN 'accept_h1'
      |    WHEN crossed.d_h0 IS NOT NULL THEN 'accept_h0'
      |    ELSE 'continue' END AS decision,
      |  round(fin.final_llr, 4) AS final_llr
      |FROM crossed, fin""".stripMargin

  // ---- NDCG retrieval quality ----

  /** NDCG@10 oracle: exact cosine top-10 per capped probe (the
    * x_sim_cosine_topk chain), binary relevance = label match,
    * DCG/IDCG/NDCG per probe on the bounded 10-row rank frames. */
  private[queries] def ndcgOracle: String =
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
       |top AS (SELECT r.qid, r.cid, r.rank,
       |  CASE WHEN lq.label = lc.label THEN 1.0e0 ELSE 0.0e0 END AS rel
       |  FROM ranked r
       |  JOIN lab lq ON lq.vec_id = r.qid
       |  JOIN lab lc ON lc.vec_id = r.cid
       |  WHERE r.rank <= 10),
       |ideal AS (SELECT qid, rel,
       |  row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid)
       |    AS irank
       |  FROM top),
       |agg AS (SELECT t.qid,
       |  sum(t.rel / ln(t.rank + 1)) * ln(2) AS dcg,
       |  (SELECT sum(i.rel / ln(i.irank + 1)) * ln(2) FROM ideal i
       |    WHERE i.qid = t.qid) AS idcg
       |  FROM top t GROUP BY t.qid)
       |SELECT qid, round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
       |  round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END, 6) AS ndcg
       |FROM agg""".stripMargin

  // ---- Yule-Walker AR(2) ----

  /** Yule-Walker AR(2) as ONE portable SQL text — oracle of `x_ar2_yw`.
    * Lag-1/lag-2 autocorrelations of the daily count series (the x_acf
    * lag frame, calendar-bounded), snapped 6 dp; φ₁, φ₂ and the implied
    * lag-1 ACF in closed form. */
  private[queries] val Ar2Sql =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
      |    CAST(count(*) AS DOUBLE) AS y
      |  FROM events GROUP BY 1),
      |lagd AS (SELECT d, y,
      |  lag(y, 1) OVER (ORDER BY d) AS y1,
      |  lag(y, 2) OVER (ORDER BY d) AS y2
      |  FROM daily),
      |r AS (SELECT round(corr(y, y1), 6) AS r1, round(corr(y, y2), 6)
      |    AS r2,
      |  CAST(count(*) AS BIGINT) AS n_days
      |  FROM lagd)
      |SELECT n_days, r1, r2,
      |  round(r1 * (1 - r2) / (1 - r1 * r1), 6) AS phi1,
      |  round((r2 - r1 * r1) / (1 - r1 * r1), 6) AS phi2
      |FROM r""".stripMargin

  // ---- Cochrane-Orcutt ----

  /** Cochrane-Orcutt as ONE portable SQL text — oracle of
    * `x_cochrane_orcutt`. OLS of daily counts on the observed-day index,
    * residual lag-1 autocorrelation ρ (snapped), ρ-differenced refit —
    * all passes over the calendar-bounded daily frame. */
  private[queries] val CochraneOrcuttSql =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
      |    CAST(count(*) AS DOUBLE) AS y
      |  FROM events GROUP BY 1),
      |idx AS (SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS DOUBLE)
      |    AS i, y
      |  FROM daily),
      |m AS (SELECT round(covar_samp(i, y) / var_samp(i), 9) AS b,
      |  round(avg(y) - covar_samp(i, y) / var_samp(i) * avg(i), 9) AS a
      |  FROM idx),
      |res AS (SELECT i, y, y - m.a - m.b * i AS u FROM idx, m),
      |lr AS (SELECT i, y, u, lag(u, 1) OVER (ORDER BY i) AS u1,
      |  lag(y, 1) OVER (ORDER BY i) AS yl,
      |  lag(i, 1) OVER (ORDER BY i) AS il
      |  FROM res),
      |rho AS (SELECT round(sum(u * u1) / sum(u1 * u1), 9) AS rho
      |  FROM lr WHERE u1 IS NOT NULL),
      |tr AS (SELECT lr.y - rho.rho * lr.yl AS ys,
      |  lr.i - rho.rho * lr.il AS xs
      |  FROM lr, rho WHERE lr.yl IS NOT NULL),
      |fit AS (SELECT round(covar_samp(xs, ys) / var_samp(xs), 6) AS b_co,
      |  round(avg(ys) - covar_samp(xs, ys) / var_samp(xs) * avg(xs), 6)
      |    AS a_star
      |  FROM tr)
      |SELECT rho.rho AS rho, round(m.b, 6) AS slope_ols, fit.b_co
      |    AS slope_co,
      |  round(fit.a_star / (1 - rho.rho), 4) AS intercept_co
      |FROM rho, m, fit""".stripMargin

  val defs: Seq[QDef] = Seq(

    // TWO-NN INTRINSIC DIMENSION: how many effective degrees of freedom
    // the embedding corpus occupies — the curse-of-dimensionality meter
    // behind every ANN recall/nlist decision. Capped probe set (< 200
    // ids, absolute — the x_dedup_srp_recall lesson) broadcast into ONE
    // corpus scan; the two nearest nonzero neighbors per probe come from
    // the bounded-heap TopKByScore aggregate; the MLE folds on the
    // probe-sized frame.
    QDef("x_intrinsic_dim", intrinsicDimOracle) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val probes = emb.filter(col("vec_id") < 200)
        .select(col("vec_id").as("q"), col("embedding").as("qe"))
      val scored = emb.select(col("vec_id").as("c"), col("embedding")
          .as("ce"))
        .crossJoin(broadcast(probes))
        .filter(col("c") =!= col("q"))
        .select(col("q"), col("c"),
          round(graft.functions.GraftFunctions.l2Sq(col("qe"), col("ce")), 6)
            .as("d2"))
        .filter(col("d2") > 0)
      val top2 = scored
        .groupBy("q")
        .agg(graft.functions.TopKByScore.topKByScore(-col("d2"), col("c"), 2)
          .as("top"))
        .select(col("q"),
          (-element_at(col("top"), 1).getField("score")).as("d2a"),
          (-element_at(col("top"), 2).getField("score")).as("d2b"))
      top2.select((lit(0.5) * log(col("d2b") / col("d2a"))).as("lnmu"))
        .agg(count(lit(1)).as("n_probes"),
          round(count(lit(1)) / sum(col("lnmu")), 4).as("id_hat"))
    },

    // RICH-CLUB COEFFICIENT: do high-degree nations preferentially trade
    // with each other. Corpus work = the one distinct-edge aggregate of
    // the g4 graph family; φ(k) is (k-grid × 25-vertex) algebra with no
    // windows at all.
    QDef("x_rich_club", RichClubSql) { (s, d) =>
      val t = Tables(s, d)
      val e0 = t.lineitem.filter(col("l_extendedprice") > 104500)
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").cast("int").as("u"),
          col("s_nationkey").cast("int").as("v")).distinct()
      val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        .distinct().filter(col("u") =!= col("v"))
      val deg = e.groupBy("u").agg(count(lit(1)).as("deg"))
      // k grid = deg − 1 so even a saturated (complete) graph yields its
      // φ(max−1) = 1 row — the sf0.1 fixture densifies to complete and a
      // deg-valued grid would release ZERO rows (vacuous pass). The grid
      // is vertex-domain-bounded and broadcast, so the non-equi grid
      // joins plan as BroadcastNestedLoopJoin, never CartesianProduct.
      val ks = broadcast(deg.select((col("deg") - 1).as("k")).distinct())
      val nk = deg.join(ks, col("deg") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("n_k"))
      val em = e
        .join(deg.select(col("u").as("ua"), col("deg").as("da")),
          col("u") === col("ua"))
        .join(deg.select(col("u").as("ub"), col("deg").as("db")),
          col("v") === col("ub"))
        .select(least(col("da"), col("db")).as("md"))
      val ek = em.join(ks, col("md") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("e2_k"))
      nk.join(ek, Seq("k"), "left")
        .filter(col("n_k") >= 2)
        .select(col("k"), col("n_k"),
          (coalesce(col("e2_k"), lit(0L)) / 2).cast("bigint").as("edges_k"),
          round(coalesce(col("e2_k"), lit(0L))
            / (col("n_k").cast("double") * (col("n_k") - 1)), 6).as("phi"))
    },

    // HOLT / BROWN DOUBLE-EXPONENTIAL FORECAST: level + trend from two
    // chained truncated-EWMA passes (the x_ewma kernel applied twice)
    // over the calendar-bounded daily frame; 7-day-ahead forecast at the
    // last observed day.
    QDef("x_holt_forecast", HoltSql) { (s, d) =>
      val K = 14
      val daily = Tables(s, d).events
        .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
        .agg(count(lit(1)).cast("double").as("y"))
      val w = Window.orderBy("d")
      def kernel(v: org.apache.spark.sql.Column) = {
        val num = (1 until K).foldLeft(v) { (acc, k) =>
          acc + coalesce(lag(v, k).over(w), lit(0.0)) * math.pow(0.7, k)
        }
        val den = (1 until K).foldLeft(lit(1.0)) { (acc, k) =>
          acc + when(lag(v, k).over(w).isNotNull, math.pow(0.7, k))
            .otherwise(0.0)
        }
        num / den
      }
      val s1 = daily.withColumn("s1", round(kernel(col("y")), 9))
      val s2 = s1.withColumn("s2", round(kernel(col("s1")), 9))
      val lastD = s2.agg(max(col("d"))).head().getDate(0)
      s2.filter(col("d") === lit(lastD))
        .select(round(lit(2) * col("s1") - col("s2"), 6).as("level"),
          round(lit(0.3 / 0.7) * (col("s1") - col("s2")), 6).as("trend"),
          round((lit(2) * col("s1") - col("s2"))
            + lit(7) * lit(0.3 / 0.7) * (col("s1") - col("s2")), 6)
            .as("forecast_7d"),
          round(col("y"), 1).as("last_y"))
    },

    // SPRT TRAJECTORY: Wald's sequential test of the URGENT rate over the
    // order calendar — cumulative LLR on the calendar-bounded daily
    // frame, first boundary crossing + final state released.
    QDef("x_sprt", SprtSql) { (s, d) =>
      val daily = Tables(s, d).orders
        .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("d"))
        .agg(sum(when(col("o_orderpriority") === "1-URGENT", 1L)
          .otherwise(0L)).as("k"), count(lit(1)).as("n"))
      val cum = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val llr = daily.withColumn("llr",
        sum(col("k") * math.log(0.22 / 0.18)
          + (col("n") - col("k")) * math.log(0.78 / 0.82)).over(cum))
      val a = math.log(0.95 / 0.05)
      val crossed = llr.agg(
        min(when(col("llr") >= a, col("d"))).as("d_h1"),
        min(when(col("llr") <= -a, col("d"))).as("d_h0"),
        count(lit(1)).as("n_days"), max(col("d")).as("dmax"))
      val fin = llr.join(broadcast(crossed), col("d") === col("dmax"))
      fin.select(col("n_days"),
        coalesce(col("d_h1"), col("d_h0")).as("first_cross"),
        when(col("d_h1").isNotNull
            && (col("d_h0").isNull || col("d_h1") <= col("d_h0")),
          "accept_h1")
          .when(col("d_h0").isNotNull, "accept_h0")
          .otherwise("continue").as("decision"),
        round(col("llr"), 4).as("final_llr"))
    },

    // NDCG@10: retrieval quality of exact cosine search against
    // label-match relevance — the eval the ANN tiers are ultimately
    // graded on. Capped probe set, bounded per-probe rank frames, binary
    // relevance; DCG in the ln(2)-normalized form both engines share.
    QDef("x_ndcg", ndcgOracle) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val top = graft.llm.Similarity
        .cosineTopK(emb.filter(col("vec_id") < 10), emb, 10)
        .join(emb.select(col("vec_id").as("qid"), col("label").as("lq")),
          Seq("qid"))
        .join(emb.select(col("vec_id").as("cid"), col("label").as("lc")),
          Seq("cid"))
        .select(col("qid"), col("cid"), col("rank"),
          when(col("lq") === col("lc"), 1.0).otherwise(0.0).as("rel"))
      val wIdeal = Window.partitionBy("qid")
        .orderBy(col("rel").desc, col("cid"))
      val ideal = top.withColumn("irank", row_number().over(wIdeal))
      val dcg = top.groupBy("qid")
        .agg((sum(col("rel") / log(col("rank") + 1)) * math.log(2.0))
          .as("dcg"))
      val idcg = ideal.groupBy("qid")
        .agg((sum(col("rel") / log(col("irank") + 1)) * math.log(2.0))
          .as("idcg"))
      dcg.join(idcg, Seq("qid"))
        .select(col("qid"), round(col("dcg"), 6).as("dcg"),
          round(col("idcg"), 6).as("idcg"),
          round(when(col("idcg") > 0, col("dcg") / col("idcg"))
            .otherwise(0.0), 6).as("ndcg"))
    },

    // YULE-WALKER AR(2): autoregressive structure of the daily event
    // volume in closed form from the snapped lag-1/lag-2 ACF — the model
    // identification step before x_poisson_glm-style trend fits.
    QDef("x_ar2_yw", Ar2Sql) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
        .agg(count(lit(1)).cast("double").as("y"))
      val w = Window.orderBy("d")
      val lagd = daily.select(col("y"),
        lag(col("y"), 1).over(w).as("y1"),
        lag(col("y"), 2).over(w).as("y2"))
      val r = lagd.agg(round(corr(col("y"), col("y1")), 6).as("r1"),
        round(corr(col("y"), col("y2")), 6).as("r2"),
        count(lit(1)).as("n_days"))
      r.select(col("n_days"), col("r1"), col("r2"),
        round(col("r1") * (lit(1) - col("r2"))
          / (lit(1) - col("r1") * col("r1")), 6).as("phi1"),
        round((col("r2") - col("r1") * col("r1"))
          / (lit(1) - col("r1") * col("r1")), 6).as("phi2"))
    },

    // COCHRANE-ORCUTT: the autocorrelation-corrected trend — OLS, ρ from
    // the residual lag-1 regression (through the origin, the textbook
    // estimator), ρ-differenced refit. Serially-correlated daily series
    // make naive OLS SEs lie; this is the classical fix, all on the
    // calendar-bounded frame.
    QDef("x_cochrane_orcutt", CochraneOrcuttSql) { (s, d) =>
      def snap9(v: Double) =
        BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val daily = Tables(s, d).events
        .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
        .agg(count(lit(1)).cast("double").as("y"))
      val idx = daily.select(
        (row_number().over(Window.orderBy("d")) - 1).cast("double").as("i"),
        col("y"))
      val mRow = idx.agg(
        (covar_samp(col("i"), col("y")) / var_samp(col("i"))).as("braw"),
        avg(col("y")).as("my"), avg(col("i")).as("mi")).head()
      val b = snap9(mRow.getDouble(0))
      val a = snap9(mRow.getDouble(1) - mRow.getDouble(0) * mRow.getDouble(2))
      val w = Window.orderBy("i")
      val u = col("y") - lit(a) - lit(b) * col("i")
      val lr = idx.select(col("i"), col("y"), u.as("u"),
        lag(u, 1).over(w).as("u1"),
        lag(col("y"), 1).over(w).as("yl"),
        lag(col("i"), 1).over(w).as("il"))
      val rho = snap9(lr.filter(col("u1").isNotNull)
        .agg((sum(col("u") * col("u1")) / sum(col("u1") * col("u1"))))
        .head().getDouble(0))
      val tr = lr.filter(col("yl").isNotNull)
        .select((col("y") - lit(rho) * col("yl")).as("ys"),
          (col("i") - lit(rho) * col("il")).as("xs"))
      tr.agg(
        round(covar_samp(col("xs"), col("ys")) / var_samp(col("xs")), 6)
          .as("b_co"),
        round(avg(col("ys")) - covar_samp(col("xs"), col("ys"))
          / var_samp(col("xs")) * avg(col("xs")), 6).as("a_star"))
        .select(lit(rho).as("rho"), round(lit(b), 6).as("slope_ols"),
          col("b_co").as("slope_co"),
          round(col("a_star") / (lit(1) - lit(rho)), 4).as("intercept_co"))
    }
  )
}
