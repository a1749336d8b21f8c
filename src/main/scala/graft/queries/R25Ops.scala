package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-25 batch: the experimentation / causal-inference family —
  * stratified treatment effects, difference-in-differences, CUPED
  * variance reduction, the sample-ratio-mismatch guardrail, and a
  * seasonal-naive forecast backtest. Every operator is one or two
  * map-side-combined aggregates plus 1-row/stratum-frame algebra with
  * the snapped-moment convention; lags and periods come from date
  * arithmetic, never windows.
  */
object R25Ops {

  val defs: Seq[QDef] = Seq(

    // STRATIFIED AVERAGE TREATMENT EFFECT: high order priority as the
    // "treatment", order value as the outcome, market segment as the
    // stratifier — ATE = Σ_g (n_g/N)·(ȳ_t − ȳ_c). ONE grouped indicator
    // pass; strata algebra on the 5-row frame; the weighted effect
    // broadcast beside each stratum.
    QDef("x_ate_strat",
      """WITH oc AS (
        |  SELECT c.c_mktsegment AS g, o.o_totalprice AS y,
        |    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS t
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |  sum(CASE WHEN t = 1 THEN y END) / sum(t) AS mt,
        |  sum(CASE WHEN t = 0 THEN y END) / sum(1 - t) AS mc
        |  FROM oc GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |  round(sum(n * (mt - mc)) / sum(n), 4) AS ate FROM st)
        |SELECT st.g AS segment, st.n, round(st.mt, 4) AS mean_treated,
        |  round(st.mc, 4) AS mean_control,
        |  round(st.mt - st.mc, 4) AS strata_diff, tot.ate
        |FROM st, tot""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("y"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("t"))
      val st = oc.groupBy("g").agg(count(lit(1)).as("n"),
        (sum(when(col("t") === 1, col("y"))) / sum(col("t"))).as("mt"),
        (sum(when(col("t") === 0, col("y"))) / sum(lit(1) - col("t")))
          .as("mc"))
      val tot = st.agg(sum(col("n")).as("nn"),
        round(sum(col("n") * (col("mt") - col("mc"))) / sum(col("n")), 4)
          .as("ate"))
      st.crossJoin(broadcast(tot))
        .select(col("g").as("segment"), col("n"),
          round(col("mt"), 4).as("mean_treated"),
          round(col("mc"), 4).as("mean_control"),
          round(col("mt") - col("mc"), 4).as("strata_diff"), col("ate"))
    },

    // DIFFERENCE-IN-DIFFERENCES on purchase value: even/odd user arms ×
    // pre/post Jan 16 periods — DiD = (ȳ_A,post − ȳ_A,pre) −
    // (ȳ_B,post − ȳ_B,pre) from ONE 4-cell indicator aggregate.
    QDef("x_diff_in_diff",
      """WITH p AS (
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
        |      THEN 0 ELSE 1 END AS post, value AS y
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT
        |  sum(CASE WHEN arm = 0 AND post = 0 THEN y END)
        |    / sum(CASE WHEN arm = 0 AND post = 0 THEN 1 END) AS a_pre,
        |  sum(CASE WHEN arm = 0 AND post = 1 THEN y END)
        |    / sum(CASE WHEN arm = 0 AND post = 1 THEN 1 END) AS a_post,
        |  sum(CASE WHEN arm = 1 AND post = 0 THEN y END)
        |    / sum(CASE WHEN arm = 1 AND post = 0 THEN 1 END) AS b_pre,
        |  sum(CASE WHEN arm = 1 AND post = 1 THEN y END)
        |    / sum(CASE WHEN arm = 1 AND post = 1 THEN 1 END) AS b_post,
        |  CAST(count(*) AS BIGINT) AS n
        |  FROM p)
        |SELECT n, round(a_pre, 4) AS a_pre, round(a_post, 4) AS a_post,
        |  round(b_pre, 4) AS b_pre, round(b_post, 4) AS b_post,
        |  round((a_post - a_pre) - (b_post - b_pre), 4) AS did
        |FROM c""".stripMargin) { (s, d) =>
      val p = Tables(s, d).events
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("arm"),
          when(to_date(col("ts")) < lit(java.sql.Date.valueOf("2024-01-16")),
            0).otherwise(1).as("post"),
          col("value").as("y"))
      def cellMean(a: Int, po: Int) =
        sum(when(col("arm") === a && col("post") === po, col("y"))) /
          sum(when(col("arm") === a && col("post") === po, 1))
      val c = p.agg(cellMean(0, 0).as("a_pre"), cellMean(0, 1).as("a_post"),
        cellMean(1, 0).as("b_pre"), cellMean(1, 1).as("b_post"),
        count(lit(1)).as("n"))
      c.select(col("n"), round(col("a_pre"), 4).as("a_pre"),
        round(col("a_post"), 4).as("a_post"),
        round(col("b_pre"), 4).as("b_pre"),
        round(col("b_post"), 4).as("b_post"),
        round((col("a_post") - col("a_pre"))
          - (col("b_post") - col("b_pre")), 4).as("did"))
    },

    // CUPED VARIANCE REDUCTION: adjust each user's post-period purchase
    // value by their pre-period covariate (θ = cov(pre,post)/var(pre),
    // snapped) — the modern A/B-test precision tool. Two passes: the
    // per-user pre/post aggregate + moment pass, then the adjusted
    // indicator aggregate against broadcast θ/μ_pre.
    QDef("x_cuped",
      """WITH u AS (
        |  SELECT user_id,
        |    coalesce(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
        |      THEN value END), 0) AS pre,
        |    coalesce(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
        |      THEN value END), 0) AS post
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(covar_samp(pre, post) / var_samp(pre), 6) AS theta,
        |  round(avg(pre), 6) AS mpre,
        |  round(var_samp(post), 4) AS var_post FROM u),
        |adj AS (SELECT u.user_id % 2 AS arm,
        |  u.post - m.theta * (u.pre - m.mpre) AS ya, u.post AS yr
        |  FROM u, m),
        |st AS (SELECT
        |  sum(CASE WHEN arm = 0 THEN yr END) / sum(CASE WHEN arm = 0
        |    THEN 1 END)
        |  - sum(CASE WHEN arm = 1 THEN yr END) / sum(CASE WHEN arm = 1
        |    THEN 1 END) AS raw_diff,
        |  sum(CASE WHEN arm = 0 THEN ya END) / sum(CASE WHEN arm = 0
        |    THEN 1 END)
        |  - sum(CASE WHEN arm = 1 THEN ya END) / sum(CASE WHEN arm = 1
        |    THEN 1 END) AS adj_diff,
        |  round(var_samp(ya), 4) AS var_adj
        |  FROM adj)
        |SELECT m.n AS n_users, m.theta, round(st.raw_diff, 4) AS raw_diff,
        |  round(st.adj_diff, 4) AS adj_diff,
        |  round(1 - st.var_adj / m.var_post, 4) AS var_reduction
        |FROM m, st""".stripMargin) { (s, d) =>
      val cutoff = lit(java.sql.Date.valueOf("2024-01-16"))
      val u = Tables(s, d).events
        .filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(
          coalesce(sum(when(to_date(col("ts")) < cutoff, col("value"))),
            lit(0.0)).as("pre"),
          coalesce(sum(when(to_date(col("ts")) >= cutoff, col("value"))),
            lit(0.0)).as("post"))
      val m = u.agg(count(lit(1)).as("n"),
        round(covar_samp(col("pre"), col("post")) / var_samp(col("pre")), 6)
          .as("theta"),
        round(avg(col("pre")), 6).as("mpre"),
        round(var_samp(col("post")), 4).as("var_post"))
      val adj = u.crossJoin(broadcast(m))
        .select((col("user_id") % 2).as("arm"),
          (col("post") - col("theta") * (col("pre") - col("mpre"))).as("ya"),
          col("post").as("yr"))
      def armMean(c: String, a: Int) =
        sum(when(col("arm") === a, col(c))) /
          sum(when(col("arm") === a, 1))
      val st = adj.agg(
        (armMean("yr", 0) - armMean("yr", 1)).as("raw_diff"),
        (armMean("ya", 0) - armMean("ya", 1)).as("adj_diff"),
        round(var_samp(col("ya")), 4).as("var_adj"))
      m.crossJoin(broadcast(st))
        .select(col("n").as("n_users"), col("theta"),
          round(col("raw_diff"), 4).as("raw_diff"),
          round(col("adj_diff"), 4).as("adj_diff"),
          round(lit(1) - col("var_adj") / col("var_post"), 4)
            .as("var_reduction"))
    },

    // SAMPLE RATIO MISMATCH guardrail: does the even/odd signup split
    // deviate from 50/50 — the first A/B sanity check. One indicator
    // aggregate, 1-df chi-square on exact counts.
    QDef("x_srm_check",
      """WITH s AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'signup'),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_a
        |  FROM s)
        |SELECT n, n_a, n - n_a AS n_b,
        |  round(pow(n_a - n / 2.0e0, 2) / (n / 2.0e0)
        |    + pow((n - n_a) - n / 2.0e0, 2) / (n / 2.0e0), 4) AS chi2
        |FROM c""".stripMargin) { (s, d) =>
      val su = Tables(s, d).events
        .filter(col("event_type") === "signup")
        .select("user_id").distinct()
      val c = su.agg(count(lit(1)).as("n"),
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"))
      val half = col("n") / lit(2.0)
      c.select(col("n"), col("n_a"), (col("n") - col("n_a")).as("n_b"),
        round(pow(col("n_a") - half, 2) / half
          + pow((col("n") - col("n_a")) - half, 2) / half, 4).as("chi2"))
    },

    // SEASONAL-NAIVE FORECAST BACKTEST: predict each of the last 10
    // days' event counts with the value 7 days (seasonal) and 1 day
    // (naive) earlier; MAE / RMSE / MAPE per method — the forecasting
    // baseline every pipeline needs before anything fancier. Lags by
    // DATE equi-join; errors are exact integer differences.
    QDef("x_forecast_backtest",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |hi AS (SELECT max(dd) AS dmax FROM daily),
        |test AS (SELECT dd, c FROM daily, hi
        |  WHERE dd > dmax - 10),
        |j AS (
        |  SELECT 7 AS lag_days, t.c AS actual, f.c AS forecast
        |  FROM test t JOIN daily f ON f.dd + 7 = t.dd
        |  UNION ALL
        |  SELECT 1, t.c, f.c FROM test t JOIN daily f ON f.dd + 1 = t.dd)
        |SELECT lag_days, CAST(count(*) AS BIGINT) AS n_days,
        |  round(avg(abs(actual - forecast)), 4) AS mae,
        |  round(sqrt(avg(pow(CAST(actual - forecast AS DOUBLE), 2))), 4)
        |    AS rmse,
        |  round(avg(abs(actual - forecast) / CAST(actual AS DOUBLE)), 6)
        |    AS mape
        |FROM j GROUP BY 1""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(count(lit(1)).as("c"))
      val hi = daily.agg(max(col("dd")).as("dmax"))
      val test = daily.crossJoin(broadcast(hi))
        .filter(col("dd") > date_sub(col("dmax"), 10))
        .select(col("dd"), col("c").as("actual"))
      def leg(k: Int) = test.join(
        daily.select(date_add(col("dd"), k).as("dd"),
          col("c").as("forecast")), "dd")
        .select(lit(k).as("lag_days"), col("actual"), col("forecast"))
      leg(7).union(leg(1))
        .groupBy("lag_days")
        .agg(count(lit(1)).as("n_days"),
          round(avg(abs(col("actual") - col("forecast"))), 4).as("mae"),
          round(sqrt(avg(pow((col("actual") - col("forecast"))
            .cast("double"), 2))), 4).as("rmse"),
          round(avg(abs(col("actual") - col("forecast"))
            / col("actual").cast("double")), 6).as("mape"))
    }
  )
}
