package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-22 batch: lead-lag dependence (Granger lag-1 F, cross-
  * correlation function), multi-treatment agreement (Cochran's Q),
  * partial correlation, and the odds ratio with its Wald interval —
  * series work by DATE equi-joins on the calendar frame (no windows),
  * everything else one-pass indicator/moment aggregates with the
  * snapped-release convention.
  */
object R22Ops {

  /** Cochran's Q as ONE portable SQL text — oracle of `x_cochran_q` and
    * whole query of the `x_sql_cochran` twin. */
  private[queries] val CochranSql =
    """WITH r AS (SELECT
      |  CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END AS a,
      |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END AS b,
      |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS c
      |  FROM orders),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb,
      |  CAST(sum(c) AS BIGINT) AS cc,
      |  CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS r2
      |  FROM r),
      |q AS (SELECT n, ca, cb, cc,
      |  CAST(ca + cb + cc AS BIGINT) AS t, r2 FROM s)
      |SELECT n, ca AS high_price, cb AS high_priority, cc AS finished,
      |  round(3 * 2 * ((ca - t / 3.0e0) * (ca - t / 3.0e0)
      |      + (cb - t / 3.0e0) * (cb - t / 3.0e0)
      |      + (cc - t / 3.0e0) * (cc - t / 3.0e0))
      |    / (3.0e0 * t - r2), 4) AS q_stat
      |FROM q""".stripMargin

  /** Odds ratio as ONE portable SQL text — oracle of `x_odds_ratio` and
    * whole query of the `x_sql_odds` twin. */
  private[queries] val OddsSql =
    """WITH r AS (SELECT
      |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END AS a,
      |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS b
      |  FROM orders),
      |s AS (SELECT CAST(sum(a * b) AS BIGINT) AS n11,
      |  CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
      |  CAST(sum((1 - a) * b) AS BIGINT) AS n01,
      |  CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      |  FROM r),
      |k AS (SELECT n11, n10, n01, n00,
      |  (CAST(n11 AS DOUBLE) * n00) / (CAST(n10 AS DOUBLE) * n01) AS orr,
      |  sqrt(1.0e0 / n11 + 1.0e0 / n10 + 1.0e0 / n01 + 1.0e0 / n00) AS se
      |  FROM s)
      |SELECT n11, n10, n01, n00, round(orr, 4) AS odds_ratio,
      |  round(ln(orr), 4) AS log_or,
      |  round(exp(ln(orr) - 1.96e0 * se), 4) AS ci_lo,
      |  round(exp(ln(orr) + 1.96e0 * se), 4) AS ci_hi
      |FROM k""".stripMargin

  val defs: Seq[QDef] = Seq(

    // GRANGER LAG-1 TEST: do yesterday's views help predict today's
    // purchases beyond yesterday's purchases? Restricted (y ~ y₋₁) vs
    // full (y ~ y₋₁ + x₋₁) OLS by closed-form normal equations (the
    // x_harmonic_fit Cramer solve), F from the SSE gap. Lags come from
    // DATE equi-joins of the calendar frame — no window, no explode.
    QDef("x_granger_lag1",
      """WITH dv AS (SELECT CAST(ts AS DATE) AS dd,
        |  CAST(count(*) AS DOUBLE) AS x
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |dp AS (SELECT CAST(ts AS DATE) AS dd,
        |  CAST(count(*) AS DOUBLE) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT dp.y, py.y AS yl, pv.x AS xl
        |  FROM dp JOIN dp py ON py.dd + 1 = dp.dd
        |  JOIN dv pv ON pv.dd + 1 = dp.dd),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(yl) AS s1, sum(xl) AS s2, sum(yl * yl) AS s11,
        |  sum(xl * xl) AS s22, sum(yl * xl) AS s12,
        |  sum(y) AS sy, sum(y * yl) AS sy1, sum(y * xl) AS sy2
        |  FROM l),
        |rfit AS (SELECT n,
        |  round((n * sy1 - s1 * sy) / (n * s11 - s1 * s1), 6) AS rb,
        |  round((sy - (n * sy1 - s1 * sy) / (n * s11 - s1 * s1) * s1) / n,
        |    6) AS ra
        |  FROM mo),
        |ffit AS (SELECT n,
        |  round((sy * (s11 * s22 - s12 * s12)
        |    - s1 * (sy1 * s22 - s12 * sy2)
        |    + s2 * (sy1 * s12 - s11 * sy2))
        |   / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2)), 6) AS fa,
        |  round((n * (sy1 * s22 - sy2 * s12) - sy * (s1 * s22 - s12 * s2)
        |    + s2 * (s1 * sy2 - sy1 * s2))
        |   / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2)), 6) AS fb,
        |  round((n * (s11 * sy2 - s12 * sy1) - s1 * (s1 * sy2 - sy1 * s2)
        |    + sy * (s1 * s12 - s11 * s2))
        |   / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2)), 6) AS fc
        |  FROM mo),
        |sse AS (SELECT max(rfit.n) AS n, max(ffit.fb) AS beta_self,
        |  max(ffit.fc) AS beta_cross,
        |  sum(pow(l.y - (rfit.ra + rfit.rb * l.yl), 2)) AS sse_r,
        |  sum(pow(l.y - (ffit.fa + ffit.fb * l.yl + ffit.fc * l.xl), 2))
        |    AS sse_f
        |  FROM l, rfit, ffit)
        |SELECT n AS n_days, beta_self, beta_cross,
        |  round((sse_r - sse_f) / (sse_f / (n - 3)), 4) AS f_stat
        |FROM sse""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      def daily(t: String, cn: String) = ev.filter(col("event_type") === t)
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(count(lit(1)).cast("double").as(cn))
      val dp = daily("purchase", "y")
      val py = daily("purchase", "yl")
        .select(date_add(col("dd"), 1).as("dd"), col("yl"))
      val pv = daily("view", "xl")
        .select(date_add(col("dd"), 1).as("dd"), col("xl"))
      val l = dp.join(py, "dd").join(pv, "dd").select("y", "yl", "xl")
      val mo = l.agg(count(lit(1)).as("n"),
        sum(col("yl")).as("s1"), sum(col("xl")).as("s2"),
        sum(col("yl") * col("yl")).as("s11"),
        sum(col("xl") * col("xl")).as("s22"),
        sum(col("yl") * col("xl")).as("s12"),
        sum(col("y")).as("sy"), sum(col("y") * col("yl")).as("sy1"),
        sum(col("y") * col("xl")).as("sy2"))
      val rbRaw = (col("n") * col("sy1") - col("s1") * col("sy")) /
        (col("n") * col("s11") - col("s1") * col("s1"))
      val rfit = mo.select(col("n"), round(rbRaw, 6).as("rb"),
        round((col("sy") - rbRaw * col("s1")) / col("n"), 6).as("ra"))
      val det = col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
        col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
        col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
      val det0 = col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
        col("s1") * (col("sy1") * col("s22") - col("s12") * col("sy2")) +
        col("s2") * (col("sy1") * col("s12") - col("s11") * col("sy2"))
      val det1 = col("n") * (col("sy1") * col("s22") - col("sy2") * col("s12")) -
        col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
        col("s2") * (col("s1") * col("sy2") - col("sy1") * col("s2"))
      val det2 = col("n") * (col("s11") * col("sy2") - col("s12") * col("sy1")) -
        col("s1") * (col("s1") * col("sy2") - col("sy1") * col("s2")) +
        col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
      val ffit = mo.select(round(det0 / det, 6).as("fa"),
        round(det1 / det, 6).as("fb"), round(det2 / det, 6).as("fc"))
      val sse = l.crossJoin(broadcast(rfit)).crossJoin(broadcast(ffit))
        .agg(max(col("n")).as("n"), max(col("fb")).as("beta_self"),
          max(col("fc")).as("beta_cross"),
          sum(pow(col("y") - (col("ra") + col("rb") * col("yl")), 2))
            .as("sse_r"),
          sum(pow(col("y") - (col("fa") + col("fb") * col("yl")
            + col("fc") * col("xl")), 2)).as("sse_f"))
      sse.select(col("n").as("n_days"), col("beta_self"), col("beta_cross"),
        round((col("sse_r") - col("sse_f"))
          / (col("sse_f") / (col("n") - lit(3))), 4).as("f_stat"))
    },

    // COCHRAN'S Q across three binary order "treatments" (high price,
    // high priority, finished status): do the three flags mark the same
    // share of orders? ONE indicator aggregate — column totals and the
    // row-sum square sum — then the closed form on a 1-row frame.
    QDef("x_cochran_q", CochranSql) { (s, d) =>
      val r = Tables(s, d).orders.select(
        when(col("o_totalprice") >= 150000, 1L).otherwise(0L).as("a"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("b"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("c"))
      val st = r.agg(count(lit(1)).as("n"), sum(col("a")).as("ca"),
        sum(col("b")).as("cb"), sum(col("c")).as("cc"),
        sum((col("a") + col("b") + col("c"))
          * (col("a") + col("b") + col("c"))).as("r2"))
      val t = col("ca") + col("cb") + col("cc")
      def sq(c: org.apache.spark.sql.Column) =
        (c - t / lit(3.0)) * (c - t / lit(3.0))
      st.select(col("n"), col("ca").as("high_price"),
        col("cb").as("high_priority"), col("cc").as("finished"),
        round(lit(6) * (sq(col("ca")) + sq(col("cb")) + sq(col("cc")))
          / (lit(3.0) * t - col("r2")), 4).as("q_stat"))
    },

    // PARTIAL CORRELATION of quantity and extended price CONTROLLING for
    // discount: the three pairwise Pearson r's from ONE aggregate pass
    // (snapped at 6 dp so both engines enter the algebra with identical
    // doubles), then the first-order partial-correlation identity.
    QDef("x_partial_corr",
      """WITH c AS (SELECT
        |  round(corr(l_quantity, l_extendedprice), 6) AS rqp,
        |  round(corr(l_quantity, l_discount), 6) AS rqd,
        |  round(corr(l_extendedprice, l_discount), 6) AS rpd,
        |  CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem)
        |SELECT n, rqp, rqd, rpd,
        |  round((rqp - rqd * rpd)
        |    / sqrt((1 - rqd * rqd) * (1 - rpd * rpd)), 6)
        |    AS partial_qp_given_d
        |FROM c""".stripMargin) { (s, d) =>
      val c = Tables(s, d).lineitem.agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("rqp"),
        round(corr(col("l_quantity"), col("l_discount")), 6).as("rqd"),
        round(corr(col("l_extendedprice"), col("l_discount")), 6).as("rpd"),
        count(lit(1)).as("n"))
      c.select(col("n"), col("rqp"), col("rqd"), col("rpd"),
        round((col("rqp") - col("rqd") * col("rpd"))
          / sqrt((lit(1) - col("rqd") * col("rqd"))
            * (lit(1) - col("rpd") * col("rpd"))), 6)
          .as("partial_qp_given_d"))
    },

    // ODDS RATIO of finished status given high priority, with the Wald
    // 95% interval — the effect-size view of the x_woe_iv contingency.
    // ONE 4-cell indicator pass; exact integer cells.
    QDef("x_odds_ratio", OddsSql) { (s, d) =>
      val r = Tables(s, d).orders.select(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("a"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("b"))
      val st = r.agg(sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1) - col("b"))).as("n10"),
        sum((lit(1) - col("a")) * col("b")).as("n01"),
        sum((lit(1) - col("a")) * (lit(1) - col("b"))).as("n00"))
      val orr = (col("n11").cast("double") * col("n00")) /
        (col("n10").cast("double") * col("n01"))
      val se = sqrt(lit(1.0) / col("n11") + lit(1.0) / col("n10")
        + lit(1.0) / col("n01") + lit(1.0) / col("n00"))
      st.select(col("n11"), col("n10"), col("n01"), col("n00"),
        round(orr, 4).as("odds_ratio"), round(log(orr), 4).as("log_or"),
        round(exp(log(orr) - lit(1.96) * se), 4).as("ci_lo"),
        round(exp(log(orr) + lit(1.96) * se), 4).as("ci_hi"))
    },

    // CROSS-CORRELATION FUNCTION between daily view and purchase counts
    // at lags −7..+7 (does view volume LEAD purchases?) — the two-series
    // complement of x_acf, with every lag product from a DATE equi-join
    // of the calendar frames (the x_ljung_box posture: no variable-lag
    // window anywhere) and the means/normalizers snapped at 6 dp.
    QDef("x_ccf",
      """WITH dv AS (SELECT CAST(ts AS DATE) AS dd,
        |  CAST(count(*) AS DOUBLE) AS x
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |dp AS (SELECT CAST(ts AS DATE) AS dd,
        |  CAST(count(*) AS DOUBLE) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |mx AS (SELECT round(avg(x), 6) AS mx,
        |  round(sum((x - (SELECT round(avg(x), 6) FROM dv))
        |    * (x - (SELECT round(avg(x), 6) FROM dv))), 6) AS sxx FROM dv),
        |my AS (SELECT round(avg(y), 6) AS my,
        |  round(sum((y - (SELECT round(avg(y), 6) FROM dp))
        |    * (y - (SELECT round(avg(y), 6) FROM dp))), 6) AS syy FROM dp),
        |lags AS (SELECT unnest([-7,-6,-5,-4,-3,-2,-1,0,1,2,3,4,5,6,7])
        |  AS k),
        |num AS (SELECT lags.k,
        |  sum((dv.x - mx.mx) * (dp.y - my.my)) AS nk
        |  FROM lags, mx, my, dv, dp
        |  WHERE dp.dd = dv.dd + lags.k
        |  GROUP BY 1)
        |SELECT num.k AS lag_days,
        |  round(num.nk / sqrt(mx.sxx * my.syy), 6) AS ccf
        |FROM num, mx, my""".stripMargin) { (s, d) =>
      val ev = Tables(s, d).events
      def daily(t: String, cn: String) = ev.filter(col("event_type") === t)
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(count(lit(1)).cast("double").as(cn))
      val dv = daily("view", "x")
      val dp = daily("purchase", "y")
      val mxm = dv.agg(round(avg(col("x")), 6).as("mx"))
      val mym = dp.agg(round(avg(col("y")), 6).as("my"))
      val mx = dv.crossJoin(broadcast(mxm))
        .agg(max(col("mx")).as("mx"),
          round(sum((col("x") - col("mx")) * (col("x") - col("mx"))), 6)
            .as("sxx"))
      val my = dp.crossJoin(broadcast(mym))
        .agg(max(col("my")).as("my"),
          round(sum((col("y") - col("my")) * (col("y") - col("my"))), 6)
            .as("syy"))
      val lagged = dv
        .select(col("dd"), col("x"),
          explode(array((-7 to 7).map(lit(_)): _*)).as("k"))
        .select(date_add(col("dd"), col("k")).as("dd"), col("k"), col("x"))
      val num = lagged.join(dp, "dd")
        .crossJoin(broadcast(mx)).crossJoin(broadcast(my))
        .groupBy("k")
        .agg(sum((col("x") - col("mx")) * (col("y") - col("my"))).as("nk"),
          max(col("sxx")).as("sxx"), max(col("syy")).as("syy"))
      num.select(col("k").as("lag_days"),
        round(col("nk") / sqrt(col("sxx") * col("syy")), 6).as("ccf"))
    }
  )
}
