package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-20 batch: SQL-surface twins for the WoE and kappa statistics
  * (the CcSql twin contract — one portable text parsed by both
  * engines), a portable day-of-week uniformity chi-square, a
  * dispersion/empirical-rule profile, and the Durbin-Watson serial-
  * correlation statistic on detrended daily values.
  */
object R20Ops {

  val defs: Seq[QDef] = Seq(

    // The WoE statistic through Spark's SQL parser — ONE portable text
    // shared verbatim with the DuckDB oracle.
    QDef("x_sql_woe", R13Ops.WoeSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(R13Ops.WoeSql)
    },

    // Cohen's kappa through Spark's SQL parser, same shared text.
    QDef("x_sql_kappa", R16Ops.KappaSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(R16Ops.KappaSql)
    },

    // DAY-OF-WEEK UNIFORMITY CHI-SQUARE of event volume: weekday from
    // PORTABLE date arithmetic (days since Monday 2024-01-01, mod 7 —
    // dayofweek() numbers Sunday differently across engines), expected
    // counts n/7, per-weekday χ² contributions (the x_benford release
    // shape). ONE count aggregate does all corpus-scale work.
    QDef("x_chi2_dow",
      """WITH d AS (
        |  SELECT CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |    % 7 AS INTEGER) AS dow
        |  FROM events),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM d),
        |obs AS (SELECT dow, CAST(count(*) AS BIGINT) AS observed
        |  FROM d GROUP BY 1)
        |SELECT obs.dow, observed, round(total / 7, 4) AS expected,
        |  round(pow(observed - total / 7, 2) / (total / 7), 6)
        |    AS chi2_term
        |FROM obs, n""".stripMargin) { (s, d) =>
      val dw = Tables(s, d).events.select(
        (datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("2024-01-01")))
          % 7).cast("int").as("dow"))
      val n = dw.agg(count(lit(1)).cast("double").as("total"))
      dw.groupBy("dow").agg(count(lit(1)).as("observed"))
        .crossJoin(broadcast(n))
        .select(col("dow"), col("observed"),
          round(col("total") / lit(7), 4).as("expected"),
          round(pow(col("observed") - col("total") / lit(7), 2)
            / (col("total") / lit(7)), 6).as("chi2_term"))
    },

    // DISPERSION PROFILE per market segment: coefficient of variation
    // plus the empirical-rule tail shares (|z| > 2, |z| > 3) — the
    // "is this column well-behaved" audit. Two passes: snapped moments
    // broadcast back, then one indicator aggregate of exact counts.
    QDef("x_cv_profile",
      """WITH oc AS (
        |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n, round(avg(v), 6)
        |    AS mu, round(stddev_samp(v), 6) AS sd
        |  FROM oc GROUP BY 1),
        |t AS (SELECT oc.g,
        |  CAST(sum(CASE WHEN abs(oc.v - m.mu) > 2 * m.sd THEN 1 ELSE 0 END)
        |    AS BIGINT) AS gt2,
        |  CAST(sum(CASE WHEN abs(oc.v - m.mu) > 3 * m.sd THEN 1 ELSE 0 END)
        |    AS BIGINT) AS gt3
        |  FROM oc JOIN m ON oc.g = m.g GROUP BY 1)
        |SELECT m.g AS segment, m.n, round(m.sd / m.mu, 6) AS cv,
        |  round(t.gt2 / CAST(m.n AS DOUBLE), 6) AS pct_gt2,
        |  round(t.gt3 / CAST(m.n AS DOUBLE), 6) AS pct_gt3
        |FROM m JOIN t ON m.g = t.g""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val m = oc.groupBy("g").agg(count(lit(1)).as("n"),
        round(avg(col("v")), 6).as("mu"),
        round(stddev_samp(col("v")), 6).as("sd"))
      val tails = oc.join(broadcast(m), "g")
        .groupBy("g").agg(
          sum(when(abs(col("v") - col("mu")) > lit(2) * col("sd"), 1L)
            .otherwise(0L)).as("gt2"),
          sum(when(abs(col("v") - col("mu")) > lit(3) * col("sd"), 1L)
            .otherwise(0L)).as("gt3"))
      m.join(tails, "g")
        .select(col("g").as("segment"), col("n"),
          round(col("sd") / col("mu"), 6).as("cv"),
          round(col("gt2") / col("n").cast("double"), 6).as("pct_gt2"),
          round(col("gt3") / col("n").cast("double"), 6).as("pct_gt3"))
    },

    // DURBIN-WATSON SERIAL CORRELATION of the daily mean event value
    // after removing its OLS linear trend — the autocorrelation
    // diagnostic on regression residuals (DW ≈ 2 means none). Trend
    // coefficients from regr_slope/regr_intercept snapped at 6 dp;
    // residual differences by a lag over the calendar frame.
    QDef("x_durbin_watson",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, round(avg(value), 6) AS v
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(dd) AS start FROM daily),
        |idx AS (SELECT datediff('day', d0.start, dd) AS i, dd, v
        |  FROM daily, d0),
        |fit AS (SELECT round(regr_slope(v, i), 6) AS b1,
        |  round(regr_intercept(v, i), 6) AS b0,
        |  CAST(count(*) AS BIGINT) AS n FROM idx),
        |e AS (SELECT idx.dd, idx.v - (fit.b0 + fit.b1 * idx.i) AS e,
        |  fit.n
        |  FROM idx, fit),
        |l AS (SELECT n, e, lag(e) OVER (ORDER BY dd) AS pe FROM e)
        |SELECT max(n) AS n_days,
        |  round(sum(CASE WHEN pe IS NOT NULL
        |      THEN (e - pe) * (e - pe) ELSE 0 END)
        |    / sum(e * e), 4) AS dw
        |FROM l""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(round(avg(col("value")), 6).as("v"))
      val d0 = daily.agg(min(col("dd")).as("start"))
      val idx = daily.crossJoin(broadcast(d0))
        .select(datediff(col("dd"), col("start")).as("i"), col("dd"),
          col("v"))
      val fit = idx.agg(
        round(regr_slope(col("v"), col("i")), 6).as("b1"),
        round(regr_intercept(col("v"), col("i")), 6).as("b0"),
        count(lit(1)).as("n"))
      val e = idx.crossJoin(broadcast(fit))
        .select(col("dd"),
          (col("v") - (col("b0") + col("b1") * col("i"))).as("e"), col("n"))
      val l = e.withColumn("pe", lag(col("e"), 1).over(Window.orderBy("dd")))
      l.agg(max(col("n")).as("n_days"),
        round(sum(when(col("pe").isNotNull,
            (col("e") - col("pe")) * (col("e") - col("pe")))
          .otherwise(lit(0.0))) / sum(col("e") * col("e")), 4).as("dw"))
    }
  )
}
