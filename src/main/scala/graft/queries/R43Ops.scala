package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-43 batch: operations / retail forecasting — Croston's
  * intermittent-demand method (+ SBA correction), per-brand log-log
  * price elasticity, Bass diffusion fitting on the adoption curve, and
  * the newsvendor quantile with its expected over/under costs.
  *
  * Scale posture: Croston/Bass are calendar-bounded daily-frame
  * machinery (the x_holt / x_ar2 class); elasticity collapses to the
  * (brand × month) cell frame in ONE pass then fits 25 independent
  * OLS slopes from grouped moments; newsvendor is an exact integer
  * quantile selection on the ≤50-value quantity histogram plus
  * piecewise expectations from the same frame. */
object R43Ops {

  /** Croston's method as ONE portable text — oracle of `x_croston` and
    * whole query of the `x_sql_croston` twin. Demand points = days with
    * any >450 k$ order (an intermittent series); SES (α = 0.1) over
    * demand sizes AND inter-arrival gaps via the closed power-weight
    * form s_K = (1−α)^{K−1} z₁ + Σ_{i≥2} α(1−α)^{K−i} z_i — one
    * window pass for the gaps, one weighted sum per series. Forecast =
    * sizes/intervals; SBA multiplies by (1 − α/2). Gaps are measured
    * in OBSERVED-calendar days (row_number over the order calendar —
    * the portable day index; datediff units do not parse in both
    * engines). */
  private[queries] val CrostonSql =
    """WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  CAST(sum(CASE WHEN o_totalprice > 450000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS z
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT d, z,
      |  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i FROM cal),
      |seq AS (SELECT d, CAST(z AS DOUBLE) AS z,
      |  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k,
      |  CAST(i - lag(i, 1) OVER (ORDER BY d) AS DOUBLE) AS gap
      |  FROM idx WHERE z > 0),
      |kk AS (SELECT CAST(max(k) AS BIGINT) AS kmax,
      |  CAST(count(*) AS BIGINT) AS n FROM seq),
      |sz AS (SELECT
      |  sum(CASE WHEN seq.k = 1 THEN pow(0.9e0, kk.kmax - 1) * seq.z
      |    ELSE 0.1e0 * pow(0.9e0, kk.kmax - seq.k) * seq.z END) AS sz
      |  FROM seq CROSS JOIN kk),
      |sx AS (SELECT
      |  sum(CASE WHEN seq.k = 2 THEN pow(0.9e0, kk.kmax - 2) * seq.gap
      |    ELSE 0.1e0 * pow(0.9e0, kk.kmax - seq.k) * seq.gap END) AS sx
      |  FROM seq CROSS JOIN kk WHERE seq.k >= 2)
      |SELECT kk.n AS n_demands,
      |  round(sz.sz, 4) AS size_ses,
      |  round(sx.sx, 4) AS interval_ses,
      |  round(sz.sz / sx.sx, 6) AS croston_forecast,
      |  round(0.95e0 * sz.sz / sx.sx, 6) AS sba_forecast
      |FROM kk CROSS JOIN sz CROSS JOIN sx""".stripMargin

  /** Per-brand price elasticity as ONE portable text — oracle of
    * `x_price_elasticity` and whole query of the `x_sql_elastic` twin.
    * (brand × month) demand/price cells from ONE collapse; per-brand
    * OLS of ln(quantity) on ln(avg unit price) from grouped moments.
    * Top 10 most elastic brands released (|elasticity| desc). */
  private[queries] val ElasticSql =
    """WITH cells AS (
      |  SELECT p.p_brand AS b,
      |    CAST(date_trunc('month', l.l_shipdate) AS DATE) AS mo,
      |    ln(sum(l.l_quantity)) AS lq,
      |    ln(sum(l.l_extendedprice) / sum(l.l_quantity)) AS lp
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |fit AS (SELECT b, CAST(count(*) AS BIGINT) AS n_months,
      |  round(covar_samp(lp, lq) / var_samp(lp), 6) AS elasticity,
      |  round(corr(lp, lq) * corr(lp, lq), 6) AS r2
      |  FROM cells GROUP BY 1)
      |SELECT b AS brand, n_months, elasticity, r2
      |FROM fit ORDER BY abs(elasticity) DESC, brand LIMIT 10""".stripMargin

  /** Bass diffusion as ONE portable text — oracle of `x_bass` and
    * whole query of the `x_sql_bass` twin. Adopters = first purchase
    * per user per day; discrete Bass n_t = a + b·N_{t−1} + c·N²_{t−1}
    * fitted by 2-regressor OLS on the calendar-bounded daily frame
    * (closed determinant form, 9 dp-snapped moments); p, q, m from the
    * root m = (−b − √(b² − 4ac))/(2c), guarded for the
    * non-diffusion-shaped case in BOTH engines. */
  private[queries] val BassSql =
    """WITH fp AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |daily AS (SELECT d0 AS d, CAST(count(*) AS DOUBLE) AS n_t
      |  FROM fp GROUP BY 1),
      |cum AS (SELECT d, n_t,
      |  coalesce(sum(n_t) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0e0)
      |    AS nprev
      |  FROM daily),
      |mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  round(avg(n_t), 9) AS my,
      |  round(avg(nprev), 9) AS m1, round(avg(nprev * nprev), 9) AS m2,
      |  round(covar_samp(nprev, n_t) * (count(*) - 1), 9) AS s1y,
      |  round(covar_samp(nprev * nprev, n_t) * (count(*) - 1), 9) AS s2y,
      |  round(var_samp(nprev) * (count(*) - 1), 9) AS s11,
      |  round(covar_samp(nprev, nprev * nprev) * (count(*) - 1), 9)
      |    AS s12,
      |  round(var_samp(nprev * nprev) * (count(*) - 1), 9) AS s22
      |  FROM cum),
      |fit AS (SELECT n, my, m1, m2,
      |  (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b,
      |  (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS c
      |  FROM mo),
      |abc AS (SELECT n, b, c, my - b * m1 - c * m2 AS a FROM fit),
      |root AS (SELECT n, a, b, c,
      |  CASE WHEN c < 0 AND b * b - 4 * a * c > 0
      |    THEN (-b - sqrt(b * b - 4 * a * c)) / (2 * c) END AS m
      |  FROM abc)
      |SELECT n AS n_days, round(a, 6) AS a_coef, round(b, 6) AS b_coef,
      |  round(c, 9) AS c_coef,
      |  round(m, 2) AS m_potential,
      |  round(CASE WHEN m IS NOT NULL THEN a / m END, 6) AS p_innov,
      |  round(CASE WHEN m IS NOT NULL THEN -c * m END, 6) AS q_imit
      |FROM root""".stripMargin

  /** Newsvendor as ONE portable text — oracle of `x_newsvendor` and
    * whole query of the `x_sql_newsvendor` twin. Critical ratio 0.9
    * (cu = 9, co = 1); Q* = the smallest quantity whose inclusive CDF
    * reaches ⌈0.9 n⌉ (integer selection — no interpolation), expected
    * leftover E[(Q−D)⁺] and short E[(D−Q)⁺] exactly from the ≤50-row
    * histogram. */
  private[queries] val NewsvendorSql =
    """WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
      |  CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |cum AS (SELECT v, c,
      |  CAST(sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cuminc,
      |  CAST(sum(c) OVER () AS BIGINT) AS nn
      |  FROM h),
      |q AS (SELECT min(v) AS qstar, max(nn) AS nn FROM cum
      |  WHERE cuminc * 10 >= nn * 9),
      |sv AS (SELECT q.qstar, q.nn,
      |  max(CASE WHEN cum.v = q.qstar THEN cum.cuminc END) AS served
      |  FROM cum CROSS JOIN q GROUP BY 1, 2),
      |ec AS (SELECT sv.qstar, sv.nn, sv.served,
      |  sum(CASE WHEN h.v < sv.qstar
      |    THEN CAST(h.c AS DOUBLE) * (sv.qstar - h.v) ELSE 0 END) AS lo,
      |  sum(CASE WHEN h.v > sv.qstar
      |    THEN CAST(h.c AS DOUBLE) * (h.v - sv.qstar) ELSE 0 END) AS sh
      |  FROM h CROSS JOIN sv GROUP BY 1, 2, 3)
      |SELECT nn AS n, CAST(qstar AS BIGINT) AS q_star,
      |  round(CAST(served AS DOUBLE) / nn, 6) AS service_level,
      |  round(lo / nn, 4) AS expected_leftover,
      |  round(sh / nn, 4) AS expected_short
      |FROM ec""".stripMargin

  val defs: Seq[QDef] = Seq(

    // CROSTON: the intermittent-demand forecaster — SES over nonzero
    // demand sizes and over inter-arrival gaps separately, ratio as
    // the demand rate. The closed power-weight SES avoids any
    // sequential recursion: one window pass + one weighted aggregate
    // on the calendar-bounded demand-point frame.
    QDef("x_croston", CrostonSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(sum(when(col("o_totalprice") > 450000, 1L).otherwise(0L))
          .as("z"))
      val w = Window.orderBy("d")
      val idx = cal.select(col("d"), col("z"),
        row_number().over(w).cast("bigint").as("i"))
      val seq0 = idx.filter(col("z") > 0)
        .select(col("d"), col("z").cast("double").as("z"),
          row_number().over(w).cast("bigint").as("k"),
          (col("i") - lag(col("i"), 1).over(w)).cast("double").as("gap"))
      val kk = seq0.agg(max(col("k")).as("kmax"), count(lit(1)).as("n"))
      val szW = when(col("k") === 1,
        pow(lit(0.9), col("kmax") - 1) * col("z"))
        .otherwise(lit(0.1) * pow(lit(0.9), col("kmax") - col("k"))
          * col("z"))
      val sz = seq0.crossJoin(broadcast(kk)).agg(sum(szW).as("sz"))
      val sxW = when(col("k") === 2,
        pow(lit(0.9), col("kmax") - 2) * col("gap"))
        .otherwise(lit(0.1) * pow(lit(0.9), col("kmax") - col("k"))
          * col("gap"))
      val sx = seq0.crossJoin(broadcast(kk)).filter(col("k") >= 2)
        .agg(sum(sxW).as("sx"))
      kk.crossJoin(broadcast(sz)).crossJoin(broadcast(sx))
        .select(col("n").as("n_demands"),
          round(col("sz"), 4).as("size_ses"),
          round(col("sx"), 4).as("interval_ses"),
          round(col("sz") / col("sx"), 6).as("croston_forecast"),
          round(lit(0.95) * col("sz") / col("sx"), 6).as("sba_forecast"))
    },

    // Croston through Spark's SQL parser — same shared text.
    QDef("x_sql_croston", CrostonSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(CrostonSql)
    },

    // PRICE ELASTICITY: ln-demand on ln-price per brand — the
    // marketing-mix slope, one (brand × month) collapse then 25
    // independent grouped-moment OLS fits. Top-10 by |elasticity|.
    QDef("x_price_elasticity", ElasticSql) { (s, d) =>
      val t = Tables(s, d)
      val cells = t.lineitem
        .join(broadcast(t.part.select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("b"),
          date_trunc("month", col("l_shipdate")).cast("date").as("mo"))
        .agg(log(sum(col("l_quantity"))).as("lq"),
          log(sum(col("l_extendedprice")) / sum(col("l_quantity")))
            .as("lp"))
      cells.groupBy("b").agg(count(lit(1)).as("n_months"),
          round(covar_samp(col("lp"), col("lq")) / var_samp(col("lp")), 6)
            .as("elasticity"),
          round(corr(col("lp"), col("lq")) * corr(col("lp"), col("lq")),
            6).as("r2"))
        .select(col("b").as("brand"), col("n_months"), col("elasticity"),
          col("r2"))
        .orderBy(abs(col("elasticity")).desc, col("brand")).limit(10)
    },

    // Elasticity through Spark's SQL parser — same shared text.
    QDef("x_sql_elastic", ElasticSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "part")
      s.sql(ElasticSql)
    },

    // BASS DIFFUSION: p (innovation) and q (imitation) from the
    // first-purchase adoption curve — 2-regressor OLS on the daily
    // frame with 9 dp-snapped moments so both engines solve the same
    // normal equations; the market-potential root guarded identically.
    QDef("x_bass", BassSql) { (s, d) =>
      val fp = Tables(s, d).events
        .filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts").cast("date")).as("d0"))
      val daily = fp.groupBy(col("d0").as("d"))
        .agg(count(lit(1)).cast("double").as("n_t"))
      val w = Window.orderBy("d")
      val cum = daily.select(col("d"), col("n_t"),
        coalesce(sum(col("n_t")).over(w.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0.0)).as("nprev"))
      val np2 = col("nprev") * col("nprev")
      val mo = cum.agg(count(lit(1)).as("n"),
        round(avg(col("n_t")), 9).as("my"),
        round(avg(col("nprev")), 9).as("m1"),
        round(avg(np2), 9).as("m2"),
        round(covar_samp(col("nprev"), col("n_t")) * (count(lit(1)) - 1),
          9).as("s1y"),
        round(covar_samp(np2, col("n_t")) * (count(lit(1)) - 1), 9)
          .as("s2y"),
        round(var_samp(col("nprev")) * (count(lit(1)) - 1), 9).as("s11"),
        round(covar_samp(col("nprev"), np2) * (count(lit(1)) - 1), 9)
          .as("s12"),
        round(var_samp(np2) * (count(lit(1)) - 1), 9).as("s22"))
      val det = col("s11") * col("s22") - col("s12") * col("s12")
      val fit = mo.select(col("n"), col("my"), col("m1"), col("m2"),
        ((col("s1y") * col("s22") - col("s2y") * col("s12")) / det)
          .as("b"),
        ((col("s2y") * col("s11") - col("s1y") * col("s12")) / det)
          .as("c"))
      val abc = fit.select(col("n"), col("b"), col("c"),
        (col("my") - col("b") * col("m1") - col("c") * col("m2")).as("a"))
      val disc = col("b") * col("b") - lit(4) * col("a") * col("c")
      val root = abc.select(col("n"), col("a"), col("b"), col("c"),
        when(col("c") < 0 && disc > 0,
          (-col("b") - sqrt(disc)) / (lit(2) * col("c"))).as("m"))
      root.select(col("n").as("n_days"), round(col("a"), 6).as("a_coef"),
        round(col("b"), 6).as("b_coef"), round(col("c"), 9).as("c_coef"),
        round(col("m"), 2).as("m_potential"),
        round(when(col("m").isNotNull, col("a") / col("m")), 6)
          .as("p_innov"),
        round(when(col("m").isNotNull, -col("c") * col("m")), 6)
          .as("q_imit"))
    },

    // Bass through Spark's SQL parser — same shared text.
    QDef("x_sql_bass", BassSql) { (s, d) =>
      SqlSurface.viewed(s, d, "events")
      s.sql(BassSql)
    },

    // NEWSVENDOR: the stocking quantile for critical ratio 0.9 —
    // exact integer selection from the quantity histogram (cuminc·10 ≥
    // n·9 avoids any float threshold), expected leftover/short from
    // the same ≤50-row frame.
    QDef("x_newsvendor", NewsvendorSql) { (s, d) =>
      val h = Tables(s, d).lineitem
        .groupBy(col("l_quantity").cast("bigint").as("v"))
        .agg(count(lit(1)).as("c"))
      val wv = Window.orderBy("v")
      val wAll = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = h.select(col("v"), col("c"),
        sum(col("c")).over(wv.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("cuminc"),
        sum(col("c")).over(wAll).as("nn"))
      val q = cum.filter(col("cuminc") * 10 >= col("nn") * 9)
        .agg(min(col("v")).as("qstar"))
      val sv = cum.crossJoin(broadcast(q))
        .groupBy("qstar")
        .agg(max(col("nn")).as("nn"),
          max(when(col("v") === col("qstar"), col("cuminc")))
            .as("served"))
      val ec = h.crossJoin(broadcast(sv))
        .groupBy("qstar", "nn", "served")
        .agg(
          sum(when(col("v") < col("qstar"),
            col("c").cast("double") * (col("qstar") - col("v")))
            .otherwise(0.0)).as("lo"),
          sum(when(col("v") > col("qstar"),
            col("c").cast("double") * (col("v") - col("qstar")))
            .otherwise(0.0)).as("sh"))
      ec.select(col("nn").as("n"), col("qstar").cast("bigint").as("q_star"),
        round(col("served").cast("double") / col("nn"), 6)
          .as("service_level"),
        round(col("lo") / col("nn"), 4).as("expected_leftover"),
        round(col("sh") / col("nn"), 4).as("expected_short"))
    },

    // Newsvendor through Spark's SQL parser — same shared text.
    QDef("x_sql_newsvendor", NewsvendorSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(NewsvendorSql)
    }
  )
}
