package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-46 batch: series diagnostics + modern dependence measures +
  * quality engineering — max drawdown, process capability (Cp/Cpk/Cpm +
  * exact out-of-spec ppm), Chatterjee's ξ rank correlation, distance
  * correlation, iterative proportional fitting (raking), Hoeffding's D,
  * the full binary-confusion battery, and Haar wavelet energy by level.
  *
  * Scale posture: the corpus collapses once per operator (daily
  * calendar frame / quantity histogram / 5×5 contingency / 2×2
  * confusion counts); everything after runs on the bounded frame. The
  * dependence measures keep their quadratic parts strictly on bounded
  * frames: Chatterjee needs only rank windows over the daily frame,
  * dCor's pair matrix is calendar², and Hoeffding's dominance sums
  * expand the ≤25-cell contingency cross — never corpus pairs. */
object R46Ops {

  /** Max drawdown of the demeaned cumulative daily revenue as ONE
    * portable text — oracle of `x_drawdown` and whole query of the
    * `x_sql_drawdown` twin. Equity = prefix sum of (daily revenue −
    * calendar mean); drawdown = running max − equity; the released day
    * is the FIRST day attaining the max (min-date tie-break, exact
    * because both engines subtract identical snapped doubles). */
  private[queries] val DrawdownSql =
    """WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  round(sum(o_totalprice), 2) AS r FROM orders GROUP BY 1),
      |mm AS (SELECT round(avg(r), 6) AS mu,
      |  CAST(count(*) AS BIGINT) AS n FROM cal),
      |eq AS (SELECT cal.d, mm.n,
      |  sum(cal.r - mm.mu) OVER (ORDER BY cal.d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS equity
      |  FROM cal, mm),
      |dd AS (SELECT d, n,
      |  max(equity) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - equity
      |    AS draw
      |  FROM eq),
      |mx AS (SELECT max(draw) AS maxdd FROM dd)
      |SELECT max(dd.n) AS n_days, round(mx.maxdd, 2) AS max_drawdown,
      |  min(CASE WHEN dd.draw = mx.maxdd THEN dd.d END) AS trough_day
      |FROM dd, mx GROUP BY mx.maxdd""".stripMargin

  /** Process capability of l_quantity vs spec [5, 45], target 25, as
    * ONE portable text — oracle of `x_capability` and whole query of
    * the `x_sql_capability` twin. μ/σ from exact BIGINT sums; Cp, Cpk,
    * Cpm (Taguchi) closed-form; out-of-spec ppm is an EXACT integer
    * count, not a normal-tail estimate. */
  private[queries] val CapabilitySql =
    """WITH mo AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
      |  CAST(sum(CAST(l_quantity AS BIGINT)
      |    * CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
      |  CAST(sum(CASE WHEN l_quantity < 5 OR l_quantity > 45
      |    THEN 1 ELSE 0 END) AS BIGINT) AS oos
      |  FROM lineitem),
      |ms AS (SELECT n, oos, CAST(s AS DOUBLE) / n AS mu,
      |  sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
      |    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0e0))) AS sd
      |  FROM mo)
      |SELECT n, round(mu, 6) AS mu, round(sd, 6) AS sd,
      |  round(40.0e0 / (6.0e0 * sd), 6) AS cp,
      |  round(CASE WHEN 45.0e0 - mu < mu - 5.0e0
      |    THEN (45.0e0 - mu) / (3.0e0 * sd)
      |    ELSE (mu - 5.0e0) / (3.0e0 * sd) END, 6) AS cpk,
      |  round(40.0e0 / (6.0e0 * sqrt(sd * sd
      |    + (mu - 25.0e0) * (mu - 25.0e0))), 6) AS cpm,
      |  round(CAST(oos AS DOUBLE) * 1000000.0e0 / n, 2) AS oos_ppm
      |FROM ms""".stripMargin

  /** Chatterjee's ξ rank correlation (2021) between daily order count
    * and daily mean order value as ONE portable text — oracle of
    * `x_chatterjee` and whole query of the `x_sql_chatterjee` twin.
    * ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i)) with the data
    * ordered by X (ties broken by date — the deterministic stand-in
    * for the paper's random tie-break, documented); r_i = #{y_j ≤ y_i}
    * and l_i = #{y_j ≥ y_i} via RANGE-frame counting windows (peers
    * included, so ties are exact). Everything on the calendar frame. */
  private[queries] val ChatterjeeSql =
    """WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  CAST(count(*) AS BIGINT) AS x, round(avg(o_totalprice), 6) AS y
      |  FROM orders GROUP BY 1),
      |rk AS (SELECT d, x, y,
      |  CAST(count(*) OVER (ORDER BY y
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS r,
      |  CAST(count(*) OVER (ORDER BY y DESC
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS l,
      |  CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM cal),
      |sq AS (SELECT n, r, l,
      |  lead(r, 1) OVER (ORDER BY x, d) AS rnext
      |  FROM rk),
      |agg AS (SELECT max(n) AS n,
      |  sum(CAST(abs(rnext - r) AS DOUBLE)) AS num,
      |  sum(CAST(l AS DOUBLE) * (n - l)) AS den
      |  FROM sq)
      |SELECT n AS n_days,
      |  round(1.0e0 - n * num / (2.0e0 * den), 6) AS xi
      |FROM agg""".stripMargin

  /** Distance correlation between daily order count and daily revenue
    * as ONE portable text — oracle of `x_dcor` and whole query of the
    * `x_sql_dcor` twin. Double-centered distance products over the
    * calendar² pair matrix (≤2400² at every sf — the calendar, not the
    * corpus, sets the frame); row means snapped 9 dp before centering
    * so both engines center identical matrices. The Spark-only
    * BROADCAST hints keep the ON-TRUE pair join off CartesianProduct. */
  // Split into fragments so the x_sql_dcor twin can materialize the
  // multiply-referenced frames once (`pr` feeds rm AND cen; `rm` feeds
  // gm AND both centering joins) — the x_sql_kcore from-birth rule.
  // The DuckDB oracle parses the composed full text.
  private[queries] val DcorCalCtes =
    """cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  CAST(count(*) AS DOUBLE) AS x, round(sum(o_totalprice), 2) AS y
      |  FROM orders GROUP BY 1)""".stripMargin

  private[queries] val DcorPrCtes =
    s"""$DcorCalCtes,
       |pr AS (SELECT /*+ BROADCAST(b) */ a.d AS di, b.d AS dj,
       |  abs(a.x - b.x) AS ax, abs(a.y - b.y) AS ay
       |  FROM cal a JOIN cal b ON 1 = 1)""".stripMargin

  private[queries] val DcorPrBody =
    """pr AS (SELECT /*+ BROADCAST(b) */ a.d AS di, b.d AS dj,
      |  abs(a.x - b.x) AS ax, abs(a.y - b.y) AS ay
      |  FROM cal a JOIN cal b ON 1 = 1)""".stripMargin

  private[queries] val DcorRmCtes =
    """rm AS (SELECT di, round(avg(ax), 9) AS rax, round(avg(ay), 9)
      |    AS ray
      |  FROM pr GROUP BY 1)""".stripMargin

  private[queries] val DcorTailCtes =
    """gm AS (SELECT round(avg(rax), 9) AS gax, round(avg(ray), 9)
      |    AS gay,
      |  CAST(count(*) AS BIGINT) AS n FROM rm),
      |cen AS (SELECT /*+ BROADCAST(ri) BROADCAST(rj) */
      |  pr.ax - ri.rax - rj.rax + gm.gax AS ca,
      |  pr.ay - ri.ray - rj.ray + gm.gay AS cb
      |  FROM pr JOIN rm ri ON pr.di = ri.di
      |  JOIN rm rj ON pr.dj = rj.di CROSS JOIN gm),
      |mom AS (SELECT sum(ca * cb) AS vxy, sum(ca * ca) AS vxx,
      |  sum(cb * cb) AS vyy FROM cen)
      |SELECT gm.n AS n_days,
      |  round(sqrt(abs(mom.vxy)) / sqrt(sqrt(mom.vxx * mom.vyy)), 6)
      |    AS dcor,
      |  round(mom.vxy / gm.n / gm.n, 4) AS dcov2
      |FROM mom, gm""".stripMargin

  private[queries] val DcorSql =
    s"WITH $DcorPrCtes,\n$DcorRmCtes,\n$DcorTailCtes"

  /** Iterative proportional fitting (raking) of the (segment ×
    * priority) contingency to uniform margins, 3 unrolled rounds, as
    * ONE portable text — oracle of `x_ipf_raking` and whole query of
    * the `x_sql_ipf` twin. Weights snapped 9 dp after every scaling
    * step so both engines replay identical rounds; margin sums use
    * key-partitioned windows (they scale out — nothing global). */
  private[queries] val IpfSql =
    """WITH cell AS (
      |  SELECT c.c_mktsegment AS g, o.o_orderpriority AS p,
      |    CAST(count(*) AS DOUBLE) AS w0,
      |    CAST(count(*) AS BIGINT) AS n0
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT sum(w0) AS t,
      |  CAST(count(DISTINCT g) AS DOUBLE) AS ng,
      |  CAST(count(DISTINCT p) AS DOUBLE) AS np FROM cell),
      |r1 AS (SELECT g, p, n0,
      |  round(w0 * (tot.t / tot.ng)
      |    / sum(w0) OVER (PARTITION BY g), 9) AS w
      |  FROM cell, tot),
      |r2 AS (SELECT g, p, n0,
      |  round(w * ((SELECT t / np FROM tot))
      |    / sum(w) OVER (PARTITION BY p), 9) AS w
      |  FROM r1),
      |r3 AS (SELECT g, p, n0,
      |  round(w * ((SELECT t / ng FROM tot))
      |    / sum(w) OVER (PARTITION BY g), 9) AS w
      |  FROM r2)
      |SELECT g AS segment, p AS priority, n0 AS n_raw,
      |  round(w, 4) AS weight,
      |  round(sum(w) OVER (PARTITION BY g), 2) AS row_margin,
      |  round(sum(w) OVER (PARTITION BY p), 2) AS col_margin
      |FROM r3 ORDER BY g, p""".stripMargin

  /** Hoeffding's D dependence between order priority (ordinal 1-5) and
    * price bucket (0-50k/.../>200k) as ONE portable text — oracle of
    * `x_hoeffding_d` and whole query of the `x_sql_hoeffd` twin.
    * Midranks R, S from margin cumulatives; the bivariate Q per cell
    * from strict/tie dominance sums over the ≤25-cell contingency
    * cross (Hollander-Wolfe ties convention: ½ for one-coordinate
    * ties, ¼ for both); D1/D2/D3 sums weight each cell by its count,
    * products DOUBLE (n⁴ terms). The corpus cost is ONE contingency
    * collapse. */
  private[queries] val HoeffdingSql =
    """WITH cell AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS gx,
      |    CAST(CASE WHEN o_totalprice < 50000 THEN 0
      |      WHEN o_totalprice < 100000 THEN 1
      |      WHEN o_totalprice < 150000 THEN 2
      |      WHEN o_totalprice < 200000 THEN 3 ELSE 4 END AS INT) AS gy,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1, 2),
      |rx AS (SELECT gx, CAST(sum(c) AS BIGINT) AS cr FROM cell
      |  GROUP BY 1),
      |ry AS (SELECT gy, CAST(sum(c) AS BIGINT) AS cc FROM cell
      |  GROUP BY 1),
      |cx AS (SELECT gx, cr,
      |  CAST(sum(cr) OVER (ORDER BY gx
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cr
      |    AS BIGINT) AS below FROM rx),
      |cy AS (SELECT gy, cc,
      |  CAST(sum(cc) OVER (ORDER BY gy
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cc
      |    AS BIGINT) AS below FROM ry),
      |q AS (SELECT /*+ BROADCAST(b) */ a.gx, a.gy, a.c,
      |  1.0e0
      |  + sum(CASE WHEN b.gx < a.gx AND b.gy < a.gy
      |      THEN CAST(b.c AS DOUBLE) ELSE 0 END)
      |  + 0.5e0 * sum(CASE WHEN b.gx = a.gx AND b.gy < a.gy
      |      THEN CAST(b.c AS DOUBLE) ELSE 0 END)
      |  + 0.5e0 * sum(CASE WHEN b.gx < a.gx AND b.gy = a.gy
      |      THEN CAST(b.c AS DOUBLE) ELSE 0 END)
      |  + 0.25e0 * (a.c - 1) AS qv
      |  FROM cell a JOIN cell b ON 1 = 1 GROUP BY 1, 2, 3),
      |rs AS (SELECT q.gx, q.gy, q.c, q.qv,
      |  cx.below + (cx.cr + 1.0e0) / 2 AS rv,
      |  cy.below + (cy.cc + 1.0e0) / 2 AS sv
      |  FROM q JOIN cx ON q.gx = cx.gx JOIN cy ON q.gy = cy.gy),
      |dd AS (SELECT CAST(sum(c) AS DOUBLE) AS n,
      |  sum(c * (qv - 1) * (qv - 2)) AS d1,
      |  sum(c * (rv - 1) * (rv - 2) * (sv - 1) * (sv - 2)) AS d2,
      |  sum(c * (rv - 2) * (sv - 2) * (qv - 1)) AS d3
      |  FROM rs)
      |SELECT CAST(n AS BIGINT) AS n,
      |  round(30.0e0 * ((n - 2) * (n - 3) * d1 + d2
      |    - 2 * (n - 2) * d3)
      |    / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4)), 9) AS hoeffding_d
      |FROM dd""".stripMargin

  /** The full binary-confusion battery as ONE portable text — oracle
    * of `x_confusion_stats` and whole query of the `x_sql_confusion`
    * twin. Classifier: price > 150 k$ predicting fulfilled status;
    * tp/fp/fn/tn from one conditional-sum aggregate, every derived
    * metric closed-form (MCC products DOUBLE — the 4-margin product
    * overflows BIGINT at corpus scale). */
  private[queries] val ConfusionSql =
    """WITH r AS (SELECT
      |  CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS pr,
      |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS tr
      |  FROM orders),
      |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(pr * tr) AS BIGINT) AS tp,
      |  CAST(sum(pr * (1 - tr)) AS BIGINT) AS fp,
      |  CAST(sum((1 - pr) * tr) AS BIGINT) AS fn,
      |  CAST(sum((1 - pr) * (1 - tr)) AS BIGINT) AS tn
      |  FROM r)
      |SELECT n, tp, fp, fn, tn,
      |  round(CAST(tp + tn AS DOUBLE) / n, 6) AS accuracy,
      |  round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_,
      |  round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_,
      |  round(CAST(tn AS DOUBLE) / (tn + fp), 6) AS specificity,
      |  round(2.0e0 * tp / (2.0e0 * tp + fp + fn), 6) AS f1,
      |  round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
      |    / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
      |      * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6)
      |    AS mcc,
      |  round(CAST(tp AS DOUBLE) / (tp + fn)
      |    + CAST(tn AS DOUBLE) / (tn + fp) - 1.0e0, 6) AS youden_j
      |FROM c""".stripMargin

  /** Haar wavelet energy by level over the first 256 observed order
    * days as ONE portable text — oracle of `x_haar_energy` and whole
    * query of the `x_sql_haar` twin. Five unrolled transform levels
    * (detail = (odd − even)/√2, approx = (odd + even)/√2 via signed
    * sums grouped on (i+1) div 2); per-level detail energy + the final
    * approximation energy released. The fixed 256-day truncation makes
    * the frame size sf-independent; energy conservation (Σ details +
    * approx = input energy) is the spec's cross-check. The series is
    * measured in M$ — dollar-scale energies reach ~1e13 where a few
    * ulps of engine-dependent summation order survive a 4 dp round
    * (measured: 0.01-absolute diffs at sf0.01); at M$ scale the sum
    * error sits ~1e-10 below the release grid. */
  private[queries] val HaarSql = {
    def lvl(k: Int): String =
      s"""l$k AS (SELECT CAST(floor((i + 1) / 2.0e0) AS BIGINT) AS i,
         |  sum(v / 1.4142135623730951e0) AS v,
         |  sum(CASE WHEN i % 2 = 1 THEN v ELSE -v END
         |    / 1.4142135623730951e0) AS dt
         |  FROM l${k - 1} GROUP BY 1),
         |e$k AS (SELECT $k AS lev, round(sum(dt * dt), 4) AS energy,
         |  CAST(count(*) AS BIGINT) AS n_coef FROM l$k)""".stripMargin
    s"""WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
       |  round(sum(o_totalprice) / 1e6, 6) AS v FROM orders GROUP BY 1),
       |idx AS (SELECT v,
       |  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i FROM cal),
       |l0 AS (SELECT i, v FROM idx WHERE i <= 256),
       |${(1 to 5).map(lvl).mkString(",\n")},
       |ea AS (SELECT 6 AS lev, round(sum(v * v), 4) AS energy,
       |  CAST(count(*) AS BIGINT) AS n_coef FROM l5)
       |SELECT lev AS level, energy, n_coef FROM e1
       |UNION ALL SELECT lev, energy, n_coef FROM e2
       |UNION ALL SELECT lev, energy, n_coef FROM e3
       |UNION ALL SELECT lev, energy, n_coef FROM e4
       |UNION ALL SELECT lev, energy, n_coef FROM e5
       |UNION ALL SELECT lev, energy, n_coef FROM ea
       |ORDER BY level""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    // MAX DRAWDOWN: the classic risk statistic on the demeaned revenue
    // equity curve — prefix-sum + running-max windows on the
    // calendar-bounded daily frame (carved out); trough day released
    // with a min-date tie-break rather than a second ranking window.
    QDef("x_drawdown", DrawdownSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(round(sum(col("o_totalprice")), 2).as("r"))
      val mm = cal.agg(round(avg(col("r")), 6).as("mu"),
        count(lit(1)).as("n"))
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val eq = cal.crossJoin(broadcast(mm))
        .select(col("d"), col("n"),
          sum(col("r") - col("mu")).over(w).as("equity"))
      val dd = eq.select(col("d"), col("n"),
        (max(col("equity")).over(w) - col("equity")).as("draw"))
      val mx = dd.agg(max(col("draw")).as("maxdd"))
      dd.crossJoin(broadcast(mx))
        .groupBy(col("maxdd"))
        .agg(max(col("n")).as("n_days"),
          min(when(col("draw") === col("maxdd"), col("d")))
            .as("trough_day"))
        .select(col("n_days"), round(col("maxdd"), 2).as("max_drawdown"),
          col("trough_day"))
    },

    // Drawdown through Spark's SQL parser — same shared text.
    QDef("x_sql_drawdown", DrawdownSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(DrawdownSql)
    },

    // PROCESS CAPABILITY: Cp/Cpk/Cpm plus the EXACT out-of-spec ppm
    // (an integer count — the advantage of in-database capability over
    // the normal-tail approximation). One aggregate, zero windows.
    QDef("x_capability", CapabilitySql) { (s, d) =>
      val mo = Tables(s, d).lineitem.agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("bigint")).as("s"),
        sum(col("l_quantity").cast("bigint")
          * col("l_quantity").cast("bigint")).as("q"),
        sum(when(col("l_quantity") < 5 || col("l_quantity") > 45, 1)
          .otherwise(0)).cast("bigint").as("oos"))
      val ms = mo.select(col("n"), col("oos"),
        (col("s").cast("double") / col("n")).as("mu"),
        sqrt((col("n").cast("double") * col("q").cast("double")
          - col("s").cast("double") * col("s").cast("double"))
          / (col("n").cast("double") * (col("n").cast("double") - 1.0)))
          .as("sd"))
      ms.select(col("n"), round(col("mu"), 6).as("mu"),
        round(col("sd"), 6).as("sd"),
        round(lit(40.0) / (lit(6.0) * col("sd")), 6).as("cp"),
        round(when(lit(45.0) - col("mu") < col("mu") - 5.0,
          (lit(45.0) - col("mu")) / (lit(3.0) * col("sd")))
          .otherwise((col("mu") - 5.0) / (lit(3.0) * col("sd"))), 6)
          .as("cpk"),
        round(lit(40.0) / (lit(6.0) * sqrt(col("sd") * col("sd")
          + (col("mu") - 25.0) * (col("mu") - 25.0))), 6).as("cpm"),
        round(col("oos").cast("double") * 1000000.0 / col("n"), 2)
          .as("oos_ppm"))
    },

    // Capability through Spark's SQL parser — same shared text.
    QDef("x_sql_capability", CapabilitySql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(CapabilitySql)
    },

    // CHATTERJEE'S XI: the 2021 rank correlation that detects ANY
    // functional dependence (not just monotone) — rank windows over
    // the calendar frame only; RANGE frames make the tie counts exact
    // in both engines.
    QDef("x_chatterjee", ChatterjeeSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).as("x"), round(avg(col("o_totalprice")), 6).as("y"))
      val wLe = Window.orderBy("y")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wGe = Window.orderBy(col("y").desc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val rk = cal.select(col("d"), col("x"), col("y"),
        count(lit(1)).over(wLe).cast("bigint").as("r"),
        count(lit(1)).over(wGe).cast("bigint").as("l"),
        count(lit(1)).over(Window.partitionBy()).cast("bigint").as("n"))
      val sq = rk.select(col("n"), col("r"), col("l"),
        lead(col("r"), 1).over(Window.orderBy("x", "d")).as("rnext"))
      val agg = sq.agg(max(col("n")).as("n"),
        sum(abs(col("rnext") - col("r")).cast("double")).as("num"),
        sum(col("l").cast("double") * (col("n") - col("l"))).as("den"))
      agg.select(col("n").as("n_days"),
        round(lit(1.0) - col("n") * col("num") / (lit(2.0) * col("den")),
          6).as("xi"))
    },

    // Chatterjee through Spark's SQL parser — same shared text.
    QDef("x_sql_chatterjee", ChatterjeeSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(ChatterjeeSql)
    },

    // DISTANCE CORRELATION: zero iff independent — the pair matrix is
    // calendar² (bounded at every sf), row means snapped before
    // centering, one moment aggregate closes it.
    QDef("x_dcor", DcorSql) { (s, d) =>
      // cal is read by BOTH sides of the pair cross — pin the
      // ≤2400-row calendar frame so orders is scanned once.
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).cast("double").as("x"),
          round(sum(col("o_totalprice")), 2).as("y"))
        .localCheckpoint()
      val pr = cal.select(col("d").as("di"), col("x").as("xi"),
        col("y").as("yi"))
        .crossJoin(broadcast(cal.select(col("d").as("dj"),
          col("x").as("xj"), col("y").as("yj"))))
        .select(col("di"), col("dj"), abs(col("xi") - col("xj")).as("ax"),
          abs(col("yi") - col("yj")).as("ay"))
      // rm feeds gm AND both centering joins — each reference would
      // re-evaluate the calendar² pair pass; pin the ≤2400-row frame.
      val rm = pr.groupBy("di")
        .agg(round(avg(col("ax")), 9).as("rax"),
          round(avg(col("ay")), 9).as("ray"))
        .localCheckpoint()
      val gm = rm.agg(round(avg(col("rax")), 9).as("gax"),
        round(avg(col("ray")), 9).as("gay"), count(lit(1)).as("n"))
      val cen = pr
        .join(broadcast(rm.select(col("di").as("ri_d"),
          col("rax").as("ri_ax"), col("ray").as("ri_ay"))),
          col("di") === col("ri_d"))
        .join(broadcast(rm.select(col("di").as("rj_d"),
          col("rax").as("rj_ax"), col("ray").as("rj_ay"))),
          col("dj") === col("rj_d"))
        .crossJoin(broadcast(gm))
        .select((col("ax") - col("ri_ax") - col("rj_ax") + col("gax"))
          .as("ca"),
          (col("ay") - col("ri_ay") - col("rj_ay") + col("gay"))
            .as("cb"),
          col("n"))
      val mom = cen.agg(max(col("n")).as("n"),
        sum(col("ca") * col("cb")).as("vxy"),
        sum(col("ca") * col("ca")).as("vxx"),
        sum(col("cb") * col("cb")).as("vyy"))
      mom.select(col("n").as("n_days"),
        round(sqrt(abs(col("vxy"))) / sqrt(sqrt(col("vxx") * col("vyy"))),
          6).as("dcor"),
        round(col("vxy") / col("n") / col("n"), 4).as("dcov2"))
    },

    // dCor through Spark's SQL parser — same shared fragments (hint
    // comments keep the pair cross off CartesianProduct). Materialize
    // ONLY the ≤2400-row row-mean frame `rm` behind a localCheckpoint
    // view: rm is referenced 3× (gm + both centering joins) and each
    // reference re-evaluates the full calendar² pair pass, so pinning
    // it cuts pr evaluations from ~5 to 2. The pair frame itself stays
    // inline — a broadcast-NLJ cross of two ≤2400-row frames is
    // cheaper to recompute once than to checkpoint (measured: the
    // pr-checkpoint variant spent 4.2 s writing 5.7M rows).
    QDef("x_sql_dcor", DcorSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(s"WITH $DcorCalCtes SELECT d, x, y FROM cal")
        .transform(SqlSurface.materialized("cal"))
      s.sql(s"WITH $DcorPrBody,\n$DcorRmCtes SELECT di, rax, ray FROM rm")
        .transform(SqlSurface.materialized("rm"))
      s.sql(s"WITH $DcorPrBody,\n$DcorTailCtes")
    },

    // IPF / RAKING: calibrate the (segment × priority) table to
    // uniform margins — 3 unrolled rounds of key-partitioned margin
    // scaling (the windows partition by the 5-key margins, so the
    // pattern scales out to arbitrarily many cells); 9 dp snap per
    // round keeps both engines on identical weights.
    QDef("x_ipf_raking", IpfSql) { (s, d) =>
      val t = Tables(s, d)
      val cell = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("g"), col("o_orderpriority").as("p"))
        .agg(count(lit(1)).cast("double").as("w0"),
          count(lit(1)).as("n0"))
      val tot = cell.agg(sum(col("w0")).as("t"),
        countDistinct(col("g")).cast("double").as("ng"),
        countDistinct(col("p")).cast("double").as("np"))
      val wg = Window.partitionBy("g")
      val wp = Window.partitionBy("p")
      val r1 = cell.crossJoin(broadcast(tot))
        .select(col("g"), col("p"), col("n0"), col("t"), col("ng"),
          col("np"),
          round(col("w0") * (col("t") / col("ng"))
            / sum(col("w0")).over(wg), 9).as("w"))
      val r2 = r1.select(col("g"), col("p"), col("n0"), col("t"),
        col("ng"),
        round(col("w") * (col("t") / col("np"))
          / sum(col("w")).over(wp), 9).as("w"))
      val r3 = r2.select(col("g"), col("p"), col("n0"),
        round(col("w") * (col("t") / col("ng"))
          / sum(col("w")).over(wg), 9).as("w"))
      r3.select(col("g").as("segment"), col("p").as("priority"),
        col("n0").as("n_raw"), round(col("w"), 4).as("weight"),
        round(sum(col("w")).over(wg), 2).as("row_margin"),
        round(sum(col("w")).over(wp), 2).as("col_margin"))
        .orderBy("segment", "priority")
    },

    // IPF through Spark's SQL parser — same shared text.
    QDef("x_sql_ipf", IpfSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(IpfSql)
    },

    // HOEFFDING'S D: the classic nonparametric dependence test whose
    // power extends beyond monotone association — bivariate midrank
    // machinery entirely on the ≤25-cell contingency (dominance sums
    // via the hinted cell cross), corpus touched once.
    QDef("x_hoeffding_d", HoeffdingSql) { (s, d) =>
      val cell = Tables(s, d).orders
        .groupBy(substring(col("o_orderpriority"), 1, 1).cast("int")
          .as("gx"),
          when(col("o_totalprice") < 50000, 0)
            .when(col("o_totalprice") < 100000, 1)
            .when(col("o_totalprice") < 150000, 2)
            .when(col("o_totalprice") < 200000, 3).otherwise(4)
            .cast("int").as("gy"))
        .agg(count(lit(1)).as("c"))
      def margin(key: String, cnt: String) = cell.groupBy(key)
        .agg(sum(col("c")).cast("bigint").as(cnt))
      val wx = Window.orderBy("gx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wy = Window.orderBy("gy")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cx = margin("gx", "cr").select(col("gx"), col("cr"),
        (sum(col("cr")).over(wx) - col("cr")).cast("bigint").as("belowx"))
      val cy = margin("gy", "cc").select(col("gy"), col("cc"),
        (sum(col("cc")).over(wy) - col("cc")).cast("bigint").as("belowy"))
      val q = cell.select(col("gx").as("agx"), col("gy").as("agy"),
        col("c").as("ac"))
        .crossJoin(broadcast(cell.select(col("gx").as("bgx"),
          col("gy").as("bgy"), col("c").as("bc"))))
        .groupBy("agx", "agy", "ac")
        .agg((lit(1.0)
          + sum(when(col("bgx") < col("agx") && col("bgy") < col("agy"),
            col("bc").cast("double")).otherwise(0.0))
          + lit(0.5) * sum(when(col("bgx") === col("agx")
            && col("bgy") < col("agy"), col("bc").cast("double"))
            .otherwise(0.0))
          + lit(0.5) * sum(when(col("bgx") < col("agx")
            && col("bgy") === col("agy"), col("bc").cast("double"))
            .otherwise(0.0))
          + lit(0.25) * (col("ac") - 1)).as("qv"))
      val rs = q
        .join(broadcast(cx), col("agx") === col("gx"))
        .join(broadcast(cy), col("agy") === col("gy"))
        .select(col("ac").as("c"), col("qv"),
          (col("belowx") + (col("cr") + 1.0) / 2).as("rv"),
          (col("belowy") + (col("cc") + 1.0) / 2).as("sv"))
      val dd = rs.agg(sum(col("c")).cast("double").as("n"),
        sum(col("c") * (col("qv") - 1) * (col("qv") - 2)).as("d1"),
        sum(col("c") * (col("rv") - 1) * (col("rv") - 2)
          * (col("sv") - 1) * (col("sv") - 2)).as("d2"),
        sum(col("c") * (col("rv") - 2) * (col("sv") - 2)
          * (col("qv") - 1)).as("d3"))
      dd.select(col("n").cast("bigint").as("n"),
        round(lit(30.0) * ((col("n") - 2) * (col("n") - 3) * col("d1")
          + col("d2") - lit(2.0) * (col("n") - 2) * col("d3"))
          / (col("n") * (col("n") - 1) * (col("n") - 2)
            * (col("n") - 3) * (col("n") - 4)), 9).as("hoeffding_d"))
    },

    // Hoeffding through Spark's SQL parser — same shared text.
    QDef("x_sql_hoeffd", HoeffdingSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(HoeffdingSql)
    },

    // CONFUSION BATTERY: the complete binary-classifier scorecard in
    // one conditional-sum pass (x_cohens_kappa releases agreement; this
    // releases the ranking/threshold metrics a model card needs).
    QDef("x_confusion_stats", ConfusionSql) { (s, d) =>
      val r = Tables(s, d).orders.select(
        when(col("o_totalprice") > 150000, 1).otherwise(0).as("pr"),
        when(col("o_orderstatus") === "F", 1).otherwise(0).as("tr"))
      val c = r.agg(count(lit(1)).as("n"),
        sum(col("pr") * col("tr")).cast("bigint").as("tp"),
        sum(col("pr") * (lit(1) - col("tr"))).cast("bigint").as("fp"),
        sum((lit(1) - col("pr")) * col("tr")).cast("bigint").as("fn"),
        sum((lit(1) - col("pr")) * (lit(1) - col("tr"))).cast("bigint")
          .as("tn"))
      c.select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
        round((col("tp") + col("tn")).cast("double") / col("n"), 6)
          .as("accuracy"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .as("precision_"),
        round(col("tp").cast("double") / (col("tp") + col("fn")), 6)
          .as("recall_"),
        round(col("tn").cast("double") / (col("tn") + col("fp")), 6)
          .as("specificity"),
        round(lit(2.0) * col("tp")
          / (lit(2.0) * col("tp") + col("fp") + col("fn")), 6).as("f1"),
        round((col("tp").cast("double") * col("tn")
          - col("fp").cast("double") * col("fn"))
          / sqrt((col("tp") + col("fp")).cast("double")
            * (col("tp") + col("fn")).cast("double")
            * (col("tn") + col("fp")).cast("double")
            * (col("tn") + col("fn")).cast("double")), 6).as("mcc"),
        round(col("tp").cast("double") / (col("tp") + col("fn"))
          + col("tn").cast("double") / (col("tn") + col("fp")) - 1.0, 6)
          .as("youden_j"))
    },

    // Confusion battery through Spark's SQL parser — same shared text.
    QDef("x_sql_confusion", ConfusionSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(ConfusionSql)
    },

    // HAAR ENERGY: multiresolution energy decomposition of the daily
    // revenue series — five unrolled (odd±even)/√2 levels as grouped
    // signed sums on the fixed 256-day frame; the spec checks energy
    // conservation against the raw series.
    QDef("x_haar_energy", HaarSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(round(sum(col("o_totalprice")) / lit(1e6), 6).as("v"))
      val idx = cal.select(col("v"),
        row_number().over(Window.orderBy("d")).cast("bigint").as("i"))
      var cur = idx.filter(col("i") <= 256)
      val levels = (1 to 5).map { k =>
        val next = cur.groupBy(floor((col("i") + 1) / lit(2.0))
          .cast("bigint").as("i"))
          .agg(sum(col("v") / lit(1.4142135623730951)).as("v"),
            sum(when(col("i") % 2 === 1, col("v")).otherwise(-col("v"))
              / lit(1.4142135623730951)).as("dt"))
        val e = next.agg(round(sum(col("dt") * col("dt")), 4)
          .as("energy"), count(lit(1)).as("n_coef"))
          .select(lit(k).as("level"), col("energy"), col("n_coef"))
        cur = next.select(col("i"), col("v"))
        e
      }
      val ea = cur.agg(round(sum(col("v") * col("v")), 4).as("energy"),
        count(lit(1)).as("n_coef"))
        .select(lit(6).as("level"), col("energy"), col("n_coef"))
      levels.reduce(_ unionAll _).unionAll(ea).orderBy("level")
    },

    // Haar through Spark's SQL parser — same shared text.
    QDef("x_sql_haar", HaarSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(HaarSql)
    })
}
