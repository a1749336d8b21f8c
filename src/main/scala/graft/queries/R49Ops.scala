package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-49 batch: time-series diagnostics and statistical process
  * control — Engle's ARCH LM test, the von Neumann successive-
  * difference ratio, the Buishand range change-point test, exhaustive
  * single-breakpoint search via prefix moments, the Shewhart I-MR
  * control chart (with a Western-Electric run rule), the varying-n
  * p-chart, one-way intraclass correlation, and the Kolmogorov-
  * Zurbenko iterated moving-average filter.
  *
  * Scale posture: the corpus collapses ONCE per operator to a
  * calendar-bounded daily frame (or, for ICC, a 25-row per-nation
  * moment frame); every window after that orders the bounded daily
  * series (the x_acf/x_cusum carve-out class). The breakpoint search
  * is the round's shape lesson: an exhaustive scan over all ~2400
  * candidate split days costs ZERO extra passes — both sides' SSEs are
  * closed forms over running prefix moments, so "try every breakpoint"
  * is one window plus an ORDER BY ... LIMIT 1 on the bounded frame
  * (contrast with the naive candidate × day self-join). χ²(1) tails
  * ride the R45 erfc fragment: p = erfc(√(x/2)) exactly. */
object R49Ops {

  /** Engle's ARCH(1) LM test on daily order-count innovations as ONE
    * portable text — oracle of `x_arch_lm` and whole query of the
    * `x_sql_arch` twin. Innovations e_t = y_t − ȳ (ȳ 6 dp-snapped);
    * the auxiliary regression e²_t ~ e²_{t−1} by closed-form OLS on
    * the lag-paired daily frame; LM = m·R², p = erfc(√(LM/2)). */
  private[queries] val ArchSql =
    s"""WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
       |  CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1),
       |m AS (SELECT round(avg(y), 6) AS my FROM cal),
       |e AS (SELECT d, (y - m.my) * (y - m.my) AS e2 FROM cal, m),
       |lp AS (SELECT d, e2,
       |  lag(e2, 1) OVER (ORDER BY d) AS e2l FROM e),
       |pairs AS (SELECT e2, e2l FROM lp WHERE e2l IS NOT NULL),
       |mo AS (SELECT CAST(count(*) AS DOUBLE) AS m,
       |  sum(e2) AS sy, sum(e2l) AS sx, sum(e2 * e2) AS syy,
       |  sum(e2l * e2l) AS sxx, sum(e2 * e2l) AS sxy FROM pairs),
       |r2 AS (SELECT m,
       |  (m * sxy - sx * sy) * (m * sxy - sx * sy)
       |    / ((m * sxx - sx * sx) * (m * syy - sy * sy)) AS r2
       |  FROM mo),
       |lm AS (SELECT m, r2, m * r2 AS lm,
       |  sqrt(m * r2 / 2.0e0) AS az FROM r2)
       |SELECT CAST(m AS BIGINT) AS n_pairs, round(r2, 6) AS aux_r2,
       |  round(lm, 4) AS arch_lm,
       |  round(${R45Ops.erfcSql("az")}, 6) AS p_value
       |FROM lm""".stripMargin

  /** Von Neumann ratio (successive-difference test for serial
    * dependence) on the daily revenue series as ONE portable text —
    * oracle of `x_von_neumann` and whole query of the `x_sql_vn` twin.
    * η = Σ(y_{t+1}−y_t)² / Σ(y_t−ȳ)²; under independence E[η] ≈ 2,
    * z = (η − 2)/√(4(m−2)/(m²−1)). Revenue in M$ (the x_haar_energy
    * scale lesson: dollar-scale squared sums leave sum-order ulps
    * above the release rounding). */
  private[queries] val VnSql =
    """WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  round(sum(o_totalprice) / 1.0e6, 6) AS y FROM orders
      |  GROUP BY 1),
      |lp AS (SELECT d, y, lag(y, 1) OVER (ORDER BY d) AS yl FROM cal),
      |m AS (SELECT round(avg(y), 6) AS my,
      |  CAST(count(*) AS DOUBLE) AS n FROM cal),
      |ag AS (SELECT max(m.n) AS n,
      |  sum(CASE WHEN lp.yl IS NOT NULL
      |    THEN (lp.y - lp.yl) * (lp.y - lp.yl) ELSE 0 END) AS sd2,
      |  sum((lp.y - m.my) * (lp.y - m.my)) AS ss FROM lp, m),
      |v AS (SELECT n, sd2 / ss AS eta FROM ag)
      |SELECT CAST(n AS BIGINT) AS n_days, round(eta, 6) AS vn_ratio,
      |  round((eta - 2.0e0)
      |    / sqrt(4.0e0 * (n - 2) / (n * n - 1.0e0)), 4) AS z
      |FROM v""".stripMargin

  /** Buishand range change-point test on daily order counts as ONE
    * portable text — oracle of `x_buishand` and whole query of the
    * `x_sql_buishand` twin. Partial sums S_k of 6 dp-snapped
    * deviations; R = (max S − min S)/s_y; released R/√n against the
    * ~1.5 critical band. The most extreme |S_k| day is the change-point
    * candidate (min-date tie-break via ORDER BY ... LIMIT 1). */
  private[queries] val BuishandSql =
    """WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1),
      |m AS (SELECT round(avg(y), 6) AS my,
      |  CAST(count(*) AS DOUBLE) AS n FROM cal),
      |s AS (SELECT cal.d, m.n,
      |  sum(cal.y - m.my) OVER (ORDER BY cal.d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sk
      |  FROM cal, m),
      |sd AS (SELECT sqrt(sum((y - m.my) * (y - m.my)) / max(m.n))
      |    AS sy
      |  FROM cal, m),
      |rng AS (SELECT max(n) AS n, max(sk) AS smax, min(sk) AS smin
      |  FROM s),
      |peak AS (SELECT d FROM s ORDER BY abs(sk) DESC, d LIMIT 1)
      |SELECT CAST(rng.n AS BIGINT) AS n_days,
      |  round((rng.smax - rng.smin) / sd.sy, 4) AS r_stat,
      |  round((rng.smax - rng.smin) / sd.sy / sqrt(rng.n), 4)
      |    AS r_scaled,
      |  peak.d AS peak_day
      |FROM rng, sd, peak""".stripMargin

  /** Exhaustive single-breakpoint search (mean-shift model) on the
    * daily revenue series as ONE portable text — oracle of
    * `x_break_sse` and whole query of the `x_sql_break` twin. For
    * EVERY candidate split day, both sides' SSEs are closed forms over
    * running prefix moments (n, Σy, Σy² up to t), so the full scan is
    * one cumulative window — no candidate × day join anywhere. The
    * argmin picks by (6 dp-snapped combined SSE, day); the released
    * F-like statistic tests the shift against the pooled residual.
    * Prefix moments accumulate as exact DOLLAR BIGINTs (the
    * x_dsir_weights integer-space lesson — double prefix sums differ
    * between engines in summation ORDER, and the sf0.1 sweep caught
    * the resulting 1-ulp straddle of a 4 dp rounding tie in
    * sse_full); the closed algebra runs in DOUBLE from identical
    * integers, scaled back to M$² at release. The squared prefix
    * Σyq² accumulates as DECIMAL(38,0) — still order-independent-
    * exact in both engines, and it survives the 100× growth probe
    * where a BIGINT overflows (≈7e16 at sf0.1, ×100 at the sf1
    * upscale). */
  private[queries] val BreakSql =
    """WITH cal0 AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  CAST(round(sum(o_totalprice) * 100.0e0, 0) AS BIGINT) AS yc
      |  FROM orders GROUP BY 1),
      |cal AS (SELECT d,
      |  CAST((yc + 50 - (yc + 50) % 100) / 100.0e0 AS BIGINT) AS yq
      |  FROM cal0),
      |p AS (SELECT d, yq,
      |  CAST(row_number() OVER (ORDER BY d) AS DOUBLE) AS t,
      |  CAST(sum(yq) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS ps,
      |  CAST(sum(CAST(yq AS DECIMAL(19, 0)) * yq) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DECIMAL(38, 0)) AS pq
      |  FROM cal),
      |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n,
      |  CAST(sum(yq) AS BIGINT) AS s,
      |  CAST(sum(CAST(yq AS DECIMAL(19, 0)) * yq) AS DECIMAL(38, 0))
      |    AS q FROM cal),
      |cand AS (SELECT p.d, p.t, tot.n,
      |  ((CAST(p.pq AS DOUBLE)
      |    - CAST(p.ps AS DOUBLE) * CAST(p.ps AS DOUBLE) / p.t)
      |    + ((CAST(tot.q AS DOUBLE) - CAST(p.pq AS DOUBLE))
      |       - CAST(tot.s - p.ps AS DOUBLE)
      |         * CAST(tot.s - p.ps AS DOUBLE) / (tot.n - p.t)))
      |    / 1.0e12 AS sse_split,
      |  (CAST(tot.q AS DOUBLE)
      |    - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE) / tot.n)
      |    / 1.0e12 AS sse_full
      |  FROM p, tot WHERE p.t >= 5 AND p.t <= tot.n - 5),
      |best AS (SELECT d, t, n, sse_split, sse_full
      |  FROM cand
      |  ORDER BY floor(sse_split * 1.0e6 + 0.5e0), d LIMIT 1)
      |SELECT d AS break_day, CAST(t AS BIGINT) AS break_index,
      |  CAST(n AS BIGINT) AS n_days,
      |  floor(sse_full * 1.0e4 + 0.5e0) / 1.0e4 AS sse_full,
      |  floor(sse_split * 1.0e4 + 0.5e0) / 1.0e4 AS sse_split,
      |  floor((sse_full - sse_split) / (sse_split / (n - 2))
      |    * 1.0e4 + 0.5e0) / 1.0e4 AS f_stat
      |FROM best""".stripMargin

  /** Shewhart individuals / moving-range chart on daily mean order
    * value as ONE portable text — oracle of `x_imr_chart` and whole
    * query of the `x_sql_imr` twin. Center = 6 dp-snapped mean of the
    * daily means; MR̄ from |y_t − y_{t−1}|; limits center ± 2.66·MR̄
    * (the d2-based I-chart constant); plus Western Electric rule 4-ish
    * run detection — counts of maximal ≥9-day runs strictly one side
    * of center via the gaps-islands constant-key trick on the daily
    * frame. */
  private[queries] val ImrSql =
    """WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  round(avg(o_totalprice), 6) AS y FROM orders GROUP BY 1),
      |c AS (SELECT round(avg(y), 6) AS center FROM cal),
      |mr AS (SELECT d, y,
      |  abs(y - lag(y, 1) OVER (ORDER BY d)) AS m FROM cal),
      |lim AS (SELECT max(c.center) AS center,
      |  round(avg(mr.m), 6) AS mrbar
      |  FROM mr, c WHERE mr.m IS NOT NULL),
      |fl AS (SELECT mr.d, mr.y, lim.center,
      |  lim.center + 2.66e0 * lim.mrbar AS ucl,
      |  lim.center - 2.66e0 * lim.mrbar AS lcl,
      |  CASE WHEN mr.y > lim.center THEN 1
      |       WHEN mr.y < lim.center THEN -1 ELSE 0 END AS side,
      |  CAST(row_number() OVER (ORDER BY mr.d) AS BIGINT) AS rn
      |  FROM mr, lim),
      |isl AS (SELECT side, rn - CAST(row_number() OVER (
      |    PARTITION BY side ORDER BY rn) AS BIGINT) AS grp
      |  FROM fl WHERE side <> 0),
      |runs AS (SELECT CAST(count(*) AS BIGINT) AS len FROM isl
      |  GROUP BY side, grp),
      |agg AS (SELECT
      |  CAST(sum(CASE WHEN len >= 9 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS long_runs FROM runs),
      |oob AS (SELECT CAST(sum(CASE WHEN y > ucl OR y < lcl THEN 1
      |    ELSE 0 END) AS BIGINT) AS n_beyond,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(max(ucl), 4) AS ucl, round(max(lcl), 4) AS lcl,
      |  round(max(center), 4) AS center
      |  FROM fl)
      |SELECT oob.n AS n_days, oob.center, oob.lcl, oob.ucl,
      |  oob.n_beyond, agg.long_runs
      |FROM oob, agg""".stripMargin

  /** Varying-n p-chart on the daily share of URGENT/HIGH-priority
    * orders as ONE portable text — oracle of `x_p_chart` and whole
    * query of the `x_sql_pchart` twin. p̄ from exact BIGINT totals;
    * per-day 3σ limits use that day's n; out-of-control days counted
    * exactly. */
  private[queries] val PchartSql =
    """WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS INT)
      |    <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |pb AS (SELECT CAST(sum(x) AS DOUBLE) / sum(n) AS pbar,
      |  CAST(count(*) AS BIGINT) AS days FROM cal),
      |fl AS (SELECT cal.d, pb.pbar, pb.days,
      |  CAST(cal.x AS DOUBLE) / cal.n AS p,
      |  pb.pbar + 3.0e0 * sqrt(pb.pbar * (1.0e0 - pb.pbar) / cal.n)
      |    AS ucl,
      |  pb.pbar - 3.0e0 * sqrt(pb.pbar * (1.0e0 - pb.pbar) / cal.n)
      |    AS lcl
      |  FROM cal, pb)
      |SELECT max(days) AS n_days, round(max(pbar), 6) AS p_bar,
      |  CAST(sum(CASE WHEN p > ucl OR p < lcl THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_out_of_control
      |FROM fl""".stripMargin

  /** One-way random-effects intraclass correlation ICC(1) of order
    * value within customer nations as ONE portable text — oracle of
    * `x_icc` and whole query of the `x_sql_icc` twin. Unbalanced
    * one-way ANOVA from ONE (nation × moment) collapse: MSB/MSW and
    * the unbalanced group-size constant n₀ = (N − Σnᵢ²/N)/(k−1); the
    * corpus cost is one broadcast dim join + one grouped aggregate.
    * Value in k$ (the M$-scale discipline, one notch down — nation
    * sums are smaller than daily corpus sums). */
  private[queries] val IccSql =
    """WITH g AS (SELECT c.c_nationkey AS nk,
      |  CAST(count(*) AS BIGINT) AS n,
      |  sum(o.o_totalprice / 1.0e3) AS s,
      |  sum((o.o_totalprice / 1.0e3) * (o.o_totalprice / 1.0e3)) AS q
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
      |  CAST(count(*) AS DOUBLE) AS k, sum(s) AS st, sum(q) AS qt,
      |  sum(CAST(n AS DOUBLE) * n) AS n2,
      |  sum(s * s / n) AS sb FROM g),
      |ms AS (SELECT nn, k,
      |  (sb - st * st / nn) / (k - 1) AS msb,
      |  (qt - sb) / (nn - k) AS msw,
      |  (nn - n2 / nn) / (k - 1) AS n0 FROM tot)
      |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups,
      |  round(msb, 6) AS ms_between, round(msw, 6) AS ms_within,
      |  round(n0, 4) AS n0,
      |  round((msb - msw) / (msb + (n0 - 1) * msw), 6) AS icc1
      |FROM ms""".stripMargin

  /** Kolmogorov-Zurbenko KZ(15, 3) filter on the daily order-count
    * series as ONE portable text — oracle of `x_kz_filter` and whole
    * query of the `x_sql_kz` twin. Three iterated centered 15-day
    * moving averages (edge-shortened windows, each pass 6 dp-snapped
    * so both engines iterate identical series); released: the filter's
    * variance-reduction ratio and the last filtered value. */
  private[queries] val KzSql = {
    def pass(src: String, dst: String): String =
      s"""$dst AS (SELECT d, round(avg(y) OVER (ORDER BY d
         |  ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING), 6) AS y
         |  FROM $src)""".stripMargin
    s"""WITH k0 AS (SELECT CAST(o_orderdate AS DATE) AS d,
       |  CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1),
       |${pass("k0", "k1")},
       |${pass("k1", "k2")},
       |${pass("k2", "k3")},
       |v0 AS (SELECT round(avg(y), 6) AS m,
       |  CAST(count(*) AS BIGINT) AS n FROM k0),
       |vr AS (SELECT sum((k0.y - v0.m) * (k0.y - v0.m)) AS raw_ss,
       |  max(v0.n) AS n FROM k0, v0),
       |vf AS (SELECT sum((k3.y - v0.m) * (k3.y - v0.m)) AS f_ss
       |  FROM k3, v0),
       |lastv AS (SELECT y FROM k3 ORDER BY d DESC LIMIT 1)
       |SELECT vr.n AS n_days,
       |  round(vf.f_ss / vr.raw_ss, 6) AS variance_ratio,
       |  round(lastv.y, 6) AS last_filtered
       |FROM vr, vf, lastv""".stripMargin
  }

  private def daily(s: org.apache.spark.sql.SparkSession, d: String,
      value: org.apache.spark.sql.Column) =
    Tables(s, d).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(value.as("y"))

  val defs: Seq[QDef] = Seq(

    // ARCH LM: volatility clustering — the squared-innovation
    // autocorrelation that mean-level diagnostics can't see.
    QDef("x_arch_lm", ArchSql) { (s, d) =>
      val cal = daily(s, d, count(lit(1)).cast("double"))
      val m = cal.agg(round(avg("y"), 6).as("my"))
      val e = cal.crossJoin(broadcast(m))
        .select(col("d"), ((col("y") - col("my"))
          * (col("y") - col("my"))).as("e2"))
      val lp = e.select(col("d"), col("e2"),
        lag("e2", 1).over(Window.orderBy("d")).as("e2l"))
      val pairs = lp.filter(col("e2l").isNotNull)
      val mo = pairs.agg(count(lit(1)).cast("double").as("m"),
        sum("e2").as("sy"), sum("e2l").as("sx"),
        sum(col("e2") * col("e2")).as("syy"),
        sum(col("e2l") * col("e2l")).as("sxx"),
        sum(col("e2") * col("e2l")).as("sxy"))
      val r2 = mo.select(col("m"),
        ((col("m") * col("sxy") - col("sx") * col("sy"))
          * (col("m") * col("sxy") - col("sx") * col("sy"))
          / ((col("m") * col("sxx") - col("sx") * col("sx"))
            * (col("m") * col("syy") - col("sy") * col("sy"))))
          .as("r2"))
      val lm = r2.select(col("m"), col("r2"),
        (col("m") * col("r2")).as("lm"),
        sqrt(col("m") * col("r2") / 2.0).as("az"))
      lm.select(col("m").cast("bigint").as("n_pairs"),
        round(col("r2"), 6).as("aux_r2"),
        round(col("lm"), 4).as("arch_lm"),
        round(expr(R45Ops.erfcSql("az")), 6).as("p_value"))
    },

    // ARCH through Spark's SQL parser — same shared text.
    QDef("x_sql_arch", ArchSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(ArchSql)
    },

    // VON NEUMANN: the oldest successive-difference randomness test —
    // one lag window on the M$-scaled daily frame.
    QDef("x_von_neumann", VnSql) { (s, d) =>
      val cal = daily(s, d, round(sum("o_totalprice") / 1.0e6, 6))
      val lp = cal.select(col("d"), col("y"),
        lag("y", 1).over(Window.orderBy("d")).as("yl"))
      val m = cal.agg(round(avg("y"), 6).as("my"),
        count(lit(1)).cast("double").as("n"))
      val ag = lp.crossJoin(broadcast(m)).agg(max("n").as("n"),
        sum(when(col("yl").isNotNull,
          (col("y") - col("yl")) * (col("y") - col("yl")))
          .otherwise(0.0)).as("sd2"),
        sum((col("y") - col("my")) * (col("y") - col("my"))).as("ss"))
      ag.select(col("n").cast("bigint").as("n_days"),
        round(col("sd2") / col("ss"), 6).as("vn_ratio"),
        round((col("sd2") / col("ss") - 2.0)
          / sqrt(lit(4.0) * (col("n") - 2)
            / (col("n") * col("n") - 1.0)), 4).as("z"))
    },

    // Von Neumann through Spark's SQL parser — same shared text.
    QDef("x_sql_vn", VnSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(VnSql)
    },

    // BUISHAND: the partial-sum range change-point test — rescaled
    // range of deviations, peak day released.
    QDef("x_buishand", BuishandSql) { (s, d) =>
      val cal = daily(s, d, count(lit(1)).cast("double"))
      val m = cal.agg(round(avg("y"), 6).as("my"),
        count(lit(1)).cast("double").as("n"))
      val sF = cal.crossJoin(broadcast(m))
        .select(col("d"), col("n"),
          sum(col("y") - col("my")).over(Window.orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("sk"))
      val sd = cal.crossJoin(broadcast(m))
        .agg(sqrt(sum((col("y") - col("my")) * (col("y") - col("my")))
          / max("n")).as("sy"))
      val rng = sF.agg(max("n").as("n"), max("sk").as("smax"),
        min("sk").as("smin"))
      val peak = sF.orderBy(abs(col("sk")).desc, col("d")).limit(1)
        .select(col("d"))
      rng.crossJoin(broadcast(sd)).crossJoin(broadcast(peak))
        .select(col("n").cast("bigint").as("n_days"),
          round((col("smax") - col("smin")) / col("sy"), 4)
            .as("r_stat"),
          round((col("smax") - col("smin")) / col("sy")
            / sqrt(col("n")), 4).as("r_scaled"),
          col("d").as("peak_day"))
    },

    // Buishand through Spark's SQL parser — same shared text.
    QDef("x_sql_buishand", BuishandSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(BuishandSql)
    },

    // BREAKPOINT SEARCH: every candidate split day scored from ONE
    // prefix-moment window — the exhaustive scan with zero extra
    // corpus passes.
    QDef("x_break_sse", BreakSql) { (s, d) =>
      // exact-cents quantization, then HALF_UP to whole dollars in
      // integer space: the daily total is integral in cents (no tie
      // possible there), while a direct round to dollars or to 6 dp
      // M$ ties whenever a day ends in $0.50 — engines then disagree
      // by their sum-order ulps (the sf0.1 catch)
      val cal = daily(s, d,
        round(sum("o_totalprice") * 100.0, 0).cast("bigint"))
        .select(col("d"),
          (((col("y") + 50) - (col("y") + 50) % 100) / 100.0)
            .cast("bigint").as("yq"))
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val p = cal.select(col("d"), col("yq"),
        row_number().over(Window.orderBy("d")).cast("double").as("t"),
        sum("yq").over(w).cast("bigint").as("ps"),
        sum(col("yq").cast("decimal(19,0)") * col("yq")).over(w)
          .cast("decimal(38,0)").as("pq"))
      val tot = cal.agg(count(lit(1)).cast("double").as("n"),
        sum("yq").cast("bigint").as("s"),
        sum(col("yq").cast("decimal(19,0)") * col("yq"))
          .cast("decimal(38,0)").as("q"))
      val cand = p.crossJoin(broadcast(tot))
        .filter(col("t") >= 5 && col("t") <= col("n") - 5)
        .select(col("d"), col("t"), col("n"),
          (((col("pq").cast("double")
            - col("ps").cast("double") * col("ps").cast("double")
              / col("t"))
            + ((col("q").cast("double") - col("pq").cast("double"))
              - (col("s") - col("ps")).cast("double")
                * (col("s") - col("ps")).cast("double")
                / (col("n") - col("t")))) / 1.0e12).as("sse_split"),
          ((col("q").cast("double")
            - col("s").cast("double") * col("s").cast("double")
              / col("n")) / 1.0e12).as("sse_full"))
      // floor-based rounding (floor(x·1eN + .5)/1eN): pure IEEE ops on
      // doubles both engines derived from identical BIGINTs — immune
      // to the round(double, N) tie divergence (Spark BigDecimal-exact
      // vs DuckDB float-multiply) the sf0.1 sweep caught at 4 dp
      def fl(c: org.apache.spark.sql.Column, n: Int) = {
        val k = math.pow(10, n)
        floor(c * k + 0.5) / k
      }
      val best = cand
        .orderBy(floor(col("sse_split") * 1.0e6 + 0.5), col("d"))
        .limit(1)
      best.select(col("d").as("break_day"),
        col("t").cast("bigint").as("break_index"),
        col("n").cast("bigint").as("n_days"),
        fl(col("sse_full"), 4).as("sse_full"),
        fl(col("sse_split"), 4).as("sse_split"),
        fl((col("sse_full") - col("sse_split"))
          / (col("sse_split") / (col("n") - 2)), 4).as("f_stat"))
    },

    // Breakpoint through Spark's SQL parser — same shared text.
    QDef("x_sql_break", BreakSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(BreakSql)
    },

    // I-MR CHART: the individuals chart with moving-range limits and
    // a ≥9-day one-side run rule (gaps-islands on the sign series).
    // Dataset side: lag + gaps-islands in Column algebra over the
    // carved-out calendar frame; 1-row limit frames cross-joined back.
    QDef("x_imr_chart", ImrSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(round(avg("o_totalprice"), 6).as("y"))
      val c = cal.agg(round(avg("y"), 6).as("center"))
      val mr = cal.select(col("d"), col("y"),
        abs(col("y") - lag("y", 1).over(Window.orderBy("d"))).as("m"))
      val lim = mr.filter(col("m").isNotNull).crossJoin(c)
        .agg(max("center").as("center"),
          round(avg("m"), 6).as("mrbar"))
      val fl = mr.crossJoin(broadcast(lim))
        .select(col("d"), col("y"), col("center"),
          (col("center") + lit(2.66) * col("mrbar")).as("ucl"),
          (col("center") - lit(2.66) * col("mrbar")).as("lcl"),
          when(col("y") > col("center"), 1)
            .when(col("y") < col("center"), -1).otherwise(0)
            .as("side"),
          row_number().over(Window.orderBy("d")).cast("bigint")
            .as("rn"))
      val isl = fl.filter(col("side") =!= 0)
        .select(col("side"),
          (col("rn") - row_number().over(
            Window.partitionBy("side").orderBy("rn")).cast("bigint"))
            .as("grp"))
      val runs = isl.groupBy("side", "grp")
        .agg(count(lit(1)).as("len"))
      val agg = runs.agg(
        sum(when(col("len") >= 9, 1).otherwise(0)).cast("bigint")
          .as("long_runs"))
      val oob = fl.agg(
        sum(when(col("y") > col("ucl") || col("y") < col("lcl"), 1)
          .otherwise(0)).cast("bigint").as("n_beyond"),
        count(lit(1)).as("n"),
        round(max("ucl"), 4).as("ucl"),
        round(max("lcl"), 4).as("lcl"),
        round(max("center"), 4).as("center"))
      oob.crossJoin(agg)
        .select(col("n").as("n_days"), col("center"), col("lcl"),
          col("ucl"), col("n_beyond"), col("long_runs"))
    },

    // I-MR through Spark's SQL parser — same shared text; the spec
    // also recomputes limits and run counts brute force from the
    // collected daily series.
    QDef("x_sql_imr", ImrSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(ImrSql)
    },

    // P-CHART: attribute control with per-day limits — the varying-n
    // form that fixed-limit charts get wrong.
    QDef("x_p_chart", PchartSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).as("n"),
          sum(when(substring(col("o_orderpriority"), 1, 1).cast("int")
            <= 2, 1L).otherwise(0L)).cast("bigint").as("x"))
      val pb = cal.agg(
        (sum("x").cast("double") / sum("n")).as("pbar"),
        count(lit(1)).cast("bigint").as("days"))
      val fl = cal.crossJoin(broadcast(pb))
        .select(col("days"), col("pbar"),
          (col("x").cast("double") / col("n")).as("p"),
          (col("pbar") + lit(3.0) * sqrt(col("pbar")
            * (lit(1.0) - col("pbar")) / col("n"))).as("ucl"),
          (col("pbar") - lit(3.0) * sqrt(col("pbar")
            * (lit(1.0) - col("pbar")) / col("n"))).as("lcl"))
      fl.agg(max("days").as("n_days"),
        round(max("pbar"), 6).as("p_bar"),
        sum(when(col("p") > col("ucl") || col("p") < col("lcl"), 1L)
          .otherwise(0L)).cast("bigint").as("n_out_of_control"))
    },

    // P-chart through Spark's SQL parser — same shared text.
    QDef("x_sql_pchart", PchartSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(PchartSql)
    },

    // ICC(1): how much of order-value variance is BETWEEN nations —
    // the reliability coefficient from one unbalanced-ANOVA collapse.
    QDef("x_icc", IccSql) { (s, d) =>
      val t = Tables(s, d)
      val kv = col("o_totalprice") / 1.0e3
      val g = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n"), sum(kv).as("s"),
          sum(kv * kv).as("q"))
      val tot = g.agg(sum("n").cast("double").as("nn"),
        count(lit(1)).cast("double").as("k"),
        sum("s").as("st"), sum("q").as("qt"),
        sum(col("n").cast("double") * col("n")).as("n2"),
        sum(col("s") * col("s") / col("n")).as("sb"))
      val ms = tot.select(col("nn"), col("k"),
        ((col("sb") - col("st") * col("st") / col("nn"))
          / (col("k") - 1)).as("msb"),
        ((col("qt") - col("sb")) / (col("nn") - col("k"))).as("msw"),
        ((col("nn") - col("n2") / col("nn")) / (col("k") - 1))
          .as("n0"))
      ms.select(col("nn").cast("bigint").as("n"),
        col("k").cast("bigint").as("k_groups"),
        round(col("msb"), 6).as("ms_between"),
        round(col("msw"), 6).as("ms_within"),
        round(col("n0"), 4).as("n0"),
        round((col("msb") - col("msw"))
          / (col("msb") + (col("n0") - 1) * col("msw")), 6).as("icc1"))
    },

    // ICC through Spark's SQL parser — same shared text.
    QDef("x_sql_icc", IccSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders", "customer")
      s.sql(IccSql)
    },

    // KZ FILTER: three iterated centered moving averages — the
    // low-pass filter with a provably sharper cutoff than one MA of
    // the same total width.
    QDef("x_kz_filter", KzSql) { (s, d) =>
      val k0 = daily(s, d, count(lit(1)).cast("double"))
      val wC = Window.orderBy("d").rowsBetween(-7, 7)
      def pass(df: org.apache.spark.sql.DataFrame) =
        df.select(col("d"), round(avg("y").over(wC), 6).as("y"))
      val k3 = pass(pass(pass(k0)))
      val v0 = k0.agg(round(avg("y"), 6).as("m"),
        count(lit(1)).cast("bigint").as("n"))
      val vr = k0.crossJoin(broadcast(v0))
        .agg(sum((col("y") - col("m")) * (col("y") - col("m")))
          .as("raw_ss"), max("n").as("n"))
      val vf = k3.crossJoin(broadcast(v0))
        .agg(sum((col("y") - col("m")) * (col("y") - col("m")))
          .as("f_ss"))
      val lastv = k3.orderBy(col("d").desc).limit(1)
        .select(col("y"))
      vr.crossJoin(broadcast(vf)).crossJoin(broadcast(lastv))
        .select(col("n").as("n_days"),
          round(col("f_ss") / col("raw_ss"), 6).as("variance_ratio"),
          round(col("y"), 6).as("last_filtered"))
    },

    // KZ through Spark's SQL parser — same shared text.
    QDef("x_sql_kz", KzSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(KzSql)
    })
}
