package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-52 batch: the matrix profile (motif + discord discovery), STL
  * strength-of-components, prospective power analysis, Holm step-down
  * FWER control, and in-database k-fold cross-validation.
  *
  * Scale posture: the matrix profile is the round's shape lesson — the
  * all-pairs z-normalized window distance usually written as an
  * O(n²·m) triple loop factors into (a) ONE daily collapse, (b) a
  * lag-keyed pair join of the calendar frame with itself (calendar² —
  * bounded at every sf, the x_sample_entropy posture), and (c) dot
  * products as 7-row windows PARTITIONED BY LAG — so every window in
  * the plan partitions and the whole profile scales out. k-fold CV is
  * the other pattern worth naming: per-fold train coefficients AND
  * per-fold test MSEs both close over ONE (fold × moment) collapse —
  * train moments are totals minus the fold's own, test MSE expands
  * algebraically over the same five sums, so 5-fold CV costs exactly
  * one corpus pass, not six. */
object R52Ops {

  /** Matrix profile (window m = 7, z-normalized Euclidean) of the
    * daily M$ revenue series as ONE portable text — oracle of
    * `x_matrix_profile` and whole query of the `x_sql_mp` twin.
    * dot(i, i+ℓ) for every pair is a 7-row running sum over the
    * product series PARTITIONED BY ℓ; distances close via per-window
    * (μ, σ) from one MA pass; the profile takes each window's nearest
    * non-trivial neighbor (|ℓ| ≥ 7, both directions via the
    * min-over-union). Released: the top-3 discord windows (largest
    * profile — the most anomalous weeks) and the best motif pair. */
  // The profile text in three fragments so the x_sql_mp twin can
  // materialize the multiply-referenced frames ONCE behind
  // localCheckpoint temp views (the x_sql_kcore from-birth rule): `ix`
  // is referenced 3× (μ/σ chain + both sides of the pair join) and
  // `dist` 3× (both profile sides + the motif scan) — Spark inlines
  // CTEs, so the unsplit text re-evaluates the whole pair-window chain
  // three times. The DuckDB oracle parses the composed full text.
  private[queries] val MpIxCtes =
    """cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  round(sum(o_totalprice) / 1.0e6, 6) AS y FROM orders
      |  GROUP BY 1),
      |ix AS (SELECT d, y,
      |  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
      |  CAST(count(*) OVER () AS BIGINT) AS n FROM cal)"""
      .stripMargin

  private[queries] val MpDistCtes =
    """ws AS (SELECT d, i, n,
      |  round(avg(y) OVER (ORDER BY i
      |    ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING), 9) AS mu,
      |  sum(y * y) OVER (ORDER BY i
      |    ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS qq,
      |  count(*) OVER (ORDER BY i
      |    ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS wn
      |  FROM ix),
      |win AS (SELECT d, i, n, mu,
      |  sqrt(qq / 7.0e0 - mu * mu) AS sd
      |  FROM ws WHERE wn = 7),
      |pr AS (SELECT /*+ BROADCAST(b) */ a.i AS i, b.i - a.i AS l,
      |  a.y * b.y AS p
      |  FROM ix a JOIN ix b ON b.i >= a.i + 7),
      |dots AS (SELECT i, l,
      |  sum(p) OVER (PARTITION BY l ORDER BY i
      |    ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS dot,
      |  count(*) OVER (PARTITION BY l ORDER BY i
      |    ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS wn
      |  FROM pr),
      |dist AS (SELECT wa.d AS da, wb.d AS db, wa.i AS ia, wb.i AS ib,
      |  sqrt(greatest(0.0e0, 14.0e0 * (1.0e0
      |    - (dots.dot / 7.0e0 - wa.mu * wb.mu)
      |      / (wa.sd * wb.sd)))) AS dd
      |  FROM dots
      |  JOIN win wa ON dots.i = wa.i
      |  JOIN win wb ON dots.i + dots.l = wb.i
      |  WHERE dots.wn = 7)""".stripMargin

  private[queries] val MpTailCtes =
    """sides AS (SELECT da AS d, dd FROM dist
      |  UNION ALL SELECT db AS d, dd FROM dist),
      |prof AS (SELECT d, round(min(dd), 6) AS nn_dist FROM sides
      |  GROUP BY 1),
      |disc AS (SELECT d, nn_dist,
      |  CAST(row_number() OVER (ORDER BY nn_dist DESC, d) AS BIGINT)
      |    AS rk
      |  FROM prof),
      |motif AS (SELECT da, db, round(dd, 6) AS dd FROM dist
      |  ORDER BY dd, da, db LIMIT 1)
      |SELECT disc.rk AS discord_rank, disc.d AS window_start,
      |  disc.nn_dist, motif.da AS motif_a, motif.db AS motif_b,
      |  motif.dd AS motif_dist
      |FROM disc, motif WHERE disc.rk <= 3 ORDER BY disc.rk"""
      .stripMargin

  private[queries] val MpSql =
    s"WITH $MpIxCtes,\n$MpDistCtes,\n$MpTailCtes"

  /** STL-style strength of trend and seasonality on daily order counts
    * as ONE portable text — oracle of `x_stl_strength` and whole query
    * of the `x_sql_stl` twin. Trend = centered 15-day MA (6 dp snap);
    * seasonal = day-of-week means of the detrended series (6 dp);
    * remainder closes the identity. F_trend = max(0, 1 −
    * Var(R)/Var(y−S)), F_seasonal = max(0, 1 − Var(R)/Var(y−T)) —
    * Hyndman's definitions, all variances from one pass over the
    * decomposed daily frame. Season keyed by calendar MONTH —
    * month() is engine-portable where weekday numbering and 2-arg
    * datediff are not (the PageSql lesson). */
  private[queries] val StlSql =
    """WITH cal AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |  CAST(count(*) AS DOUBLE) AS y FROM orders GROUP BY 1),
      |tr AS (SELECT cal.d, cal.y,
      |  CAST(month(cal.d) AS INT) AS mn,
      |  round(avg(cal.y) OVER (ORDER BY cal.d
      |    ROWS BETWEEN 7 PRECEDING AND 7 FOLLOWING), 6) AS t
      |  FROM cal),
      |se AS (SELECT mn, round(avg(y - t), 6) AS s FROM tr
      |  GROUP BY 1),
      |de AS (SELECT /*+ BROADCAST(se) */ tr.d, tr.y, tr.t, se.s,
      |  tr.y - tr.t - se.s AS r
      |  FROM tr JOIN se ON tr.mn = se.mn),
      |mo AS (SELECT
      |  CAST(count(*) AS DOUBLE) AS n,
      |  sum(r) AS sr, sum(r * r) AS srr,
      |  sum(y - s) AS sds, sum((y - s) * (y - s)) AS sds2,
      |  sum(y - t) AS sdt, sum((y - t) * (y - t)) AS sdt2
      |  FROM de),
      |vv AS (SELECT n,
      |  srr / n - (sr / n) * (sr / n) AS vr,
      |  sds2 / n - (sds / n) * (sds / n) AS vds,
      |  sdt2 / n - (sdt / n) * (sdt / n) AS vdt FROM mo)
      |SELECT CAST(n AS BIGINT) AS n_days,
      |  round(greatest(0.0e0, 1.0e0 - vr / vds), 6) AS f_trend,
      |  round(greatest(0.0e0, 1.0e0 - vr / vdt), 6) AS f_seasonal,
      |  round(vr, 6) AS var_remainder
      |FROM vv""".stripMargin

  /** Prospective power analysis for the R-vs-N quantity contrast as
    * ONE portable text — oracle of `x_power_ttest` and whole query
    * of the `x_sql_power` twin. Observed δ and pooled σ from exact
    * BIGINT sums; required n/arm for 80% power at α = 0.05 (z
    * constants as double literals), achieved power at the current
    * min(n_R, n_N) via the R45 Φ fragment. */
  private[queries] val PowerSql = {
    val za = "1.959963984540054e0" // Phi^-1(0.975)
    val zb = "0.8416212335729143e0" // Phi^-1(0.8)
    s"""WITH g AS (SELECT l_returnflag AS f,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
       |  CAST(sum(CAST(l_quantity AS BIGINT)
       |    * CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
       |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
       |w AS (SELECT
       |  max(CASE WHEN f = 'R' THEN n END) AS na,
       |  max(CASE WHEN f = 'R' THEN s END) AS sa,
       |  max(CASE WHEN f = 'R' THEN q END) AS qa,
       |  max(CASE WHEN f = 'N' THEN n END) AS nb,
       |  max(CASE WHEN f = 'N' THEN s END) AS sb,
       |  max(CASE WHEN f = 'N' THEN q END) AS qb
       |  FROM g),
       |e AS (SELECT na, nb,
       |  abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
       |    AS delta,
       |  sqrt((
       |    (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na)
       |    + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb))
       |    / (CAST(na AS DOUBLE) + nb - 2)) AS sd
       |  FROM w),
       |z AS (SELECT na, nb, delta, sd,
       |  2.0e0 * sd * sd * ($za + $zb) * ($za + $zb)
       |    / (delta * delta) AS n_req,
       |  delta / (sd * sqrt(2.0e0 / least(na, nb))) - $za AS zp
       |  FROM e)
       |SELECT na AS n_r, nb AS n_n, round(delta, 6) AS abs_diff,
       |  round(sd, 6) AS pooled_sd,
       |  CAST(ceil(n_req) AS BIGINT) AS n_required_per_arm,
       |  round(${R45Ops.normCdfSql("zp")}, 6) AS achieved_power
       |FROM z""".stripMargin
  }

  /** Holm step-down FWER control over the same 25 brand z-tests as
    * BH-FDR (the shared R45 prefix) as ONE portable text — oracle of
    * `x_holm` and whole query of the `x_sql_holm` twin. Reject ranks
    * below the FIRST k where p_(k) > α/(m−k+1); released beside the
    * per-rank adjusted threshold. */
  private[queries] val HolmSql =
    s"""WITH ${R45Ops.BrandPvalCtes},
       |r AS (SELECT b, n_b, zs, pv,
       |  CAST(row_number() OVER (ORDER BY pv, b) AS BIGINT) AS k,
       |  CAST(count(*) OVER () AS BIGINT) AS m FROM p),
       |kf AS (SELECT coalesce(min(CASE
       |    WHEN pv * (m - k + 1) > 0.05e0 THEN k END), max(m) + 1)
       |    AS kfail
       |  FROM r)
       |SELECT r.b AS brand, round(r.pv, 6) AS p_value, r.k AS p_rank,
       |  round(0.05e0 / (r.m - r.k + 1), 6) AS holm_threshold,
       |  CAST(CASE WHEN r.k < kf.kfail THEN 1 ELSE 0 END AS INT)
       |    AS rejected
       |FROM r, kf ORDER BY r.k""".stripMargin

  /** In-database 5-fold cross-validation of the OLS l_quantity ~
    * l_extendedprice as ONE portable text — oracle of `x_kfold_cv`
    * and whole query of the `x_sql_kfold` twin. Folds by
    * l_orderkey % 5; ONE (fold × moment) collapse carries everything:
    * train moments = totals − own fold (9 dp-snapped coefficients),
    * test MSE expands algebraically over the same five sums — 5-fold
    * CV in exactly one corpus pass. Moments accumulate as EXACT
    * integers (cents, BIGINT; squared-cents DECIMAL(38,0) — the
    * BreakSql pattern) and the train-minus-test differences happen in
    * integer space, so both engines derive every double from
    * identical integers and no summation-order or cancellation path
    * can diverge. */
  private[queries] val KfoldSql =
    """WITH li AS (SELECT l_orderkey % 5 AS f,
      |  CAST(round(l_extendedprice * 100.0e0, 0) AS BIGINT) AS xc,
      |  CAST(l_quantity AS BIGINT) AS yi
      |  FROM lineitem),
      |fm AS (SELECT f, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(xc) AS BIGINT) AS sxc,
      |  CAST(sum(yi) AS BIGINT) AS syi,
      |  CAST(sum(CAST(xc AS DECIMAL(19, 0)) * xc) AS DECIMAL(38, 0))
      |    AS sxxc,
      |  CAST(sum(xc * yi) AS BIGINT) AS sxyc,
      |  CAST(sum(yi * yi) AS BIGINT) AS syyi
      |  FROM li GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
      |  CAST(sum(sxc) AS BIGINT) AS txc,
      |  CAST(sum(syi) AS BIGINT) AS tyi,
      |  CAST(sum(sxxc) AS DECIMAL(38, 0)) AS txx,
      |  CAST(sum(sxyc) AS BIGINT) AS txy FROM fm),
      |tr AS (SELECT fm.f, fm.n AS nt,
      |  CAST(fm.sxc AS DOUBLE) / 1.0e5 AS tsx,
      |  CAST(fm.syi AS DOUBLE) AS tsy,
      |  CAST(fm.sxxc AS DOUBLE) / 1.0e10 AS tsxx,
      |  CAST(fm.sxyc AS DOUBLE) / 1.0e5 AS tsxy,
      |  CAST(fm.syyi AS DOUBLE) AS tsyy,
      |  CAST(tot.tn - fm.n AS DOUBLE) AS rn,
      |  CAST(tot.txc - fm.sxc AS DOUBLE) / 1.0e5 AS rsx,
      |  CAST(tot.tyi - fm.syi AS DOUBLE) AS rsy,
      |  CAST(tot.txx - fm.sxxc AS DOUBLE) / 1.0e10 AS rsxx,
      |  CAST(tot.txy - fm.sxyc AS DOUBLE) / 1.0e5 AS rsxy
      |  FROM fm, tot),
      |co AS (SELECT f, nt, tsx, tsy, tsxx, tsxy, tsyy,
      |  round((rn * rsxy - rsx * rsy)
      |    / (rn * rsxx - rsx * rsx), 9) AS b1,
      |  rsy / rn AS myt, rsx / rn AS mxt
      |  FROM tr),
      |ab AS (SELECT f, nt, tsx, tsy, tsxx, tsxy, tsyy, b1,
      |  round(myt - b1 * mxt, 9) AS b0
      |  FROM co),
      |mse AS (SELECT f, nt AS n_test, b0, b1,
      |  (tsyy + nt * b0 * b0 + b1 * b1 * tsxx
      |    - 2.0e0 * b0 * tsy - 2.0e0 * b1 * tsxy
      |    + 2.0e0 * b0 * b1 * tsx) / nt AS m
      |  FROM ab)
      |SELECT CAST(f AS INT) AS fold, n_test,
      |  round(b0, 6) AS intercept, round(b1, 9) AS slope,
      |  round(m, 6) AS test_mse
      |FROM mse ORDER BY fold""".stripMargin

  val defs: Seq[QDef] = Seq(

    // MATRIX PROFILE: motif + discord discovery — every dot product a
    // lag-partitioned window, nothing unbounded anywhere.
    QDef("x_matrix_profile", MpSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(round(sum("o_totalprice") / 1.0e6, 6).as("y"))
      // ix feeds the μ/σ chain AND both sides of the pair join —
      // materialize the ≤2400-row calendar frame once.
      val ix = cal.select(col("d"), col("y"),
        row_number().over(Window.orderBy("d")).cast("bigint").as("i"),
        count(lit(1)).over(Window.partitionBy()).cast("bigint")
          .as("n"))
        .localCheckpoint()
      val w7 = Window.orderBy("i").rowsBetween(0, 6)
      val win = ix.select(col("d"), col("i"), col("n"),
          round(avg("y").over(w7), 9).as("mu"),
          sum(col("y") * col("y")).over(w7).as("qq"),
          count(lit(1)).over(w7).as("wn"))
        .filter(col("wn") === 7)
        .select(col("d"), col("i"), col("mu"),
          sqrt(col("qq") / 7.0 - col("mu") * col("mu")).as("sd"))
      val a = ix.select(col("i").as("ia"), col("y").as("ya"))
      val b = ix.select(col("i").as("ib"), col("y").as("yb"))
      val pr = a.join(broadcast(b), col("ib") >= col("ia") + 7)
        .select(col("ia").as("i"), (col("ib") - col("ia")).as("l"),
          (col("ya") * col("yb")).as("p"))
      val wl = Window.partitionBy("l").orderBy("i").rowsBetween(0, 6)
      val dots = pr.select(col("i"), col("l"),
          sum("p").over(wl).as("dot"),
          count(lit(1)).over(wl).as("wn"))
        .filter(col("wn") === 7)
      val wa = win.select(col("d").as("da"), col("i").as("wi"),
        col("mu").as("mua"), col("sd").as("sda"))
      val wb = win.select(col("d").as("db"), col("i").as("wj"),
        col("mu").as("mub"), col("sd").as("sdb"))
      // dist feeds both profile sides and the motif scan — without a
      // barrier the whole pair-window chain evaluates three times.
      val dist = dots
        .join(wa, col("i") === col("wi"))
        .join(wb, col("i") + col("l") === col("wj"))
        .select(col("da"), col("db"),
          sqrt(greatest(lit(0.0), lit(14.0) * (lit(1.0)
            - (col("dot") / 7.0 - col("mua") * col("mub"))
              / (col("sda") * col("sdb"))))).as("dd"))
        .localCheckpoint()
      val both = dist.select(col("da").as("d"), col("dd"))
        .union(dist.select(col("db").as("d"), col("dd")))
      val prof = both.groupBy("d").agg(round(min("dd"), 6)
        .as("nn_dist"))
      val disc = prof.select(col("d"), col("nn_dist"),
          row_number().over(Window.orderBy(col("nn_dist").desc,
            col("d"))).cast("bigint").as("rk"))
        .filter(col("rk") <= 3)
      val motif = dist
        .orderBy(round(col("dd"), 6), col("da"), col("db")).limit(1)
        .select(col("da").as("motif_a"), col("db").as("motif_b"),
          round(col("dd"), 6).as("motif_dist"))
      disc.crossJoin(broadcast(motif))
        .select(col("rk").as("discord_rank"),
          col("d").as("window_start"), col("nn_dist"),
          col("motif_a"), col("motif_b"), col("motif_dist"))
        .orderBy("discord_rank")
    },

    // Matrix profile through Spark's SQL parser — same shared
    // fragments, with the multiply-referenced `ix` and `dist` frames
    // materialized ONCE behind localCheckpoint views (the x_sql_kcore
    // from-birth rule) instead of letting CTE inlining re-evaluate the
    // pair-window chain three times.
    QDef("x_sql_mp", MpSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(s"WITH $MpIxCtes SELECT d, y, i, n FROM ix")
        .transform(SqlSurface.materialized("ix"))
      s.sql(s"WITH $MpDistCtes SELECT da, db, ia, ib, dd FROM dist")
        .transform(SqlSurface.materialized("dist"))
      s.sql(s"WITH $MpTailCtes")
    },

    // STL STRENGTH: how much of the series is trend vs weekly season
    // vs noise — Hyndman's F-statistics from one decomposition pass.
    // Dataset side: same decomposition in Column algebra — centered MA
    // window over the calendar frame, month-keyed season means
    // broadcast back, one moment pass over the decomposed frame.
    QDef("x_stl_strength", StlSql) { (s, d) =>
      val cal = Tables(s, d).orders
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(count(lit(1)).cast("double").as("y"))
      val w15 = Window.orderBy("d").rowsBetween(-7, 7)
      val tr = cal.select(col("d"), col("y"),
        month(col("d")).cast("int").as("mn"),
        round(avg("y").over(w15), 6).as("t"))
      val se = tr.groupBy("mn")
        .agg(round(avg(col("y") - col("t")), 6).as("s"))
      val de = tr.join(broadcast(se), "mn")
        .select(col("y"), col("t"), col("s"),
          (col("y") - col("t") - col("s")).as("r"))
      val mo = de.agg(count(lit(1)).cast("double").as("n"),
        sum("r").as("sr"), sum(col("r") * col("r")).as("srr"),
        sum(col("y") - col("s")).as("sds"),
        sum((col("y") - col("s")) * (col("y") - col("s"))).as("sds2"),
        sum(col("y") - col("t")).as("sdt"),
        sum((col("y") - col("t")) * (col("y") - col("t"))).as("sdt2"))
      val vv = mo.select(col("n"),
        (col("srr") / col("n")
          - (col("sr") / col("n")) * (col("sr") / col("n"))).as("vr"),
        (col("sds2") / col("n")
          - (col("sds") / col("n")) * (col("sds") / col("n"))).as("vds"),
        (col("sdt2") / col("n")
          - (col("sdt") / col("n")) * (col("sdt") / col("n"))).as("vdt"))
      vv.select(col("n").cast("bigint").as("n_days"),
        round(greatest(lit(0.0), lit(1.0) - col("vr") / col("vds")), 6)
          .as("f_trend"),
        round(greatest(lit(0.0), lit(1.0) - col("vr") / col("vdt")), 6)
          .as("f_seasonal"),
        round(col("vr"), 6).as("var_remainder"))
    },

    // STL through Spark's SQL parser — same shared text; the spec also
    // recomputes the decomposition brute force from the collected
    // daily series.
    QDef("x_sql_stl", StlSql) { (s, d) =>
      SqlSurface.viewed(s, d, "orders")
      s.sql(StlSql)
    },

    // POWER ANALYSIS: the experiment-design companion to the TOST /
    // t-test family — required n and achieved power, closed form.
    // Dataset side: one exact-BIGINT collapse of the two arms, pivot
    // to one row, closed-form algebra; Φ via the shared erfc fragment
    // applied with expr() on the identically-named zp column.
    QDef("x_power_ttest", PowerSql) { (s, d) =>
      val za = lit(1.959963984540054)
      val zb = lit(0.8416212335729143)
      val g = Tables(s, d).lineitem
        .filter(col("l_returnflag").isin("R", "N"))
        .groupBy(col("l_returnflag").as("f"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("bigint")).as("s"),
          sum(col("l_quantity").cast("bigint")
            * col("l_quantity").cast("bigint")).as("q"))
      val w = g.agg(
        max(when(col("f") === "R", col("n"))).as("na"),
        max(when(col("f") === "R", col("s"))).as("sa"),
        max(when(col("f") === "R", col("q"))).as("qa"),
        max(when(col("f") === "N", col("n"))).as("nb"),
        max(when(col("f") === "N", col("s"))).as("sb"),
        max(when(col("f") === "N", col("q"))).as("qb"))
      val e = w.select(col("na"), col("nb"),
        abs(col("sa").cast("double") / col("na")
          - col("sb").cast("double") / col("nb")).as("delta"),
        sqrt(((col("qa").cast("double")
            - col("sa").cast("double") * col("sa") / col("na"))
          + (col("qb").cast("double")
            - col("sb").cast("double") * col("sb") / col("nb")))
          / (col("na").cast("double") + col("nb") - 2)).as("sd"))
      val z = e.select(col("na"), col("nb"), col("delta"), col("sd"),
        (lit(2.0) * col("sd") * col("sd") * (za + zb) * (za + zb)
          / (col("delta") * col("delta"))).as("n_req"),
        (col("delta")
          / (col("sd") * sqrt(lit(2.0) / least(col("na"), col("nb"))))
          - za).as("zp"))
      z.select(col("na").as("n_r"), col("nb").as("n_n"),
        round(col("delta"), 6).as("abs_diff"),
        round(col("sd"), 6).as("pooled_sd"),
        ceil(col("n_req")).cast("bigint").as("n_required_per_arm"),
        round(expr(R45Ops.normCdfSql("zp")), 6).as("achieved_power"))
    },

    // Power through Spark's SQL parser — same shared text.
    QDef("x_sql_power", PowerSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(PowerSql)
    },

    // HOLM: step-down FWER control on the shared brand z-test family —
    // the strict complement of x_fdr_bh's step-up FDR. Dataset side:
    // the same 25-test p-value frame as x_fdr_bh (shared
    // R45Ops.brandPvalDf), step-DOWN selection on the bounded frame.
    QDef("x_holm", HolmSql) { (s, d) =>
      val p = R45Ops.brandPvalDf(s, d)
      val r = p.select(col("b"), col("n_b"), col("zs"), col("pv"),
        row_number().over(Window.orderBy("pv", "b")).cast("bigint")
          .as("k"),
        count(lit(1)).over(Window.partitionBy()).cast("bigint")
          .as("m"))
      val kf = r.agg(coalesce(
        min(when(col("pv") * (col("m") - col("k") + 1) > 0.05,
          col("k"))),
        max(col("m")) + 1).as("kfail"))
      r.crossJoin(broadcast(kf))
        .select(col("b").as("brand"),
          round(col("pv"), 6).as("p_value"), col("k").as("p_rank"),
          round(lit(0.05) / (col("m") - col("k") + 1), 6)
            .as("holm_threshold"),
          when(col("k") < col("kfail"), 1).otherwise(0).cast("int")
            .as("rejected"))
        .orderBy("p_rank")
    },

    // Holm through Spark's SQL parser — same shared text.
    QDef("x_sql_holm", HolmSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem", "part")
      s.sql(HolmSql)
    },

    // K-FOLD CV: five train/test regressions from one corpus pass —
    // train moments by subtraction, test MSE by algebra.
    QDef("x_kfold_cv", KfoldSql) { (s, d) =>
      val xc = round(col("l_extendedprice") * lit(100.0), 0)
        .cast("bigint")
      val yi = col("l_quantity").cast("bigint")
      val li = Tables(s, d).lineitem.select(
        (col("l_orderkey") % 5).as("f"), xc.as("xc"), yi.as("yi"))
      val fm = li.groupBy("f")
        .agg(count(lit(1)).as("n"),
          sum("xc").as("sxc"), sum("yi").as("syi"),
          sum(col("xc").cast("decimal(19,0)") * col("xc"))
            .cast("decimal(38,0)").as("sxxc"),
          sum(col("xc") * col("yi")).as("sxyc"),
          sum(col("yi") * col("yi")).as("syyi"))
      val tot = fm.agg(sum("n").as("tn"), sum("sxc").as("txc"),
        sum("syi").as("tyi"),
        sum("sxxc").cast("decimal(38,0)").as("txx"),
        sum("sxyc").as("txy"))
      val tr = fm.crossJoin(broadcast(tot))
        .select(col("f"), col("n").as("nt"),
          (col("sxc").cast("double") / 1.0e5).as("tsx"),
          col("syi").cast("double").as("tsy"),
          (col("sxxc").cast("double") / 1.0e10).as("tsxx"),
          (col("sxyc").cast("double") / 1.0e5).as("tsxy"),
          col("syyi").cast("double").as("tsyy"),
          (col("tn") - col("n")).cast("double").as("rn"),
          ((col("txc") - col("sxc")).cast("double") / 1.0e5).as("rsx"),
          (col("tyi") - col("syi")).cast("double").as("rsy"),
          ((col("txx") - col("sxxc")).cast("double") / 1.0e10)
            .as("rsxx"),
          ((col("txy") - col("sxyc")).cast("double") / 1.0e5)
            .as("rsxy"))
      val co = tr.select(col("f"), col("nt"), col("tsx"), col("tsy"),
        col("tsxx"), col("tsxy"), col("tsyy"),
        round((col("rn") * col("rsxy") - col("rsx") * col("rsy"))
          / (col("rn") * col("rsxx") - col("rsx") * col("rsx")), 9)
          .as("b1"),
        (col("rsy") / col("rn")).as("myt"),
        (col("rsx") / col("rn")).as("mxt"))
      val ab = co.select(col("f"), col("nt"), col("tsx"), col("tsy"),
        col("tsxx"), col("tsxy"), col("tsyy"), col("b1"),
        round(col("myt") - col("b1") * col("mxt"), 9).as("b0"))
      ab.select(col("f").cast("int").as("fold"),
          col("nt").as("n_test"),
          round(col("b0"), 6).as("intercept"),
          round(col("b1"), 9).as("slope"),
          round((col("tsyy") + col("nt") * col("b0") * col("b0")
            + col("b1") * col("b1") * col("tsxx")
            - lit(2.0) * col("b0") * col("tsy")
            - lit(2.0) * col("b1") * col("tsxy")
            + lit(2.0) * col("b0") * col("b1") * col("tsx"))
            / col("nt"), 6).as("test_mse"))
        .orderBy("fold")
    },

    // K-fold through Spark's SQL parser — same shared text.
    QDef("x_sql_kfold", KfoldSql) { (s, d) =>
      SqlSurface.viewed(s, d, "lineitem")
      s.sql(KfoldSql)
    })
}
