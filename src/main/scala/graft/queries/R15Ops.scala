package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 batch: distribution distances and robust time-series
  * diagnostics — 1-D Wasserstein (earth mover's) distance and
  * Jensen-Shannon divergence for drift measurement, the Hurst exponent
  * (long-range dependence), the Theil-Sen robust trend, and Page-Hinkley
  * drift detection. Same posture as R12-R14: distribution work rides
  * distinct-value/bin histograms (two-level prefix sums, never a corpus
  * sort), series work rides the calendar-bounded daily frame, and every
  * released double is snapped at a declared precision on both engines.
  */
object R15Ops {

  /** Jensen-Shannon divergence as ONE portable SQL text — oracle of
    * `x_js_divergence` and whole query of the `x_sql_js` twin. */
  private[queries] val JsSql =
    """WITH oc AS (
      |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |bins AS (SELECT CAST(floor(v / 1000) AS BIGINT) AS b,
      |  CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS ca,
      |  CAST(sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS cb
      |  FROM oc GROUP BY 1),
      |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |  CAST(sum(cb) AS BIGINT) AS nb,
      |  CAST(count(*) AS BIGINT) AS n_bins FROM bins),
      |terms AS (SELECT tot.n_bins,
      |  CASE WHEN ca > 0 THEN (ca / CAST(na AS DOUBLE))
      |    * ln(2 * (ca / CAST(na AS DOUBLE))
      |        / (ca / CAST(na AS DOUBLE) + cb / CAST(nb AS DOUBLE)))
      |    ELSE 0 END AS tp,
      |  CASE WHEN cb > 0 THEN (cb / CAST(nb AS DOUBLE))
      |    * ln(2 * (cb / CAST(nb AS DOUBLE))
      |        / (ca / CAST(na AS DOUBLE) + cb / CAST(nb AS DOUBLE)))
      |    ELSE 0 END AS tq
      |  FROM bins, tot)
      |SELECT max(n_bins) AS n_bins,
      |  round(0.5e0 * sum(tp) + 0.5e0 * sum(tq), 6) AS jsd,
      |  round(sqrt(greatest(0.5e0 * sum(tp) + 0.5e0 * sum(tq), 0)), 6)
      |    AS jsd_distance
      |FROM terms""".stripMargin

  val defs: Seq[QDef] = Seq(

    // 1-D WASSERSTEIN (earth mover's) DISTANCE between the BUILDING and
    // MACHINERY order-price distributions: W₁ = Σ|F_A(v)−F_B(v)|·Δv over
    // the merged distinct-value support — the integral form, EXACT, with
    // CDFs from the two-level binned prefix sums (the BinnedRank shape
    // inlined for two measures at once) and the next-value step from a
    // within-bin lead stitched across bins by the bounded bin frame.
    // The corpus contributes one distinct-value histogram; nothing
    // sf-proportional crosses an unpartitioned boundary.
    QDef("x_wasserstein",
      """WITH oc AS (
        |  SELECT c.c_mktsegment AS g, o.o_totalprice AS v
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |hist AS (SELECT v,
        |  CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS ca,
        |  CAST(sum(CASE WHEN g = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS cb
        |  FROM oc GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |  CAST(sum(cb) AS BIGINT) AS nb FROM hist),
        |cdf AS (SELECT v,
        |  CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
        |  CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb,
        |  lead(v) OVER (ORDER BY v) AS vnext
        |  FROM hist)
        |SELECT tot.na AS n_a, tot.nb AS n_b,
        |  round(sum(abs(cuma / CAST(tot.na AS DOUBLE)
        |      - cumb / CAST(tot.nb AS DOUBLE))
        |    * coalesce(vnext - v, 0)), 4) AS w1
        |FROM cdf, tot GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val hist = oc.groupBy("v").agg(
          sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("ca"),
          sum(when(col("g") === "MACHINERY", 1L).otherwise(0L)).as("cb"))
        .withColumn("bin", floor(col("v") / lit(1000)).cast("bigint"))
      val tot = hist.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      // bounded bin frame: prefix counts per measure + next bin's first
      // value (the only unpartitioned windows — price-domain ≤500 rows)
      val wBinPrefix = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
      val binF = hist.groupBy("bin")
        .agg(sum(col("ca")).as("bca"), sum(col("cb")).as("bcb"),
          min(col("v")).as("bmin"))
        .withColumn("belowBinA",
          coalesce(sum(col("bca")).over(wBinPrefix), lit(0L)))
        .withColumn("belowBinB",
          coalesce(sum(col("bcb")).over(wBinPrefix), lit(0L)))
        .withColumn("nextFirst", lead(col("bmin"), 1).over(Window.orderBy("bin")))
        .select("bin", "belowBinA", "belowBinB", "nextFirst")
      // within-bin: inclusive prefix + lead, hash-partitioned by bin
      val wWithin = Window.partitionBy("bin").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wLead = Window.partitionBy("bin").orderBy("v")
      val cdf = hist
        .withColumn("ia", sum(col("ca")).over(wWithin))
        .withColumn("ib", sum(col("cb")).over(wWithin))
        .withColumn("vnextWithin", lead(col("v"), 1).over(wLead))
        .join(binF, "bin")
        .crossJoin(broadcast(tot))
        .select(col("v"),
          ((col("belowBinA") + col("ia")) / col("na").cast("double")).as("fa"),
          ((col("belowBinB") + col("ib")) / col("nb").cast("double")).as("fb"),
          coalesce(col("vnextWithin"), col("nextFirst")).as("vnext"),
          col("na"), col("nb"))
      cdf.groupBy("na", "nb")
        .agg(round(sum(abs(col("fa") - col("fb"))
          * coalesce(col("vnext") - col("v"), lit(0))), 4).as("w1"))
        .select(col("na").as("n_a"), col("nb").as("n_b"), col("w1"))
    },

    // JENSEN-SHANNON DIVERGENCE between the same two spend distributions
    // over the price-domain bins — the symmetric, bounded complement of
    // x_drift_psi / x_ks_test for distribution-drift monitoring. One
    // binned contingency aggregate; probabilities are exact integer
    // ratios so both engines evaluate identical doubles; zero-mass bins
    // contribute 0 by the p·ln(p) convention.
    QDef("x_js_divergence", R15Ops.JsSql) { (s, d) =>
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      val bins = oc.groupBy(floor(col("v") / lit(1000)).cast("bigint").as("b"))
        .agg(sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("ca"),
          sum(when(col("g") === "MACHINERY", 1L).otherwise(0L)).as("cb"))
      val tot = bins.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        count(lit(1)).as("n_bins"))
      val p = col("ca") / col("na").cast("double")
      val q = col("cb") / col("nb").cast("double")
      val terms = bins.crossJoin(broadcast(tot)).select(col("n_bins"),
        when(col("ca") > 0, p * log(lit(2) * p / (p + q)))
          .otherwise(lit(0.0)).as("tp"),
        when(col("cb") > 0, q * log(lit(2) * q / (p + q)))
          .otherwise(lit(0.0)).as("tq"))
      terms.agg(max(col("n_bins")).as("n_bins"),
        round(lit(0.5) * sum(col("tp")) + lit(0.5) * sum(col("tq")), 6)
          .as("jsd"),
        round(sqrt(greatest(
          lit(0.5) * sum(col("tp")) + lit(0.5) * sum(col("tq")), lit(0))), 6)
          .as("jsd_distance"))
    },

    // HURST EXPONENT of the daily event-count series by rescaled-range
    // (R/S) analysis at block lengths 4/6/8/10/15 days (the driver calendar spans 30 days at every sf; lengths divide into >=2 complete blocks): per-block
    // mean-centered cumulative range over standard deviation, averaged
    // per block length, log-log slope = H. Every window partitions by
    // (block length, block) — partitions are ≤15 rows by construction (≤ block length at any span) —
    // and the fit runs on a 5-row frame. Block means and the released
    // averages snap at 6 dp so both engines aggregate identical doubles.
    QDef("x_hurst",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(dd) AS start FROM daily),
        |idx AS (SELECT datediff('day', d0.start, dd) AS i, c
        |  FROM daily, d0),
        |ms AS (SELECT unnest([4, 6, 8, 10, 15]) AS m),
        |blk AS (SELECT ms.m, CAST(floor(i / ms.m) AS BIGINT) AS b, i, c
        |  FROM idx CROSS JOIN ms),
        |bm AS (SELECT m, b, round(avg(c), 6) AS mu
        |  FROM blk GROUP BY 1, 2 HAVING count(*) = m),
        |z AS (SELECT blk.m, blk.b, blk.i, blk.c - bm.mu AS z
        |  FROM blk JOIN bm ON blk.m = bm.m AND blk.b = bm.b),
        |y AS (SELECT m, b, z,
        |  sum(z) OVER (PARTITION BY m, b ORDER BY i) AS y FROM z),
        |rs AS (SELECT m, b, max(y) - min(y) AS r,
        |  sqrt(round(avg(z * z), 6)) AS s1 FROM y GROUP BY 1, 2),
        |ars AS (SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
        |  round(avg(r / s1), 6) AS avg_rs
        |  FROM rs WHERE s1 > 0 GROUP BY 1),
        |h AS (SELECT round(regr_slope(ln(avg_rs), ln(m)), 4) AS hurst
        |  FROM ars)
        |SELECT m AS block_len, n_blocks, avg_rs, h.hurst
        |FROM ars, h""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(count(lit(1)).cast("double").as("c"))
      val d0 = daily.agg(min(col("dd")).as("start"))
      val idx = daily.crossJoin(broadcast(d0))
        .select(datediff(col("dd"), col("start")).as("i"), col("c"))
      val blk = idx
        .select(col("i"), col("c"),
          explode(array(Seq(4, 6, 8, 10, 15).map(lit(_)): _*)).as("m"))
        .withColumn("b", floor(col("i") / col("m")).cast("bigint"))
      val bm = blk.groupBy("m", "b")
        .agg(round(avg(col("c")), 6).as("mu"), count(lit(1)).as("cnt"))
        .filter(col("cnt") === col("m")).drop("cnt")
      val z = blk.join(bm, Seq("m", "b"))
        .select(col("m"), col("b"), col("i"), (col("c") - col("mu")).as("z"))
      val wy = Window.partitionBy("m", "b").orderBy("i")
      val y = z.withColumn("y", sum(col("z")).over(wy))
      val rs = y.groupBy("m", "b").agg(
        (max(col("y")) - min(col("y"))).as("r"),
        sqrt(round(avg(col("z") * col("z")), 6)).as("s1"))
      val ars = rs.filter(col("s1") > 0).groupBy("m")
        .agg(count(lit(1)).as("n_blocks"),
          round(avg(col("r") / col("s1")), 6).as("avg_rs"))
      val h = ars.agg(
        round(regr_slope(log(col("avg_rs")), log(col("m"))), 4).as("hurst"))
      ars.crossJoin(broadcast(h))
        .select(col("m").as("block_len"), col("n_blocks"), col("avg_rs"),
          col("hurst"))
    },

    // THEIL-SEN ROBUST TREND of the daily mean event value: the median
    // of all pairwise slopes, with the median residual as intercept —
    // the outlier-proof alternative to x_regr_by_group's OLS. The pair
    // enumeration is a broadcast nested-loop over the CALENDAR frame
    // (days² pairs — bounded at any sf; the corpus contributes one daily
    // aggregate), and the medians interpolate identically in both
    // engines (percentile ≡ quantile_cont).
    QDef("x_theilsen_trend",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, round(avg(value), 6) AS v
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(dd) AS start FROM daily),
        |idx AS (SELECT datediff('day', d0.start, dd) AS i, v
        |  FROM daily, d0),
        |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM idx),
        |sl AS (SELECT median((b.v - a.v) / (b.i - a.i)) AS slope
        |  FROM idx a JOIN idx b ON b.i > a.i),
        |res AS (SELECT median(v - sl.slope * i) AS icept FROM idx, sl)
        |SELECT cnt.n_days, round(sl.slope, 6) AS slope,
        |  round(res.icept, 4) AS intercept
        |FROM cnt, sl, res""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(round(avg(col("value")), 6).as("v"))
      val d0 = daily.agg(min(col("dd")).as("start"))
      val idx = daily.crossJoin(broadcast(d0))
        .select(datediff(col("dd"), col("start")).as("i"), col("v"))
      val cnt = idx.agg(count(lit(1)).as("n_days"))
      val a = idx.select(col("i").as("ia"), col("v").as("va"))
      val b = idx.select(col("i").as("ib"), col("v").as("vb"))
      val sl = a.join(broadcast(b), col("ib") > col("ia"))
        .select(((col("vb") - col("va")) / (col("ib") - col("ia"))).as("s"))
        .agg(expr("percentile(s, 0.5)").as("slope"))
      val res = idx.crossJoin(broadcast(sl))
        .select((col("v") - col("slope") * col("i")).as("r"))
        .agg(expr("percentile(r, 0.5)").as("icept"))
      cnt.crossJoin(broadcast(sl)).crossJoin(broadcast(res))
        .select(col("n_days"), round(col("slope"), 6).as("slope"),
          round(col("icept"), 4).as("intercept"))
    },

    // PAGE-HINKLEY DRIFT DETECTOR on the daily mean event value — the
    // sequential complement of x_cusum_drift/x_changepoint: cumulative
    // deviation from the RUNNING mean (δ=0.1 tolerance), alarm when the
    // excursion over its running minimum exceeds λ = 10·σ. All windows
    // order the calendar-bounded daily frame; prefix sums accumulate in
    // date order so both engines see bit-identical series.
    QDef("x_page_hinkley",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dd, round(avg(value), 6) AS x
        |  FROM events GROUP BY 1),
        |stats AS (SELECT round(stddev_samp(x), 6) AS sd FROM daily),
        |w AS (SELECT dd, x,
        |  sum(x) OVER (ORDER BY dd) AS sx,
        |  row_number() OVER (ORDER BY dd) AS rn
        |  FROM daily),
        |t AS (SELECT dd, x - sx / rn - 0.1e0 AS term FROM w),
        |m AS (SELECT dd, sum(term) OVER (ORDER BY dd) AS mt FROM t),
        |ph AS (SELECT dd,
        |  mt - min(mt) OVER (ORDER BY dd) AS ph FROM m)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  round(max(ph), 4) AS max_ph,
        |  CAST(sum(CASE WHEN ph > 10 * stats.sd THEN 1 ELSE 0 END)
        |    AS BIGINT) AS alarm_days,
        |  min(CASE WHEN ph > 10 * stats.sd THEN dd END) AS first_alarm
        |FROM ph, stats""".stripMargin) { (s, d) =>
      val daily = Tables(s, d).events
        .groupBy(to_date(col("ts")).as("dd"))
        .agg(round(avg(col("value")), 6).as("x"))
      val stats = daily.agg(round(stddev_samp(col("x")), 6).as("sd"))
      val wPrefix = Window.orderBy("dd")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = daily
        .withColumn("sx", sum(col("x")).over(wPrefix))
        .withColumn("rn", row_number().over(Window.orderBy("dd")))
      val t = w.select(col("dd"),
        (col("x") - col("sx") / col("rn") - lit(0.1)).as("term"))
      val m = t.withColumn("mt", sum(col("term")).over(wPrefix))
      val ph = m.withColumn("ph", col("mt") - min(col("mt")).over(wPrefix))
      ph.crossJoin(broadcast(stats)).agg(
        count(lit(1)).as("n_days"),
        round(max(col("ph")), 4).as("max_ph"),
        sum(when(col("ph") > lit(10) * col("sd"), 1L).otherwise(0L))
          .as("alarm_days"),
        min(when(col("ph") > lit(10) * col("sd"), col("dd")))
          .as("first_alarm"))
    }
  )
}
