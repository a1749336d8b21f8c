package graft

/** Plan-level invariants enforced across EVERY registered query — the
  * mechanized form of the PLANS_r0N.md audits. Catches the two plan
  * shapes that silently kill a 100 TB run long before any bench notices:
  *
  *  - `CartesianProduct`: a non-broadcast cross join means BOTH sides were
  *    too big to broadcast — O(|L|·|R|) over real data. (1-row stats glue
  *    plans as BroadcastNestedLoopJoin and stays allowed.)
  *  - `Exchange SinglePartition` under a non-aggregate consumer: the input
  *    funnels through one task. Global scalar aggregates plan a
  *    partial/final pair whose final exchange carries one row per task —
  *    fine, allowed. Everything else (global sorts/windows) must name the
  *    BOUNDED frame it orders in [[boundedFrame]] — and the round-7 lesson
  *    is that a carve-out comment can be wrong (x_quantile_norm called a
  *    distinct-continuous-value frame "value-domain-bounded" when it was
  *    ≈ row-count-sized), so every carve-out is also validated
  *    DYNAMICALLY: the query runs at sf0.01 and sf0.1 and the records
  *    actually written into its SinglePartition shuffles must not grow
  *    with the data (10× rows → ≤3× records, or stay under 2000 rows).
  *    Bin/calendar/log-histogram frames are flat under that probe;
  *    sf-proportional funnels show ≈10× and fail.
  *
  * Static plans are built at sf0.001 (construction only); the dynamic
  * probe executes only the carved-out names.
  */
class PlanInvariantsSpec extends SparkSpec {

  private val sfStatic = "/root/testdata/sf0.001"
  private val sfMid = "/root/testdata/sf0.01"
  private val sfBig = "/root/testdata/sf0.1"

  /** Complete inventory of intentional non-aggregate SinglePartition
    * exchanges: name → the bounded frame its global sort/window orders.
    * Opt-out, not opt-in: any OTHER registered query that plans one fails
    * the static test; any entry here whose plan no longer needs it fails
    * as stale; and every entry must hold up under the dynamic growth
    * probe. */
  private val boundedFrame: Map[String, String] = Map(
    "x_acf" -> "daily-series lag frame — calendar-bounded",
    "x_sql_acf" -> "daily-series lag frame — calendar-bounded (SQL twin)",
    "x_budget_select" ->
      "floor(score*1000) quality-bin histogram — score-domain <=1001 bins",
    "x_sql_budget" -> "same quality-bin histogram (SQL twin)",
    "x_pipeline_pretrain" ->
      "final budgetSelect stage: the same quality-bin histogram window",
    "x_changepoint" -> "daily prefix-sum frame — calendar-bounded",
    "x_sql_changepoint" -> "daily prefix-sum frame (SQL twin)",
    "x_cusum_drift" -> "daily mean series — calendar-bounded",
    "x_sql_cusum" -> "daily mean series (SQL twin)",
    "x_funnel_timing" ->
      "view->purchase whole-minutes histogram — horizon-bounded",
    "x_isotonic" -> "floor(price/1000) bin frame — price-domain <=500 bins",
    "x_sql_isotonic" -> "same price-bin frame (SQL twin)",
    "x_ntile_deciles" ->
      "floor(spend/5000) bin frame — spend-domain-bounded (BinnedRank)",
    "x_quantile_norm" ->
      "price-bin frames + dense 1001-row rank-bin carry table",
    "x_rolling_corr" -> "daily two-series frame — calendar-bounded",
    "x_sql_rolling" -> "daily two-series frame (SQL twin)",
    "x_skyline" ->
      "KB local-survivor union — SkylineSpec pins the bucket-local feed",
    "x_survival_km" -> "duration-hours at-risk histogram — horizon-bounded",
    "x_text_zipf" -> "floor(log2(count)) bin frame — ~40 log bins",
    "x_ks_test" -> "floor(price/1000) bin frame — binned two-sample CDFs",
    "x_sql_ks" -> "same price-bin frame (SQL twin)",
    "x_mannwhitney" ->
      "floor(price/1000) bin frame — binned joint rank histogram (BinnedRank)",
    "x_sql_mannwhitney" -> "same price-bin frame (SQL twin)",
    "x_spearman_corr" ->
      "price/1000 + acctbal/100 bin frames — two BinnedRank passes",
    "x_decision_stump" ->
      "floor(price/1000) bin frame — binned split-candidate CDF",
    "x_pacf" -> "daily-series lag frame — calendar-bounded (ACF input)",
    "x_auc_rank" ->
      "floor(price/1000) bin frame — binned score-rank histogram (BinnedRank)",
    "x_kruskal_wallis" ->
      "floor(price/1000) bin frame — binned joint rank histogram (BinnedRank)",
    "x_logrank" ->
      "duration-hours at-risk histogram — horizon-bounded (KM frame)",
    "x_wasserstein" ->
      "floor(price/1000) bin frame — binned two-sample CDF + next-value stitch",
    "x_page_hinkley" ->
      "daily mean series — calendar-bounded (CUSUM family)",
    "x_lift_gain" ->
      "negated floor(price/1000) bin frame — ntile closed form (BinnedRank)",
    "x_rfm_segments" ->
      ("recency-days + frequency + floor(spend/5000) bin frames — three " +
        "quintile closed forms (BinnedRank)"),
    "x_runs_test" ->
      "daily sign series — calendar-bounded (lag over the daily frame)",
    "x_pettitt" ->
      "daily value histogram + rank prefix — calendar-bounded frames",
    "x_lorenz_deciles" ->
      "floor(spend/5000) bin frame — ntile closed form (BinnedRank)",
    "x_durbin_watson" ->
      "daily residual series — calendar-bounded (lag over the daily frame)",
    "x_abc_analysis" ->
      "negated floor(spend/5000) bin frame — cents prefix sums (BinnedRank)",
    "x_sql_kruskal" ->
      "same price-bin frame as x_kruskal_wallis (SQL twin)")

  private def staticSuspect(planStr: String): Boolean = {
    val lines = planStr.linesIterator.toVector
    lines.zipWithIndex.exists { case (l, i) =>
      l.contains("Exchange SinglePartition") && {
        // tolerated only as the final leg of a 1-row global aggregate: the
        // operator directly consuming it must be an aggregate
        // (HashAggregate also matches ObjectHashAggregate — substring)
        val above = lines.take(i).reverse.find(_.trim.nonEmpty)
        !above.exists(a =>
          a.contains("HashAggregate") || a.contains("SortAggregate"))
      }
    }
  }

  test("no CartesianProduct in any registered query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sfStatic).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"CONSTRUCTION FAILED: ${e.getMessage}" }
        if (plan.contains("CartesianProduct") || plan.contains("CONSTRUCTION FAILED"))
          Some(name -> plan.linesIterator.take(3).mkString(" | "))
        else None
    }
    assert(offenders.isEmpty, offenders.map(_._1).mkString(", "))
  }

  test("every registered query: non-aggregate SinglePartition exchanges " +
      "require a justified bounded-frame carve-out (opt-out, stale entries flagged)") {
    val suspects = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfStatic).queryExecution.executedPlan.toString
        if (staticSuspect(plan)) Some(name) else None
    }.toSet
    val missing = (suspects -- boundedFrame.keySet).toSeq.sorted
    val stale = (boundedFrame.keySet -- suspects).toSeq.sorted
    assert(missing.isEmpty && stale.isEmpty,
      s"unjustified single-partition funnels: ${missing.mkString(", ")}; " +
        s"stale carve-outs: ${stale.mkString(", ")}")
  }

  test("carved-out single-partition frames stay bounded as data scales 10x") {
    def spRecords(name: String, sf: String): Long = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val recs = PlanProbe
        .singlePartitionShuffleRecords(df.queryExecution.executedPlan)
      spark.catalog.clearCache()
      recs.sum
    }
    val measured = boundedFrame.keys.toSeq.sorted.map { name =>
      (name, spRecords(name, sfMid), spRecords(name, sfBig))
    }
    // probe sanity: a metric-name mismatch would read all-zero and pass
    // vacuously; the price-bin frames alone guarantee hundreds of rows
    assert(measured.exists(_._3 > 100L),
      s"probe read ~zero records everywhere — metric extraction broken? $measured")
    val offenders = measured.flatMap { case (name, atMid, atBig) =>
      if (atBig > 3 * math.max(atMid, 1L) && atBig > 2000L)
        Some(s"$name: $atMid -> $atBig rows through SinglePartition")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("substring dedup: no forced broadcast hint — AQE owns the build-side " +
      "choice, and the mark join is keyed on xxhash64, not the window text") {
    val qe = SparkEntry.queries("x_dedup_substring")(spark, sfStatic).queryExecution
    // a broadcast() hint would survive analysis as ResolvedHint and reach
    // the optimized Join as strategy=broadcast; its absence means AQE
    // picks broadcast-vs-shuffle from ACTUAL dupWins stats at runtime
    // (the round-5 scale-killer was the forced driver-side build — see
    // SCALE.md "substring-dedup dupWins sizing")
    assert(!qe.analyzed.toString.contains("ResolvedHint"))
    assert(!qe.optimizedPlan.toString.contains("strategy=broadcast"))
    // 8-byte hash key in both the duplicate-window aggregate and the join
    assert(qe.optimizedPlan.toString.contains("xxhash64"))
  }
}
