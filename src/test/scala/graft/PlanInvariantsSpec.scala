package graft

/** Plan-level invariants enforced across EVERY registered query — the
  * mechanized form of the PLANS_r0N.md audits. Catches the two plan
  * shapes that silently kill a 100 TB run long before any bench notices:
  *
  *  - `CartesianProduct`: a non-broadcast cross join means BOTH sides were
  *    too big to broadcast — O(|L|·|R|) over real data. (1-row stats glue
  *    plans as BroadcastNestedLoopJoin and stays allowed.)
  *  - `Exchange SinglePartition` under a corpus-scale operator: the whole
  *    dataset funneling through one task. Global scalar aggregates plan a
  *    partial/final pair whose final exchange carries one row per task —
  *    that is fine and allowed; the invariant targets the operators whose
  *    INPUT is corpus-sized (dedup, packing, text, sampling families,
  *    where a careless global window/sort would hide).
  *
  * Plans are built at sf0.001 (construction only — side-effecting queries
  * write their small fixtures, nothing large executes).
  */
class PlanInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // corpus-scale families: their full input must never cross one task.
  // (Global 1-row aggregates still appear INSIDE some as broadcast stats;
  // those exchanges carry partial rows, and the check below tolerates a
  // SinglePartition exchange only when it feeds a 1-row aggregate —
  // detected by the final HashAggregate/ObjectHashAggregate right above.)
  private val corpusScale = Set(
    "x_dedup_exact", "x_dedup_minhash_lsh", "x_dedup_simhash",
    "x_dedup_ngram_jaccard", "x_dedup_embedding", "x_dedup_clean",
    "x_text_langid",
    "x_text_quality", "x_text_tokens", "x_text_fingerprint",
    "x_text_entropy", "x_feature_hash", "x_pack_chunks", "x_pack_greedy",
    "x_interleave", "x_mix_sources", "x_split_assign", "x_split_kfold",
    "x_sample_stratified", "x_sample_weighted", "x_sample_balance",
    "x_contamination", "x_ewma", "x_rolling_time", "x_normalize",
    // round-6 batch 2 (x_budget_select is excluded BY DESIGN: its KB
    // histogram window is an unpartitioned exchange over the aggregated
    // bins frame, consumed by Sort→Window — R6OpsSpec carries the
    // tailored assertion that it is fed by the bin aggregate, never
    // corpus rows)
    "x_contamination_fuzzy", "x_mm_neardup", "x_pack_length_buckets",
    "x_split_group", "x_stream_distinct",
    // round 7 (x_bpe_pairs and x_rrf_fusion are excluded BY DESIGN: their
    // final rank windows sort bounded aggregates — charset²-sized pair
    // counts / two 10-row rank lists — never corpus rows, the same
    // carve-out as x_budget_select's histogram window)
    "x_funnel_steps", "x_cdc_apply", "x_snapshot_diff", "x_drift_psi",
    // round 9 (x_ntile_deciles, x_survival_km and x_skyline are excluded
    // BY DESIGN: their global windows order customer-dimension /
    // horizon-hour aggregate frames / the KB local-survivor union, never
    // corpus rows — the x_budget_select carve-out; SkylineSpec carries the
    // tailored assertion that the single-partition pass is fed by the
    // bucket-local Filter, and the corpus-sized window is hash-partitioned)
    "x_basket_pairs", "x_seq_transitions", "x_retention_cohorts",
    "x_text_postings", "x_stream_ewma", "x_grid_knn",
    "x_incremental_join", "x_seasonal_dow", "x_time_weighted",
    "x_hist2d", "x_stream_anomaly", "x_dedup_srp", "x_text_boilerplate",
    "x_text_pmi", "x_shard_rendezvous", "x_mutual_info",
    "x_path_trigrams", "x_sparse_cosine", "x_bootstrap_ci",
    "x_sim_binary_topk", "x_token_fertility", "x_regr_by_group",
    "x_t_closeness", "x_rank_features", "x_nb_langid", "x_target_encode")

  test("no CartesianProduct in any registered query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"CONSTRUCTION FAILED: ${e.getMessage}" }
        if (plan.contains("CartesianProduct") || plan.contains("CONSTRUCTION FAILED"))
          Some(name -> plan.linesIterator.take(3).mkString(" | "))
        else None
    }
    assert(offenders.isEmpty, offenders.map(_._1).mkString(", "))
  }

  test("corpus-scale operators never funnel their input through one partition") {
    val offenders = corpusScale.toSeq.sorted.flatMap { name =>
      val fn = SparkEntry.queries(name)
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val lines = plan.linesIterator.toVector
      val bad = lines.zipWithIndex.exists { case (l, i) =>
        l.contains("Exchange SinglePartition") && {
          // tolerated only as the final leg of a 1-row global aggregate:
          // the operator directly consuming it must be an aggregate
          val above = lines.take(i).reverse.find(_.trim.nonEmpty)
          // HashAggregate also matches ObjectHashAggregate (substring)
          !above.exists(a => a.contains("HashAggregate") || a.contains("SortAggregate"))
        }
      }
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, offenders.mkString(", "))
  }

  test("substring dedup: no forced broadcast hint — AQE owns the build-side " +
      "choice, and the mark join is keyed on xxhash64, not the window text") {
    val qe = SparkEntry.queries("x_dedup_substring")(spark, sfDir).queryExecution
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
