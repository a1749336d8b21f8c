package graft

import org.apache.spark.sql.catalyst.plans.{logical => logical}

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
    "x_ewma_chart" ->
      "daily count series — calendar-bounded (60 literal-weight lags)",
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
      "same price-bin frame as x_kruskal_wallis (SQL twin)",
    "x_cliffs_delta" ->
      "floor(price/1000) bin frame — binned c2-cumulative (BinnedRank)",
    "x_sql_cliffs" -> "same price-bin frame (SQL twin)",
    "x_mood_median" ->
      "floor(price/1000) bin frame — binned median selection (BinnedRank)",
    "x_sql_mood" -> "same price-bin frame (SQL twin)",
    "x_hampel" -> "daily mean series — calendar-bounded rolling window",
    "x_sql_poisson_glm" ->
      "daily count frame — calendar-bounded observed-day row_number",
    "x_rolling_quantile" ->
      "daily mean series — calendar-bounded rolling window",
    "x_conformal" ->
      ("floor(residual/100) bin frame — residual-domain-bounded " +
        "(measured 1035→1040 bins under 10× data; BinnedRank)"),
    "x_sql_conformal" ->
      "same residual-bin frame (SQL twin — the oracle's plain cumulative)",
    "x_nelson_aalen" ->
      "duration-hours at-risk histogram — horizon-bounded (KM frame)",
    "x_weibull_plot" ->
      "duration-hours at-risk histogram — horizon-bounded (KM frame)",
    "x_life_table" ->
      "100-hour interval frame — horizon-bounded (KM frame / 100)",
    "x_sql_sprt" -> "daily URGENT-count series (SQL twin)",
    "x_sql_holt" -> "daily count series (SQL twin)",
    "x_sql_ar2" -> "daily count series (SQL twin)",
    "x_sql_cochrane" -> "daily count series (SQL twin)",
    "x_anderson_darling" ->
      "floor(price/1000) bin frame — binned joint CDFs (BinnedRank, 2 measures)",
    "x_sql_ad" -> "same price-bin frame (SQL twin)",
    "x_holt_forecast" ->
      "daily count series — calendar-bounded double-EWMA windows",
    "x_sprt" -> "daily URGENT-count series — calendar-bounded LLR prefix",
    "x_ar2_yw" -> "daily count series — calendar-bounded ACF lag frame",
    "x_cochrane_orcutt" ->
      "daily count series — calendar-bounded residual-lag frame",
    "x_cvm" ->
      "floor(price/1000) bin frame — binned joint CDFs (BinnedRank, 2 measures)",
    "x_sql_cvm" -> "same price-bin frame (SQL twin)",
    "x_jonckheere" ->
      "floor(price/1000) bin frame — binned 5-group cumulatives (BinnedRank)",
    "x_sql_jonckheere" -> "same price-bin frame (SQL twin)",
    // NB x_dunn_posthoc (r15): its BinnedRank bin window now sits below
    // the gv/gr pins (the x_fligner_killeen treatment), so the
    // SinglePartition exchange runs at construction and the final plan
    // starts from LogicalRDD leaves — not a suspect anymore. The frame is
    // the same bounded price-bin histogram x_sql_kruskal still probes.
    "x_brunner_munzel" ->
      "quantity-domain histogram — l_quantity has <=50 distinct values",
    "x_sql_bm" -> "same quantity histogram (SQL twin)",
    "x_rmst" ->
      "duration-hours at-risk histogram — horizon-bounded (KM frame)",
    "x_harrell_c" ->
      "duration-hours histogram — horizon-bounded (KM frame, BinnedRank)",
    "x_coint_eg" -> "daily two-series frame — calendar-bounded",
    "x_sql_coint" -> "same daily frame (SQL twin)",
    "x_kpss" ->
      "daily count series — calendar-bounded partial-sum/lag frame",
    "x_sql_kpss" -> "same daily frame (SQL twin)",
    "x_sample_entropy" ->
      "daily count series — calendar-bounded row_number/lead frame",
    "x_sql_sampen" -> "same daily frame (SQL twin)",
    "x_spectral_entropy" ->
      "daily count series — calendar-bounded day-index row_number",
    "x_sql_spectral" -> "same daily frame (SQL twin)",
    "x_ansari_bradley" ->
      "quantity-domain histogram — l_quantity has <=50 distinct values",
    "x_sql_ansari" -> "same quantity histogram (SQL twin)",
    // NB x_vdw_test / x_fligner_killeen (r15): their BinnedRank bin-frame
    // windows now sit BELOW a lazy localCheckpoint pin (the scaffold is
    // pinned because two downstream consumers replayed it — 48 aggregates
    // in the unpinned fligner plan), so the SinglePartition exchange runs
    // at construction inside the pinned subtree and the query's own
    // executedPlan starts from LogicalRDD leaves — not a suspect. The
    // frames stay what they were: value-domain ~500-bin histograms, the
    // same bounded shape the x_sql_vdw / x_sql_fk twins' carve-outs below
    // still probe dynamically every run.
    "x_sql_vdw" -> "same price-bin frame (SQL twin)",

    "x_sql_fk" -> "same residual-bin frame (SQL twin)",
    "x_shapiro_francia" ->
      "quantity-domain histogram — l_quantity has <=50 distinct values",
    "x_sql_sf" -> "same quantity histogram (SQL twin)",
    "x_croston" ->
      "order-calendar day-index frame — calendar-bounded row_number/lag",
    "x_sql_croston" -> "same calendar frame (SQL twin)",
    "x_bass" ->
      "adoption daily frame — calendar-bounded cumulative window",
    "x_sql_bass" -> "same daily frame (SQL twin)",
    "x_newsvendor" ->
      "quantity-domain histogram — l_quantity has <=50 distinct values",
    "x_sql_newsvendor" -> "same quantity histogram (SQL twin)",
    "x_gaps_islands" ->
      "event-calendar day-index frame — calendar-bounded row_number",
    "x_sql_gaps" -> "same calendar frame (SQL twin)",
    "x_fdr_bh" ->
      "per-brand p-value frame — 25 brands (BH step-up windows)",
    "x_sql_fdr" -> "same 25-row p-value frame (SQL twin)",
    "x_lilliefors" ->
      "quantity-domain histogram — l_quantity has <=50 distinct values",
    "x_sql_lilliefors" -> "same quantity histogram (SQL twin)",
    "x_lmoments" ->
      "quantity-domain histogram — l_quantity has <=50 distinct values",
    "x_sql_lmoments" -> "same quantity histogram (SQL twin)",
    "x_drawdown" ->
      "daily revenue series — calendar-bounded prefix/running-max windows",
    "x_sql_drawdown" -> "same daily frame (SQL twin)",
    "x_chatterjee" ->
      "daily (count, mean) frame — calendar-bounded rank/lead windows",
    "x_sql_chatterjee" -> "same daily frame (SQL twin)",
    "x_hoeffding_d" ->
      "margin cumulative frames — (priority, price-bucket) <=5 rows each",
    "x_sql_hoeffd" -> "same margin frames (SQL twin)",
    // NB x_haar_energy/x_sql_haar: the day-index row_number feeds
    // straight into the five grouped level aggregates, so the
    // SinglePartition exchange sits under an aggregate consumer and the
    // static walk already allows it — no carve-out (stale-flagged).
    "x_gev_lmom" ->
      "monthly block-maxima frame — calendar-bounded (<=84 rows)",
    "x_sql_gev" -> "same maxima frame (SQL twin)",
    "x_pot_gpd" ->
      "daily rank + excess rank frames — calendar-bounded",
    "x_sql_gpd" -> "same daily/excess frames (SQL twin)",
    "x_copula_corr" ->
      "daily (count, revenue) frame — calendar-bounded RANGE rank windows",
    "x_sql_copula" -> "same daily frame (SQL twin)",
    "x_transfer_entropy" ->
      "daily direction series + 16-cell joint frame — calendar-bounded",
    "x_sql_te" -> "same daily/joint frames (SQL twin)",
    "x_hodges_lehmann" ->
      ("quantity histogram + <=99-row Walsh-sum frame — both " +
        "value-domain bounded (l_quantity has <=50 distinct values)"),
    "x_sql_hl" -> "same quantity/Walsh frames (SQL twin)",
    "x_winsor_trim" ->
      "quantity-domain histogram — l_quantity has <=50 distinct values",
    "x_sql_trimmed" -> "same quantity histogram (SQL twin)",
    "x_lepage" ->
      "quantity-domain histogram — l_quantity has <=50 distinct values",
    "x_sql_lepage" -> "same quantity histogram (SQL twin)",
    "x_ppcc" ->
      "quantity-domain histogram — l_quantity has <=50 distinct values",
    "x_sql_ppcc" -> "same quantity histogram (SQL twin)",
    "x_cucconi" ->
      "quantity-domain histogram — l_quantity has <=50 distinct values",
    "x_sql_cucconi" -> "same quantity histogram (SQL twin)",
    "x_arch_lm" ->
      "daily squared-innovation lag frame — calendar-bounded",
    "x_sql_arch" -> "same daily lag frame (SQL twin)",
    "x_von_neumann" ->
      "daily revenue lag frame — calendar-bounded",
    "x_sql_vn" -> "same daily lag frame (SQL twin)",
    "x_buishand" ->
      "daily partial-sum frame — calendar-bounded (CUSUM family)",
    "x_sql_buishand" -> "same daily frame (SQL twin)",
    "x_break_sse" ->
      "daily prefix-moment frame — calendar-bounded split scan",
    "x_sql_break" -> "same daily frame (SQL twin)",
    "x_imr_chart" ->
      ("daily mean series — calendar-bounded (the sign-run islands " +
        "partition by side)"),
    "x_sql_imr" -> "same daily series (SQL twin)",
    "x_kz_filter" ->
      "daily count series — calendar-bounded centered-MA windows",
    "x_sql_kz" -> "same daily series (SQL twin)",
    "x_herfindahl" ->
      "brand revenue-share frame — 25 brands (CR4 rank window)",
    "x_sql_hhi" -> "same 25-row share frame (SQL twin)",
    "x_rca" ->
      "(region x brand) cell frame — <=125 cells (grand-total window)",
    "x_sql_rca" -> "same cell frame (SQL twin)",
    "x_shift_share" ->
      "(region x brand) cell frame — <=125 cells (national-rate window)",
    "x_sql_shift" -> "same cell frame (SQL twin)",
    "x_adjusted_rand" ->
      "pairing contingency margins — 9 cells (grand-total window)",
    "x_sql_ari" -> "same 9-cell frame (SQL twin)",
    "x_v_measure" ->
      "pairing contingency margins — 9 cells (grand-total window)",
    "x_sql_vmeasure" -> "same 9-cell frame (SQL twin)",
    "x_kappa_weighted" ->
      "pairing contingency margins — 9 cells (grand-total window)",
    "x_sql_wkappa" -> "same 9-cell frame (SQL twin)",
    "x_gwet_ac1" ->
      "pairing contingency margins — 9 cells (grand-total window)",
    "x_sql_ac1" -> "same 9-cell frame (SQL twin)",
    "x_krippendorff" ->
      "pairing contingency margins — 9 cells (grand-total window)",
    "x_sql_kripp" -> "same 9-cell frame (SQL twin)",
    "x_stl_strength" ->
      "daily trend-MA frame — calendar-bounded centered window",
    "x_sql_stl" -> "same daily frame (SQL twin)",
    "x_holm" ->
      "per-brand p-value frame — 25 brands (step-down rank window)",
    "x_sql_holm" -> "same 25-row p-value frame (SQL twin)")
    // NB x_cox_ph's at-risk reverse-cumulative windows (the x_survival_km
    // horizon-bounded frame) execute inside the driver-side Newton fit
    // (collected bounded frame), so the returned plan the static walk
    // sees is the tiny result frame — same posture as x_logistic_glm.

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

  /** ONE static sweep shared by the three 738-query plan audits (r15:
    * each audit used to re-construct every query's QueryExecution — three
    * full planning passes, ~2 min each, and the round-14 driver killed the
    * suite at its time budget). Per query: the executedPlan text (the
    * CartesianProduct + SinglePartition walks) and the analyzed-plan
    * broadcast-hint suspicion — computed from the SAME QueryExecution. A
    * construction failure is carried as a CONSTRUCTION FAILED plan string
    * so it fails the CartesianProduct audit by name, never silently. */
  private lazy val staticSweep: Seq[(String, String, Boolean)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val qe = fn(spark, sfStatic).queryExecution
        val hinted = suspectHintFrames(qe.analyzed).nonEmpty
        (name, qe.executedPlan.toString, hinted)
      } catch { case e: Throwable =>
        (name, s"CONSTRUCTION FAILED: ${e.getMessage}", false)
      }
    }

  test("no CartesianProduct in any registered query plan") {
    val offenders = staticSweep.flatMap { case (name, plan, _) =>
      if (plan.contains("CartesianProduct") || plan.contains("CONSTRUCTION FAILED"))
        Some(name -> plan.linesIterator.take(3).mkString(" | "))
      else None
    }
    assert(offenders.isEmpty, offenders.map(_._1).mkString(", "))
  }

  test("every registered query: non-aggregate SinglePartition exchanges " +
      "require a justified bounded-frame carve-out (opt-out, stale entries flagged)") {
    val suspects = staticSweep.collect {
      case (name, plan, _) if staticSuspect(plan) => name
    }.toSet
    val missing = (suspects -- boundedFrame.keySet).toSeq.sorted
    val stale = (boundedFrame.keySet -- suspects).toSeq.sorted
    assert(missing.isEmpty && stale.isEmpty,
      s"unjustified single-partition funnels: ${missing.mkString(", ")}; " +
        s"stale carve-outs: ${stale.mkString(", ")}")
  }

  test("carved-out single-partition frames stay bounded as data scales 10x and 100x") {
    def spRecords(name: String, sf: String): Long = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val recs = PlanProbe
        .singlePartitionShuffleRecords(df.queryExecution.executedPlan)
      spark.catalog.clearCache()
      recs.sum
    }
    // third decade: deterministic 10x upscale of sf0.1 (ProbeSf1), so
    // "flat under 10x" is actually asserted as "flat under 100x" —
    // sf-root growth (√n frames) that squeaks under one decade's 3x
    // rule compounds to ~10x over two and fails
    val sfHuge = ProbeSf1.ensure(spark)
    val measured = boundedFrame.keys.toSeq.sorted.map { name =>
      (name, spRecords(name, sfMid), spRecords(name, sfBig),
        spRecords(name, sfHuge))
    }
    // probe sanity: a metric-name mismatch would read all-zero and pass
    // vacuously; the price-bin frames alone guarantee hundreds of rows
    assert(measured.exists(_._3 > 100L),
      s"probe read ~zero records everywhere — metric extraction broken? $measured")
    val offenders = measured.flatMap { case (name, atMid, atBig, atHuge) =>
      val decade1 = atBig > 3 * math.max(atMid, 1L) && atBig > 2000L
      val decade2 = atHuge > 3 * math.max(atBig, 1L) && atHuge > 2000L
      // compounded: two decades may each pass 3x yet multiply to ~9x+ —
      // √n growth lands here (≈10x over 100x data)
      val compounded = atHuge > 6 * math.max(atMid, 1L) && atHuge > 2000L
      if (decade1 || decade2 || compounded)
        Some(s"$name: $atMid -> $atBig -> $atHuge rows through SinglePartition")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  /** Complete inventory of intentional broadcast() hints on frames DERIVED
    * FROM corpus-scale tables whose boundedness the static walk cannot
    * prove (grouped aggregates: per-nation / per-brand / bin-keyed frames).
    * Opt-out like [[boundedFrame]]: any other registered query that hints
    * an unproven corpus-derived frame fails the static audit (the
    * round-8/9 x_text_zipf lesson: a forced broadcast on a ~√corpus
    * distinct-count histogram), stale entries fail, and every entry's
    * hinted frames are row-counted at sf0.01 vs sf0.1 by the dynamic
    * probe below. */
  private val boundedBroadcast: Map[String, String] = Map(
    "j4_route_using" -> "per-route count frame — route domain is dim-bounded",
    "q_most_delay" -> "per-nation popularity frame — 25 rows",
    "x_basket_pairs" -> "per-brand item-count frame — 25 brands",
    "x_budget_select" -> "quality-bin histogram — score-domain <=1001 bins",
    "x_contamination" ->
      ("eval-benchmark n-gram set — PINNED 6-doc id list (TrainPrep." +
        "EvalExactIds), bounded by construction; probe-measured"),
    "x_contamination_fuzzy" ->
      ("eval-benchmark band/text frames — PINNED 100-doc id list " +
        "(TrainPrep.EvalFuzzyIds), bounded by construction; probe-measured"),
    "x_cramers_v" -> "contingency marginals — (priority x status) domains",
    "x_cv_profile" -> "per-fold moment frame — fold-count-bounded",
    "x_dedup_srp_recall" -> "SRP probe/plane frames — probe-set + bit-bounded",
    "x_doclen_powerlaw" -> "eighth-log length-bin frame — <=60 bins",
    "x_entropy_rate" -> "per-event-type transition marginals — type-domain",
    "x_graph_jaccard" -> "per-nation degree frame — 25 vertices",
    "x_grubbs" -> "per-segment moment frame — 5 segments",
    "x_hill_diversity" -> "per-nation totals — 25 nations",
    "x_jarque_bera" -> "per-segment moment frame — 5 segments",
    "x_kendall_tau" -> "bin frames + tie/moment glue — bin-domain-bounded",
    "x_kl_lang_drift" -> "per-(lang x source) distribution frames — bounded",
    "x_levene_bf" -> "per-segment median/moment frames — 5 segments",
    "x_lift_gain" -> "negated price-bin frame — BinnedRank bins",
    "x_ljung_box" -> "daily-lag autocorr frames — calendar-bounded",
    "x_lorenz_deciles" -> "spend-bin frame — BinnedRank bins",
    "x_mad_outliers" -> "per-segment median/MAD frame — 5 segments",
    "x_mann_kendall" -> "daily series + tie frames — calendar-bounded",
    "x_mode_stats" -> "per-returnflag max-count frame — 3 flags",
    "x_mutual_info" -> "(event_type x dow) marginals — bounded domains",
    "x_nb_langid" -> "char-ngram language model — charset x lang bounded",
    "x_normalize" -> "per-group moment frame — group-domain-bounded",
    // NB x_pipeline_pretrain: its broadcast hints (eval band/text frames,
    // budget verdict) all sit above the r14 gated-corpus pin, whose
    // localCheckpoint truncates lineage to a LogicalRDD — the corpus-leaf
    // walk can no longer see through it, so the query is NOT a suspect and
    // a carve-out here would be stale (latent r14 red: the pin landed
    // after the builder's last green cold run, and the driver's r14 sbt
    // test was killed before reaching this audit). The frames stay
    // dynamically bounded — the eval id lists are pinned literals and the
    // verdict histogram is the same <=1001-bin frame x_budget_select's
    // carve-out probes.
    "x_pq_adc_topk" -> "PQ codebook frame — k x subspaces bounded",
    "x_pq_recall" -> "PQ codebook + probe frames — k-bounded",
    "x_pq_rerank" -> "PQ codebook + probe frames — k-bounded",
    "x_price_index" -> "monthly index frames — calendar-bounded",
    "x_quantile_norm" -> "dense 1001-row rank-bin carry table",
    "x_retention_cohorts" -> "cohort-month size frame — calendar-bounded",
    "x_sample_balance" -> "per-group moment frame — group-domain-bounded",
    "x_seasonal_dow" -> "per-dow baseline frame — 7 rows",
    "x_seasonality_strength" -> "daily/dow component frames — calendar-bounded",
    "x_seq_transitions" -> "per-event-type totals — type-domain",
    "x_sim_binary_topk" -> "query-vector + plane frames — probe-set-bounded",
    "x_sim_cosine_topk" -> "query-vector frame — probe-set-bounded",
    "x_sim_cosine_topk_agg" -> "query-vector frame — probe-set-bounded",
    "x_sim_ivf_auto" ->
      "centroid + probe frames — k-bounded (dispatched recall chain)",
    "x_sim_ivf_nprobe" -> "k-means centroid frame — k-bounded",
    "x_sim_ivf_recall" -> "centroid + probe frames — k-bounded",
    "x_sim_ivf_topk" -> "centroid + probe frames — k-bounded",
    "x_sim_ivf_trained" -> "trained centroid frame — k-bounded",
    "x_sim_ivfpq_recall" -> "IVF centroids + PQ codebook — k-bounded",
    "x_sim_ivfpq_rerank" -> "IVF centroids + PQ codebook — k-bounded",
    "x_sim_ivfpq_topk" -> "IVF centroids + PQ codebook — k-bounded",
    "x_sim_matryoshka" -> "query-vector frame — probe-set-bounded",
    "x_stream_anomaly" -> "per-key baseline stats — key-domain-bounded",
    "x_stream_psi" -> "baseline bin distribution — bin-bounded",
    "x_target_encode" -> "per-category target means — category-domain",
    "x_theil_index" -> "per-nation decomposition frame — 25 nations",
    "x_theilsen_trend" -> "daily pair/median frames — calendar-bounded",
    "x_tukey_fences" -> "per-segment fence frame — 5 segments",
    "x_vocab_overlap" -> "per-source vocab counts — source-domain",
    "x_winsorize" -> "per-group percentile frame — group-domain-bounded",
    "x_friedman" -> "month x segment cell-mean frame — 60 rows",
    "x_tukey_hsd" -> "per-segment moment frame — 5 segments",
    "x_sql_tukey" ->
      ("same 5-row moment frame (SQL twin; Spark-only BROADCAST hint " +
        "comment keeps the parser's non-equi pair join off CartesianProduct)"),
    "x_rich_club" ->
      ("degree-valued k grid — vertex-domain-bounded (the hint keeps the " +
        "non-equi grid joins off CartesianProduct)"),
    "x_dirichlet_mom" -> "event-type spine frame — type-domain (5 rows)",
    "x_intrinsic_dim" ->
      "capped probe set (vec_id < 200, absolute) — probe-set-bounded",
    "x_ndcg" -> "query-vector frame — probe-set-bounded (x_sim family)",
    "x_eta_squared" -> "per-segment snapped-mean frame — 5 segments",
    // NB x_dunn_posthoc (r15): the pair-side broadcast hints now sit on
    // the PINNED 5-row gr frame (LogicalRDD) — the corpus-leaf walk stops
    // at the pin, so the query is no longer a suspect; the hints still
    // keep the triangular pair join off CartesianProduct.
    "x_g_test" -> "contingency marginals — (priority x status) domains",
    "x_brier_decomp" -> "monthly propensity frame — 12 rows",
    "x_item_cf" -> "per-brand item-count frame — 25 brands",
    "x_knn_classify" -> "query-vector frame — probe-set-bounded (x_sim family)",
    "x_map_mrr" -> "query-vector frame — probe-set-bounded (x_sim family)",
    "x_sample_entropy" ->
      ("daily template frame — calendar-bounded (the hint keeps the " +
        "i < j pair join off CartesianProduct)"),
    "x_sql_sampen" -> "same daily template frame (SQL twin hint comment)",
    "x_ordinal_assoc" ->
      ("contingency cell frame — (priority x price-bucket) domains, " +
        "<=20 cells (the hint keeps the dominance cross off " +
        "CartesianProduct)"),
    "x_sql_ordassoc" -> "same cell frame (SQL twin hint comment)",
    // NB x_fligner_killeen (r15): its broadcast(med) hint — the 5-row
    // per-segment median frame — now sits INSIDE the pinned gz subtree
    // (lazy localCheckpoint), so the corpus-leaf walk stops at the
    // LogicalRDD and the query is no longer a suspect; a carve-out here
    // would be stale. The frame itself is unchanged (5 segments).
    "x_newsvendor" ->
      "selected-quantile frame — single row by construction (Q*)",
    "x_energy_dist" ->
      ("quantity-domain histograms — l_quantity has <=50 distinct values " +
        "(the hints keep the histogram crosses off CartesianProduct)"),
    "x_sql_energy" -> "same quantity histograms (SQL twin hint comments)",
    "x_meta_analysis" ->
      "per-region effect + DL tau2 frames — 5 studies",
    "x_sql_meta" ->
      ("same 5-study frames (SQL twin; the hint keeps the comma join " +
        "with the grouped tau frame off CartesianProduct)"),
    "x_hoeffding_d" ->
      ("contingency cell + margin frames — (priority x price-bucket) " +
        "<=25 cells (the hint keeps the dominance cross off " +
        "CartesianProduct)"),
    "x_sql_hoeffd" -> "same cell frames (SQL twin hint comment)",
    "x_sql_dtw" ->
      ("normalized (segment x month) profile frames — 12 rows each " +
        "(the hint keeps the cost cross off CartesianProduct)"),
    "x_hodges_lehmann" ->
      ("quantity-domain histogram — l_quantity has <=50 distinct values " +
        "(the hint keeps the Walsh a.v < b.v cross off CartesianProduct)"),
    "x_sql_hl" -> "same quantity histogram (SQL twin hint comment)",
    "x_quade" ->
      ("block range-rank frames — 12 months (the hints keep the " +
        "12x12 range ranking off CartesianProduct)"),
    "x_sql_quade" -> "same month frames (SQL twin hint comments)",
    "x_kappa_weighted" ->
      ("pairing contingency margin frame — 3 distinct classes (the " +
        "hint keeps the 3x3 weight cross off CartesianProduct)"),
    "x_stl_strength" ->
      "monthly seasonal means — 12 rows (calendar-domain bounded)",
    "x_sql_stl" -> "same 12-row seasonal frame (SQL twin hint comment)",
    "x_embed_cluster_quality" ->
      ("centroid/grand-mean/size frames — (label x dim) <=640 rows " +
        "(dims and labels are schema-bounded, not corpus-bounded)"),
    "x_basket_triples" ->
      "per-brand order-frequency frame — 25 brands (lift marginals)",
    "x_heaps_profile" ->
      "per-level doc-count frame — 3 rows (the nested 25/50/100% carves)",
    "x_hard_negatives" ->
      "centroid + anchor frames — k-bounded / probe-set-bounded (x_sim family)",
    "x_contamination_13g" ->
      ("eval-benchmark 13-gram set — PINNED 100-doc id list (TrainPrep." +
        "EvalFuzzyIds), bounded by construction; probe-measured"))
    // NB x_assoc_rules broadcasts its 25-row brand marginals, but they sit
    // behind the pinned (localCheckpoint) basket frame, so the audit's
    // corpus-leaf walk never reaches a corpus table — no carve-out needed
    // (adding one trips the stale check).

  private val CorpusTables =
    Seq("lineitem", "orders", "events", "documents", "embeddings", "flights")

  private def corpusLeaf(p: logical.LeafNode): Boolean = p match {
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.exists(rp =>
            CorpusTables.exists(t => rp.toString.contains(t)))
        case _ => false
      }
    case dsv2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      CorpusTables.exists(t => dsv2.name.contains(t))
    case _ => false
  }

  /** True iff some corpus-table leaf under this hinted subtree reaches the
    * broadcast WITHOUT passing a node that bounds row count independently
    * of data scale: a global (groupless) aggregate or a literal limit.
    * Grouped aggregates pass through — their key domain may or may not be
    * bounded, which is exactly what the carve-out + dynamic probe decide.
    * SQL-parsed queries keep their CTE structure in the analyzed plan
    * (`CTERelationRef` leaves), so refs resolve through `cteDefs` — a
    * hinted CTE alias over a corpus aggregate is as visible as the
    * Dataset-API form. */
  private def unboundedCorpusFrame(root: logical.LogicalPlan,
      cteDefs: Map[Long, logical.LogicalPlan]): Boolean = {
    def walk(p: logical.LogicalPlan, seen: Set[Long]): Boolean = p match {
      case a: logical.Aggregate if a.groupingExpressions.isEmpty => false
      case _: logical.GlobalLimit => false
      case r: logical.CTERelationRef =>
        !seen(r.cteId) &&
          cteDefs.get(r.cteId).exists(walk(_, seen + r.cteId))
      case l: logical.LeafNode => corpusLeaf(l)
      case other => other.children.exists(walk(_, seen))
    }
    walk(root, Set.empty)
  }

  private def cteDefsOf(analyzed: logical.LogicalPlan): Map[Long, logical.LogicalPlan] =
    analyzed.collect {
      case d: logical.CTERelationDef => d.id -> d.child
    }.toMap

  private def suspectHintFrames(analyzed: logical.LogicalPlan): Seq[logical.LogicalPlan] = {
    // Spark's own InlineCTE substitutes CTERelationRef leaves with their
    // definitions (attribute mapping included), so a hinted CTE alias in
    // a SQL twin yields the same standalone-executable frame as the
    // Dataset-API form — both for this walk and for the dynamic probe's
    // row counts.
    val plan = org.apache.spark.sql.catalyst.optimizer
      .InlineCTE(alwaysInline = true).apply(analyzed)
    val defs = cteDefsOf(plan)
    plan.collect {
      case h: logical.ResolvedHint
          if h.hints.strategy.contains(logical.BROADCAST) &&
            unboundedCorpusFrame(h.child, defs) => h.child
    }
  }

  test("forced broadcast() on a corpus-derived frame requires a justified " +
      "bounded-frame carve-out (opt-out, stale entries flagged)") {
    val suspects = staticSweep.collect {
      case (name, _, hinted) if hinted => name
    }.toSet
    val missing = (suspects -- boundedBroadcast.keySet).toSeq.sorted
    val stale = (boundedBroadcast.keySet -- suspects).toSeq.sorted
    assert(missing.isEmpty && stale.isEmpty,
      s"unjustified corpus-frame broadcast hints: ${missing.mkString(", ")}; " +
        s"stale carve-outs: ${stale.mkString(", ")}")
  }

  /** Round 10 closed the last documented-not-measured exemption: the
    * decontamination family's eval split is now a PINNED literal id
    * list (TrainPrep.EvalExactIds/EvalFuzzyIds) instead of a modulus
    * slice, so its eval frames are bounded by construction and the
    * dynamic probe measures them like every other carve-out. */
  private val fixtureProportionalEval: Set[String] = Set.empty

  test("carved-out corpus broadcast frames stay bounded as data scales 10x") {
    assume(boundedBroadcast.nonEmpty)
    def hintedRows(name: String, sf: String): Long = {
      val df = SparkEntry.queries(name)(spark, sf)
      val rows = suspectHintFrames(df.queryExecution.analyzed)
        .map(f => org.apache.spark.sql.graft.Shim.ofRows(spark, f).count()).sum
      spark.catalog.clearCache()
      rows
    }
    // same two-decade coverage as the SinglePartition probe: sf1 from
    // ProbeSf1, per-decade 3x rule + compounded 6x (catches sqrt growth)
    val sfHuge = ProbeSf1.ensure(spark)
    val measured = (boundedBroadcast.keySet -- fixtureProportionalEval)
      .toSeq.sorted.map { name =>
        (name, hintedRows(name, sfMid), hintedRows(name, sfBig),
          hintedRows(name, sfHuge))
      }
    val offenders = measured.flatMap { case (name, atMid, atBig, atHuge) =>
      val decade1 = atBig > 3 * math.max(atMid, 1L) && atBig > 2000L
      val decade2 = atHuge > 3 * math.max(atBig, 1L) && atHuge > 2000L
      val compounded = atHuge > 6 * math.max(atMid, 1L) && atHuge > 2000L
      if (decade1 || decade2 || compounded)
        Some(s"$name: $atMid -> $atBig -> $atHuge broadcast rows")
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
    // (r15: the native window_hashes kernel — xxhash64 values, fused loop;
    // bit-identity vs the xxhash64(substring(..)) HOF pinned in
    // ShingleExpressionsSpec)
    assert(qe.optimizedPlan.toString.contains("window_hashes"))
  }
}
