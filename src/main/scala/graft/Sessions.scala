package graft

import org.apache.spark.sql.SparkSession

/** Session construction with the engine's scale posture in one place.
  *
  * Local defaults here mirror what the cluster profile would set per-job:
  * - `spark.sql.shuffle.partitions`: sized to cores locally; on a cluster,
  *   2-3× total executor cores (AQE coalesces small partitions back down,
  *   so oversizing is safe; undersizing causes spills).
  * - AQE on (Spark 4 default): runtime re-planning, skew-join splitting,
  *   partition coalescing.
  * - `spark.sql.files.maxPartitionBytes` default 128 MB: at 100 TB that's
  *   ~800k scan tasks — raise per-job if task overhead dominates.
  * - events.parquet nanos handling (see Tables.events).
  */
object Sessions {

  def local(cores: String, extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // honor KeyGroupedPartitioning reported by V2 scans → storage-
      // partitioned joins (zero-exchange co-partitioned joins against the
      // graft-range grouped layout; see GraftRangeScan.outputPartitioning)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // accept co-partitioning when the children are partitioned on a
      // SUBSET of the join keys (bucket ⊂ {bucket, id}) — a planner
      // relaxation that can only remove exchanges, never change results
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // native functions (cosine_sim, l2_sq) + the WindowTopKRewrite
      // optimizer rule (window top-k → bounded-heap aggregate where
      // provably identical)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // ContextCleaner only reclaims shuffle files / broadcasts when their
      // driver-side references are GC'd; the default periodic-GC interval
      // (30 min) never fires inside a multi-minute 200-query harness run,
      // so state from early queries piles onto the last ones (measured:
      // x_zorder_scan 5.5 s isolated vs 13.9 s at the tail of a full
      // bench). A 2-minute cadence bounds that accumulation.
      .config("spark.cleaner.periodicGC.interval", "2min")
    extra.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }
}
