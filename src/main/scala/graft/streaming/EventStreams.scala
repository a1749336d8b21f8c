package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import java.sql.Timestamp

final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)
final case class SessionSummary(user_id: Long, n_events: Long, total_value: Double,
    session_start: Timestamp, session_end: Timestamp)

/** One streaming as-of match: `probe_id` enriched with the latest ref row
  * at-or-before its event time (NULL columns when no ref precedes it). */
final case class AsOfMatch(probe_id: Long, user_id: Long, ts: Timestamp,
    ref_id: Option[Long], ref_value: Option[Double], lag_us: Option[Long])

/** One finalized funnel-stage assignment (see [[EventStreams.funnelStages]]). */
final case class FunnelStage(user_id: Long, stage: String, stage_ts: Timestamp)

/** Per-user funnel state: unmatured events + the finalized stage
  * timestamps (epoch micros — no Timestamp codec in the state store). */
final case class FunnelState(buffered: List[(Long, Long, String)],
    v: Option[Long], c: Option[Long], p: Option[Long])

/** Per-key state for [[EventStreams.asOfStream]]: probes not yet matured by
  * the watermark, and the refs still able to match a future probe (all refs
  * at/after the watermark plus ONE carry ref below it). Timestamps are
  * epoch micros — exact integers, no Timestamp codec in the state store. */
final case class AsOfState(probes: List[(Long, Long)],
    refs: List[(Long, Long, Double)])

/** One finalized EWMA emission (see [[EventStreams.ewmaStream]]). */
final case class EwmaOut(event_id: Long, user_id: Long, ewma: Double)

/** Per-user state for [[EventStreams.ewmaStream]]: unmatured events
  * (epoch micros, event_id, value) + the most-recent-first trailing values
  * of already-matured events (capped at k−1 — the FIR tap window). */
final case class EwmaState(pending: List[(Long, Long, Double)],
    tail: List[Double])

/** Structured-Streaming surface over the `events` table shape: windowed
  * aggregations with watermarks and custom sessionization state. The
  * transform bodies are shared with the batch queries (same Column
  * expressions), so batch results = eventual streaming results — tested via
  * MemoryStream in EventStreamsSpec.
  */
object EventStreams {

  /** Normalize event-time columns to `TimestampType` at the operator
    * boundary: TIMESTAMP_NTZ inputs (e.g. a source written with naive µs
    * timestamps — the round-6 testdata flavor) are cast — a pure
    * reinterpretation under the session's UTC zone — so watermarks,
    * `window()`, and `unix_micros` behave identically for every input
    * flavor, batch and stream alike. Columns absent or already
    * TIMESTAMP pass through untouched. */
  private def normTs(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c) &&
          d.schema(c).dataType == org.apache.spark.sql.types.TimestampNTZType)
        d.withColumn(c, col(c).cast("timestamp"))
      else d
    }

  /** Tumbling-window counts/sums per event type. Watermark bounds state:
    * late events beyond `watermark` are dropped, windows finalize and emit
    * (append mode), so state size is O(active windows), not O(stream). */
  def tumblingAgg(eventsIn: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val events = normTs(eventsIn, "ts")
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))
  }

  /** CHAINED stateful aggregations in ONE streaming query — Spark 4's
    * multiple-stateful-operator support: 5-minute tumbling per-user counts
    * re-aggregated into hourly rollups DOWNSTREAM IN THE SAME QUERY, event
    * time propagated through `window_time` (the window's end − 1 µs, so a
    * window ending exactly on the hour rolls into the hour it covers).
    * Before Spark 3.4 this took two queries with an intermediate sink and
    * two sets of exactly-once bookkeeping; chained, one watermark bounds
    * BOTH operators' state and the rollup inherits end-to-end exactly-once.
    * State: O(active 5-min windows · users) + O(active hours) — both
    * watermark-evicted. */
  def chainedWindowsAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    normTs(events, "ts")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("c5"))
      .groupBy(window(window_time(col("window")), "1 hour"))
      .agg(count(lit(1)).as("n_user_windows"), sum(col("c5")).as("total_events"))
      .select(col("window.start").as("hour_start"),
        col("n_user_windows"), col("total_events"))

  /** DISTINCT users per tumbling window — the "hourly unique visitors"
    * query, as the OTHER chained-stateful-operator pair ([[
    * chainedWindowsAgg]] chains agg→agg; this chains DEDUP→agg): a
    * stateful `dropDuplicates` keyed on (user, window) admits each user's
    * first event per window, and the downstream windowed count — exact
    * distinct, no approx sketch — sees exactly one row per (user,
    * window). ONE watermark bounds both operators' state: dedup state is
    * O(active users per in-flight window), agg state O(in-flight
    * windows), both evicted as event time passes. The same code runs
    * batch (dropDuplicates = exact distinct) and stream — the twin
    * contract every x_stream query keeps. */
  def distinctUsersPerWindow(events: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    normTs(events, "ts")
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id"), window(col("ts"), width).as("w"))
      .dropDuplicates("user_id", "w")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("distinct_users"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("distinct_users"))

  /** Laplace-smoothed reference histogram for [[driftPsiStream]]: per
    * event_type, the 10-bin probability vector of `value` over a STATIC
    * reference corpus — `q[b] = (c_b + 1)/(N + 10)`, bins
    * `clamp(⌊value/50⌋, 0, 9)`. |types| rows of 10 doubles: KB-sized by
    * construction, always broadcastable. */
  def referenceHistogram(events: DataFrame): DataFrame = {
    val cnt = events.select(col("event_type"),
        least(greatest(floor(col("value") / 50).cast("int"), lit(0)), lit(9)).as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
    cnt.groupBy("event_type")
      .agg(map_from_entries(collect_list(struct(col("bin"), col("c")))).as("cm"),
        sum(col("c")).as("n"))
      .select(col("event_type"), expr(
        "transform(sequence(0, 9), b -> (coalesce(element_at(cm, b), 0L) + 1.0D) / (n + 10.0D))")
        .as("q"))
  }

  /** STREAMING distribution-drift monitor: per tumbling window and
    * event_type, the population-stability index of the window's `value`
    * distribution against a static reference histogram
    * ([[referenceHistogram]]) — the data-quality tripwire a continuously
    * ingesting training pipeline runs in-flight ("did this hour's data
    * shift?"), alerting per window instead of per offline audit.
    *
    * The third chained-stateful-pair shape: agg→agg like
    * [[chainedWindowsAgg]], but the second aggregate FOLDS the per-bin
    * counts into a map column (`map_from_entries(collect_list(…))` — at
    * most 10 entries per group, bounded by construction), and the PSI is
    * then pure scalar algebra: a higher-order `aggregate` over the
    * 10-bin grid against the BROADCAST reference vector. Missing bins
    * fall out of `coalesce(element_at(cm, b), 0)` — no grid join, no
    * third stateful operator. One watermark bounds both aggs' state;
    * the stream side never shuffles more than (window, type, bin)
    * count rows. Same body runs batch for the `x_stream_psi` oracle. */
  def driftPsiStream(eventsIn: DataFrame, refProbs: DataFrame,
      width: String = "1 day", watermark: String = "2 hours"): DataFrame = {
    val events = normTs(eventsIn, "ts")
    val cnt = events
      .withWatermark("ts", watermark)
      .select(window(col("ts"), width).as("w"), col("event_type"),
        least(greatest(floor(col("value") / 50).cast("int"), lit(0)), lit(9)).as("bin"))
      .groupBy(col("w"), col("event_type"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val hist = cnt.groupBy(col("w"), col("event_type"))
      .agg(map_from_entries(collect_list(struct(col("bin"), col("c")))).as("cm"),
        sum(col("c")).as("n"))
    hist.join(broadcast(refProbs), Seq("event_type"))
      .select(col("w.start").as("window_start"), col("event_type"),
        round(expr(
          """aggregate(sequence(0, 9), 0D, (acc, b) ->
            |  acc + ((coalesce(element_at(cm, b), 0L) + 1.0D) / (n + 10.0D)
            |           - element_at(q, b + 1))
            |      * ln((coalesce(element_at(cm, b), 0L) + 1.0D) / (n + 10.0D)
            |           / element_at(q, b + 1)))""".stripMargin), 6).as("psi"))
  }

  /** STREAMING changelog materialization — the update-mode twin of the
    * batch `x_cdc_apply` window pipeline: per key, keep the LAST writer's
    * value (latest `(ts, event_id)` wins) and the op count, and suppress
    * keys whose latest op is a delete.
    *
    * Formulated as ONE declarative keyed aggregation (`max_by` over the
    * `(ts, event_id)` struct + `count`), not a window: aggregations
    * incrementally maintain per-key state under update mode, so every
    * micro-batch emits the refreshed row for the keys it touched — exactly
    * a changelog-materialized table. The delete/ upsert split is a post-agg
    * filter on the carried op, so tombstoned keys drop out of the
    * materialized view the moment a delete becomes their latest op. Batch
    * and stream share this body (the watermark is a no-op in batch); state
    * is one struct per live key, never event-sized. */
  def cdcMaterialize(eventsIn: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val events = normTs(eventsIn, "ts")
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"))
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("op"), col("value")), struct(col("ts"), col("event_id"))).as("last"),
        count(lit(1)).as("n_ops"))
      .filter(col("last.op") =!= "D")
      .select(col("user_id"), col("last.value").as("last_value"), col("n_ops"))
  }

  /** STREAMING top-k per window: the k most frequent event types of each
    * event-time window, ranked (count DESC, type ASC).
    *
    * The chained agg→agg stateful-pair shape again ([[driftPsiStream]]):
    * per-(window, type) counts, then a second keyed aggregate FOLDS each
    * window's type counts into one bounded array — `slice(array_sort(...),
    * 1, k)` over structs whose first field is the NEGATED count, so the
    * ascending struct sort IS (count DESC, type ASC) and only k entries
    * survive per window. The explode back to ranked rows is stateless
    * post-processing on k-sized arrays. One watermark bounds both
    * aggregates' state; nothing downstream of the first aggregate is ever
    * bigger than (windows × types). Same body runs batch for the oracle. */
  def topKPerWindow(eventsIn: DataFrame, k: Int = 3, width: String = "1 day",
      watermark: String = "2 hours"): DataFrame = {
    val events = normTs(eventsIn, "ts")
    val cnt = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    cnt
      .groupBy(col("w"))
      .agg(slice(array_sort(collect_list(
        struct((-col("cnt")).as("nc"), col("event_type")))), 1, k).as("top"))
      .select(col("w.start").as("window_start"), posexplode(col("top")))
      .select(col("window_start"), col("col.event_type").as("event_type"),
        (-col("col.nc")).as("cnt"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Sliding windows (width/slide) — each event lands in width/slide windows. */
  def slidingAgg(events: DataFrame, width: String = "1 hour", slide: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    normTs(events, "ts")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Batch gap-based sessionization: per user, a new session starts when
    * the gap to the previous event exceeds `gapMinutes`. The batch mirror
    * of [[sessionize]] (and of Structured Streaming's `session_window`):
    * lag → gap flag → running sum = session ordinal → aggregate. All
    * window frames are per-user and ordered by (ts, event_id) so results
    * are deterministic; gap arithmetic in exact microseconds
    * (`unix_micros`) for cross-engine parity.
    *
    * Scale shape: two per-user window functions + one hash aggregate, all
    * partitioned by user_id — a single shuffle of the events (AQE handles
    * hot users via skew splitting). */
  def sessionizeBatch(eventsIn: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val events = normTs(eventsIn, "ts")
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val flagged = events
      .withColumn("gap", graft.functions.TimeCols.eventMicros(col("ts"))
        - lag(graft.functions.TimeCols.eventMicros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > gapMicros, 1).otherwise(0))
    flagged
      .withColumn("session_seq",
        sum(col("new_sess")).over(byUser.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
  }

  /** Per-user sessionization with custom state (mapGroupsWithState). With
    * `idleTimeoutMs > 0` a processing-time timeout is armed: a user idle
    * that long has their session emitted one final time and the state
    * REMOVED — state is bounded by ACTIVE users, not all users ever seen
    * (the production posture at scale). With the default 0 no timeout is
    * armed (NoTimeout): state lives for the query's lifetime — demo/test
    * mode, where the engine otherwise busy-triggers timeout-check batches
    * and `processAllAvailable` never settles. */
  def sessionize(events: Dataset[EventRow], idleTimeoutMs: Long = 0L)(
      implicit spark: SparkSession): Dataset[SessionSummary] = {
    import spark.implicits._
    val timeoutConf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionSummary, SessionSummary](timeoutConf) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionSummary]) =>
          if (state.hasTimedOut) {
            // timeout invocation: rows is empty, state is present — emit the
            // closed session once more and expire the state
            val last = state.get
            state.remove()
            last
          } else {
            val batch = rows.toSeq
            val prev = state.getOption
            val minTs = (prev.map(_.session_start) ++ batch.map(_.ts)).minBy(_.getTime)
            val maxTs = (prev.map(_.session_end) ++ batch.map(_.ts)).maxBy(_.getTime)
            val next = SessionSummary(
              userId,
              prev.map(_.n_events).getOrElse(0L) + batch.size,
              prev.map(_.total_value).getOrElse(0.0) + batch.map(_.value).sum,
              minTs, maxTs)
            state.update(next)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            next
          }
      }
  }

  /** Stream-stream interval join (view→click attribution): every click
    * pairs with the SAME user's views in the preceding `maxDelayMinutes`.
    *
    * In streaming, BOTH sides carry a watermark and the join condition
    * bounds event time in both directions — exactly what lets the engine
    * expire buffered rows: once the click-side watermark passes
    * `view_ts + maxDelay`, that view can never match a future click and
    * its state is evicted. State is O(events inside the delay window per
    * user), not O(stream) — without the time bound a stream-stream inner
    * join buffers both sides forever. The same body runs in batch
    * (watermarks are a no-op there), which is what the `x_stream_join`
    * oracle row checks; MemoryStream parity is in EventStreamsSpec.
    *
    * `delay_us` is exact integer microseconds (hash-safe cross-engine). */
  def intervalJoin(viewsIn: DataFrame, clicksIn: DataFrame,
      maxDelayMinutes: Int = 30, watermark: String = "2 hours"): DataFrame = {
    val views = normTs(viewsIn, "ts"); val clicks = normTs(clicksIn, "ts")
    val v = views.select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    v.join(c,
        col("v_user") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr(s"interval $maxDelayMinutes minutes"))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        (graft.functions.TimeCols.eventMicros(col("click_ts"))
          - graft.functions.TimeCols.eventMicros(col("view_ts"))).as("delay_us"))
  }

  /** Stream-stream LEFT OUTER interval join — [[intervalJoin]] plus the
    * unmatched side: a view with NO same-user click inside the delay
    * window emits exactly once with null click columns. In streaming that
    * null row may only surface after the click-side watermark passes
    * `view_ts + maxDelay` (earlier, a matching click could still arrive) —
    * so the SAME time bound that evicts join state also supplies the
    * null-emission deadline; outer correctness and bounded state are one
    * mechanism. The batch twin (watermarks no-op) is the `x_stream_outer`
    * oracle row; MemoryStream parity incl. the late-null case is in
    * EventStreamsSpec. */
  def intervalJoinOuter(viewsIn: DataFrame, clicksIn: DataFrame,
      maxDelayMinutes: Int = 30, watermark: String = "2 hours"): DataFrame = {
    val views = normTs(viewsIn, "ts"); val clicks = normTs(clicksIn, "ts")
    val v = views.select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    v.join(c,
        col("v_user") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr(s"interval $maxDelayMinutes minutes"),
        "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        (graft.functions.TimeCols.eventMicros(col("click_ts"))
          - graft.functions.TimeCols.eventMicros(col("view_ts"))).as("delay_us"))
  }

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * against a STATIC dimension (no watermark needed — the static side is
    * not evolving state, it's re-read/broadcast per batch; only the stream
    * side is unbounded). The standard shape for attaching profile/catalog
    * attributes to an event stream at scale: broadcast the dim, never
    * shuffle the stream. Same body runs in batch for the `x_stream_enrich`
    * oracle row. */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey))

  /** Streaming EXACT dedup — the streaming form of `Dedup.exactDedup`:
    * only the first event per `keyCols` ever reaches the sink; later
    * duplicates (same batch or any later batch) are suppressed by the
    * state store. Built on Spark's stateful `dropDuplicates`, with the
    * watermark bounding state: a key older than the watermark can be
    * evicted because a duplicate arriving later than `watermark` would be
    * dropped as late anyway. Without the watermark the state grows with
    * DISTINCT keys forever — the same unbounded-state trap as an
    * unbounded stream-stream join. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    normTs(events, "ts").withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** Bounded-state dedup for redeliveries whose event time JITTERS between
    * attempts (a retried producer re-stamps the payload): dedup on the
    * BUSINESS key alone via `dropDuplicatesWithinWatermark`, which
    * [[dedupStream]]'s (key, ts) identity cannot catch — the jittered copy
    * has a different ts and sails through. State holds each key only until
    * the watermark passes its first-seen event time plus the delay, so
    * memory is bounded by keys ACTIVE within one watermark window, not by
    * all distinct keys ever — the difference between a dedup that survives
    * a month of uptime at 100 TB/day and one that OOMs. */
  def dedupStreamJittered(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    normTs(events, "ts").withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  private def toMicros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private def fromMicros(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** STREAMING as-of join — the temporal-join form of
    * [[graft.ops.AsOfJoin]]: each probe event (`probeType`) is enriched,
    * per user, with the latest ref event (`refType`) at-or-before its
    * event time. The batch engines (Spark window form, the custom
    * AsOfJoinExec, DuckDB `ASOF LEFT JOIN`) answer this over data at rest;
    * this answers it continuously over a live stream.
    *
    * Mechanics (`flatMapGroupsWithState`, event-time timeout):
    *  - Incoming rows buffer into per-key state, BOTH sides tolerant of
    *    out-of-order arrival up to the watermark delay.
    *  - A probe is emitted only once the watermark passes its event time —
    *    at that point no ref with an earlier timestamp can still arrive
    *    (later ones would be dropped as late), so the match is final.
    *    Emission is an O(|probes|+|refs|) two-pointer merge over the
    *    ts-sorted buffers, the same carry discipline as AsOfJoinExec.
    *  - State then prunes to: unmatured probes (bounded by the watermark
    *    delay) + refs at/after the watermark + ONE carry ref below it.
    *    Per-key state is O(in-flight window) plus a single carry row —
    *    the temporal-join state bound (one "current version" per key),
    *    NOT O(stream history).
    *  - An event-time timeout re-wakes the key when the watermark passes
    *    its oldest pending probe, so maturation doesn't wait for new data
    *    on that key.
    *
    * Refs sharing one (user, ts) collapse to the max event_id (its value
    * via the same row) on ingest — the deterministic tie the oracle mirrors
    * with `max(event_id)` / `max_by(value, event_id)`.
    *
    * The same body runs in BATCH (single invocation per key, no watermark →
    * everything matures immediately), which is what the `x_stream_asof`
    * oracle row checks against DuckDB's native ASOF LEFT JOIN; MemoryStream
    * parity incl. cross-batch/out-of-order arrival is in EventStreamsSpec. */
  def asOfStream(events: Dataset[EventRow], probeType: String = "click",
      refType: String = "view", watermark: String = "2 hours")(
      implicit spark: SparkSession): Dataset[AsOfMatch] = {
    import spark.implicits._

    // collapse equal-ts refs to max event_id; keep the list ts-sorted
    def normRefs(refs: List[(Long, Long, Double)]): List[(Long, Long, Double)] =
      refs.groupBy(_._1).map { case (_, same) => same.maxBy(_._2) }
        .toList.sortBy(r => (r._1, r._2))

    // emit matured probes (ts < wm) against the sorted refs; prune state
    def flush(st: AsOfState, wmMicros: Long): (List[AsOfMatch], AsOfState) = {
      val (matured, pending) = st.probes.partition(_._1 < wmMicros)
      val refs = st.refs // kept sorted by normRefs
      val out = scala.collection.mutable.ListBuffer.empty[AsOfMatch]
      var i = 0
      var carry: Option[(Long, Long, Double)] = None
      matured.sortBy(p => (p._1, p._2)).foreach { case (pTs, pId) =>
        while (i < refs.length && refs(i)._1 <= pTs) { carry = Some(refs(i)); i += 1 }
        out += (carry match {
          case Some((rTs, rId, rVal)) =>
            AsOfMatch(pId, -1L, fromMicros(pTs), Some(rId), Some(rVal), Some(pTs - rTs))
          case None => AsOfMatch(pId, -1L, fromMicros(pTs), None, None, None)
        })
      }
      // refs a future probe could still need: everything at/after the
      // watermark, plus the single latest one below it (the carry)
      val (live, old) = refs.partition(_._1 >= wmMicros)
      val kept = (old.lastOption.toList ++ live).sortBy(r => (r._1, r._2))
      (out.toList, AsOfState(pending, kept))
    }

    events
      // Column (not lambda) predicate: pushes `event_type IN (...)` into
      // the source scan instead of deserializing every row to check it
      .filter(col("event_type").isin(probeType, refType))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[AsOfState]) =>
          val prev = state.getOption.getOrElse(AsOfState(Nil, Nil))
          val incoming = rows.toSeq
          val newProbes = incoming.collect {
            case e if e.event_type == probeType => (toMicros(e.ts), e.event_id) }
          val newRefs = incoming.collect {
            case e if e.event_type == refType => (toMicros(e.ts), e.event_id, e.value) }
          val merged = AsOfState(prev.probes ++ newProbes,
            normRefs(prev.refs ++ newRefs))
          // batch mode has no watermark (getCurrentWatermarkMs throws):
          // everything matures in the one invocation → exact batch as-of
          val wmMicros =
            try state.getCurrentWatermarkMs() * 1000L
            catch { case _: UnsupportedOperationException => Long.MaxValue }
          val (out, next) = flush(merged, wmMicros)
          if (next.probes.isEmpty && next.refs.isEmpty) state.remove()
          else {
            state.update(next)
            // re-wake when the watermark passes the oldest pending probe
            if (wmMicros != Long.MaxValue && next.probes.nonEmpty)
              state.setTimeoutTimestamp(next.probes.map(_._1).min / 1000L + 1L)
          }
          out.map(_.copy(user_id = userId)).iterator
      }
  }

  /** Per-type volume baseline for [[anomalyStream]]: mean/stddev of the
    * per-(day, type) event counts — a KB stats frame computed over the
    * reference corpus and broadcast into the live stream. */
  def anomalyBaseline(events: DataFrame): DataFrame =
    normTs(events, "ts")
      .groupBy(to_date(date_trunc("day", col("ts"))).as("d"), col("event_type"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .groupBy("event_type")
      .agg(avg(col("cnt")).as("mu"), stddev_samp(col("cnt")).as("sigma"))

  /** STREAMING volume-anomaly alerts: tumbling per-(window, type) counts
    * z-scored against the broadcast baseline, emitting only windows where
    * |z| crosses `threshold`. ONE stateful aggregate (the windowed count,
    * watermark-bounded); the baseline join is stream-static against a KB
    * frame and the z algebra is stateless — the monitor shape where the
    * corpus-sized stream never shuffles twice. z is rounded to 4dp BEFORE
    * the threshold compare so the alert boundary is engine-stable. The
    * same body runs in batch — the `x_stream_anomaly` oracle row. */
  def anomalyStream(eventsIn: DataFrame, baseline: DataFrame,
      width: String = "1 day", watermark: String = "1 day",
      threshold: Double = 1.0): DataFrame = {
    val events = normTs(eventsIn, "ts")
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .select(to_date(col("window.start")).as("day"), col("event_type"), col("cnt"))
      .join(broadcast(baseline), "event_type")
      .withColumn("z", round((col("cnt") - col("mu")) / col("sigma"), 4))
      .filter(abs(col("z")) > threshold)
      .select(col("day"), col("event_type"), col("cnt").cast("long").as("cnt"),
        col("z"))
  }

  /** STREAMING exponential smoothing — the continuous form of the
    * `x_ewma` batch query: per user, each event's truncated-FIR EWMA over
    * the `k−1` preceding values (decay `d` per step, renormalized over the
    * taps that exist), emitted EXACTLY ONCE when the watermark makes its
    * position in the sequence final.
    *
    * Mechanics (same buffered-maturity discipline as [[asOfStream]]):
    * events buffer per user until the watermark passes them; matured
    * events replay in (ts, event_id) order against a trailing-value list
    * capped at k−1 — per-key state is O(watermark window) + k−1 doubles,
    * NOT O(stream history), which is exactly why the batch form uses a
    * truncated FIR instead of the unbounded recursive EWMA. The arithmetic
    * replays the batch Column fold term-for-term (left-to-right adds,
    * `math.pow` taps, Spark's BigDecimal HALF_UP 6dp round), so streaming
    * output is bit-identical to the window query. Batch mode (no
    * watermark) matures everything in the single invocation — the
    * `x_stream_ewma` oracle row, sharing x_ewma's SQL text. */
  def ewmaStream(events: Dataset[EventRow], k: Int = 8, d: Double = 0.7,
      watermark: String = "2 hours")(
      implicit spark: SparkSession): Dataset[EwmaOut] = {
    import spark.implicits._

    def ewmaOf(value: Double, tail: List[Double]): Double = {
      var num = value
      var den = 1.0
      var i = 1
      while (i < k) {
        if (i <= tail.length) {
          num += tail(i - 1) * math.pow(d, i)
          den += math.pow(d, i)
        } else {
          num += 0.0 // the batch form's coalesce(lag, 0) * pow term
        }
        i += 1
      }
      java.math.BigDecimal.valueOf(num / den)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[EwmaState]) =>
          val prev = state.getOption.getOrElse(EwmaState(Nil, Nil))
          val incoming = rows.map(e => (toMicros(e.ts), e.event_id, e.value)).toList
          val wmMicros =
            try state.getCurrentWatermarkMs() * 1000L
            catch { case _: UnsupportedOperationException => Long.MaxValue }
          val (matured, pending) =
            (prev.pending ++ incoming).partition(_._1 < wmMicros)
          var tail = prev.tail
          val out = matured.sortBy(e => (e._1, e._2)).map { case (_, id, v) =>
            val e = EwmaOut(id, userId, ewmaOf(v, tail))
            tail = (v :: tail).take(k - 1)
            e
          }
          if (pending.isEmpty && tail.isEmpty) state.remove()
          else {
            state.update(EwmaState(pending, tail))
            if (wmMicros != Long.MaxValue && pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1L)
          }
          out.iterator
      }
  }

  /** STREAMING conversion funnel — the continuous form of the
    * `x_funnel_steps` batch query: per user, the first view, the first
    * click strictly after it, and the first purchase strictly after that,
    * each emitted EXACTLY ONCE as a `(user_id, stage, stage_ts)` row the
    * moment the watermark makes it final.
    *
    * Mechanics (same buffered-maturity discipline as [[asOfStream]]):
    * events buffer per user until the watermark passes them — at that
    * point no earlier event can arrive, so replaying the matured events
    * in (ts, event_id) order makes "first view" = min view ts exactly,
    * and each stage assignment is FINAL on emission (append-mode
    * correct; no retraction needed even when a late view retroactively
    * requalifies an earlier-buffered click, because neither had matured).
    * State is the unmatured buffer (bounded by the watermark delay) plus
    * three stage timestamps; an event-time timeout re-wakes the user
    * when the watermark passes their oldest buffered event. Completed
    * funnels drop their state entirely. Batch mode (no watermark)
    * matures everything in the single invocation — the `x_stream_funnel`
    * oracle row. */
  def funnelStages(events: Dataset[EventRow],
      viewType: String = "view", clickType: String = "click",
      purchaseType: String = "purchase", watermark: String = "2 hours")(
      implicit spark: SparkSession): Dataset[FunnelStage] = {
    import spark.implicits._
    events
      .filter(col("event_type").isin(viewType, clickType, purchaseType))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelStage](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(Nil, None, None, None))
          val merged = prev.copy(buffered = prev.buffered ++
            rows.map(e => (toMicros(e.ts), e.event_id, e.event_type)))
          val wmMicros =
            try state.getCurrentWatermarkMs() * 1000L
            catch { case _: UnsupportedOperationException => Long.MaxValue }
          val (matured, pending) = merged.buffered.partition(_._1 < wmMicros)
          var (v, c, p) = (merged.v, merged.c, merged.p)
          val out = scala.collection.mutable.ListBuffer.empty[FunnelStage]
          matured.sortBy(e => (e._1, e._2)).foreach { case (ts, _, tpe) =>
            if (tpe == viewType && v.isEmpty) {
              v = Some(ts); out += FunnelStage(userId, "1_view", fromMicros(ts))
            } else if (tpe == clickType && c.isEmpty && v.exists(ts > _)) {
              c = Some(ts); out += FunnelStage(userId, "2_click", fromMicros(ts))
            } else if (tpe == purchaseType && p.isEmpty && c.exists(ts > _)) {
              p = Some(ts); out += FunnelStage(userId, "3_purchase", fromMicros(ts))
            }
          }
          if (wmMicros == Long.MaxValue) {
            state.remove() // batch mode: the one invocation saw everything
          } else {
            // completed funnels keep a TOMBSTONE (stage marks, no buffer):
            // removing state entirely would let a later event restart the
            // funnel and re-emit stage rows. A completed user costs three
            // Options — the irreducible attribution state.
            val kept = if (p.isDefined) Nil else pending
            state.update(FunnelState(kept, v, c, p))
            if (kept.nonEmpty)
              state.setTimeoutTimestamp(kept.map(_._1).min / 1000L + 1L)
          }
          out.iterator
      }
  }

  /** File-source streaming read of an events directory (parquet), schema
    * locked to the batch table. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Start a windowed aggregation into an in-memory sink (tests/demos). */
  def startToMemory(agg: DataFrame, queryName: String): StreamingQuery =
    agg.writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Complete()).start()

  /** Land an append-mode stream (e.g. a watermarked windowed aggregate) as
    * parquet through the BUILT-IN file sink: exactly-once via the sink's
    * `_spark_metadata` transaction log + the checkpoint's WAL — a batch
    * replayed after a crash re-commits the same file set, and readers only
    * see files recorded in the log. */
  def startToParquet(agg: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    agg.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()

  /** Same landing through `foreachBatch`, the programmable-sink surface:
    * each micro-batch overwrites its own `batch=<id>/` subdirectory, so a
    * batch replayed after restart rewrites the SAME directory instead of
    * appending duplicates — idempotent writes + checkpoint offsets =
    * exactly-once output. (`foreachBatch` is where production pipelines do
    * merges/upserts; directory-per-batch is the minimal idempotent form.) */
  def startForeachBatchParquet(agg: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** Read back everything [[startForeachBatchParquet]] has landed. */
  def readForeachBatchOutput(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch")

  /** Streaming ADMISSION CONTROL with a GROWING corpus — the streaming
    * form of [[graft.llm.Dedup.dedupAgainst]], i.e. continuous-crawl
    * ingestion: each micro-batch is (1) exact-deduped within itself
    * (min-id per identical text), (2) admitted against the corpus AS OF
    * this batch — exact md5 + LSH near-dup, one-directional — and (3) its
    * survivors are appended to the corpus as partition `inc=<batchId>`,
    * so a later increment duplicating an earlier admitted document is
    * rejected. `foreachBatch` is the right vehicle: admission is
    * inherently a per-increment BATCH decision (the candidate aggregation
    * inside dedupAgainst would be unbounded state in a pure streaming
    * plan), and the sink contract gives exactly-once — each batch
    * OVERWRITES its own partition directory and reads the corpus
    * EXCLUDING that partition, so a replayed batch reproduces the same
    * admission decision instead of rejecting itself or double-admitting.
    * At 100 TB the per-batch corpus re-read is the md5 key set and the
    * signature index, never documents (see dedupAgainst's scaladoc); both
    * are exactly what a production pipeline keeps as standing tables. */
  def admitIncrements(stream: DataFrame, corpusDir: String, idCol: String,
      textCol: String, threshold: Double, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val firstPerText = org.apache.spark.sql.expressions.Window
            .partitionBy(col(textCol)).orderBy(col(idCol))
          val deduped = batch
            .withColumn("__rn", row_number().over(firstPerText))
            .filter(col("__rn") === 1).drop("__rn")
          val corpus = spark.read.parquet(corpusDir)
            .filter(col("inc") =!= lit(batchId.toString)).drop("inc")
          graft.llm.Dedup.dedupAgainst(deduped, corpus, idCol, textCol, threshold)
            .write.mode("overwrite").parquet(s"$corpusDir/inc=$batchId")
        }
      }
      .start()

  /** Read the admitted corpus (seed + all admitted increments). */
  def admittedCorpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(corpusDir).drop("inc")

  /** Streaming APPEND into a catalog (DSv2) table through `foreachBatch` —
    * the "stream lands in a governed table" shape: each micro-batch runs
    * the connector's two-phase-commit write via `writeTo(table).append()`,
    * so readers of the catalog identifier see whole batches or nothing.
    *
    * Replay protection: appends are not idempotent, so the table directory
    * carries a `_last_batch` marker (written by atomic rename AFTER the
    * data commit); a replayed batch with id ≤ marker is SKIPPED. The
    * remaining window — a crash between data commit and marker rename
    * re-appends that one batch on recovery — is exactly the gap a
    * transactional catalog closes by recording the batch id inside the
    * table commit itself; documented rather than hidden. */
  def startCatalogAppend(events: DataFrame, table: String, tableDir: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val marker = new java.io.File(tableDir, "_last_batch")
        val last =
          if (marker.exists())
            new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
              .trim.toLong
          else -1L
        if (batchId > last && !batch.isEmpty) {
          batch.toDF().writeTo(table).append()
          val tmp = new java.io.File(tableDir, s"_last_batch.tmp$batchId")
          java.nio.file.Files.write(tmp.toPath, batchId.toString.getBytes("UTF-8"))
          java.nio.file.Files.move(tmp.toPath, marker.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
        }
      }
      .start()

  /** Keyed MERGE/upsert through `foreachBatch` — the pattern production
    * pipelines run against a mutable serving table: each micro-batch of
    * (key, value) UPDATES holds the latest aggregate per key (Update output
    * mode), and the batch function merges it into the table as
    * "new rows win, untouched keys survive".
    *
    * Without a transactional table format, the merge is
    * read-current → anti-join out the updated keys → union the updates →
    * write to a VERSIONED directory → atomically flip a pointer file.
    * Re-running a batch after a crash rewrites the same version directory
    * and re-flips the pointer to the same content — idempotent, so
    * checkpoint replay keeps exactly-once table state (proven by the
    * restart test in EventStreamsSpec). Readers resolve the pointer and see
    * one complete version, never a half-written directory. At scale the
    * versioned-dir + pointer pair is exactly what table formats (Delta/
    * Iceberg) industrialize; the anti-join is the MERGE. */
  def startForeachBatchUpsert(updates: DataFrame, keyCol: String,
      tableDir: String, checkpointDir: String): StreamingQuery =
    updates.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val current = readUpsertTable(spark, tableDir)
          val merged = current match {
            case Some(cur) =>
              cur.join(batch.select(col(keyCol)), Seq(keyCol), "left_anti")
                .unionByName(batch.toDF())
            case None => batch.toDF()
          }
          val versionDir = s"$tableDir/v=$batchId"
          merged.write.mode("overwrite").parquet(versionDir)
          // atomic pointer flip: the table IS whatever _CURRENT names
          val tmp = new java.io.File(tableDir, s"_CURRENT.tmp$batchId")
          java.nio.file.Files.write(tmp.toPath,
            s"v=$batchId".getBytes("UTF-8"))
          java.nio.file.Files.move(tmp.toPath,
            new java.io.File(tableDir, "_CURRENT").toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
        }
      }
      .start()

  /** Streaming SCD Type-2 maintenance: each micro-batch of change rows
    * `(key, state, ts, tiebreak)` is applied to a versioned history table
    * via [[graft.ops.Scd.scd2Merge]] — the CDC-ingest shape production
    * dimensions run (change stream in, full attribute history out).
    *
    * Same versioned-dir + atomic `_CURRENT` pointer-flip storage as
    * [[startForeachBatchUpsert]], with one difference forced by SCD2
    * semantics: the merge base is the highest version STRICTLY BELOW the
    * incoming batchId, NOT the pointer. An upsert replayed onto its own
    * output is a no-op (last-write-wins per key), but an SCD2 batch
    * re-merged onto a table that already contains it would re-version its
    * own closed rows; pinning the base to `max{v : v < batchId}` makes a
    * checkpoint replay read the identical base and rewrite the identical
    * version — exactly-once table state (restart-parity test in
    * EventStreamsSpec). */
  def startForeachBatchScd2(changes: DataFrame, key: String, state: String,
      ts: String, tiebreak: String, tableDir: String,
      checkpointDir: String): StreamingQuery =
    changes.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val merged = scd2VersionBelow(spark, tableDir, batchId) match {
            case Some(hist) =>
              graft.ops.Scd.scd2Merge(hist, batch.toDF(), key, state, ts, tiebreak)
            case None =>
              graft.ops.Scd.scd2FromLog(batch.toDF(), key, state, ts, tiebreak)
          }
          merged.write.mode("overwrite").parquet(s"$tableDir/v=$batchId")
          val tmp = new java.io.File(tableDir, s"_CURRENT.tmp$batchId")
          java.nio.file.Files.write(tmp.toPath, s"v=$batchId".getBytes("UTF-8"))
          java.nio.file.Files.move(tmp.toPath,
            new java.io.File(tableDir, "_CURRENT").toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
        }
      }
      .start()

  /** Highest committed SCD2 version strictly below `below` — the
    * deterministic replay base (a crashed write of `v=below` itself is
    * simply overwritten on retry). Versions above can only exist for
    * checkpoint-committed batches, which are never replayed. */
  private def scd2VersionBelow(spark: SparkSession, tableDir: String,
      below: Long): Option[DataFrame] = {
    val vs = Option(new java.io.File(tableDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(_ < below)
    if (vs.isEmpty) None else Some(spark.read.parquet(s"$tableDir/v=${vs.max}"))
  }

  /** Resolve the `_CURRENT` pointer and read that version of the upsert
    * table; None before the first committed version. */
  def readUpsertTable(spark: SparkSession, tableDir: String): Option[DataFrame] = {
    val ptr = new java.io.File(tableDir, "_CURRENT")
    if (!ptr.exists()) None
    else {
      val v = new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim
      Some(spark.read.parquet(s"$tableDir/$v"))
    }
  }
}
