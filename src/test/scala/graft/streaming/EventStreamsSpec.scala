package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, lit, round, sum}
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  val rows = Seq(
    EventRow(1L, ts("2024-01-01 10:05:00"), 100L, "click", 1.5),
    EventRow(2L, ts("2024-01-01 10:55:00"), 100L, "click", 2.5),
    EventRow(3L, ts("2024-01-01 11:05:00"), 101L, "click", 3.0),
    EventRow(4L, ts("2024-01-01 10:20:00"), 101L, "view", 4.0),
    EventRow(5L, ts("2024-01-01 12:40:00"), 100L, "view", 5.0))

  test("streaming tumbling agg through MemoryStream equals the batch agg") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val query = EventStreams.startToMemory(
      EventStreams.tumblingAgg(stream.toDF(), "1 hour", "2 hours"), "tumbling_test")
    stream.addData(rows: _*)
    query.processAllAvailable()
    val streamed = spark.table("tumbling_test").collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
    query.stop()
    val batch = EventStreams.tumblingAgg(rows.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(streamed === batch)
    assert(batch((ts("2024-01-01 10:00:00"), "click")) === ((2L, 4.0)))
  }

  test("sliding windows assign each event to width/slide windows") {
    import spark.implicits._
    val out = EventStreams.slidingAgg(rows.toDF()).collect()
    // event 1 at 10:05 → windows [09:30,10:30) and [10:00,11:00)
    val clickWindows = out.filter(_.getString(2) == "click").map(_.getTimestamp(0).toString).toSet
    assert(clickWindows.contains("2024-01-01 09:30:00.0"))
    assert(clickWindows.contains("2024-01-01 10:00:00.0"))
  }

  test("stream-stream interval join through MemoryStream equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      EventRow(10L, ts("2024-01-01 10:00:00"), 100L, "view", 0.0),
      EventRow(11L, ts("2024-01-01 11:00:00"), 101L, "view", 0.0))
    val clicks = Seq(
      EventRow(20L, ts("2024-01-01 10:20:00"), 100L, "click", 1.0), // +20m → match
      EventRow(21L, ts("2024-01-01 12:30:00"), 100L, "click", 1.0), // +2h30 → out of bound
      EventRow(22L, ts("2024-01-01 10:50:00"), 101L, "click", 1.0), // before the view
      EventRow(23L, ts("2024-01-01 11:10:00"), 101L, "click", 1.0), // +10m → match
      EventRow(24L, ts("2024-01-01 11:00:00"), 102L, "click", 1.0)) // user without views
    val vStream = MemoryStream[EventRow]
    val cStream = MemoryStream[EventRow]
    // stream-stream inner join requires Append output (no Complete mode)
    val query = EventStreams.intervalJoin(vStream.toDF(), cStream.toDF(), 120)
      .writeStream.format("memory").queryName("ssjoin_test")
      .outputMode("append").start()
    vStream.addData(views: _*)
    cStream.addData(clicks: _*)
    query.processAllAvailable()
    val streamed = spark.table("ssjoin_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    query.stop()
    val batch = EventStreams.intervalJoin(views.toDF(), clicks.toDF(), 120)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === batch)
    assert(batch === Set(
      (100L, 10L, 20L, 20L * 60 * 1000000),
      (101L, 11L, 23L, 10L * 60 * 1000000)))
  }

  test("stream-stream LEFT OUTER interval join: null row only after the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      EventRow(10L, ts("2024-01-01 10:00:00"), 100L, "view", 0.0), // will match
      EventRow(11L, ts("2024-01-01 10:00:00"), 101L, "view", 0.0)) // never matches
    val click = EventRow(20L, ts("2024-01-01 10:20:00"), 100L, "click", 1.0)
    val vStream = MemoryStream[EventRow]
    val cStream = MemoryStream[EventRow]
    val query = EventStreams.intervalJoinOuter(vStream.toDF(), cStream.toDF(),
        maxDelayMinutes = 30, watermark = "10 minutes")
      .writeStream.format("memory").queryName("ssouter_test")
      .outputMode("append").start()
    vStream.addData(views: _*)
    cStream.addData(click)
    query.processAllAvailable()
    // matched row is out; the unmatched view CANNOT emit yet — a click
    // inside its window could still arrive
    val early = spark.table("ssouter_test").collect()
    assert(early.map(_.getLong(1)).toSet === Set(10L), early.mkString(","))

    // advance the click watermark past view_ts + 30m (+10m delay):
    // the unmatched view's null row must now surface
    cStream.addData(EventRow(99L, ts("2024-01-01 12:00:00"), 999L, "click", 1.0))
    vStream.addData(EventRow(98L, ts("2024-01-01 12:00:00"), 998L, "view", 0.0))
    query.processAllAvailable()
    val late = spark.table("ssouter_test").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    query.stop()
    assert(late.contains((11L, -1L)), late.mkString(","))
    assert(late.contains((10L, 20L)))

    // batch twin: same body, watermarks no-op, nulls immediate
    val batch = EventStreams.intervalJoinOuter(views.toDF(), Seq(click).toDF(), 30)
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(batch === Set((10L, 20L), (11L, -1L)))
  }

  test("file-source stream: readEventStream windows a growing parquet directory") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    rows.take(3).toDF().withColumn("props", lit("{}"))
      .write.mode("append").parquet(dir)
    val q = EventStreams.startToMemory(
      EventStreams.tumblingAgg(EventStreams.readEventStream(spark, dir)), "file_stream_test")
    q.processAllAvailable()
    val afterFirst = spark.table("file_stream_test").agg(sum("cnt")).first().getLong(0)
    assert(afterFirst === 3L)
    // a new file lands; the stream picks it up incrementally
    rows.drop(3).toDF().withColumn("props", lit("{}"))
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    val afterSecond = spark.table("file_stream_test").agg(sum("cnt")).first().getLong(0)
    q.stop()
    assert(afterSecond === 5L)
  }

  test("watermark drops late events in append mode (state bounded, windows finalize)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val q = EventStreams.tumblingAgg(stream.toDF(), "1 hour", "1 hour")
      .writeStream.format("memory").queryName("watermark_test")
      .outputMode("append").start()
    // batch 1: two events in the 10:00 window
    stream.addData(
      EventRow(1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
      EventRow(2L, ts("2024-01-01 10:10:00"), 1L, "click", 2.0))
    q.processAllAvailable()
    // batch 2: event at 15:00 → watermark advances to 14:00; 10:00 window finalizes
    stream.addData(EventRow(3L, ts("2024-01-01 15:00:00"), 1L, "click", 3.0))
    q.processAllAvailable()
    // batch 3: LATE event for the already-finalized 10:00 window → dropped
    stream.addData(EventRow(4L, ts("2024-01-01 10:20:00"), 1L, "click", 100.0))
    q.processAllAvailable()
    val finalized = spark.table("watermark_test").collect()
      .map(r => r.getTimestamp(0).toString -> (r.getLong(3), r.getDouble(4))).toMap
    q.stop()
    // the 10:00 window emitted with ONLY the two on-time events
    assert(finalized("2024-01-01 10:00:00.0") === ((2L, 3.0)))
  }

  test("foreachBatch parquet sink: restart from checkpoint, sink equals batch, no dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString
    val stream = MemoryStream[EventRow]
    def start() = EventStreams.startForeachBatchParquet(
      EventStreams.tumblingAgg(stream.toDF(), "1 hour", "1 hour"), outDir, ckpt)
    // phase 1: three events, stop (nothing finalized yet — watermark at 10:05)
    val q1 = start()
    stream.addData(rows.take(3): _*)
    q1.processAllAvailable()
    q1.stop()
    // phase 2: RESTART from the same checkpoint; remaining events + a
    // sentinel that pushes the watermark past every real window
    val q2 = start()
    stream.addData(rows.drop(3): _*)
    q2.processAllAvailable()
    stream.addData(EventRow(99L, ts("2024-01-02 12:00:00"), 999L, "sentinel", 0.0))
    q2.processAllAvailable()
    q2.stop()
    val sunk = EventStreams.readForeachBatchOutput(spark, outDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4)))
    // exactly once: no (window, type) key appears twice across batch dirs
    assert(sunk.length === sunk.toMap.size)
    // and the landed content equals the batch aggregate over the same rows
    val batch = EventStreams.tumblingAgg(rows.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(sunk.toMap === batch)
  }

  test("stream-static enrich join equals the batch join (broadcast dim)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((100L, "IT"), (101L, "DE")).toDF("cust_id", "country")
    val stream = MemoryStream[EventRow]
    val query = EventStreams.enrich(stream.toDF(), dim, "user_id", "cust_id")
      .select(col("event_id"), col("country"))
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    stream.addData(rows: _*) // users 100, 101; no 102 in dim
    query.processAllAvailable()
    val streamed = spark.table("enrich_test").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    query.stop()
    val batch = EventStreams.enrich(rows.toDF(), dim, "user_id", "cust_id")
      .select(col("event_id"), col("country"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
    assert(batch === Set((1L, "IT"), (2L, "IT"), (5L, "IT"), (3L, "DE"), (4L, "DE")))
  }

  test("foreachBatch upsert: latest per-key state survives restart, untouched keys persist") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tableDir = java.nio.file.Files.createTempDirectory("graft_upsert_tbl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upsert_ckpt").toString
    val stream = MemoryStream[EventRow]
    // running (count, sum) per user in Update mode — each batch emits only
    // the keys it touched; the upsert must keep the rest
    def agg = stream.toDF().groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
    def start() = EventStreams.startForeachBatchUpsert(agg, "user_id", tableDir, ckpt)

    val q1 = start()
    stream.addData(rows.take(3): _*) // users 100 (×2), 101
    q1.processAllAvailable()
    q1.stop()
    val afterPhase1 = EventStreams.readUpsertTable(spark, tableDir).get.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(afterPhase1 === Map(100L -> ((2L, 4.0)), 101L -> ((1L, 3.0))))

    // RESTART from the same checkpoint: touch user 101 only; 100 must survive
    val q2 = start()
    stream.addData(rows.drop(3): _*) // 101 view, 100 view
    q2.processAllAvailable()
    q2.stop()
    val finalTable = EventStreams.readUpsertTable(spark, tableDir).get.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // equals the batch aggregate over ALL rows — exactly-once per key
    val batch = rows.toDF().groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(finalTable === batch)
  }

  test("streaming dedup suppresses duplicates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val query = EventStreams.dedupStream(stream.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode("append").start()
    stream.addData(rows.take(3): _*)
    query.processAllAvailable()
    // replay batch 1 (at-least-once source) + new rows, with an in-batch dup
    stream.addData(rows.take(3): _*)
    stream.addData(rows.drop(3) ++ rows.drop(3): _*)
    query.processAllAvailable()
    val streamed = spark.table("dedup_stream_test").collect()
      .map(_.getAs[Long]("event_id")).sorted
    query.stop()
    // every event exactly once, despite double delivery
    assert(streamed === rows.map(_.event_id).sorted)
  }

  test("dropDuplicatesWithinWatermark dedups JITTERED redeliveries on the business key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val query = EventStreams.dedupStreamJittered(stream.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_jitter_test")
      .outputMode("append").start()
    stream.addData(rows.take(3): _*)
    query.processAllAvailable()
    // redelivery with re-stamped timestamps (+1s): a (key, ts) dedup would
    // pass these through as "new" events; the business-key dedup must not
    val jittered = rows.take(3).map(r =>
      r.copy(ts = new Timestamp(r.ts.getTime + 1000)))
    stream.addData(jittered: _*)
    stream.addData(rows.drop(3): _*)
    query.processAllAvailable()
    val streamed = spark.table("dedup_jitter_test").collect()
      .map(_.getAs[Long]("event_id")).sorted
    query.stop()
    // every business key exactly once, despite jittered double delivery
    assert(streamed === rows.map(_.event_id).sorted)
  }

  test("catalog append sink: stream lands in a DSv2 table, survives restart, skips replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val warehouse = java.nio.file.Files.createTempDirectory("graft_scat").toString
    spark.conf.set("spark.sql.catalog.gsink", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsink.base", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsink.live")
    spark.sql("""CREATE TABLE gsink.live.ev
      |(event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    val tableDir = s"$warehouse/live/ev"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_scat_ck").toString

    def project(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("user_id"), col("event_type"), col("value"))

    val stream = MemoryStream[EventRow]
    val q1 = EventStreams.startCatalogAppend(project(stream.toDF()),
      "gsink.live.ev", tableDir, ckpt)
    stream.addData(rows.take(3): _*)
    q1.processAllAvailable()
    stream.addData(rows.drop(3): _*)
    q1.processAllAvailable()
    q1.stop()
    assert(spark.table("gsink.live.ev").count() === 5L)

    // restart on the SAME checkpoint: committed batches are not re-run
    val q2 = EventStreams.startCatalogAppend(project(stream.toDF()),
      "gsink.live.ev", tableDir, ckpt)
    q2.processAllAvailable()
    assert(spark.table("gsink.live.ev").count() === 5L)
    q2.stop()

    // the marker guard itself: a batch id at/below _last_batch is skipped
    // even if the engine re-delivers it (simulated with a fresh checkpoint,
    // which restarts batch ids at 0)
    val last = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(tableDir, "_last_batch").toPath), "UTF-8").trim.toLong
    assert(last >= 1L)
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_scat_ck2").toString
    val stream2 = MemoryStream[EventRow]
    val q3 = EventStreams.startCatalogAppend(project(stream2.toDF()),
      "gsink.live.ev", tableDir, ckpt2)
    stream2.addData(rows.take(2): _*) // arrives as batch 0 <= marker -> skipped
    q3.processAllAvailable()
    q3.stop()
    assert(spark.table("gsink.live.ev").count() === 5L)

    // exactly-once content, not just count: table equals the batch input
    val got = spark.table("gsink.live.ev").collect()
      .map(_.getAs[Long]("event_id")).sorted
    assert(got === rows.map(_.event_id).sorted)
  }

  test("built-in parquet file sink lands finalized windows exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_fsink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fsink_ckpt").toString
    val stream = MemoryStream[EventRow]
    val q = EventStreams.startToParquet(
      EventStreams.tumblingAgg(stream.toDF(), "1 hour", "1 hour"), outDir, ckpt)
    stream.addData(rows: _*)
    q.processAllAvailable()
    stream.addData(EventRow(99L, ts("2024-01-02 12:00:00"), 999L, "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()
    val sunk = spark.read.parquet(outDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4)))
    assert(sunk.length === sunk.toMap.size)
    val batch = EventStreams.tumblingAgg(rows.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(sunk.toMap === batch)
  }

  test("sessionize accumulates per-user state across micro-batches") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    val q = EventStreams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("update").start()
    stream.addData(rows.take(2): _*)
    q.processAllAvailable()
    stream.addData(rows.drop(2): _*)
    q.processAllAvailable()
    val sessions = spark.table("sessions_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    // latest update for user 100: 3 events totalling 9.0
    assert(sessions.contains((100L, 3L, 9.0)))
    assert(sessions.contains((101L, 2L, 7.0)))
  }

  test("sessionize idle timeout expires state: next event starts a FRESH session") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EventRow]
    // 200 ms idle timeout; with ProcessingTimeTimeout the engine triggers
    // continuously, so processAllAvailable never settles — poll the memory
    // sink with a deadline instead.
    val q = EventStreams.sessionize(stream.toDS(), idleTimeoutMs = 200L)
      .writeStream.format("memory").queryName("sessions_timeout_test")
      .outputMode("update").start()
    def await(pred: Set[(Long, Long, Double)] => Boolean): Set[(Long, Long, Double)] = {
      val deadline = System.currentTimeMillis + 30000
      var got = Set.empty[(Long, Long, Double)]
      while (!pred(got) && System.currentTimeMillis < deadline) {
        Thread.sleep(100)
        got = spark.table("sessions_timeout_test").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      }
      got
    }
    stream.addData(EventRow(1L, ts("2024-01-01 10:00:00"), 500L, "click", 1.0))
    assert(await(_.contains((500L, 1L, 1.0))).contains((500L, 1L, 1.0)))
    Thread.sleep(2000) // >> idle timeout: state expires and is removed
    stream.addData(EventRow(2L, ts("2024-01-01 10:01:00"), 500L, "click", 9.0))
    // fresh session: n_events restarts at 1 with ONLY the new value — had the
    // state survived, the update would read (500, 2, 10.0)
    val got = await(_.contains((500L, 1L, 9.0)))
    q.stop()
    assert(got.contains((500L, 1L, 9.0)))
    assert(!got.contains((500L, 2L, 10.0)))
  }

  test("sessionizeBatch splits on the inactivity gap, per user, ordinal sessions") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    // user 1: events at 0, 10, 50 min (gap 40 > 30 → split); user 2: one event
    val events = Seq(
      (1L, ts(0), 1L, "a", 1.0, "{}"),
      (2L, ts(10), 1L, "a", 2.0, "{}"),
      (3L, ts(50), 1L, "a", 4.0, "{}"),
      (4L, ts(5), 2L, "b", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.sessionizeBatch(events, gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getTimestamp(2), r.getTimestamp(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out.size === 3)
    assert(out((1L, 1L)) === ((ts(0), ts(10), 2L, 3.0)))  // first session: 2 events
    assert(out((1L, 2L)) === ((ts(50), ts(50), 1L, 4.0))) // split by the 40-min gap
    assert(out((2L, 1L)) === ((ts(5), ts(5), 1L, 8.0)))
  }

  test("streaming SCD2 sink: restart parity with the batch history rebuild") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tableDir = java.nio.file.Files.createTempDirectory("graft_scd2_tbl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_scd2_ckpt").toString
    // an in-order change log: users flip states, with a cross-batch no-op
    // (user 100 re-sends "click" at the start of phase 2)
    val phase1 = Seq(
      EventRow(1L, ts("2024-01-01 10:00:00"), 100L, "click", 0.0),
      EventRow(2L, ts("2024-01-01 10:10:00"), 101L, "view", 0.0),
      EventRow(3L, ts("2024-01-01 10:20:00"), 100L, "view", 0.0),
      EventRow(4L, ts("2024-01-01 10:30:00"), 100L, "click", 0.0))
    val phase2 = Seq(
      EventRow(5L, ts("2024-01-01 11:00:00"), 100L, "click", 0.0), // no-op
      EventRow(6L, ts("2024-01-01 11:10:00"), 100L, "error", 0.0),
      EventRow(7L, ts("2024-01-01 11:20:00"), 102L, "view", 0.0)) // new key
    val stream = MemoryStream[EventRow]
    def start() = EventStreams.startForeachBatchScd2(stream.toDF(),
      "user_id", "event_type", "ts", "event_id", tableDir, ckpt)

    val q1 = start()
    stream.addData(phase1: _*)
    q1.processAllAvailable()
    q1.stop()

    // RESTART from the same checkpoint
    val q2 = start()
    stream.addData(phase2: _*)
    q2.processAllAvailable()
    q2.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4))
    val streamed = EventStreams.readUpsertTable(spark, tableDir).get
      .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
      .collect().map(key).toSet
    val batch = graft.ops.Scd.scd2FromLog((phase1 ++ phase2).toDF(),
      "user_id", "event_type", "ts", "event_id")
      .collect().map(key).toSet
    assert(streamed === batch)
    // the phase-2 no-op click did NOT open a new version: user 100 has
    // click[10:00,10:20) view[10:20,10:30) click[10:30,11:10) error[11:10,inf)
    assert(streamed.count(_._1 == 100L) === 4)
  }

  test("file-source backfill is rate-limited: maxFilesPerTrigger bounds per-batch work") {
    // replaying a large directory through a stream must NOT load it in one
    // giant batch — per-trigger limits are what keep backfill memory flat
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_backfill").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_backfill_ck").toString
    (0 until 6).foreach { i =>
      Seq((i.toLong, i * 1.0)).toDF("event_id", "value")
        .write.parquet(s"$dir/chunk=$i")
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, value DOUBLE")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(s"$dir/chunk=*")
    var batches = 0
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!b.isEmpty) { assert(b.count() <= 2L); batches += 1 }; ()
      }.start()
    q.processAllAvailable(); q.stop()
    assert(batches >= 3, s"6 files at ≤2/trigger needs ≥3 batches, got $batches")
  }

  test("streaming as-of join: watermark-matured emission equals batch, refs carry across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val all = Seq(
      // batch 1 — user 100: ref then probes; probe 20 has no earlier ref
      EventRow(20L, ts("2024-01-01 09:50:00"), 100L, "click", 0.0), // → NULL ref
      EventRow(1L, ts("2024-01-01 10:00:00"), 100L, "view", 10.0),
      EventRow(21L, ts("2024-01-01 10:30:00"), 100L, "click", 0.0), // → ref 1
      // batch 2 — OUT-OF-ORDER ref older than probe 22 but inside the
      // watermark delay: must win over ref 1 for probe 22
      EventRow(2L, ts("2024-01-01 10:40:00"), 100L, "view", 20.0),
      EventRow(22L, ts("2024-01-01 10:45:00"), 100L, "click", 0.0), // → ref 2
      // equal-ts refs collapse to max event_id
      EventRow(3L, ts("2024-01-01 10:50:00"), 101L, "view", 1.0),
      EventRow(4L, ts("2024-01-01 10:50:00"), 101L, "view", 2.0),
      EventRow(23L, ts("2024-01-01 10:55:00"), 101L, "click", 0.0), // → ref 4
      // batch 3 — far-future event advances the watermark past everything
      EventRow(99L, ts("2024-01-02 00:00:00"), 999L, "view", 0.0))
    val batches = Seq(all.slice(0, 3), all.slice(3, 8), all.slice(8, 9))

    val stream = MemoryStream[EventRow]
    val q = EventStreams.asOfStream(stream.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("asof_stream_test")
      .outputMode("append").start()
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    val streamed = spark.table("asof_stream_test").as[AsOfMatch].collect()
      .map(m => m.probe_id -> ((m.ref_id, m.ref_value, m.lag_us))).toMap
    q.stop()

    assert(streamed(20L) === ((None, None, None)))
    assert(streamed(21L) === ((Some(1L), Some(10.0), Some(30L * 60 * 1000000))))
    // the out-of-order ref 2 (10:40) beat ref 1 (10:00) for probe 22 (10:45)
    assert(streamed(22L) === ((Some(2L), Some(20.0), Some(5L * 60 * 1000000))))
    // equal-ts tie → max event_id (4)
    assert(streamed(23L) === ((Some(4L), Some(2.0), Some(5L * 60 * 1000000))))

    // parity: streaming output == the same body run in batch
    val batch = EventStreams.asOfStream(all.toDS(), watermark = "1 hour")
      .collect().map(m => m.probe_id -> ((m.ref_id, m.ref_value, m.lag_us))).toMap
    assert(streamed === batch)
  }

  test("transformWithState running user stats: final streamed row equals batch aggregate") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store; scope the
    // provider switch to this query and restore after (shared session).
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[EventRow]
      val q = TwsUserStats.userStatsStream(stream.toDS())
        .writeStream.format("memory").queryName("tws_test")
        .outputMode("update").start()
      // three micro-batches — the ValueState must carry across all of them
      stream.addData(rows.take(2): _*); q.processAllAvailable()
      stream.addData(rows.slice(2, 4): _*); q.processAllAvailable()
      stream.addData(rows.drop(4): _*); q.processAllAvailable()
      val streamed = spark.table("tws_test").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      q.stop()
      val batch = TwsUserStats.userStatsBatch(rows.toDF()).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(streamed === batch)
      // user 100: events 1, 2, 5 → 150 + 250 + 500 cents, max 5.0
      assert(batch(100L) === ((3L, 900L, 5.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("chained stateful windows: 5-min per-user counts rolled to hourly in ONE query, batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      EventRow(1L, ts("2024-01-01 10:01:00"), 100L, "click", 1.0),
      EventRow(2L, ts("2024-01-01 10:02:00"), 100L, "click", 2.0),
      EventRow(3L, ts("2024-01-01 10:07:00"), 100L, "view", 3.0),
      EventRow(4L, ts("2024-01-01 10:03:00"), 101L, "click", 4.0),
      EventRow(5L, ts("2024-01-01 10:58:00"), 101L, "view", 5.0))
    val stream = MemoryStream[EventRow]
    // chained stateful operators demand APPEND mode — the inner windows
    // hand finalized rows to the outer aggregate as the watermark passes
    val q = EventStreams.chainedWindowsAgg(stream.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("chained_test")
      .outputMode("append").start()
    stream.addData(data: _*); q.processAllAvailable()
    // sentinel far past hour 10 pushes the watermark over BOTH operators'
    // deadlines: the 5-min windows finalize, then the hour containing them
    stream.addData(EventRow(9L, ts("2024-01-01 14:00:00"), 999L, "click", 0.0))
    q.processAllAvailable()
    val streamed = spark.table("chained_test").collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    q.stop()
    val batch = EventStreams.chainedWindowsAgg(data.toDF()).collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed === batch)
    // hour 10: 5-min windows (10:00,u100)=2, (10:05,u100)=1, (10:00,u101)=1,
    // (10:55,u101)=1 → 4 user-windows, 5 events
    assert(streamed(ts("2024-01-01 10:00:00")) === ((4L, 5L)))
  }

  test("distinct users per window: stream dedup→agg chain equals batch distinct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      EventRow(1L, ts("2024-01-01 10:01:00"), 100L, "click", 1.0),
      EventRow(2L, ts("2024-01-01 10:40:00"), 100L, "view", 2.0), // same user, same hour
      EventRow(3L, ts("2024-01-01 10:03:00"), 101L, "click", 3.0),
      EventRow(4L, ts("2024-01-01 11:05:00"), 100L, "click", 4.0), // same user, NEXT hour
      EventRow(5L, ts("2024-01-01 11:06:00"), 102L, "view", 5.0))
    val stream = MemoryStream[EventRow]
    val q = EventStreams.distinctUsersPerWindow(stream.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("distinct_test")
      .outputMode("append").start()
    // duplicates split ACROSS micro-batches: dedup state must carry over
    stream.addData(data.take(2): _*); q.processAllAvailable()
    stream.addData(data.drop(2): _*); q.processAllAvailable()
    stream.addData(EventRow(9L, ts("2024-01-01 14:00:00"), 999L, "click", 0.0))
    q.processAllAvailable()
    val streamed = spark.table("distinct_test").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
    q.stop()
    val batch = EventStreams.distinctUsersPerWindow(data.toDF()).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
    assert(streamed === batch)
    assert(streamed(ts("2024-01-01 10:00:00")) === 2L) // users 100, 101
    assert(streamed(ts("2024-01-01 11:00:00")) === 2L) // 100 counts AGAIN, + 102
  }

  test("chained stateful windows: straggler inside the inner grace after " +
      "the hourly rollup already saw the hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val early = Seq(
      EventRow(1L, ts("2024-01-01 10:01:00"), 100L, "click", 1.0),
      EventRow(2L, ts("2024-01-01 10:07:00"), 100L, "view", 2.0))
    val advance = EventRow(3L, ts("2024-01-01 11:00:00"), 101L, "click", 3.0)
    val straggler = EventRow(4L, ts("2024-01-01 10:52:00"), 102L, "click", 4.0)
    val stream = MemoryStream[EventRow]
    val q = EventStreams.chainedWindowsAgg(stream.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("chained_late_test")
      .outputMode("append").start()
    stream.addData(early: _*); q.processAllAvailable()
    // watermark → 10:50: hour 10's first finalized 5-min windows
    // ([10:00), [10:05)) flow into the hourly operator, which now holds
    // OPEN state for hour 10 — the hour has been "seen" downstream
    stream.addData(advance); q.processAllAvailable()
    // straggler at 10:52 is LATE (max ts 11:00) but >= the 10:50
    // watermark: the single end-to-end watermark must make the inner
    // operator accept it into the still-open [10:50,10:55) window AND the
    // downstream hourly state absorb the extra user-window — the
    // single-watermark contract through BOTH stateful operators
    stream.addData(straggler); q.processAllAvailable()
    // sentinel pushes the watermark past both operators' deadlines
    stream.addData(EventRow(9L, ts("2024-01-01 14:00:00"), 999L, "click", 0.0))
    q.processAllAvailable()
    val streamed = spark.table("chained_late_test").collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    q.stop()
    val batch = EventStreams
      .chainedWindowsAgg((early ++ Seq(advance, straggler)).toDF()).collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed === batch)
    // hour 10: (10:00,u100) (10:05,u100) (10:50,u102) → 3 user-windows,
    // 3 events — the straggler's window IS here; dropping it would give (2,2)
    assert(streamed(ts("2024-01-01 10:00:00")) === ((3L, 3L)))
    assert(streamed(ts("2024-01-01 11:00:00")) === ((1L, 1L)))
  }

  test("transformWithState sessionizer: event-time timers close sessions, batch parity") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val u100 = Seq(
        EventRow(1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0),
        EventRow(2L, ts("2024-01-01 10:10:00"), 100L, "click", 2.5),
        EventRow(3L, ts("2024-01-01 11:30:00"), 100L, "view", 4.0))
      val stream = MemoryStream[EventRow]
      val q = TwsSessionizer.sessionStream(
          stream.toDS().withWatermark("ts", "0 seconds").as[EventRow])
        .writeStream.format("memory").queryName("tws_sessions_test")
        .outputMode("append").start()
      // batch 1: two events 10 min apart — one open session
      stream.addData(u100.take(2): _*); q.processAllAvailable()
      // batch 2: 80-min gap — the new event opens session 2; the advancing
      // watermark (0s delay → 11:30) passes session 1's 10:40 deadline, so
      // its TIMER seals and emits it this batch
      stream.addData(u100(2)); q.processAllAvailable()
      // batch 3: sentinel user far in the future pushes the watermark past
      // session 2's gap deadline — its TIMER fires and emits it
      stream.addData(EventRow(9L, ts("2024-01-01 23:00:00"), 999L, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("tws_sessions_test").as[TwsSession].collect()
        .filter(_.user_id == 100L)
        .map(t => (t.session_start, t.session_end, t.n_events, t.total_value)).toSet
      q.stop()
      val batch = EventStreams.sessionizeBatch(u100.toDF(), gapMinutes = 30)
        .collect()
        .map(r => (r.getTimestamp(2), r.getTimestamp(3), r.getLong(4), r.getDouble(5)))
        .toSet
      assert(streamed === batch)
      assert(streamed.size === 2) // both u100 sessions closed; sentinel's open
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState sessionizer: out-of-order cross-batch event merges by interval") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Seq(
        EventRow(1L, ts("2024-01-01 10:00:00"), 200L, "click", 1.0),
        EventRow(2L, ts("2024-01-01 11:00:00"), 200L, "click", 2.0),
        EventRow(3L, ts("2024-01-01 10:20:00"), 200L, "view", 3.0)) // out of order
      val stream = MemoryStream[EventRow]
      // 2h watermark delay keeps the 10:20 straggler on-time in batch 2
      val q = TwsSessionizer.sessionStream(
          stream.toDS().withWatermark("ts", "2 hours").as[EventRow])
        .writeStream.format("memory").queryName("tws_ooo_test")
        .outputMode("append").start()
      stream.addData(evs.take(2): _*); q.processAllAvailable()
      // straggler at 10:20 arrives AFTER 11:00 — must merge into the
      // 10:00 session (within gap on its right side), not corrupt the
      // open 11:00 session; no session may be emitted before its seal
      stream.addData(evs(2)); q.processAllAvailable()
      stream.addData(EventRow(9L, ts("2024-01-01 23:50:00"), 999L, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("tws_ooo_test").as[TwsSession].collect()
        .filter(_.user_id == 200L)
        .map(t => (t.session_start, t.session_end, t.n_events, t.total_value)).toSet
      q.stop()
      val batch = EventStreams.sessionizeBatch(evs.toDF(), gapMinutes = 30)
        .collect()
        .map(r => (r.getTimestamp(2), r.getTimestamp(3), r.getLong(4), r.getDouble(5)))
        .toSet
      assert(streamed === batch)
      assert(streamed === Set(
        (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"), 2L, 4.0),
        (ts("2024-01-01 11:00:00"), ts("2024-01-01 11:00:00"), 1L, 2.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("funnelStages: streamed stage rows equal batch; late view retro-qualifies a buffered click; exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val evs = Seq(
      // user 100: click arrives FIRST (batch 1), the view that qualifies it
      // arrives later (batch 2) but with an EARLIER event time — both are
      // unmatured until the watermark passes, so the funnel still resolves
      // view → click in event-time order
      EventRow(2L, ts("2024-01-01 10:30:00"), 100L, "click", 1.0),
      EventRow(1L, ts("2024-01-01 10:00:00"), 100L, "view", 1.0),
      EventRow(3L, ts("2024-01-01 11:00:00"), 100L, "purchase", 1.0),
      // user 101: click BEFORE its view — must never count
      EventRow(4L, ts("2024-01-01 09:00:00"), 101L, "click", 1.0),
      EventRow(5L, ts("2024-01-01 09:30:00"), 101L, "view", 1.0),
      // user 102: view only
      EventRow(6L, ts("2024-01-01 10:10:00"), 102L, "view", 1.0))
    val stream = MemoryStream[EventRow]
    val q = EventStreams.funnelStages(stream.toDS(), watermark = "2 hours")
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode("append").start()
    stream.addData(evs(0), evs(3), evs(5)); q.processAllAvailable()
    stream.addData(evs(1), evs(2), evs(4)); q.processAllAvailable()
    // sentinel pushes the watermark past every buffered event
    stream.addData(EventRow(9L, ts("2024-01-02 23:50:00"), 999L, "view", 0.0))
    q.processAllAvailable()
    // second sentinel: matured state must NOT re-emit anything
    stream.addData(EventRow(10L, ts("2024-01-03 23:50:00"), 999L, "view", 0.0))
    q.processAllAvailable()
    val streamed = spark.table("funnel_test")
      .filter(col("user_id") < 999).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    q.stop()
    assert(streamed.length === streamed.distinct.length, "duplicate stage rows")
    val batch = EventStreams.funnelStages(evs.toDS()).collect()
      .map(s => (s.user_id, s.stage, s.stage_ts))
    assert(streamed.toSet === batch.toSet)
    assert(batch.toSet === Set(
      (100L, "1_view", ts("2024-01-01 10:00:00")),
      (100L, "2_click", ts("2024-01-01 10:30:00")),
      (100L, "3_purchase", ts("2024-01-01 11:00:00")),
      (101L, "1_view", ts("2024-01-01 09:30:00")), // the 09:00 click never counts
      (102L, "1_view", ts("2024-01-01 10:10:00"))))
  }

  test("driftPsiStream: streamed per-window PSI equals the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two days with DIFFERENT value mixes vs the overall reference: day 1
    // low values (bin 0), day 2 high values (bin 9) — nonzero PSI both days
    val data = Seq(
      EventRow(1L, ts("2024-01-01 10:00:00"), 100L, "click", 10.0),
      EventRow(2L, ts("2024-01-01 11:00:00"), 100L, "click", 20.0),
      EventRow(3L, ts("2024-01-01 12:00:00"), 101L, "click", 30.0),
      EventRow(4L, ts("2024-01-02 10:00:00"), 100L, "click", 460.0),
      EventRow(5L, ts("2024-01-02 11:00:00"), 101L, "click", 470.0),
      EventRow(6L, ts("2024-01-01 10:30:00"), 102L, "view", 100.0),
      EventRow(7L, ts("2024-01-02 10:30:00"), 102L, "view", 250.0))
    val ref = EventStreams.referenceHistogram(data.toDF()).localCheckpoint()
    val stream = MemoryStream[EventRow]
    // chained stateful aggs demand append mode: zero watermark delay + a
    // far-future sentinel finalize both operators' windows
    val q = EventStreams.driftPsiStream(stream.toDF(), ref, watermark = "0 seconds")
      .writeStream.format("memory").queryName("psi_test")
      .outputMode("append").start()
    // micro-batches split BY DAY: with a zero watermark delay, a day-1
    // straggler arriving after any day-2 event would be dropped as late
    val (day1, day2) = data.partition(_.ts.before(ts("2024-01-02 00:00:00")))
    stream.addData(day1: _*); q.processAllAvailable()
    stream.addData(day2: _*); q.processAllAvailable()
    stream.addData(EventRow(9L, ts("2024-01-05 00:00:00"), 999L, "click", 0.0))
    q.processAllAvailable()
    val streamed = spark.table("psi_test").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getDouble(2)).toMap
    q.stop()
    val batch = EventStreams.driftPsiStream(data.toDF(), ref).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(streamed === batch)
    // day-1 clicks sit in bin 0 where the click reference splits 3/2 over
    // bins 0 and 9 — drift must be strictly positive on both days
    assert(batch((ts("2024-01-01 00:00:00"), "click")) > 0.0)
    assert(batch((ts("2024-01-02 00:00:00"), "click")) > 0.0)
  }

  test("TIMESTAMP_NTZ input: tumbling + chained pair match the TIMESTAMP batch results") {
    // The round-6 testdata regeneration delivered events.ts as TIMESTAMP_NTZ
    // and broke every unix_micros/watermark site. The streaming operators
    // now normalize at the entry point (EventStreams.normTs); this pins the
    // parity contract: an NTZ stream (LocalDateTime encoder) must produce
    // byte-identical results — and a TIMESTAMP output schema — vs the same
    // rows as TIMESTAMP batch input.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ntzRows = rows.map(e => NtzEventRow(e.event_id,
      e.ts.toLocalDateTime, e.user_id, e.event_type, e.value))
    // precondition: the encoder really produces NTZ (else this test is vacuous)
    assert(ntzRows.toDF().schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)

    val stream = MemoryStream[NtzEventRow]
    val q1 = EventStreams.startToMemory(
      EventStreams.tumblingAgg(stream.toDF(), "1 hour", "2 hours"), "ntz_tumbling")
    // chained stateful operators demand APPEND mode (see the chained test
    // above): zero watermark delay + a far-future sentinel finalize both
    // operators' windows
    val q2 = EventStreams.chainedWindowsAgg(stream.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("ntz_chained")
      .outputMode("append").start()
    stream.addData(ntzRows: _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    val sentinel = NtzEventRow(9L,
      ts("2024-01-02 23:50:00").toLocalDateTime, 999L, "click", 0.0)
    stream.addData(sentinel)
    q1.processAllAvailable(); q2.processAllAvailable()
    val streamedTumbling = spark.table("ntz_tumbling").collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
    val streamedChained = spark.table("ntz_chained").collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    q1.stop(); q2.stop()
    // output schema is TIMESTAMP regardless of the input flavor
    assert(EventStreams.tumblingAgg(ntzRows.toDF()).schema("window_start").dataType ==
      org.apache.spark.sql.types.TimestampType)

    // tumbling runs Complete mode → its output includes the sentinel's
    // window; chained runs append → the sentinel's own (unfinalized) hour
    // never emits, so its batch twin excludes the sentinel (the same
    // comparison the TIMESTAMP chained test makes)
    val batchRows = rows :+ EventRow(9L, ts("2024-01-02 23:50:00"), 999L, "click", 0.0)
    val batchTumbling = EventStreams.tumblingAgg(batchRows.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
    val batchChained = EventStreams.chainedWindowsAgg(rows.toDF()).collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamedTumbling === batchTumbling)
    assert(streamedChained === batchChained)
  }

  test("windowed top-k through MemoryStream equals batch; k bounds and order hold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      EventRow(1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0),
      EventRow(2L, ts("2024-01-01 11:00:00"), 101L, "click", 1.0),
      EventRow(3L, ts("2024-01-01 12:00:00"), 102L, "click", 1.0),
      EventRow(4L, ts("2024-01-01 13:00:00"), 100L, "view", 1.0),
      EventRow(5L, ts("2024-01-01 14:00:00"), 101L, "view", 1.0),
      EventRow(6L, ts("2024-01-01 15:00:00"), 100L, "buy", 1.0),
      EventRow(7L, ts("2024-01-01 16:00:00"), 100L, "ship", 1.0), // 4th type: cut
      EventRow(8L, ts("2024-01-02 10:00:00"), 100L, "view", 1.0))
    val stream = MemoryStream[EventRow]
    val q = EventStreams.topKPerWindow(stream.toDF(), k = 3, watermark = "0 seconds")
      .writeStream.format("memory").queryName("topk_test")
      .outputMode("append").start()
    stream.addData(data: _*); q.processAllAvailable()
    stream.addData(EventRow(9L, ts("2024-01-05 00:00:00"), 999L, "click", 0.0))
    q.processAllAvailable()
    val streamed = spark.table("topk_test").collect()
      .map(r => (r.getTimestamp(0), r.getInt(3)) -> ((r.getString(1), r.getLong(2)))).toMap
    q.stop()
    val batch = EventStreams.topKPerWindow(data.toDF(), k = 3).collect()
      .map(r => (r.getTimestamp(0), r.getInt(3)) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(streamed === batch)
    // day 1: click 3, view 2, then buy/ship tie at 1 → 'buy' wins rank 3;
    // 'ship' is cut by k
    assert(batch((ts("2024-01-01 00:00:00"), 1)) === (("click", 3L)))
    assert(batch((ts("2024-01-01 00:00:00"), 2)) === (("view", 2L)))
    assert(batch((ts("2024-01-01 00:00:00"), 3)) === (("buy", 1L)))
    assert(!batch.values.exists(_._1 == "ship"))
  }

  test("CDC materialization: streaming last-writer-wins equals batch, deletes tombstone") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      EventRow(1L, ts("2024-01-01 10:00:00"), 100L, "click", 1.0),
      EventRow(2L, ts("2024-01-01 10:05:00"), 100L, "view", 2.0), // latest for 100
      EventRow(3L, ts("2024-01-01 10:01:00"), 101L, "click", 3.0))
    val batch2 = Seq(
      EventRow(4L, ts("2024-01-01 10:10:00"), 101L, "error", 4.0), // delete 101
      EventRow(5L, ts("2024-01-01 10:02:00"), 100L, "click", 9.0)) // LATE: not latest
    val stream = MemoryStream[EventRow]
    val q = EventStreams.cdcMaterialize(stream.toDF())
      .writeStream.format("memory").queryName("cdc_mat_test")
      .outputMode("complete").start()
    stream.addData(batch1: _*); q.processAllAvailable()
    val mid = spark.table("cdc_mat_test").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // after batch 1: both keys live, 100 at its latest value
    assert(mid === Map(100L -> ((2.0, 2L)), 101L -> ((3.0, 1L))))
    stream.addData(batch2: _*); q.processAllAvailable()
    val fin = spark.table("cdc_mat_test").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    q.stop()
    // delete became 101's latest op → key drops out of the materialized
    // view; 100's late arrival bumps n_ops but NOT the last value
    assert(fin === Map(100L -> ((2.0, 3L))))
    val batch = EventStreams.cdcMaterialize((batch1 ++ batch2).toDF()).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(fin === batch)
  }

  test("anomalyStream through MemoryStream equals the batch twin on finalized windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 3 quiet days + one 5x burst day for clicks, then an advancer day
    val evs = (0 until 3).flatMap { day =>
      (0 until 4).map(i => EventRow(day * 100L + i,
        ts(f"2024-01-0${day + 1} 10:0$i:00"), 1L, "click", 1.0))
    } ++ (0 until 20).map(i => EventRow(400L + i,
      ts(f"2024-01-04 10:${i}%02d:00"), 1L, "click", 1.0)) ++
      Seq(EventRow(999L, ts("2024-01-06 00:00:00"), 9L, "view", 0.0))
    val baseline = EventStreams.anomalyBaseline(evs.toDF())

    val stream = MemoryStream[EventRow]
    val q = EventStreams.anomalyStream(stream.toDF(), baseline,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("anomaly_test")
      .outputMode("append").start()
    stream.addData(evs: _*); q.processAllAvailable()
    val streamed = spark.table("anomaly_test").collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    q.stop()
    // the burst day alerts high; finalized quiet days alert low (|z|>1)
    assert(streamed.contains(("2024-01-04", "click")))
    assert(streamed(("2024-01-04", "click"))._1 === 20L)
    val batch = EventStreams.anomalyStream(evs.toDF(), baseline).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // every streamed alert matches batch exactly; batch may additionally
    // hold the unfinalized last window
    streamed.foreach { case (k, v) => assert(batch(k) === v) }
  }

  test("ewmaStream: matured FIR emission equals batch and the window formula; tail carries across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val all = Seq(
      // batch 1 — user 100's first three values
      EventRow(1L, ts("2024-01-01 10:00:00"), 100L, "view", 10.0),
      EventRow(2L, ts("2024-01-01 10:10:00"), 100L, "view", 20.0),
      EventRow(3L, ts("2024-01-01 10:20:00"), 100L, "view", 30.0),
      // batch 2 — OUT-OF-ORDER event inside the watermark delay: must slot
      // between 2 and 3 in the FIR sequence
      EventRow(4L, ts("2024-01-01 10:15:00"), 100L, "view", 40.0),
      EventRow(5L, ts("2024-01-01 10:30:00"), 100L, "view", 50.0),
      EventRow(6L, ts("2024-01-01 10:05:00"), 101L, "view", 5.0),
      // batch 3 — far-future event matures everything
      EventRow(99L, ts("2024-01-02 00:00:00"), 999L, "view", 0.0))
    val batches = Seq(all.slice(0, 3), all.slice(3, 6), all.slice(6, 7))

    val stream = MemoryStream[EventRow]
    val q = EventStreams.ewmaStream(stream.toDS(), k = 3, d = 0.5,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("ewma_stream_test")
      .outputMode("append").start()
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    val streamed = spark.table("ewma_stream_test").as[EwmaOut].collect()
      .map(e => e.event_id -> e.ewma).toMap
    q.stop()

    // hand-checked FIR values (k=3 taps, d=0.5), 6dp-rounded like the
    // operator: event 4 (10:15) sits between 2 and 3, so 3's taps are
    // (40, 20), not (20, 10)
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(streamed(1L) === 10.0)                            // no taps
    assert(streamed(2L) === r6((20.0 + 0.5 * 10.0) / 1.5))   // one tap
    assert(streamed(4L) === r6((40 + 0.5 * 20 + 0.25 * 10) / 1.75))
    assert(streamed(3L) === r6((30 + 0.5 * 40 + 0.25 * 20) / 1.75))
    assert(streamed(5L) === r6((50 + 0.5 * 30 + 0.25 * 40) / 1.75))

    // event 99 is the watermark-advancer: nothing after it matures it in
    // the stream, so parity holds on the matured set
    assert(streamed.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    val batch = EventStreams.ewmaStream(all.toDS(), k = 3, d = 0.5)
      .collect().map(e => e.event_id -> e.ewma).toMap
    assert(streamed === batch.filter { case (id, _) => id != 99L })

    // and both equal the batch WINDOW formulation (x_ewma's Column fold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val num = (1 until 3).map(k =>
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.lag(col("value"), k).over(w), lit(0.0))
          * math.pow(0.5, k))
      .foldLeft(col("value"))(_ + _)
    val den = (1 until 3).map(k =>
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.lag(col("value"), k).over(w).isNotNull,
          math.pow(0.5, k)).otherwise(0.0))
      .foldLeft(lit(1.0))(_ + _)
    val windowed = all.toDF()
      .select(col("event_id"), round(num / den, 6).as("ewma"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed === windowed.filter { case (id, _) => id != 99L })
  }
}

/** EventRow with a `LocalDateTime` event time — Spark encodes it as
  * TIMESTAMP_NTZ, the round-6 testdata flavor. */
final case class NtzEventRow(event_id: Long, ts: java.time.LocalDateTime,
    user_id: Long, event_type: String, value: Double)
