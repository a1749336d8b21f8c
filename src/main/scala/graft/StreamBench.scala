package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Wall-clock probe of a TRUE streaming-engine path — the one family the
  * sf1 evidence lacked a row for (r11 verdict task 6). The per-round bench
  * times x_stream_tumbling's BATCH twin (same EventStreams.tumblingAgg
  * code, batch scan); this main drives the same operator through the
  * actual incremental machinery: Structured Streaming file source over a
  * multi-file copy of events.parquet, maxFilesPerTrigger=1 so the run
  * executes one micro-batch per file against the state store (checkpointed
  * offsets, watermark tracking, state-store commits per batch — none of
  * which the batch twin pays).
  *
  * Complete output mode so every window is emitted at termination and row
  * parity with the batch twin is assertable (append mode would hold the
  * final watermark-unexpired windows in state forever on a finite input —
  * the EventStreamsSpec sentinel problem). Complete keeps ALL windows in
  * state; that is the right shape for a parity probe on a bounded fixture,
  * while production jobs use append + watermark eviction (the registered
  * operators' documented posture).
  *
  * Prints ONE JSON line:
  *   {"metric":"stream_tumbling_engine","value":<stream_sec>,
  *    "batch_sec":<sec>,"micro_batches":<n>,"rows":<n>,"rows_match":bool,
  *    "sf":"<dir>"}
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1h sbt "runMain graft.StreamBench"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "8").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)

    // Untimed setup: the fixture ships events as ONE parquet file, which
    // would collapse the stream into a single micro-batch — split it so
    // the engine actually runs incrementally. Tables.events normalizes the
    // three driver ts flavors once, so the split copy is plain TIMESTAMP.
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    Tables(spark, sfDir).events.repartition(nFiles)
      .write.mode("overwrite").parquet(s"$tmp/events")
    val schema = spark.read.parquet(s"$tmp/events").schema
    val ckpt = s"$tmp/ckpt"

    val t0 = System.nanoTime()
    val q = graft.streaming.EventStreams.tumblingAgg(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$tmp/events"))
      .writeStream.format("memory").queryName("stream_bench")
      .outputMode("complete").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamSec = (System.nanoTime() - t0) / 1e9
    // batch COUNT from the final progress's batchId, not
    // recentProgress.length — the latter is capped at
    // spark.sql.streaming.numRecentProgressUpdates (default 100) and
    // would silently saturate above ~100 files (ADVICE r12)
    val batches = Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L)
    val rows = spark.table("stream_bench").count()

    val tb = System.nanoTime()
    val batchRows = graft.streaming.EventStreams
      .tumblingAgg(Tables(spark, sfDir).events).count()
    val batchSec = (System.nanoTime() - tb) / 1e9

    def r3(v: Double) = math.round(v * 1000) / 1000.0
    spark.stop()
    // remove the temp source/checkpoint tree — a probe main must not
    // accumulate one events copy per run in /tmp (ADVICE r12)
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => try java.nio.file.Files.delete(f)
            catch { case _: Throwable => () })
      }
    }
    rmTree(java.nio.file.Paths.get(tmp))
    println(s"""{"metric":"stream_tumbling_engine","value":${r3(streamSec)},"unit":"sec","batch_sec":${r3(batchSec)},"micro_batches":$batches,"rows":$rows,"rows_match":${rows == batchRows},"n_files":$nFiles,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
