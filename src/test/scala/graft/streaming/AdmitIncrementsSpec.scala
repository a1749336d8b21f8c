package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

case class DocRow(doc_id: Long, text: String)

/** Streaming admission control ([[EventStreams.admitIncrements]]):
  * per-increment dedup against a corpus that GROWS with each batch's
  * survivors. */
class AdmitIncrementsSpec extends SparkSpec {
  import spark.implicits._

  val seedText = "the quick brown fox jumps over the lazy dog while the " +
    "calm cat sleeps near the warm stove tonight"
  val novelA = "streaming watermarks bound state by event time so the " +
    "store evicts keys the clock has passed entirely"
  val novelB = "columnar scans prune pages with zone maps before any " +
    "predicate runs over the decoded vectors at all"

  test("admitIncrements: exact/near corpus dups rejected, survivors grow the corpus") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("admit").toString
    val ckpt = Files.createTempDirectory("admit_ckpt").toString
    // seed corpus as partition inc=seed
    Seq(DocRow(1L, seedText)).toDF()
      .write.parquet(s"$dir/inc=seed")

    val stream = MemoryStream[DocRow]
    val query = EventStreams.admitIncrements(stream.toDF(), dir,
      "doc_id", "text", 0.5, ckpt)

    // batch 1: exact dup of seed + within-batch dup pair + novel A
    stream.addData(
      DocRow(10L, seedText), // exact dup of corpus -> rejected
      DocRow(11L, novelA), // novel -> admitted
      DocRow(12L, novelA)) // within-batch exact dup of 11 -> dropped
    query.processAllAvailable()
    val after1 = EventStreams.admittedCorpus(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(after1 === Set(1L, 11L))

    // batch 2: near dup of batch-1 SURVIVOR (one word changed) + novel B
    stream.addData(
      DocRow(20L, novelA.replace("entirely", "eventually")), // near dup of 11 -> rejected
      DocRow(21L, novelB)) // novel -> admitted
    query.processAllAvailable()
    query.stop()
    val after2 = EventStreams.admittedCorpus(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(after2 === Set(1L, 11L, 21L))
  }
}
