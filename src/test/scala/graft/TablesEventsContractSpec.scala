package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Schema contract for `Tables.events`: the driver's testdata generator has
  * shipped `events.ts` in three parquet flavors across regenerations —
  * TIMESTAMP(NANOS) (round ≤5), µs `isAdjustedToUTC=false` → TIMESTAMP_NTZ
  * (round 6 regeneration, which silently broke five queries), and plain µs
  * UTC. This spec pins the contract in ONE place: whatever flavor arrives,
  * `Tables.events` must resolve `ts` to `TimestampType` with identical epoch
  * microseconds. If a future regeneration introduces a fourth flavor, THIS
  * spec fails first, instead of six downstream query specs.
  */
class TablesEventsContractSpec extends SparkSpec {

  // 2024-01-01T00:00:00.123456Z and one second later — sub-millisecond
  // digits exercise the full µs precision through each decode path.
  private val micros = Seq(1704067200123456L, 1704067201123456L)

  /** Write `micros` into `dir/events.parquet` via Spark with `ts` cast to
    * the given SQL type (timestamp ↔ µs-UTC, timestamp_ntz ↔ µs-NTZ). */
  private def writeSpark(sqlType: String): String = {
    val dir = Files.createTempDirectory("events_contract").toString
    import spark.implicits._
    micros.zipWithIndex.toDF("us", "event_id")
      .select(col("event_id").cast("long"),
        org.apache.spark.sql.functions.expr("timestamp_micros(us)").cast(sqlType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Write `micros` (as nanos) into `dir/events.parquet` with a raw
    * parquet-java writer, annotated TIMESTAMP(NANOS) — the flavor Spark's
    * vectorized reader only accepts via `spark.sql.legacy.parquet.nanosAsLong`
    * (set in TestSpark), arriving as nanos-since-epoch LONG. */
  private def writeNanos(): String = {
    val dir = Files.createTempDirectory("events_contract_nanos").toString
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  optional int64 event_id;
        |  optional int64 ts (TIMESTAMP(NANOS,false));
        |}""".stripMargin)
    val writer = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/events.parquet"), new Configuration()))
      .withType(schema)
      .build()
    val factory = new SimpleGroupFactory(schema)
    micros.zipWithIndex.foreach { case (us, i) =>
      val g = factory.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", us * 1000L)
      writer.write(g)
    }
    writer.close()
    dir
  }

  private def check(dir: String, flavor: String): Unit = {
    val events = Tables(spark, dir).events
    assert(events.schema("ts").dataType == TimestampType,
      s"$flavor: ts must normalize to TimestampType, got ${events.schema("ts").dataType}")
    val got = events.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    assert(got == micros, s"$flavor: µs values drifted: $got vs $micros")
  }

  test("µs-UTC flavor resolves to TimestampType with exact µs") {
    check(writeSpark("timestamp"), "µs-UTC")
  }

  test("µs-NTZ flavor (round-6 regeneration) resolves to TimestampType with exact µs") {
    val dir = writeSpark("timestamp_ntz")
    // precondition: the fixture really is NTZ on disk, so this test would
    // fail if the writer silently wrote UTC µs instead
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == TimestampNTZType)
    check(dir, "µs-NTZ")
  }

  test("TIMESTAMP(NANOS) flavor resolves to TimestampType with exact µs") {
    check(writeNanos(), "ns")
  }

  test("canary: driver testdata date columns arrive as timestamp-ish types, not LongType") {
    // the round-6 events.ts break generalized: if a regeneration flips
    // l_shipdate / o_orderdate to TIMESTAMP(NANOS), the session's
    // nanosAsLong flag turns them into LongType and every date function
    // on them breaks downstream. Fail HERE, with the column named,
    // instead of in a scatter of query specs.
    val t = Tables(spark, "/root/testdata/sf0.001")
    Seq(t.lineitem.schema("l_shipdate"), t.orders.schema("o_orderdate"),
      t.events.schema("ts")).foreach { f =>
      val ok = f.dataType == TimestampType || f.dataType == TimestampNTZType
      assert(ok, s"${f.name}: ${f.dataType} — testdata regenerated with a new " +
        "parquet flavor; add a normalization case (see Tables.events)")
    }
  }
}
