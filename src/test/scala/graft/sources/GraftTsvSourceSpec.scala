package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class GraftTsvSourceSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_tsv_spec").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("flag", BooleanType)))

  private def sample() = {
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "plain", 1.5, true),
        Row(2L, "tab\there newline\nthere back\\slash", -0.25, false),
        Row(3L, null, null, null)),
      schema)
  }

  test("write/read roundtrip preserves values, nulls, and escaped strings") {
    val dir = tmpDir()
    sample().write.format("graft-tsv").option("path", dir).mode("append").save()
    val back = spark.read.format("graft-tsv").option("path", dir).load()
    assert(back.schema.fieldNames.toSeq === Seq("id", "name", "score", "flag"))
    val byId = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getString(1) === "tab\there newline\nthere back\\slash")
    assert(byId(2L).getDouble(2) === -0.25)
    assert(byId(3L).isNullAt(1) && byId(3L).isNullAt(2) && byId(3L).isNullAt(3))
    assert(back.count() === 3)
  }

  test("two-phase commit: temps invisible before commit, _SUCCESS gates reads") {
    val dir = tmpDir()
    sample().write.format("graft-tsv").option("path", dir).mode("append").save()
    val files = new File(dir).listFiles().map(_.getName).sorted
    // all temps were published; schema + success marker present
    assert(!files.exists(_.startsWith("_tmp-")), files.mkString(","))
    assert(files.contains("_SUCCESS") && files.contains("_schema.json"))
    assert(files.exists(f => f.startsWith("part-") && f.endsWith(".tsv")))
    // an orphaned temp (crashed attempt) is never exposed to readers
    Files.write(new File(dir, "_tmp-9-99.tsv").toPath, "junk\tx\t0\ttrue\n".getBytes)
    assert(spark.read.format("graft-tsv").option("path", dir).load().count() === 3)
    // without _SUCCESS the directory reads as uncommitted → empty
    new File(dir, "_SUCCESS").delete()
    assert(GraftTsv.committedFiles(dir).isEmpty)
  }

  test("writer abort removes its temp file") {
    val dir = tmpDir()
    Files.createDirectories(new File(dir).toPath)
    val w = new GraftTsvWriterFactory(dir, StructType(Seq(StructField("id", LongType))), Nil)
      .createWriter(0, 42L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(7L))
    w.abort()
    assert(new File(dir).listFiles().isEmpty)
  }

  test("overwrite truncates previously committed parts") {
    val dir = tmpDir()
    sample().write.format("graft-tsv").option("path", dir).mode("append").save()
    spark.range(5).select(col("id"), lit("x").as("name"),
        lit(0.0).as("score"), lit(true).as("flag"))
      .write.format("graft-tsv").option("path", dir).mode("overwrite").save()
    val back = spark.read.format("graft-tsv").option("path", dir).load()
    assert(back.count() === 5)
    assert(back.agg(max("id")).head.getLong(0) === 4L)
  }

  test("reads split per committed file and prune columns") {
    val dir = tmpDir()
    spark.range(100).repartition(4)
      .select(col("id"), concat(lit("row-"), col("id")).as("name"),
        lit(1.0).as("score"), lit(false).as("flag"))
      .write.format("graft-tsv").option("path", dir).mode("append").save()
    val df = spark.read.format("graft-tsv").option("path", dir).load().select("id")
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.asInstanceOf[GraftTsvScan]
    }.get
    assert(scan.planInputPartitions().length === 4)
    assert(scan.readSchema().fieldNames.toSeq === Seq("id"))
    assert(df.agg(sum("id")).head.getLong(0) === 4950L)
  }

  test("unsupported column types are rejected at write planning") {
    val dir = tmpDir()
    val err = intercept[Exception] {
      spark.range(1).select(array(lit(1)).as("a"))
        .write.format("graft-tsv").option("path", dir).mode("append").save()
    }
    assert(err.getMessage.contains("graft-tsv supports"))
  }
}
