package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Hive-style partitioned tables on the graft-tsv connector: identity
  * `PARTITIONED BY` through the catalog, dynamic partition writes (tasks
  * route rows to `col=value/` dirs), and directory-index partition pruning
  * (the predicate is consumed by the scan and non-matching dirs never
  * become splits). */
class GraftTsvPartitionSpec extends SparkSpec {

  private lazy val warehouse = Files.createTempDirectory("graft_partcat").toString
  private lazy val registered: Unit = {
    spark.conf.set("spark.sql.catalog.graftp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftp.base", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftp.lake")
  }

  private def tsvScan(df: org.apache.spark.sql.DataFrame): GraftTsvScan =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec if b.scan.isInstanceOf[GraftTsvScan] =>
        b.scan.asInstanceOf[GraftTsvScan]
    }.get

  test("partitioned create + dynamic-partition insert lays out col=value dirs") {
    registered
    spark.sql(
      """CREATE TABLE graftp.lake.pev (id BIGINT, kind STRING, v DOUBLE)
        |PARTITIONED BY (kind)""".stripMargin)
    // partition spec persisted and reported back through the table API
    val cat = spark.sessionState.catalogManager.catalog("graftp")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("lake"), "pev"))
    assert(t.partitioning().map(_.toString).toSeq === Seq("identity(kind)"))

    spark.sql(
      """INSERT INTO graftp.lake.pev VALUES
        |  (1, 'click', 1.0), (2, 'view', 2.0), (3, 'click', 3.0),
        |  (4, 'buy', 4.0), (5, NULL, 5.0)""".stripMargin)

    val root = new File(s"$warehouse/lake/pev")
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("kind=__GRAFT_NULL__", "kind=buy", "kind=click", "kind=view"))
    // data files inside partition dirs do NOT repeat the partition column:
    // 2 data cells per row (id, v)
    val aFile = new File(root, "kind=click").listFiles()
      .filter(_.getName.endsWith(".tsv")).head
    val firstLine = Files.readAllLines(aFile.toPath).get(0)
    assert(firstLine.split("\t", -1).length === 2, firstLine)

    // full read reconstitutes partition values (incl. NULL sentinel)
    val back = spark.table("graftp.lake.pev")
    assert(back.count() === 5)
    assert(back.filter(col("kind").isNull).select("id").head.getLong(0) === 5L)
    assert(back.filter(col("kind") === "click").agg(sum("id")).head.getLong(0) === 4L)
  }

  test("equality and IN predicates prune partition dirs at split planning") {
    registered
    val all = tsvScan(spark.table("graftp.lake.pev"))
    assert(all.planInputPartitions().length >= 4) // one+ file per partition value

    val eq = tsvScan(spark.table("graftp.lake.pev").filter(col("kind") === "click"))
    // only files under kind=click/ become splits (file count per partition
    // depends on insert task layout — assert on partition VALUES, not files)
    assert(eq.planInputPartitions().nonEmpty)
    assert(eq.planInputPartitions().length < all.planInputPartitions().length)
    assert(eq.planInputPartitions().forall(
      _.asInstanceOf[TsvFileSplit].partVals == Seq("click")))
    assert(eq.description().contains("partitionFilters="))

    val in = tsvScan(spark.table("graftp.lake.pev")
      .filter(col("kind").isin("click", "buy")))
    assert(in.planInputPartitions().map(
      _.asInstanceOf[TsvFileSplit].partVals.head).toSet === Set("click", "buy"))

    // results are exact after pruning (the consumed filter needs no residual)
    assert(spark.table("graftp.lake.pev").filter(col("kind") === "click")
      .count() === 2)
  }

  test("non-partition predicates stay residual; null-safe semantics preserved") {
    registered
    val df = spark.table("graftp.lake.pev").filter(col("v") > 2.5)
    // v is not a partition column: nothing pruned, Spark filters above scan
    assert(tsvScan(df).planInputPartitions().length >= 4)
    assert(df.count() === 3)
    // IS NULL on the partition column is NOT consumed (only =/IN are);
    // results still correct through the residual path
    assert(spark.table("graftp.lake.pev").filter(col("kind").isNull).count() === 1)
  }

  test("INSERT OVERWRITE truncates data but keeps schema + partition spec") {
    registered
    spark.sql("INSERT OVERWRITE graftp.lake.pev VALUES (9, 'click', 9.0)")
    val back = spark.table("graftp.lake.pev")
    assert(back.count() === 1)
    assert(back.head.getLong(0) === 9L)
    // old partition dirs with no data are gone or empty; spec file survives
    assert(GraftTsv.readPartCols(s"$warehouse/lake/pev") === Seq("kind"))
    val root = new File(s"$warehouse/lake/pev")
    val liveParts = GraftTsv.committedPartFiles(s"$warehouse/lake/pev", Seq("kind"))
    assert(liveParts.map(_._1).toSet === Set(Seq("click")))
    assert(root.listFiles().exists(_.getName == "_schema.json"))
  }

  test("string partition values with path-hostile characters round-trip") {
    registered
    spark.sql(
      """CREATE TABLE IF NOT EXISTS graftp.lake.pesc (id BIGINT, tag STRING)
        |PARTITIONED BY (tag)""".stripMargin)
    val nasty = "a/b c=d\tx"
    spark.range(1).select((col("id") + 1).as("id"), lit(nasty).as("tag"))
      .writeTo("graftp.lake.pesc").append()
    val got = spark.table("graftp.lake.pesc").filter(col("id") === 1).head.getString(1)
    assert(got === nasty)
    // and the pruning path matches the escaped value too
    assert(spark.table("graftp.lake.pesc").filter(col("tag") === nasty).count() === 1)
  }
}
