package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class ScaleLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write + read prunes at the file index, results intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_spec").toString
    val df = (1 to 3000)
      .map(i => (i.toLong, Seq("click", "view", "error")(i % 3), i * 1.5))
      .toDF("id", "etype", "v")
    ScaleLayout.writePartitioned(df, dir, "etype")

    // hive layout on disk: one directory per partition value
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(subdirs === Set("etype=click", "etype=view", "etype=error"))

    val pruned = ScaleLayout.readPartitioned(spark, dir)
      .filter(col("etype") === "click")
    val rows = pruned.collect()
    // results identical to filtering the unpartitioned frame
    assert(rows.length === df.filter(col("etype") === "click").count())
    assert(rows.forall(_.getAs[String]("etype") == "click"))

    // the predicate must be a PartitionFilters entry on the scan (pruned
    // from the directory listing), NOT a data filter / row-group pushdown
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.metadata("PartitionFilters").contains("etype"),
      s"expected partition pruning, got: ${scan.metadata("PartitionFilters")}")
    // only the click partition's files are selected into the scan
    assert(scan.selectedPartitions.partitionCount === 1)
    assert(scan.relation.location.inputFiles.length.toLong > // full index: all dirs
      scan.selectedPartitions.totalNumberOfFiles) // scan: one dir
    assert(scan.selectedPartitions.toPartitionArray.forall(p =>
      java.net.URLDecoder.decode(p.urlEncodedPath, "UTF-8").contains("etype=click")))
  }
}
