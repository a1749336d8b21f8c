package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class GraftRangeSourceSpec extends SparkSpec {

  private def read(start: Long, end: Long, slices: Int) =
    spark.read.format("graft-range")
      .option("start", start.toString).option("end", end.toString)
      .option("slices", slices.toString)
      .load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): GraftRangeScan =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[GraftRangeScan]
    }.get

  test("full scan delivers the range with derived payloads") {
    val rows = read(5, 9, 3).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sortBy(_._1).toSeq ===
      Seq((5L, "row-5"), (6L, "row-6"), (7L, "row-7"), (8L, "row-8")))
  }

  test("range predicates are pushed and prune whole slices at planning") {
    val df = read(0, 100000, 32).filter(col("id") >= 2500 && col("id") < 7500)
    val scan = scanOf(df)
    // 32 slices of 3125: [2500,7500) touches slices 0,1,2 only
    val parts = scan.planInputPartitions()
    assert(parts.length === 3, s"expected 3 surviving slices, got ${parts.length}")
    // every surviving slice is clipped to the pushed interval
    assert(parts.map(_.asInstanceOf[RangeSlice]).forall(s => s.lo >= 2500 && s.hi <= 7500))
    assert(scan.description().contains("pushed=[2500,7500)"))
    // pushdown is exact: no Filter node survives above the scan
    val filters = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(filters.isEmpty, "pushed filters should not be re-evaluated above the scan")
    assert(df.count() === 5000)
  }

  test("non-range predicates stay residual and still evaluate correctly") {
    val df = read(0, 100, 4).filter(col("id") % 10 === 3 && col("id") < 50)
    // the modulo is residual; the < 50 prunes slices 2,3
    assert(scanOf(df).planInputPartitions().length === 2)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(3L, 13L, 23L, 33L, 43L))
  }

  test("column pruning reaches the reader's schema") {
    val df = read(0, 1000, 4).select("id")
    assert(scanOf(df).readSchema().fieldNames.toSeq === Seq("id"))
    assert(df.agg(sum("id")).head.getLong(0) === 499500L)
  }

  test("limit pushdown truncates the source interval — rows are never generated") {
    // LIMIT 10 after a pushed lower bound: the scan's interval collapses
    // to [5000, 5010) and only the overlapping slice survives planning
    val df = read(0, 1000000, 32).filter(col("id") >= 5000).limit(10)
    val scan = scanOf(df)
    assert(scan.description().contains("pushed=[5000,5010)"), scan.description())
    assert(scan.planInputPartitions().length === 1)
    assert(df.collect().map(_.getLong(0)).toSeq === (5000L until 5010L).toSeq)
  }

  test("scan executes COLUMNAR: batches feed the query, values and pushdown intact") {
    val df = read(0, 10000, 4).filter(col("id") >= 2000 && col("id") < 8000)
    val scanExec = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scanExec.supportsColumnar, "connector batches should flow columnar")
    // values identical to the row path's semantics, across batch boundaries
    assert(df.count() === 6000L)
    assert(df.agg(sum("id")).head.getLong(0) === (2000L until 8000L).sum)
    val sample = df.filter(col("id") === 4096).select("payload").head.getString(0)
    assert(sample === "row-4096")
  }

  test("runtime V2 filtering: the join's dim side prunes the connector scan at execution") {
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    // 1000-key dimension; the selective predicate keeps keys 500..509 only
    (0L until 1000L).map(k => (k, if (k >= 500 && k < 510) "pick" else "other"))
      .toDF("dk", "tag").write.mode("overwrite").parquet(dimDir)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false") // inspect the static plan
      val fact = read(0, 1000000, 64)
      val dim = spark.read.parquet(dimDir).filter(col("tag") === "pick")
      val joined = fact.join(dim, col("id") === col("dk")).select("id", "tag")
      val scans = joined.queryExecution.executedPlan.collect {
        case b: BatchScanExec if b.scan.isInstanceOf[GraftRangeScan] => b
      }
      assert(scans.nonEmpty)
      // a dynamic-pruning runtime filter was attached to the connector scan
      assert(scans.head.runtimeFilters.exists(_.toString.contains("dynamicpruning")),
        joined.queryExecution.executedPlan.toString.take(1500))
      assert(joined.collect().map(_.getLong(0)).sorted.toSeq === (500L until 510L).toSeq)
      // and the scan MATERIALIZED only the narrowed interval, not 1M rows
      val produced = scans.head.metrics("numOutputRows").value
      assert(produced <= 15625L, // one 64th slice; without pruning it'd be 1000000
        s"runtime filter should narrow the scan, produced $produced rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("aggregate pushdown: count/min/max/sum collapse to a one-row scan, no agg exec") {
    val df = read(0, 1000000, 64)
      .filter(col("id") >= 1000 && col("id") < 99000)
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"), sum(col("id")).as("total"))
    val plan = df.queryExecution.executedPlan.toString
    // COMPLETE pushdown: the aggregate node is gone from the physical plan
    assert(!plan.contains("HashAggregate"), plan.take(1500))
    assert(plan.contains("GraftRangeAggScan"), plan.take(1500))
    val r = df.collect().head
    val n = 98000L
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === 1000L)
    assert(r.getLong(2) === 98999L)
    assert(r.getLong(3) === (1000L + 98999L) * n / 2)
  }

  test("aggregate pushdown: empty interval yields count 0 and NULL min/max/sum") {
    val df = read(0, 1000, 8).filter(col("id") >= 500 && col("id") < 500)
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("min_id"),
        sum(col("id")).as("total"))
    val r = df.collect().head
    assert(r.getLong(0) === 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("aggregate pushdown declines grouped or non-id aggregates") {
    // GROUP BY payload: not pushable — plan keeps a real aggregate
    val grouped = read(0, 100, 4).groupBy(col("payload")).agg(count(lit(1)))
    assert(grouped.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(grouped.count() === 100L) // each payload unique
  }

  private def readBucketed(start: Long, end: Long, slices: Int, buckets: Int) =
    spark.read.format("graft-range")
      .option("start", start.toString).option("end", end.toString)
      .option("slices", slices.toString).option("buckets", buckets.toString)
      .load()

  test("GROUP BY bucket pushes down completely: per-residue closed forms, no agg exec") {
    val df = readBucketed(0, 1000000, 64, buckets = 7)
      .filter(col("id") >= 10 && col("id") < 1000)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"), sum(col("id")).as("total"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), plan.take(1500))
    assert(plan.contains("GraftRangeGroupedAggScan"), plan.take(1500))
    val got = df.collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // brute-force oracle over the same interval
    val want = (10L until 1000L).groupBy(id => (id % 7).toInt).map { case (b, ids) =>
      b -> ((ids.size.toLong, ids.min, ids.max, ids.sum))
    }
    assert(got === want)
  }

  test("bucket column reads correctly when NOT aggregated (derived id % buckets)") {
    val rows = readBucketed(0, 20, 4, buckets = 3)
      .select(col("id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows === (0L until 20L).map(id => id -> (id % 3).toInt).toMap)
  }

  test("grouped pushdown declines a second grouping column: plan keeps its aggregate") {
    val df = readBucketed(0, 100, 4, buckets = 5)
      .groupBy(col("bucket"), col("payload")).agg(count(lit(1)))
    assert(df.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(df.count() === 100L)
  }

  test("reported statistics let Catalyst auto-broadcast a small connector table") {
    // post-pushdown stats: 100 rows * 24B — far under the broadcast threshold
    val scan = scanOf(read(0, 1000000, 8).filter(col("id") < 100))
    val st = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(st.numRows().getAsLong === 100L)
    assert(st.sizeInBytes().getAsLong === 2400L)
    // un-hinted join against a parquet table: the connector side must be
    // chosen as the broadcast build side purely from its reported size
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"))
    val joined = events.join(
      read(0, 1000000, 8).filter(col("id") < 100), col("user_id") === col("id"))
    // (string match: the BHJ sits inside an un-finalized AdaptiveSparkPlan)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(plan.contains("BuildRight"), plan.take(1500))
  }

  private def grouped(start: Long, end: Long, buckets: Int = 8) =
    spark.read.format("graft-range")
      .option("start", start.toString).option("end", end.toString)
      .option("slices", "8").option("buckets", buckets.toString)
      .option("layout", "grouped")
      .load()

  test("layout=grouped plans one split per residue class, key on each split") {
    val scan = scanOf(grouped(3, 40))
    val parts = scan.planInputPartitions()
    assert(parts.length === 8)
    val keys = parts.collect { case b: BucketSlice => b.bucket }.toSet
    assert(keys === (0 until 8).toSet)
    // every split's rows must agree with its reported partition key
    parts.collect { case b: BucketSlice =>
      assert(b.first >= 3 && b.first % 8 === b.bucket && b.step === 8) }
    // and the scan reports the key-grouped layout
    val p = scan.outputPartitioning()
    assert(p.isInstanceOf[
      org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning])
    // data intact under the strided readers
    assert(grouped(3, 40).select("id").collect().map(_.getLong(0)).sorted
      === (3L until 40L).toArray)
  }

  test("storage-partitioned join: co-bucketed tables join + re-group with ZERO exchanges") {
    // both sides too big to broadcast (24 MB reported) — without SPJ this
    // plans SMJ behind two exchanges plus one more for the aggregate
    val a = grouped(0, 1000000)
    val b = grouped(500000, 1500000)
    val q = a.join(b, a("bucket") === b("bucket") && a("id") === b("id"))
      .groupBy(a("bucket")).agg(count(lit(1)).as("n"), sum(a("id")).as("sum_id"))
    val rows = q.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // overlap [500000, 1000000): 62500 ids per residue class
    assert(rows.length === 8)
    assert(rows.forall(_._2 === 62500L))
    assert(rows.map(_._3).sum === (500000L until 1000000L).sum)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("sliced layout still reports unknown partitioning (no SPJ claim)") {
    val p = scanOf(read(0, 1000, 4)).outputPartitioning()
    assert(p.isInstanceOf[
      org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning])
  }
}
