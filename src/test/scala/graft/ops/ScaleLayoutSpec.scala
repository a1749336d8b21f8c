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

  /** (min, max) of `key`'s statistics for every row group of every parquet
    * file under `dir`, straight from the footers. */
  private def rowGroupRanges(dir: String, key: String): Seq[(Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
      .flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          reader.getFooter.getBlocks.asScala.toSeq.map { block =>
            val chunk = block.getColumns.asScala
              .find(_.getPath.toDotString == key).get
            val st = chunk.getStatistics
            (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }
        } finally reader.close()
      }
  }

  test("sort-clustered write produces tight, disjoint row-group key ranges") {
    val base = java.nio.file.Files.createTempDirectory("graft_sorted_spec").toString
    // keys deliberately scattered so an unsorted write interleaves them
    val df = (1 to 20000).map(i => ((i * 7919L) % 20000, s"payload$i"))
      .toDF("k", "v")
    // small row groups so each file holds several
    spark.conf.set("parquet.block.size", 64 * 1024)
    try {
      df.coalesce(2).write.mode("overwrite").parquet(s"$base/unsorted")
      ScaleLayout.writeSorted(df, s"$base/sorted", "k", 4)
    } finally spark.conf.unset("parquet.block.size")

    val sorted = rowGroupRanges(s"$base/sorted", "k")
    val unsorted = rowGroupRanges(s"$base/unsorted", "k")
    assert(sorted.nonEmpty && unsorted.nonEmpty)
    // sorted: ranges are disjoint (no two row groups overlap), so a point/
    // range predicate matches few groups' [min,max] — the skipping precondition
    val s = sorted.sorted
    assert(s.zip(s.drop(1)).forall { case ((_, max1), (min2, _)) => max1 <= min2 },
      s"sorted row groups overlap: $s")
    // unsorted: every row group spans nearly the whole key domain — nothing
    // is skippable
    assert(unsorted.forall { case (mn, mx) => mx - mn > 15000L },
      s"expected full-domain unsorted row groups, got: $unsorted")
    // a point lookup's candidate row groups: all of them unsorted, one sorted
    val probe = 12345L
    assert(unsorted.count { case (mn, mx) => mn <= probe && probe <= mx } === unsorted.size)
    assert(sorted.count { case (mn, mx) => mn <= probe && probe <= mx } <= 1)
  }

  test("zValue interleaves bits with column 0 most significant per group") {
    import spark.implicits._
    // (x=0b11, y=0b01, bits=2) -> bits: x1 y1 x0 y0 = 1 0 1 1 = 11
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(ScaleLayout.zValue(2, col("x"), col("y"))).head.getLong(0)
    assert(z === 11L)
    // adjacent points differ in low z bits only: (2,2)=0b1100, (3,3)=0b1111
    val z2 = Seq((2L, 2L), (3L, 3L)).toDF("x", "y")
      .select(ScaleLayout.zValue(2, col("x"), col("y"))).collect().map(_.getLong(0))
    assert(z2.toSeq === Seq(12L, 15L))
  }

  test("z-ordered write keeps row-group ranges tight on BOTH columns") {
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_spec").toString
    // a scattered 128x128 grid: both dims uniformly hit
    val df = (1 to 20000)
      .map(i => ((i * 7919L) % 128, (i * 104729L) % 128, s"payload$i"))
      .toDF("x", "y", "v")
    spark.conf.set("parquet.block.size", 64 * 1024)
    try {
      ScaleLayout.writeSorted(df, s"$base/by_x", "x", 4)
      ScaleLayout.writeZOrdered(df, s"$base/zorder", 4, 7, "x", "y")
    } finally spark.conf.unset("parquet.block.size")

    def meanSpan(ranges: Seq[(Long, Long)]): Double =
      ranges.map { case (mn, mx) => (mx - mn).toDouble }.sum / ranges.size

    // single-column sort: x is tight but y spans ~the full domain in every
    // row group — a y predicate can skip almost nothing (threshold is
    // relative below; row-group boundary luck moves the mean a few units)
    val xSortY = rowGroupRanges(s"$base/by_x", "y")
    assert(meanSpan(xSortY) > 80.0, s"expected near-full-domain y spans, got $xSortY")

    // z-order: BOTH columns' spans are a fraction of the domain, so a box
    // predicate on (x, y) skips row groups via either column's footer stats
    val zX = rowGroupRanges(s"$base/zorder", "x")
    val zY = rowGroupRanges(s"$base/zorder", "y")
    assert(zX.size > 4, s"want several row groups, got ${zX.size}")
    assert(meanSpan(zX) < 96.0, s"z-order x spans too wide: $zX")
    assert(meanSpan(zY) < 96.0, s"z-order y spans too wide: $zY")
    // the load-bearing comparison: z-order tightens y RELATIVE to the
    // single-column sort, which cannot serve y at all
    assert(meanSpan(zY) * 1.15 < meanSpan(xSortY),
      s"z-order y (${meanSpan(zY)}) should be tighter than x-sort y (${meanSpan(xSortY)})")

    // results are layout-independent
    val back = spark.read.parquet(s"$base/zorder")
      .filter(col("x").between(32, 63) && col("y").between(32, 63)).count()
    val direct = df.filter(col("x").between(32, 63) && col("y").between(32, 63)).count()
    assert(back === direct)
  }

  test("manifest prunes non-overlapping files before the read; no false negatives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    val df = (1 to 4000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    ScaleLayout.writeSorted(df, dir, "k", 8) // disjoint k-ranges per file

    val manifest = ScaleLayout.buildManifest(spark, dir, "k")
    val rows = manifest.collect()
    assert(rows.length === ScaleLayout.listDataFiles(dir).length)
    assert(rows.map(_.getAs[Long]("rows")).sum === 4000L)

    // a narrow probe touches 1-2 of the 8 range files
    val hit = ScaleLayout.readSkipping(spark, dir, manifest, "k", 1000L, 1100L)
    val hitFiles = hit.select(input_file_name()).distinct().count()
    assert(hitFiles <= 2, s"expected ≤2 files opened, got $hitFiles")
    // no false negatives: the skipping read + residual filter == direct
    assert(hit.filter(col("k").between(1000, 1100)).count() === 101L)
    // empty overlap → empty result, no files read
    assert(ScaleLayout.readSkipping(spark, dir, manifest, "k", 100000L, 200000L)
      .count() === 0L)
  }

  test("copy-on-write delete rewrites only overlapping files; others keep their exact bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cow_spec").toString
    val df = (1 to 8000).map(i => (i.toLong, s"row-$i")).toDF("k", "v")
    ScaleLayout.writeSorted(df, dir, "k", 8) // ~disjoint 1k-wide ranges

    val before = ScaleLayout.listDataFiles(dir)
      .map(f => f.getName -> f.lastModified()).toMap
    // delete k ∈ [2500, 2600]: lives in 1-2 of the 8 range files
    val (rewritten, untouched) = ScaleLayout.deleteWhere(spark, dir, "k", 2500L, 2600L)
    assert(rewritten <= 2, s"locality: expected ≤2 affected files, got $rewritten")
    assert(rewritten + untouched === 8)

    // untouched files are bit-identical originals (same name, same mtime)
    val after = ScaleLayout.listDataFiles(dir)
      .map(f => f.getName -> f.lastModified()).toMap
    val survivorsOfBefore = before.keySet.intersect(after.keySet)
    assert(survivorsOfBefore.size === untouched)
    survivorsOfBefore.foreach(n => assert(before(n) === after(n), s"$n was touched"))

    // semantics: exactly the targeted rows are gone
    val back = spark.read.parquet(dir)
    assert(back.count() === 8000L - 101L)
    assert(back.filter(col("k").between(2500, 2600)).count() === 0L)
    assert(back.agg(sum("k")).head.getLong(0) ===
      (1L to 8000L).sum - (2500L to 2600L).sum)
  }

  test("copy-on-write merge rewrites only files containing update keys; upsert semantics exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_spec").toString
    val df = (1 to 8000).map(i => (i.toLong, s"row-$i")).toDF("k", "v")
    ScaleLayout.writeSorted(df, dir, "k", 8) // ~disjoint 1k-wide ranges

    val before = ScaleLayout.listDataFiles(dir)
      .map(f => f.getName -> f.lastModified()).toMap
    // batch: update 3 keys inside one range file, insert 2 brand-new keys
    val batch = Seq((3100L, "UPD"), (3200L, "UPD"), (3300L, "UPD"),
      (9001L, "NEW"), (9002L, "NEW")).toDF("k", "v")
    val (rewritten, untouched) = ScaleLayout.mergeInto(spark, dir, batch, "k")
    assert(rewritten <= 2, s"locality: expected ≤2 affected files, got $rewritten")
    assert(rewritten + untouched === 8)

    // untouched files are bit-identical originals (same name, same mtime)
    val after = ScaleLayout.listDataFiles(dir)
      .map(f => f.getName -> f.lastModified()).toMap
    val survivorsOfBefore = before.keySet.intersect(after.keySet)
    assert(survivorsOfBefore.size === untouched)
    survivorsOfBefore.foreach(n => assert(before(n) === after(n), s"$n was touched"))

    // semantics: matched keys replaced (no duplicates), new keys inserted
    val back = spark.read.parquet(dir)
    assert(back.count() === 8002L)
    assert(back.filter(col("v") === "UPD").select("k").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(3100L, 3200L, 3300L))
    assert(back.filter(col("k") === 3100L).count() === 1L)
    assert(back.filter(col("v") === "NEW").count() === 2L)
    assert(back.filter(col("k") === 1234L).head.getString(1) === "row-1234")

    // an insert-only batch (keys past every range) rewrites nothing
    val insOnly = Seq((9100L, "NEW2")).toDF("k", "v")
    val (rw2, _) = ScaleLayout.mergeInto(spark, dir, insOnly, "k")
    assert(rw2 === 0)
    assert(spark.read.parquet(dir).filter(col("v") === "NEW2").count() === 1L)
    assert(spark.read.parquet(dir).count() === 8003L)
  }

  test("incremental manifest refresh stats only appended files, drops rewritten ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest_inc").toString
    (1 to 1000).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .repartition(2).write.mode("overwrite").parquet(dir)
    val m1 = ScaleLayout.buildManifest(spark, dir, "k")
    val m1Rows = m1.collect() // pin: refresh may outlive these files

    // append a batch → refresh covers it without re-reading old files
    (1001 to 1500).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .repartition(1).write.mode("append").parquet(dir)
    val m2 = ScaleLayout.refreshManifest(spark, dir,
      spark.createDataFrame(java.util.Arrays.asList(m1Rows: _*), m1.schema), "k")
    val full = ScaleLayout.buildManifest(spark, dir, "k")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0).split("/").last, r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(canon(m2) === canon(full))
    assert(m2.agg(sum("rows")).head.getLong(0) === 1500L)

    // a rewrite (CoW delete) invalidates victims and introduces new files;
    // refresh must converge to the rebuilt truth
    ScaleLayout.deleteWhere(spark, dir, "k", 100L, 200L)
    val m3 = ScaleLayout.refreshManifest(spark, dir, m2, "k")
    assert(canon(m3) === canon(ScaleLayout.buildManifest(spark, dir, "k")))
    assert(m3.agg(sum("rows")).head.getLong(0) === 1500L - 101L)
  }

  test("multi-column manifest skipping: z-ordered files prune on BOTH box predicates") {
    val base = java.nio.file.Files.createTempDirectory("graft_mc_manifest").toString
    val df = (1 to 20000)
      .map(i => ((i * 7919L) % 128, (i * 104729L) % 128, s"p$i"))
      .toDF("x", "y", "v")
    ScaleLayout.writeSorted(df, s"$base/by_x", "x", 16)
    ScaleLayout.writeZOrdered(df, s"$base/z", 16, 7, "x", "y")
    val box = Seq(("x", 0L, 31L), ("y", 0L, 31L))

    val mX = ScaleLayout.buildManifest(spark, s"$base/by_x", "x", "y")
    val mZ = ScaleLayout.buildManifest(spark, s"$base/z", "x", "y")
    def opened(p: String, m: org.apache.spark.sql.DataFrame): Long =
      ScaleLayout.readSkippingAll(spark, p, m, box)
        .select(input_file_name()).distinct().count()
    val xOnly = opened(s"$base/by_x", mX)
    val z = opened(s"$base/z", mZ)
    // x-sort: the x range prunes to ~4 of 16 files, y prunes nothing more;
    // z-order: both predicates bite → strictly fewer files open
    assert(z < xOnly, s"z-ordered box scan opened $z vs x-sorted $xOnly")
    assert(z <= 6, s"expected the box to land in few z-files, opened $z of 16")
    // semantics identical either way (residual filter = exact)
    val exact = df.filter(col("x") <= 31 && col("y") <= 31).count()
    assert(ScaleLayout.readSkippingAll(spark, s"$base/z", mZ, box)
      .filter(col("x") <= 31 && col("y") <= 31).count() === exact)
  }

  test("bloom manifest skips files for point probes on a NON-clustered column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_manifest").toString
    // clustered on k; probe column u is scattered — min/max on u can't prune
    val df = (1 to 8000).map(i => (i.toLong, (i * 7919L) % 100000, s"v$i"))
      .toDF("k", "u", "v")
    ScaleLayout.writeSorted(df, dir, "k", 8)

    val manifest = ScaleLayout.buildManifestWithBloom(spark, dir, "k", "u")
    // pick a real u value; its k (= row index) lives in exactly one k-file
    val probe = df.filter(col("k") === 4321).head.getLong(1)
    val hit = ScaleLayout.readSkippingBloom(spark, dir, manifest, "u", probe)
    val opened = hit.select(input_file_name()).distinct().count()
    assert(opened <= 2, s"bloom should prune to ~1 file (1% FP), opened $opened of 8")
    // no false negatives: the probe row IS found after the residual filter
    val rows = hit.filter(col("u") === probe).collect()
    assert(rows.map(_.getLong(0)).contains(4321L))
    // absent key: typically zero files open, never a wrong row
    val absent = ScaleLayout.readSkippingBloom(spark, dir, manifest, "u", 999999999L)
    assert(absent.filter(col("u") === 999999999L).count() === 0L)
  }

  test("schema evolution: widened appends coexist; old files read as nulls for new columns") {
    // a long-lived table WILL gain columns; the layout must absorb that
    // without rewriting history (100 TB of old files never gets migrated)
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
      .write.mode("overwrite").parquet(dir) // epoch 1: (k, v)
    (101L to 200L).map(k => (k, s"v$k", k * 10.0)).toDF("k", "v", "score")
      .write.mode("append").parquet(dir) // epoch 2: + score
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet === Set("k", "v", "score"))
    assert(merged.count() === 200L)
    // old rows surface the new column as NULL; new rows carry it
    assert(merged.filter(col("score").isNull).count() === 100L)
    assert(merged.filter(col("k") <= 100 && col("score").isNotNull).count() === 0L)
    assert(merged.agg(sum("score")).head.getDouble(0) === (101L to 200L).map(_ * 10.0).sum)
  }

  test("compaction merges shattered files to the target count, data intact and re-clustered") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = (1 to 20000).map(i => (i.toLong, s"payload-$i-${"x" * 50}")).toDF("k", "s")
    df.repartition(32).write.parquet(s"$base/small")
    val nSmall = ScaleLayout.listDataFiles(s"$base/small").length
    assert(nSmall === 32)

    val totalBytes = ScaleLayout.listDataFiles(s"$base/small").map(_.length()).sum
    val target = totalBytes / 4 // aim for ~4 right-sized files
    val nOut = ScaleLayout.compact(spark, s"$base/small", s"$base/big", target,
      sortKey = Some("k"))
    assert(nOut <= 6, s"expected ~4-5 output files, got $nOut")
    assert(nOut < nSmall / 4)

    // same rows, and the rewrite restored sort-clustering: each output
    // file covers a disjoint k range (manifest spans don't overlap)
    val back = spark.read.parquet(s"$base/big")
    assert(back.count() === 20000L)
    assert(back.agg(sum("k")).head.getLong(0) === df.agg(sum("k")).head.getLong(0))
    val spans = ScaleLayout.buildManifest(spark, s"$base/big", "k")
      .select("min_k", "max_k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, spans.mkString(","))
      case _ => ()
    }
  }
}
