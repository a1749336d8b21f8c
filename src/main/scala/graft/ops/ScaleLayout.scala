package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout for 100 TB scans: hive-style partitioned
  * directories.
  *
  * Partition pruning and parquet predicate pushdown are DIFFERENT
  * mechanisms with different costs: a predicate on a partition column is
  * resolved against the file index (`PartitionFilters` in the scan node) —
  * directories of non-matching partitions are never even listed into the
  * scan, so zero bytes of their files are opened. Row-group pushdown
  * (`PushedFilters`) still opens every file and reads its footer. On a
  * 100 TB events table partitioned by day, `WHERE day = X` scans one
  * day's directory instead of footer-checking three years of files — the
  * single highest-leverage layout decision for append-only fact data.
  *
  * The partition column must be low-cardinality and stable (day, region,
  * event_type): every distinct value is a directory with at least one
  * file, so a high-cardinality partition key is the small-files
  * antipattern that overwhelms the metadata layer long before the data
  * itself is a problem. High-cardinality co-location wants bucketing
  * ([[ScaleJoins.writeBucketed]]) instead.
  */
object ScaleLayout {

  /** Write `df` hive-partitioned by `cols` (one `col=value/` directory
    * level per column, partition values encoded in paths, not data files). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Read a partitioned table back; Spark discovers the partition columns
    * from the directory names and a `.filter` on them becomes a
    * `PartitionFilters` entry (pruned at the file index, asserted in
    * ScaleLayoutSpec). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Sort-clustered layout — the third leg of the layout toolkit
    * (partitioning prunes low-cardinality columns at the FILE INDEX,
    * bucketing co-locates join keys, sort-clustering makes HIGH-cardinality
    * range/point predicates skippable INSIDE files): range-repartition then
    * sort within partitions on `key` before writing, so every parquet row
    * group covers a narrow, non-overlapping key range and its footer
    * min/max statistics become tight. A pushed-down range predicate then
    * skips whole row groups in the reader — the mechanism Z-ordering
    * generalizes to several columns. ScaleLayoutSpec asserts the footer
    * stats directly: sorted layout ⇒ disjoint per-row-group ranges;
    * unsorted ⇒ every row group spans ~the full key domain (nothing
    * skippable). Results are layout-independent (`x_sorted_scan` oracle). */
  def writeSorted(df: DataFrame, path: String, key: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Z-value (Morton code): the bit-interleave of k non-negative integer
    * columns, each truncated to its low `bits` bits — bit i of column c
    * lands at output position `i·k + (k−1−c)`, so column 0 is the more
    * significant within every bit group. Sorting by z walks a space-filling
    * curve: nearby (c0, c1) points get nearby z values in BOTH dimensions,
    * which single-column sorting can only give for one.
    *
    * Pure `shiftright/AND/shiftleft/OR` column arithmetic — codegen'd,
    * deterministic, and replayable bit-for-bit by the SQL oracle
    * (`x_zorder_value`). */
  def zValue(bits: Int, cols: Column*): Column = {
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * k + (k - 1 - ci))
    terms.reduce(_ bitwiseOR _)
  }

  /** Z-ordered layout: [[writeSorted]] generalized to SEVERAL
    * high-cardinality columns. Range-repartition + sort on the interleaved
    * [[zValue]] clusters rows so every parquet row group covers a small
    * RECTANGLE of the (c0, c1, …) space instead of a narrow band in one
    * column and the full domain in the others — so footer min/max stats are
    * tight on EVERY z-ordered column and a multi-column box predicate skips
    * row groups on each of them (coverage ratios asserted in
    * ScaleLayoutSpec; result parity in `x_zorder_scan`). The z column is
    * computed for layout only and dropped before the write. */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int, bits: Int,
      cols: String*): Unit =
    df.withColumn("__z", zValue(bits, cols.map(col): _*))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** File-level min/max MANIFEST: one row per data file with each key's
    * min/max and the row count — the table-format idea (Iceberg/Delta
    * manifests) distilled. Row-group skipping (writeSorted/writeZOrdered)
    * still opens every file to read its footer; at 100 TB "open every
    * file" is millions of S3 GETs per query. A manifest is the level
    * above: a KB–MB table consulted BEFORE listing, so non-matching files
    * are never opened, listed, or scheduled.
    *
    * Built as one distributed pass grouped by `input_file_name()` —
    * map-side combine makes the exchange O(files), and it rides the same
    * scan that wrote or first audited the data. (A production build reads
    * footers instead of data — same output, one task per file; the
    * CONSUMER contract below is identical either way.) */
  def buildManifest(spark: SparkSession, path: String, keys: String*): DataFrame =
    manifestOf(spark.read.parquet(path), keys)

  private def manifestOf(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        keys.flatMap(k =>
          Seq(min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k"))): _*)

  /** INCREMENTAL manifest maintenance: stat only the files the old
    * manifest hasn't seen (appended since) and union their rows in —
    * files already covered are not re-read. This is what makes a manifest
    * viable as standing metadata on an append-only 100 TB table: each
    * ingest batch pays for ITS files, never a full-table rescan (the same
    * incremental contract as a table format's per-commit manifest files).
    * Immutable files are the load-bearing assumption — rewrites
    * (compaction, CoW delete) change file NAMES, so their outputs are
    * "new" here and their victims must be dropped via the name set. */
  def refreshManifest(spark: SparkSession, path: String, old: DataFrame,
      keys: String*): DataFrame = {
    // compare by filesystem path: input_file_name() URIs ("file:///x") and
    // File.toURI ("file:/x") differ in slashes, never in path
    def norm(s: String): String =
      if (s.startsWith("file:")) new java.net.URI(s).getPath else s
    val live = listDataFiles(path).map(_.getAbsolutePath).toSet
    // materialize the old manifest NOW — it is a lazy plan over files a
    // rewrite may have deleted; keep rows whose file still exists
    val oldRows = old.collect()
    val keptRows = oldRows.filter(r => live.contains(norm(r.getString(0))))
    val kept = spark.createDataFrame(
      java.util.Arrays.asList(keptRows: _*), old.schema)
    val known = oldRows.map(r => norm(r.getString(0))).toSet
    val fresh = (live -- known).toSeq.sorted
    if (fresh.isEmpty) kept
    else kept.unionByName(manifestOf(spark.read.parquet(fresh: _*), keys.toSeq))
  }

  /** [[buildManifest]] plus a PER-FILE BLOOM over `bloomKey` — the skip
    * index for point probes on a column the layout is NOT clustered by.
    * Min/max ranges only prune what the sort order serves; any other
    * column's ranges span ~the full domain in every file and prune
    * nothing. A per-file bloom answers "could this file contain key = v?"
    * regardless of layout, at ~1.2 KB/file for 1% false positives — the
    * same trick Parquet bloom filters and Iceberg's bloom-backed
    * `value_counts` play, lifted to the manifest level where it saves the
    * file OPEN, not just the row-group read. */
  def buildManifestWithBloom(spark: SparkSession, path: String, rangeKey: String,
      bloomKey: String, estPerFile: Long = 10000L): DataFrame = {
    val df = spark.read.parquet(path)
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(rangeKey)).as(s"min_$rangeKey"), max(col(rangeKey)).as(s"max_$rangeKey"),
        graft.functions.GraftFunctions.bloomFilterAgg(
          col(bloomKey), estPerFile, estPerFile * 10).as(s"bloom_$bloomKey"))
  }

  /** Multi-predicate manifest scan: a file survives only if EVERY
    * predicate's [lo, hi] overlaps that column's file range — the
    * file-level half of the Z-order story. A single-column clustering
    * leaves every other column's per-file range full-width (nothing to
    * AND against); over [[writeZOrdered]] output each file covers a small
    * RECTANGLE, so a box predicate prunes on both columns at the manifest
    * BEFORE any file opens, then again per row group from the footers. */
  def readSkippingAll(spark: SparkSession, path: String, manifest: DataFrame,
      preds: Seq[(String, Long, Long)]): DataFrame = {
    val keep = preds
      .map { case (k, lo, hi) => !(col(s"max_$k") < lit(lo) || col(s"min_$k") > lit(hi)) }
      .reduce(_ && _)
    val files = manifest.filter(keep).select("file").collect().map(_.getString(0))
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Point-probe read through the bloom manifest: only files whose bloom
    * admits `value` are opened. No false negatives (bloom contract), so a
    * residual equality filter above the scan gives exact semantics. */
  def readSkippingBloom(spark: SparkSession, path: String, manifest: DataFrame,
      bloomKey: String, value: Long): DataFrame = {
    val files = manifest.select(col("file"), col(s"bloom_$bloomKey")).collect()
      .filter { r =>
        org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          .mightContainLong(value)
      }
      .map(_.getString(0))
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Manifest-driven scan: keep only files whose [min, max] overlaps
    * [lo, hi] and hand THAT list to the reader — files outside the range
    * are never opened (vs row-group skipping, which still pays an open +
    * footer read per file). The manifest is a KB-sized driver-side
    * collect, the same barrier shape as the bloom sketch. Combined with
    * [[writeSorted]] the two levels nest: the manifest prunes files, the
    * footers prune row groups inside the survivors. */
  def readSkipping(spark: SparkSession, path: String, manifest: DataFrame,
      key: String, lo: Long, hi: Long): DataFrame = {
    val files = manifest
      .filter(!(col(s"max_$key") < lit(lo) || col(s"min_$key") > lit(hi)))
      .select("file").collect().map(_.getString(0))
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files: _*)
  }

  /** Small-file COMPACTION: rewrite a directory of too-many-small files
    * into ceil(totalBytes / targetBytes) right-sized ones. The small-file
    * problem is the silent 100 TB killer — a streaming sink or
    * over-parallel write leaves 100k× 1 MB files, and every later query
    * pays 100k opens/tasks for 100 GB of data; compaction is the standing
    * maintenance job that fixes it. With `sortKey` the rewrite
    * range-repartitions + sorts (restoring [[writeSorted]] clustering —
    * compaction and clustering in one pass); without it a round-robin
    * repartition just right-sizes. Returns the output file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long, sortKey: Option[String] = None): Int = {
    val totalBytes = listDataFiles(inPath).map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val shaped = sortKey match {
      case Some(k) => df.repartitionByRange(nOut, col(k)).sortWithinPartitions(k)
      case None => df.repartition(nOut)
    }
    shaped.write.mode("overwrite").parquet(outPath)
    listDataFiles(outPath).length
  }

  private[ops] def listDataFiles(path: String): Array[java.io.File] =
    Option(new java.io.File(path).listFiles((_, n) =>
      n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")))
      .getOrElse(Array.empty)

  /** COPY-ON-WRITE DELETE: remove the rows with `key` ∈ [lo, hi] by
    * rewriting ONLY the files whose manifest range overlaps the target —
    * every other file is untouched (same bytes, same path, never read).
    * This is how a deletion (GDPR erasure, bad-batch rollback) runs
    * against a 100 TB table: with a clustered layout the affected keys
    * live in a handful of files, so the rewrite cost scales with the
    * DELETED data's locality, not the table size. The mechanics every
    * copy-on-write table format (Delta/Iceberg/Hudi CoW) industrializes:
    * read affected files, write them back filtered, atomically swap.
    * Returns (files rewritten, files untouched). */
  def deleteWhere(spark: SparkSession, path: String, key: String,
      lo: Long, hi: Long): (Int, Int) = {
    // materialize the manifest BEFORE mutating the directory — it is a
    // lazy plan over the very files the swap below deletes
    val entries = buildManifest(spark, path, key)
      .select(col("file"), col(s"min_$key"), col(s"max_$key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val affected = entries.collect {
      case (f, mn, mx) if !(mx < lo || mn > hi) => f
    }
    if (affected.nonEmpty) {
      // rewrite the affected files' survivors into fresh part files...
      val tmp = java.nio.file.Files.createTempDirectory("graft_cow").toString
      spark.read.parquet(affected: _*)
        .filter(col(key) < lit(lo) || col(key) > lit(hi))
        .repartition(math.max(1, affected.length))
        .write.mode("overwrite").parquet(tmp)
      // ...then swap: drop originals, move replacements in (a table format
      // would flip a manifest pointer instead; the I/O shape is the same)
      affected.foreach(f => new java.io.File(new java.net.URI(f).getPath).delete())
      listDataFiles(tmp).zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(path, s"cow-${System.nanoTime()}-$i.parquet"))
      }
      // drop the session's cached file listing for the path — readers that
      // planned against the old population must re-list
      spark.catalog.refreshByPath(path)
    }
    (affected.length, entries.length - affected.length)
  }

  /** COPY-ON-WRITE MERGE (upsert): apply a batch of `updates` to the table
    * at `path` — rows whose `key` matches an update are REPLACED by it,
    * updates with no match are INSERTED — by rewriting ONLY the files whose
    * manifest key range contains some update key. This is MERGE INTO
    * distilled to the WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT core a
    * CDC upsert runs: with a clustered layout, a batch touching k keys
    * rewrites O(k / keys-per-file) files regardless of table size — the
    * write cost follows the BATCH, not the 100 TB table (the same shape as
    * [[deleteWhere]]; Delta/Iceberg/Hudi CoW merge industrializes it).
    *
    * `updates` must carry the target schema with one row per key (dedupe
    * upstream — last-writer-wins is the CALLER's ordering decision, not
    * guessable here). The update batch is CDC-sized by posture: its
    * distinct keys land at the driver to target files (KB-scale, the same
    * barrier as the manifest itself); the data path stays distributed —
    * survivors anti-join the (broadcast) update keys, then union the batch.
    * Returns (files rewritten, files untouched). */
  def mergeInto(spark: SparkSession, path: String, updates: DataFrame,
      key: String): (Int, Int) = {
    // materialize the manifest BEFORE mutating the directory (lazy-plan
    // hazard, see deleteWhere)
    val entries = buildManifest(spark, path, key)
      .select(col("file"), col(s"min_$key"), col(s"max_$key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val updKeys = updates.select(col(key).cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    // a file is affected iff SOME update key falls inside its [min, max]
    def hitsRange(lo: Long, hi: Long): Boolean = {
      val i = java.util.Arrays.binarySearch(updKeys, lo)
      val from = if (i >= 0) i else -i - 1
      from < updKeys.length && updKeys(from) <= hi
    }
    val affected = entries.collect { case (f, mn, mx) if hitsRange(mn, mx) => f }
    val survivors =
      if (affected.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(affected.toIndexedSeq: _*)
        .join(org.apache.spark.sql.functions.broadcast(
          updates.select(col(key))), Seq(key), "left_anti")
    val tmp = java.nio.file.Files.createTempDirectory("graft_merge").toString
    survivors.unionByName(updates.select(survivors.columns.map(col): _*))
      .repartition(math.max(1, affected.length))
      .write.mode("overwrite").parquet(tmp)
    // swap: drop rewritten originals, move replacements in (a table format
    // flips a manifest pointer; the I/O shape is the same)
    affected.foreach(f => new java.io.File(new java.net.URI(f).getPath).delete())
    listDataFiles(tmp).zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(path, s"merge-${System.nanoTime()}-$i.parquet"))
    }
    spark.catalog.refreshByPath(path)
    (affected.length, entries.length - affected.length)
  }
}
