package graft.ops

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SNAPSHOT LOG + TIME TRAVEL: the table-format commit idea (Delta's
  * `_delta_log`, Iceberg's snapshot list) distilled to its load-bearing
  * core — a table IS a sequence of versions, each version IS a list of
  * immutable data files, and every mutation is a NEW version that shares
  * unchanged files with its parent. Three properties fall out:
  *
  *  - **Atomic visibility**: a version file appears with one rename;
  *    readers resolve the file LIST first, so a half-finished rewrite is
  *    invisible (same contract as the TSV sink's `_SUCCESS`, lifted to
  *    multi-version).
  *  - **Time travel**: reading version v is just planning the scan over
  *    v's file list — no data movement, because mutations never destroy
  *    files (deletes are LOGICAL: the new version omits the victim and
  *    adds its filtered rewrite).
  *  - **Bounded growth**: [[vacuum]] physically deletes files no retained
  *    version references — the ONLY place bytes die, so retention policy
  *    is one explicit knob instead of a property of every writer.
  *
  * At 100 TB the version manifests are KB–MB driver-side lists (same
  * barrier shape as [[ScaleLayout]]'s manifests) while all data movement
  * stays distributed; a production build swaps the directory-of-manifests
  * for a real log store without touching the read/commit contract.
  */
object Snapshots {

  private def logDir(path: String): File = new File(path, "_log")
  private def versionFile(path: String, v: Int): File =
    new File(logDir(path), f"v$v%05d.manifest")

  /** Versions present in the log, ascending (empty if uninitialized). */
  def versions(path: String): Seq[Int] =
    Option(logDir(path).listFiles((_, n) => n.matches("v\\d{5}\\.manifest")))
      .getOrElse(Array.empty).map(_.getName.drop(1).take(5).toInt).sorted.toSeq

  def latest(path: String): Int = {
    val vs = versions(path)
    require(vs.nonEmpty, s"$path has no snapshot log — call init first")
    vs.last
  }

  /** Relative data-file names of version `v`. */
  def files(path: String, v: Int): Seq[String] = {
    val f = versionFile(path, v)
    require(f.exists(), s"version $v does not exist under $path/_log")
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Atomic commit: write the manifest to a temp name, rename into place.
    * The rename is the commit point — a reader lists whole versions only. */
  private def commit(path: String, v: Int, names: Seq[String]): Int = {
    Files.createDirectories(logDir(path).toPath)
    val tmp = new File(logDir(path), s"_tmp-v$v")
    Files.write(tmp.toPath,
      names.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, versionFile(path, v).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Start the log at version 0 over the files currently in `path`. */
  def init(path: String): Int = {
    require(versions(path).isEmpty, s"$path already has a snapshot log")
    commit(path, 0, ScaleLayout.listDataFiles(path).map(_.getName).toSeq)
  }

  /** APPEND as a new version: land `df`'s parts beside the existing files,
    * then commit parent's list + the new names. Physical append, logical
    * isolation — a reader pinned to the parent version never sees them. */
  def append(spark: SparkSession, path: String, df: DataFrame): Int = {
    val parent = latest(path)
    val before = ScaleLayout.listDataFiles(path).map(_.getName).toSet
    df.write.mode("append").parquet(path)
    val added = ScaleLayout.listDataFiles(path).map(_.getName).filterNot(before)
    commit(path, parent + 1, files(path, parent) ++ added)
  }

  /** LOGICAL copy-on-write delete: rewrite only the current version's
    * files whose `key` range overlaps [lo, hi] (targeted through a
    * manifest over THAT version, not the directory), land the filtered
    * replacements as new files, and commit a version that swaps victim
    * names for replacement names. The victims' bytes stay — that is what
    * keeps every earlier version readable — until [[vacuum]]. */
  def deleteWhere(spark: SparkSession, path: String, key: String,
      lo: Long, hi: Long): Int = {
    val parent = latest(path)
    val cur = files(path, parent)
    val curAbs = cur.map(n => new File(path, n).getAbsolutePath)
    def norm(s: String): String =
      if (s.startsWith("file:")) new java.net.URI(s).getPath else s
    // manifest over the CURRENT VERSION's files only
    val entries = spark.read.parquet(curAbs: _*)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(key).cast("long")).as("mn"), max(col(key).cast("long")).as("mx"))
      .collect()
      .map(r => (new File(norm(r.getString(0))).getName, r.getLong(1), r.getLong(2)))
    val affected = entries.collect { case (n, mn, mx) if !(mx < lo || mn > hi) => n }
    if (affected.isEmpty) return commit(path, parent + 1, cur)
    val tmp = Files.createTempDirectory("graft_snap_cow").toString
    spark.read.parquet(affected.map(n => new File(path, n).getAbsolutePath): _*)
      .filter(col(key) < lit(lo) || col(key) > lit(hi))
      .repartition(math.max(1, affected.length))
      .write.mode("overwrite").parquet(tmp)
    val moved = ScaleLayout.listDataFiles(tmp).zipWithIndex.map { case (f, i) =>
      val name = s"cow-v${parent + 1}-$i.parquet"
      Files.move(f.toPath, Paths.get(path, name))
      name
    }
    commit(path, parent + 1, cur.filterNot(affected.toSet) ++ moved)
  }

  /** Read one version: plan the scan over exactly its file list. */
  def readVersion(spark: SparkSession, path: String, v: Int): DataFrame = {
    val fs = files(path, v).map(n => new File(path, n).getAbsolutePath)
    if (fs.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(fs: _*)
  }

  /** Latest-version read — what an unpinned query means under a log. */
  def readLatest(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path, latest(path))

  /** Files version `vTo` has that `vFrom` lacks — the DELTA an incremental
    * consumer reads. On an append-only history this is exactly the
    * appended data; after a rewrite it is the rewritten files (whose rows
    * a consumer must reconcile — CoW rewrites are not pure appends). */
  def deltaFiles(path: String, vFrom: Int, vTo: Int): Seq[String] =
    files(path, vTo).filterNot(files(path, vFrom).toSet)

  /** Read just the delta between two versions. The INCREMENTAL-refresh
    * primitive: any decomposable aggregate (count/sum/min/max, sketches)
    * over version vTo equals merge(agg over vFrom, agg over delta) — so a
    * standing rollup re-reads only what a commit added, never the table
    * ([[ScaleLayout.refreshManifest]] plays the same trick for file
    * stats). */
  def readDelta(spark: SparkSession, path: String, vFrom: Int, vTo: Int): DataFrame = {
    val fs = deltaFiles(path, vFrom, vTo).map(n => new File(path, n).getAbsolutePath)
    if (fs.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(fs: _*)
  }

  /** VACUUM: physically delete data files referenced by NO version ≥
    * `keepFrom`, then drop the older version manifests. The one place
    * bytes die; everything ≥ keepFrom stays time-travelable. Returns the
    * deleted file names. */
  def vacuum(path: String, keepFrom: Int): Seq[String] = {
    val vs = versions(path)
    require(vs.contains(keepFrom), s"version $keepFrom not in log $vs")
    val retained = vs.filter(_ >= keepFrom).flatMap(files(path, _)).toSet
    val victims = ScaleLayout.listDataFiles(path).map(_.getName)
      .filterNot(retained).toSeq
    victims.foreach(n => new File(path, n).delete())
    vs.filter(_ < keepFrom).foreach(v => versionFile(path, v).delete())
    victims
  }
}
