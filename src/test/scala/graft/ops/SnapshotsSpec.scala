package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot log: versioned file sets, logical CoW deletes, time travel,
  * vacuum retention. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_spec").toString
    val df = (1 to 4000).map(i => (i.toLong, s"row-$i")).toDF("k", "v")
    ScaleLayout.writeSorted(df, dir, "k", 4)
    Snapshots.init(dir)
    dir
  }

  test("append and delete create versions; every version stays readable") {
    val dir = freshTable()
    assert(Snapshots.versions(dir) === Seq(0))
    assert(Snapshots.readVersion(spark, dir, 0).count() === 4000L)

    val v1 = Snapshots.append(spark, dir,
      (4001 to 4500).map(i => (i.toLong, s"row-$i")).toDF("k", "v"))
    assert(v1 === 1)
    val v2 = Snapshots.deleteWhere(spark, dir, "k", 1000L, 1999L)
    assert(v2 === 2)

    // time travel: all three versions answer from one directory
    assert(Snapshots.readVersion(spark, dir, 0).count() === 4000L)
    assert(Snapshots.readVersion(spark, dir, 1).count() === 4500L)
    assert(Snapshots.readVersion(spark, dir, 2).count() === 3500L)
    // v0 still contains rows that v2 deleted — deletes are logical
    assert(Snapshots.readVersion(spark, dir, 0)
      .filter(col("k").between(1000, 1999)).count() === 1000L)
    assert(Snapshots.readLatest(spark, dir)
      .filter(col("k").between(1000, 1999)).count() === 0L)
    // exact content, not just counts
    assert(Snapshots.readVersion(spark, dir, 2).agg(sum("k")).head.getLong(0) ===
      (1L to 4500L).sum - (1000L to 1999L).sum)
  }

  test("delete shares unchanged files with the parent version") {
    val dir = freshTable()
    Snapshots.deleteWhere(spark, dir, "k", 1L, 10L) // lives in 1 of 4 files
    val v0 = Snapshots.files(dir, 0).toSet
    val v1 = Snapshots.files(dir, 1).toSet
    val shared = v0.intersect(v1)
    assert(shared.size === 3, s"expected 3 shared files, got ${shared.size}")
    assert((v1 -- v0).forall(_.startsWith("cow-v1-")))
  }

  test("vacuum deletes only files unreferenced by retained versions") {
    val dir = freshTable()
    Snapshots.deleteWhere(spark, dir, "k", 1L, 1000L)
    Snapshots.deleteWhere(spark, dir, "k", 3001L, 4000L)
    val before = ScaleLayout.listDataFiles(dir).length

    val victims = Snapshots.vacuum(dir, keepFrom = 2)
    assert(victims.nonEmpty)
    assert(ScaleLayout.listDataFiles(dir).length === before - victims.length)
    // retained version still fully readable
    assert(Snapshots.readVersion(spark, dir, 2).count() === 2000L)
    assert(Snapshots.versions(dir) === Seq(2))
    // pre-vacuum versions are gone from the log
    intercept[IllegalArgumentException](Snapshots.files(dir, 0))
  }

  test("a delete hitting nothing still commits a (file-identical) version") {
    val dir = freshTable()
    val v1 = Snapshots.deleteWhere(spark, dir, "k", 100000L, 200000L)
    assert(v1 === 1)
    assert(Snapshots.files(dir, 0).toSet === Snapshots.files(dir, 1).toSet)
  }
}
