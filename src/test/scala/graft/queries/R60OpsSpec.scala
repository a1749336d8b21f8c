package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The two-oracle discipline for the round-14 dispatches: each regime
  * selects the documented branch WITHOUT a human reading the canary,
  * the minority branch is exercised on a written fixture, and the two
  * grid formulations are proven result-identical (the dispatch changes
  * the plan, never the answer). */
class R60OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("gridRegimeExact agrees with gridRegime on the recorded readings " +
      "and ivfNprobe encodes the 0.9 recall target") {
    assert(TierSelect.gridRegimeExact(150L, 277L) === "linear")
    assert(TierSelect.gridRegimeExact(1500L, 26328L) === "linear")
    assert(TierSelect.gridRegimeExact(15000L, 2697753L) === "quadratic")
    assert(TierSelect.gridRegimeExact(1500000L, 27050000000L) === "quadratic")
    // the exact boundary: 2*pairs == 64*n stays linear (strict >)
    assert(TierSelect.gridRegimeExact(100L, 3200L) === "linear")
    assert(TierSelect.gridRegimeExact(100L, 3201L) === "quadratic")

    // recorded canary hits: 26/25/24 of 30 at the three fixtures — all
    // below the 27 target -> escalate; 27 is the exact stay boundary
    assert(TierSelect.ivfNprobe(26L, 10L) === 4)
    assert(TierSelect.ivfNprobe(25L, 10L) === 4)
    assert(TierSelect.ivfNprobe(24L, 10L) === 4)
    assert(TierSelect.ivfNprobe(27L, 10L) === 1)
    assert(TierSelect.ivfNprobe(30L, 10L) === 1)
    assert(TierSelect.ivfNprobe(0L, 0L) === 4) // empty probe set
  }

  test("the two grid formulations are result-identical at the gate " +
      "scale, and x_grid_knn_auto dispatches 'direct' there") {
    val pts = R9Ops.gridPoints(graft.Tables(spark, sf))
    val sc = R9Ops.gridShortCircuit(pts)
      .collect().map(_.toString).sorted.toSeq
    val direct = R9Ops.gridCellSearch(
        pts.select(col("id"), col("x"), col("y")), pts)
      .collect().map(_.toString).sorted.toSeq
    assert(sc === direct, "formulations must agree row-for-row")

    val auto = SparkEntry.queries("x_grid_knn_auto")(spark, sf).collect()
    assert(auto.nonEmpty)
    assert(auto.forall(_.getString(0) == "direct"),
      "sf0.001 reads 1.9 candidates/point -> the direct plan")
    val got = auto.map(r => s"[${r.get(1)},${r.get(2)},${r.get(3)}]")
      .sorted.toSeq
    val base = SparkEntry.queries("x_grid_knn")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === base, "the dispatch never changes the answer")
  }

  test("x_sim_ivf_auto at the gate scale escalates to nprobe=4 and " +
      "matches x_sim_ivf_nprobe exactly") {
    val auto = SparkEntry.queries("x_sim_ivf_auto")(spark, sf).collect()
    assert(auto.nonEmpty)
    assert(auto.forall(_.getInt(0) == 4),
      "canary reads 26/30 < 27 -> the nprobe=4 tier")
    val got = auto.map(r => s"[${r.get(1)},${r.get(2)},${r.get(3)}]")
      .sorted.toSeq
    val base = SparkEntry.queries("x_sim_ivf_nprobe")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got === base, "same search machinery behind the dispatch")
  }

  test("x_sim_ivf_auto on a written well-separated corpus keeps " +
      "nprobe=1, rows matching ivfRecall(nprobe=1) replay") {
    // 80 vectors in 8 orthogonal clusters (basis dim = vec_id % 8,
    // jitter confined to dims 8..63): every query's brute-force top-3
    // sits in its own cell, so the recall canary reads 30/30 >= 27 and
    // the dispatch STAYS at the single-cell probe — the branch
    // unreachable on the driver fixtures
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_auto1").toString
    spark.range(0, 80).select(col("id").as("vec_id"),
        expr("""transform(sequence(0, 63), d -> CAST(
                |  CASE WHEN d = id % 8 THEN 1.0
                |  ELSE 0.02 * ((id * 31 + d) % 7 - 3) END AS FLOAT))"""
          .stripMargin).as("embedding"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    try {
      val auto = SparkEntry.queries("x_sim_ivf_auto")(spark, dir).collect()
      assert(auto.nonEmpty)
      assert(auto.forall(_.getInt(0) == 1),
        "well-separated clusters -> recall 30/30 -> stay at nprobe=1")
      val emb = graft.Tables(spark, dir).embeddings
      val expect = graft.llm.Similarity.ivfRecall(
          emb.filter(col("vec_id") < 10), emb,
          emb.filter(col("vec_id") < 8), 3)
        .collect().map(_.toString).sorted.toSeq
      val got = auto.map(r => s"[${r.get(1)},${r.get(2)},${r.get(3)}]")
        .sorted.toSeq
      assert(got === expect)
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try java.nio.file.Files.delete(f)
          catch { case _: Throwable => () })
    }
  }
}
