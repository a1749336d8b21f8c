package graft.graph

import scala.util.Random

import graft.SparkSpec

class GraphKCoreSpec extends SparkSpec {
  import spark.implicits._

  /** Reference peel: run to FIXPOINT (the true k-core), plus the peel
    * depth so tests can assert the fixed-round engine ran enough rounds. */
  private def naiveKCore(edges: Seq[(Long, Long)], k: Int): (Map[Long, Int], Int) = {
    val und = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
      .distinct.filter { case (u, v) => u != v }
    var alive = und.map(_._1).toSet
    var depth = 0
    var changed = true
    while (changed) {
      val deg = und.filter { case (u, v) => alive(u) && alive(v) }
        .groupBy(_._1).map { case (u, es) => u -> es.size }
      val next = alive.filter(u => deg.getOrElse(u, 0) >= k)
      changed = next != alive
      if (changed) depth += 1
      alive = next
    }
    val finalDeg = und.filter { case (u, v) => alive(u) && alive(v) }
      .groupBy(_._1).map { case (u, es) => u -> es.size }
    (finalDeg, depth)
  }

  test("kCore matches the fixpoint reference on random graphs, including multi-round peels") {
    val rnd = new Random(11)
    var sawMultiRound = false
    for (trial <- 1 to 5) {
      val n = 30
      val edges = Seq.tabulate(70)(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (u, v) => u != v }
      val (want, depth) = naiveKCore(edges, 3)
      if (depth >= 2) sawMultiRound = true
      val got = GraphMetrics.kCore(edges.toDF("src", "dst"), k = 3, rounds = depth + 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got === want, s"trial $trial (peel depth $depth)")
    }
    assert(sawMultiRound, "no trial peeled over multiple rounds — weak test seed")
  }

  test("a chain peels to empty under k=2; a cycle survives intact") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(GraphMetrics.kCore(chain.toDF("src", "dst"), k = 2, rounds = 4)
      .count() === 0L)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = GraphMetrics.kCore(cycle.toDF("src", "dst"), k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }
}
