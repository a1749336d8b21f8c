package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class GraphCcSpec extends SparkSpec {
  import spark.implicits._

  def edges(pairs: (Long, Long)*): DataFrame = pairs.toDF("src", "dst")

  def labels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components labeled by their min vertex id") {
    val cc = labels(GraphMetrics.connectedComponents(
      edges((5L, 3L), (3L, 9L), (7L, 8L))))
    assert(cc === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 7L -> 7L, 8L -> 7L))
  }

  test("direction is ignored (undirected semantics)") {
    // 1→2 and 3→2: connected through 2 regardless of direction
    val cc = labels(GraphMetrics.connectedComponents(edges((1L, 2L), (3L, 2L))))
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a long chain converges (pointer jumping, O(log diameter) rounds)") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    val cc = labels(GraphMetrics.connectedComponents(edges(chain: _*)))
    assert(cc.size === 40)
    assert(cc.values.toSet === Set(1L))
  }

  def lpa(iters: Int, pairs: (Long, Long)*): Map[Long, Long] =
    GraphMetrics.labelPropagation(edges(pairs: _*), iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("label propagation: a triangle converges to its min label") {
    // round 1: v1 sees {2,3}→2, v2 sees {1,3}→1, v3 sees {1,2}→1
    // round 2: v1 sees {1,1}→1, v2 sees {2,1} tie→1, v3 sees {2,1} tie→1
    assert(lpa(2, (1L, 2L), (2L, 3L), (3L, 1L))
      === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("label propagation: disjoint communities keep separate labels") {
    val l = lpa(4, (1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 9L), (9L, 7L))
    assert(l.filterKeys(_ < 5L).values.toSet === Set(1L))
    assert(l.filterKeys(_ > 5L).values.toSet === Set(7L))
  }

  test("label propagation: a 2-cycle oscillates deterministically (fixed rounds)") {
    // synchronous LPA on an edge: labels swap every round
    assert(lpa(1, (1L, 2L)) === Map(1L -> 2L, 2L -> 1L))
    assert(lpa(2, (1L, 2L)) === Map(1L -> 1L, 2L -> 2L))
  }

  test("agrees with GraphX connectedComponents on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val e = edges(Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)): _*)
    val df = labels(GraphMetrics.connectedComponents(e))
    val gx = labels(GraphMetrics.connectedComponentsGraphX(spark, e))
    // GraphX also labels by min reachable id over the undirected view
    assert(df === gx)
  }
}
