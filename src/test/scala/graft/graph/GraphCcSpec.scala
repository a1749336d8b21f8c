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

  test("agrees with GraphX connectedComponents on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val e = edges(Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)): _*)
    val df = labels(GraphMetrics.connectedComponents(e))
    val gx = labels(GraphMetrics.connectedComponentsGraphX(spark, e))
    // GraphX also labels by min reachable id over the undirected view
    assert(df === gx)
  }
}
