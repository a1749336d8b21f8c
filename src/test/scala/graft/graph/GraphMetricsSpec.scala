package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class GraphMetricsSpec extends SparkSpec {

  import spark.implicits._

  def edges(pairs: (Long, Long)*): DataFrame = pairs.toDF("src", "dst")

  test("inDegrees counts parallel edges; 0-in-degree vertices absent") {
    val e = edges((1L, 2L), (1L, 2L), (3L, 2L), (2L, 3L))
    val deg = GraphMetrics.inDegrees(e).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg === Map(2L -> 3L, 3L -> 1L)) // vertex 1 has no in-edges → absent
  }

  test("3-cycle: every vertex rank exactly 1.0 after any #iterations; 1 triangle each") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 1L))
    val pr = GraphMetrics.staticPageRank(e, 0.15, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pr.values.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
    val tri = GraphMetrics.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("4-star: hub PageRank matches the closed form, leaves keep resetProb") {
    // leaves 2..5 each point at hub 1; hub is dangling (no out-edges).
    val e = edges((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L))
    val pr = GraphMetrics.staticPageRank(e, 0.15, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // leaves: no in-edges → 0.15 after iteration 1, stable.
    Seq(2L, 3L, 4L, 5L).foreach(v => assert(math.abs(pr(v) - 0.15) < 1e-12))
    // hub: iter1 = 0.15+0.85*4*1.0 = 3.55; iter2+ = 0.15+0.85*4*0.15 = 0.66
    assert(math.abs(pr(1L) - 0.66) < 1e-12)
  }

  test("triangle count canonicalizes direction and parallel edges; cliques closed-form") {
    // duplicate + reversed edges of a 4-clique {1,2,3,4}: each vertex in C(3,2)=3 triangles
    val base = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val noisy = base ++ base.map(_.swap) ++ base // reversed + duplicated
    val tri = GraphMetrics.triangleCounts(noisy.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // disconnected second clique of 3 + isolated edge: counts stay local
    val two = (base ++ Seq((10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))).toDF("src", "dst")
    val tri2 = GraphMetrics.triangleCounts(two).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri2(10L) === 1L && tri2(11L) === 1L && tri2(12L) === 1L)
    assert(tri2(20L) === 0L && tri2(21L) === 0L) // triangle-free vertices present with 0
  }

  test("explicit vertex set: isolated vertices finish at resetProb (GraphFrames semantics)") {
    val e = edges((1L, 2L))
    val verts = Seq(1L, 2L, 99L).toDF("id")
    val pr = GraphMetrics.staticPageRank(e, 0.15, 10, Some(verts)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(99L) - 0.15) < 1e-12)
  }

  test("DataFrame PageRank agrees with GraphX staticPageRank (reference runtime path)") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (2L, 1L), (2L, 1L))
    val df = GraphMetrics.staticPageRank(e, 0.15, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gx = GraphMetrics.pageRankGraphX(spark, e, 0.15, 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(df.keySet === gx.keySet)
    df.foreach { case (k, v) => assert(math.abs(v - gx(k)) < 1e-9, s"vertex $k: $v vs ${gx(k)}") }
  }

  test("DataFrame triangle count agrees with GraphX TriangleCount") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 2L), (2L, 4L), (5L, 1L))
    val df = GraphMetrics.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gx = GraphMetrics.triangleCountGraphX(spark, e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.foreach { case (k, v) => assert(v === gx.getOrElse(k, 0L), s"vertex $k") }
  }

  test("bfsHops: shortest path wins, unreachable vertices absent, parallel edges collapse") {
    // 1→2→3→4 chain with a 1→3 shortcut (duplicated), plus a disconnected
    // component {8→9} the walk must never reach; 5 points AT the source
    // (wrong direction — also unreachable).
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (1L, 3L), (8L, 9L), (5L, 1L))
    val d = GraphMetrics.bfsHops(e, source = 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("bfsHops: isolated source yields just itself at 0") {
    val d = GraphMetrics.bfsHops(edges((2L, 3L)), source = 7L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(7L -> 0L))
  }

  test("bfsHops agrees with GraphX ShortestPaths on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val e = edges(Seq.fill(80)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)): _*)
    val df = GraphMetrics.bfsHops(e, source = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gx = GraphMetrics.bfsGraphX(spark, e, source = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df === gx)
  }

  def wEdges(triples: (Long, Long, Long)*): DataFrame = triples.toDF("src", "dst", "w")

  test("sssp: a longer-hop lighter path beats the direct heavy edge; parallel edges take min weight") {
    // 1→4 direct costs 10, but 1→2→3→4 costs 1+1+1 = 3; the duplicate
    // heavy 1→2 edge (w=9) must lose to the light copy.
    val e = wEdges((1L, 4L, 10L), (1L, 2L, 1L), (1L, 2L, 9L),
      (2L, 3L, 1L), (3L, 4L, 1L), (8L, 9L, 1L), (5L, 1L, 2L))
    val d = GraphMetrics.sssp(e, source = 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("sssp: a later round can still improve an earlier settled-looking distance") {
    // 0→3 cheap-looking two-hop (5+5) vs a 4-hop chain of 1s (total 4):
    // the chain's improvement arrives at round 4 and must overwrite.
    val e = wEdges((0L, 9L, 5L), (9L, 3L, 5L),
      (0L, 1L, 1L), (1L, 2L, 1L), (2L, 8L, 1L), (8L, 3L, 1L))
    val d = GraphMetrics.sssp(e, source = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(3L) === 4L)
    assert(d(9L) === 5L)
  }

  test("sssp: with unit weights it equals bfsHops on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val raw = Seq.fill(80)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val hops = GraphMetrics.bfsHops(edges(raw: _*), source = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = GraphMetrics.sssp(wEdges(raw.map { case (s, t) => (s, t, 1L) }: _*),
      source = 0L).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === hops)
  }
}
