package graft.queries

import graft.{QDef, Tables}
import graft.graph.GraphMetrics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph operators G1-G4 (SURVEY.md §2.9) on the star schema's nation graph:
  * one edge per lineitem, src = ordering customer's nation, dst = supplying
  * supplier's nation (FIXTURES.md §B) — a 25-vertex multigraph.
  */
object StarGraph {

  /** The nation multigraph: src=c_nationkey, dst=s_nationkey per lineitem. */
  private def edges(s: SparkSession, d: String,
      factFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val t = Tables(s, d)
    val fact = factFilter.fold(t.lineitem)(t.lineitem.filter)
    fact
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
  }

  private val EdgesCte =
    """edges AS (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey)""".stripMargin

  /** Sparse undirected subgraph for triangle counting (high-price edges only). */
  private val SparseEdgesCte =
    """edges AS (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE l.l_extendedprice > 100000)""".stripMargin

  /** Per-vertex triangle count oracle over the canonicalized sparse
    * subgraph — shared by `g4_triangle_count` (DataFrame engine) and
    * `x_graphx_triangles` (the GraphX RDD path). */
  private val TriangleSql =
    s"""WITH ${SparseEdgesCte},
       |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src <> dst),
       |tri AS (
       |  SELECT t1.a AS x, t1.b AS y, t2.b AS z
       |  FROM und t1 JOIN und t2 ON t1.b = t2.a
       |  JOIN und t3 ON t3.a = t1.a AND t3.b = t2.b),
       |verts AS (SELECT a AS id FROM und UNION SELECT b FROM und),
       |pv AS (SELECT id, count(*) AS triangles FROM (
       |    SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
       |  GROUP BY id)
       |SELECT verts.id, coalesce(pv.triangles, 0) AS triangles
       |FROM verts LEFT JOIN pv ON verts.id = pv.id""".stripMargin

  /** GraphX-semantics static PageRank, unrolled to 10 iterations of SQL for
    * the DuckDB oracle (no recursive-CTE aggregation needed) — generic in
    * the edges CTE so the nation graph (g3) and the region "states" graph
    * (g7) share one oracle text. */
  private def pageRankSqlFor(edgesCte: String, dp: Int = 6): String = {
    val iters = (1 to 10).map { i =>
      s"""r$i AS (
         |  SELECT v.id, 0.15 + 0.85 * coalesce(c.contrib, 0) AS pr
         |  FROM v LEFT JOIN (
         |    SELECT ew.dst, sum(r${i - 1}.pr * ew.weight) AS contrib
         |    FROM ew JOIN r${i - 1} ON ew.src = r${i - 1}.id GROUP BY ew.dst) c
         |  ON v.id = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${edgesCte},
       |e AS (SELECT src, dst, count(*) AS w FROM edges GROUP BY src, dst),
       |o AS (SELECT src, sum(w) AS outdeg FROM e GROUP BY src),
       |ew AS (SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.outdeg AS weight
       |  FROM e JOIN o ON e.src = o.src),
       |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |r0 AS (SELECT id, 1.0 AS pr FROM v),
       |$iters
       |SELECT id, round(pr, $dp) AS pr FROM r10""".stripMargin
  }
  private val PageRankSql: String = pageRankSqlFor(EdgesCte)

  /** The "states" graph of the reference's SECOND GraphFrames suite
    * (/root/reference/src/graphframes_flights.py:91-155): flights joined
    * twice against the airports dim to lift airport endpoints to their
    * STATE, then the same metrics over the coarser graph. Star-schema
    * equivalent: nation→REGION via the region dim — built with the
    * reference's exact rename-order mechanics (ref :98-105, the J10
    * subtlety): both joins hit the SAME decoded dim frame, the first
    * USING-join's STATE is consumed by an immediate rename before the
    * second join re-introduces the name. */
  private def regionEdges(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    // the "airports" analogue: (nationkey, STATE = region name)
    val nationState = t.nation
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("r_name").as("STATE"))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nationState.withColumnRenamed("n_nationkey", "c_nationkey")),
        Seq("c_nationkey"))
      .withColumnRenamed("STATE", "src")
      .join(broadcast(nationState.withColumnRenamed("n_nationkey", "s_nationkey")),
        Seq("s_nationkey"))
      .withColumnRenamed("STATE", "dst")
      .select("src", "dst")
  }

  private val RegionEdgesCte =
    """edges AS (
      |  SELECT rc.r_name AS src, rs.r_name AS dst
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      |  JOIN region rc ON nc.n_regionkey = rc.r_regionkey
      |  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      |  JOIN region rs ON ns.n_regionkey = rs.r_regionkey)""".stripMargin

  val defs: Seq[QDef] = Seq(

    // G1 — graph construction: vertices/edges by column projection (ref:
    // src/graphframes_flights.py:27-34); materialized as the collapsed edge
    // list with multiplicities.
    QDef("g1_edge_construction",
      s"""WITH ${EdgesCte}
         |SELECT src, dst, count(*) AS cnt FROM edges GROUP BY src, dst""".stripMargin) {
      (s, d) => edges(s, d).groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    },

    // G2 — inDegrees: parallel edges counted, 0-in-degree vertices absent
    // (ref: src/graphframes_flights.py:37-41).
    QDef("g2_indegrees",
      s"""WITH ${EdgesCte}
         |SELECT dst AS id, count(*) AS inDegree FROM edges GROUP BY dst""".stripMargin) {
      (s, d) => GraphMetrics.inDegrees(edges(s, d))
    },

    // G3 — static PageRank, resetProb=0.15, maxIter=10, GraphX/GraphFrames
    // normalization (ref: src/graphframes_flights.py:44-46).
    QDef("g3_pagerank", PageRankSql) { (s, d) =>
      GraphMetrics.staticPageRank(edges(s, d), 0.15, 10)
        .select(col("id"), round(col("pr"), 6).as("pr"))
    },

    // G4 — per-vertex triangle count over the canonicalized (undirected,
    // deduped, no self-loop) sparse subgraph (ref: src/graphframes_flights.py:48-49).
    QDef("g4_triangle_count", TriangleSql) { (s, d) =>
      GraphMetrics.triangleCounts(edges(s, d, Some(col("l_extendedprice") > 100000)))
    },

    // G5 — single-source BFS hop distances over the sparse subgraph:
    // frontier iteration in the engine (iterations = diameter, per-round
    // shuffle = frontier size) vs a bounded recursive CTE in the oracle
    // (UNION-distinct on (id, depth), min depth per vertex = BFS distance).
    // The depth bound exists only to stop cycles from generating (id, d+1)
    // rows forever; it is DERIVED as the vertex count (eccentricity is
    // always < |V|) rather than a constant — the engine's bfsHops iterates
    // until the frontier empties, so a constant the subgraph's diameter
    // could outgrow at another scale factor would silently drop far
    // vertices from the oracle only.
    // GraphX ShortestPaths agreement is property-tested in GraphMetricsSpec.
    QDef("x_graph_bfs",
      s"""WITH RECURSIVE ${SparseEdgesCte},
         |nv AS (
         |  SELECT count(*) AS n FROM (
         |    SELECT src AS v FROM edges UNION SELECT dst FROM edges)),
         |walk(id, d) AS (
         |  SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d
         |  UNION
         |  SELECT CAST(e.dst AS BIGINT), w.d + 1
         |  FROM walk w JOIN edges e ON e.src = w.id
         |  WHERE w.d < (SELECT n FROM nv))
         |SELECT id, CAST(min(d) AS BIGINT) AS hops FROM walk GROUP BY id""".stripMargin) {
      (s, d) =>
        GraphMetrics.bfsHops(
          edges(s, d, Some(col("l_extendedprice") > 100000)), source = 0L)
    },

    // G6 — "states" graph edge construction (ref:
    // src/graphframes_flights.py:98-109): the rename-order double dim join
    // lifting both endpoints to their region, collapsed with
    // multiplicities like g1.
    QDef("g6_state_edges",
      s"""WITH ${RegionEdgesCte}
         |SELECT src, dst, count(*) AS cnt FROM edges GROUP BY src, dst""".stripMargin) {
      (s, d) => regionEdges(s, d).groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    },

    // G7 — state-graph inDegrees (ref: src/graphframes_flights.py:119-123):
    // parallel edges counted.
    QDef("g7_state_indegrees",
      s"""WITH ${RegionEdgesCte}
         |SELECT dst AS id, count(*) AS inDegree FROM edges GROUP BY dst""".stripMargin) {
      (s, d) => GraphMetrics.inDegrees(regionEdges(s, d))
    },

    // G8 — state-graph static PageRank (ref:
    // src/graphframes_flights.py:131-133): resetProb=0.15, maxIter=10,
    // with the vertex set passed EXPLICITLY as the reference builds it
    // (union + distinct of both endpoints, ref :108-109).
    QDef("g8_state_pagerank", pageRankSqlFor(RegionEdgesCte)) { (s, d) =>
      val e = regionEdges(s, d)
      val vertices = e.select(col("src").as("id"))
        .union(e.select(col("dst"))).distinct()
      GraphMetrics.staticPageRank(e, 0.15, 10, Some(vertices))
        .select(col("id"), round(col("pr"), 6).as("pr"))
    },

    // GraphX-path PageRank as a REGISTERED operator (not just the spec
    // cross-check): the RDD/Pregel implementation a user would reach for
    // at cluster scale, verified against the same unrolled-SQL oracle.
    // GraphX's message-sum order differs from the DataFrame loop's, so
    // the doubles agree only to ~1e-9 (GraphMetricsSpec pins that bound);
    // the release rounds at 4dp — a ~1e-5 boundary-flip margin — instead
    // of the DF path's 6dp, which sits too close to the drift to hash
    // stably across scale factors.
    QDef("x_graphx_pagerank", pageRankSqlFor(EdgesCte, dp = 4)) { (s, d) =>
      val e = edges(s, d)
      // GraphX widens vertex ids to VertexId (long); restore the edge
      // frame's nationkey dtype so the schema matches the oracle's
      GraphMetrics.pageRankGraphX(s, e, 0.15, 10)
        .select(col("id").cast(e.schema("src").dataType).as("id"),
          round(col("pr"), 4).as("pr"))
    },

    // GraphX-path triangle count as a REGISTERED operator (the RDD
    // cross-check of g4, same oracle text). TriangleCount.run canonicalizes
    // internally (dedup + orient src<dst) but keeps every vertex of its
    // input graph, so self-loop-only vertices are dropped HERE (src≠dst)
    // to match the oracle's vertex set (endpoints of canonical edges);
    // counts are exact integers, so the release needs no rounding margin.
    QDef("x_graphx_triangles", TriangleSql) { (s, d) =>
      val e = edges(s, d, Some(col("l_extendedprice") > 100000))
        .filter(col("src") =!= col("dst"))
      GraphMetrics.triangleCountGraphX(s, e)
        .select(col("id").cast(e.schema("src").dataType).as("id"),
          col("triangles"))
    }
  )
}
