package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph metrics over an edge DataFrame with `src`/`dst` columns — the
  * capability surface of the reference's GraphFrames usage
  * (`/root/reference/src/graphframes_flights.py:15-155`) without the
  * GraphFrames dependency.
  *
  * Two implementations:
  *   - pure-DataFrame (stays in Catalyst/AQE; used by the registered queries
  *     and the scale path — every step is a hash aggregate or broadcast-able
  *     join, and PageRank truncates lineage per iteration);
  *   - GraphX (`/opt/spark/jars/spark-graphx_2.13-4.1.2.jar`), used as a
  *     cross-check in tests (GraphFrames itself delegates to GraphX, so this
  *     pins the reference semantics).
  */
object GraphMetrics {

  /** Per-vertex incoming-edge count; parallel edges counted, vertices with no
    * in-edges absent — exactly GraphFrames `graph.inDegrees`
    * (ref: src/graphframes_flights.py:37-41). One hash aggregate. */
  def inDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("inDegree"))

  /** Per-vertex outgoing-edge count (GraphFrames `outDegrees`). */
  def outDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outDegree"))

  /** Fixed-iteration (non-converged) PageRank matching GraphX
    * `PageRank.run(numIter, resetProb)` — which is what GraphFrames
    * `pageRank(resetProbability, maxIter)` runs (ref:
    * src/graphframes_flights.py:44-46): ranks start at 1.0, each iteration
    * rank' = resetProb + (1-resetProb) · Σ incoming rank·weight, edge weight
    * = multiplicity / outDegree(src). Dangling vertices keep resetProb.
    *
    * Scale design: parallel edges are collapsed to (src, dst, weight) FIRST —
    * the per-iteration join then touches |distinct pairs| rows, not |edges|;
    * ranks are vertex-count-sized. `localCheckpoint` per iteration truncates
    * the 10-deep lineage (SURVEY §4.3 O3). */
  def staticPageRank(edges: DataFrame, resetProb: Double = 0.15, numIter: Int = 10,
      vertexDf: Option[DataFrame] = None): DataFrame = {
    val collapsed = edges.groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val outDeg = collapsed.groupBy("src").agg(sum(col("w")).as("outdeg"))
    val weighted = collapsed.join(outDeg, "src")
      .select(col("src"), col("dst"), (col("w").cast("double") / col("outdeg")).as("weight"))
      .localCheckpoint()
    // GraphFrames builds the graph from an explicit vertex DF, so isolated
    // vertices exist and finish at rank = resetProb; default to edge endpoints.
    val vertices = vertexDf.getOrElse(
        collapsed.select(col("src").as("id"))
          .union(collapsed.select(col("dst").as("id"))).distinct())
      .select("id").localCheckpoint()
    var ranks = vertices.withColumn("pr", lit(1.0))
    for (i <- 1 to numIter) {
      val contribs = weighted.join(ranks, col("src") === col("id"))
        .groupBy(col("dst")).agg(sum(col("pr") * col("weight")).as("contrib"))
      val next = vertices.join(contribs, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(resetProb) + lit(1 - resetProb) * coalesce(col("contrib"), lit(0.0))).as("pr"))
      // checkpoint every 3rd round, not every round: rank lineage grows
      // LINEARLY (each round references the previous ranks exactly once —
      // no self-join, unlike Dedup.clusters), so three chained rounds
      // optimize as ONE job with three pipelined shuffles; the cadence
      // still bounds plan depth and drops the per-iteration job barrier
      // (10 jobs → 4, measured ~2× on the scheduling-floor-bound bench)
      ranks = if (i % 3 == 0 || i == numIter) next.localCheckpoint() else next
    }
    ranks
  }

  /** Per-vertex triangle count with GraphFrames semantics: direction ignored,
    * edges deduplicated, self-loops dropped (ref:
    * src/graphframes_flights.py:48-49). Implemented as the canonical a<b<c
    * three-way self-join; every vertex of the undirected edge set appears
    * (0 for triangle-free vertices).
    *
    * Scale design: the self-join shuffles on the join keys; at web scale
    * you'd pre-partition `und` by `a` and rely on AQE skew splitting —
    * semantics unchanged. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val t1 = und.as("t1"); val t2 = und.as("t2"); val t3 = und.as("t3")
    val tri = t1.join(t2, col("t1.b") === col("t2.a"))
      .join(t3, col("t3.a") === col("t1.a") && col("t3.b") === col("t2.b"))
      .select(col("t1.a").as("x"), col("t1.b").as("y"), col("t2.b").as("z"))
    val perVertex = tri.select(col("x").as("id"))
      .union(tri.select(col("y").as("id")))
      .union(tri.select(col("z").as("id")))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val vertices = und.select(col("a").as("id")).union(und.select(col("b").as("id"))).distinct()
    vertices.join(perVertex, Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Single-source BFS: minimum hop count from `source` to every reachable
    * vertex over the directed edge set (unreachable vertices absent; the
    * source itself at 0 hops).
    *
    * Frontier iteration — the textbook distributed BFS: each round joins
    * ONLY the newly-discovered frontier against the edge list, anti-joins
    * the visited set, and stops when the frontier empties. Iterations =
    * graph diameter (not vertex count); per-round shuffle is frontier-sized,
    * the visited set is vertex-sized, and `localCheckpoint` per round keeps
    * the plan flat (same cadence rationale as [[staticPageRank]]). Parallel
    * edges are collapsed first — multiplicity adds nothing to reachability.
    */
  def bfsHops(edges: DataFrame, source: Long): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct().localCheckpoint()
    var visited = Seq((source, 0L)).toDF("id", "hops").localCheckpoint()
    var frontier = visited.select("id")
    var hop = 0L
    while (!frontier.isEmpty) {
      hop += 1
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint()
      visited = visited.union(next.withColumn("hops", lit(hop))).localCheckpoint()
      frontier = next
    }
    visited
  }

  /** Single-source shortest paths over positively-weighted directed edges
    * (`src`, `dst`, `w`): minimum total weight from `source` to every
    * reachable vertex (unreachable absent; the source at 0).
    *
    * Delta-style Bellman-Ford — the Pregel SSSP shape: each round relaxes
    * ONLY the frontier (vertices whose distance improved last round)
    * against the edge list, folds candidate distances into the running
    * minimum, and stops when no distance improves. Parallel edges collapse
    * to their min weight first (only the lightest copy can ever be on a
    * shortest path). Per-round work is frontier×out-edges, not |V|×|E| —
    * the distributed win over textbook Bellman-Ford; rounds ≤ the longest
    * shortest-path hop count. `localCheckpoint` per round truncates
    * lineage exactly like [[bfsHops]]. Positive weights make each
    * improvement final-monotone, so the fixpoint is Dijkstra-exact. */
  def sssp(edgesW: DataFrame, source: Long): DataFrame = {
    val spark = edgesW.sparkSession
    import spark.implicits._
    val e = edgesW
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
        col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(min(col("w")).as("w"))
      .localCheckpoint()
    var dist = Seq((source, 0L)).toDF("id", "dist").localCheckpoint()
    var frontier = dist
    while (!frontier.isEmpty) {
      val cand = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id"), (frontier("dist") + e("w")).as("nd"))
        .groupBy("id").agg(min(col("nd")).as("nd"))
      val old = dist.select(col("id").as("oid"), col("dist").as("old"))
      val improved = cand.join(old, cand("id") === old("oid"), "left")
        .filter(col("old").isNull || col("nd") < col("old"))
        .select(col("id"), col("nd").as("dist"))
        .localCheckpoint()
      dist = dist.unionByName(improved)
        .groupBy("id").agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      frontier = improved
    }
    dist
  }

  // ---- GraphX cross-check implementations (integer vertex ids) ----

  private def toGraphX(spark: SparkSession, edges: DataFrame): Graph[Int, Int] = {
    val edgeRdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph.fromEdges(edgeRdd, defaultValue = 0)
  }

  def pageRankGraphX(spark: SparkSession, edges: DataFrame,
      resetProb: Double = 0.15, numIter: Int = 10): DataFrame = {
    import spark.implicits._
    val g = toGraphX(spark, edges)
    org.apache.spark.graphx.lib.PageRank.run(g, numIter, resetProb)
      .vertices.map { case (id, r) => (id, r) }.toDF("id", "pr")
  }

  def triangleCountGraphX(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val g = toGraphX(spark, edges)
    org.apache.spark.graphx.lib.TriangleCount.run(g)
      .vertices.map { case (id, n) => (id, n.toLong) }.toDF("id", "triangles")
  }

  /** GraphX cross-check for [[bfsHops]]. ShortestPaths computes each
    * vertex's distance TO the landmark along out-edges, so the graph is
    * reversed to get distance FROM the source. */
  def bfsGraphX(spark: SparkSession, edges: DataFrame, source: Long): DataFrame = {
    import spark.implicits._
    val g = toGraphX(spark,
      edges.select(col("dst").as("src"), col("src").as("dst")))
    org.apache.spark.graphx.lib.ShortestPaths.run(g, Seq(source))
      .vertices.flatMap { case (id, m) => m.get(source).map(d => (id, d.toLong)) }
      .toDF("id", "hops")
  }

  /** Connected components (undirected view of the edge set): `(id, comp)`
    * with `comp` = the minimum vertex id reachable from `id` — the same
    * labeling GraphFrames/GraphX `connectedComponents` produces. Isolated
    * vertices don't appear in an edge list and are absent, matching
    * GraphFrames over its own edge-derived vertex set.
    *
    * Delegates to [[graft.llm.Dedup.clusters]] — the pointer-jumping
    * min-label propagation built for duplicate-cluster discovery IS
    * distributed connected components (one join + one aggregate per round,
    * label shortcutting makes rounds O(log diameter), lineage truncated per
    * round). One algorithm, two surfaces. */
  def connectedComponents(edges: DataFrame): DataFrame =
    graft.llm.Dedup.clusters(
      edges.select(col("src").cast("long").as("d1"), col("dst").cast("long").as("d2")))

  /** Synchronous label propagation (community detection), `iters` rounds:
    * every vertex starts labeled by its own id; each round every vertex
    * adopts the MOST FREQUENT label among its neighbors (undirected view),
    * ties to the smallest label — the deterministic synchronous LPA
    * variant (GraphX `LabelPropagation` semantics with a total tie order,
    * so rounds are reproducible and an unrolled SQL oracle can replay
    * them). Vertices keep their label if they have no neighbors.
    *
    * Per round: one edge⋈labels join + one (vertex, label) count aggregate
    * + one per-vertex argmax — all shuffle-partitioned by vertex id, the
    * same per-round cost class as one PageRank step; `localCheckpoint`
    * per round keeps plans flat. Fixed iteration count by contract (LPA
    * oscillates on bipartite structures; bounded rounds are the standard
    * posture). */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
    val und = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .distinct().filter(col("u") =!= col("v")).localCheckpoint()
    var lab = und.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")).localCheckpoint()
    for (_ <- 1 to iters) {
      val freq = und
        .join(lab.select(col("id").as("v"), col("lbl")), "v")
        .groupBy(col("u").as("id"), col("lbl")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("c").desc, col("lbl"))
      lab = freq
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1).select(col("id"), col("lbl"))
        .localCheckpoint()
    }
    lab
  }

  /** k-core decomposition by iterative peeling: repeatedly drop every
    * vertex whose degree within the surviving subgraph is < k; what's left
    * after the fixpoint is the k-core. Vertex ids stay whatever type the
    * edge frame carries (brand strings, user longs — no cast).
    *
    * `rounds` is FIXED (not run-to-convergence) so the unrolled SQL oracle
    * replays the identical trajectory — a round after the fixpoint is a
    * no-op, so any rounds ≥ the peel depth gives the exact k-core. Per
    * round: one alive-filter of the edge list (two vertex-keyed joins) +
    * one degree aggregate, all partitioned by vertex — frames shrink
    * monotonically, `localCheckpoint` truncates the growing lineage (the
    * pageRank/sssp cadence). Returns (id, deg): core vertices with their
    * within-core degree.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e0 = edges.select(col("src").as("u"), col("dst").as("v"))
    val und = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().filter(col("u") =!= col("v")).localCheckpoint()
    var cur = und
    var alive = und.select("u").distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      cur = cur.join(alive, "u")
        .join(alive.select(col("u").as("v")), "v")
        .select("u", "v").localCheckpoint()
      alive = cur.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("u").localCheckpoint()
    }
    cur.join(alive, "u")
      .join(alive.select(col("u").as("v")), "v")
      .groupBy("u").agg(count(lit(1)).as("deg"))
      .select(col("u").as("id"), col("deg").cast("long").as("deg"))
  }

  /** GraphX cross-check for [[connectedComponents]] (tests only). */
  def connectedComponentsGraphX(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    toGraphX(spark, edges).connectedComponents()
      .vertices.map { case (id, comp) => (id, comp) }.toDF("id", "comp")
  }
}
