package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-53 batch: embedding-health and basket-analysis operators for
  * the training-data pipeline — per-dimension statistics (dead-dim /
  * scale-drift detection), the vector-norm profile, clustering quality
  * of the labeled embedding space (Calinski-Harabasz + simplified
  * silhouette), and 3-itemset mining with in-row combination
  * expansion.
  *
  * Scale posture: the embedding operators cost one (or, for cluster
  * quality, two) corpus passes — posexplode collapses to (dim)- or
  * (label × dim)-bounded frames (64 / 640 rows), and the per-vector
  * second pass joins only the broadcast 640-row centroid frame. The
  * triple miner is the x_item_cf lesson applied to 3-itemsets: the
  * combinations expand IN-ROW per basket (nested sequence/transform
  * HOFs over the sorted brand set — C(k,3) rows per order, never a
  * 3-way self-join of the fact table); the DuckDB oracle keeps the
  * classic triple self-join, documenting the gap. No SQL twins: the
  * engine sides are HOF/lambda programs (Spark `transform`/`aggregate`
  * vs DuckDB `list_transform`/`list_sum`), not one shared text — the
  * x_sim family convention. */
object R53Ops {

  /** Per-dimension embedding statistics — dead dimensions and scale
    * drift show up as near-zero σ or off-scale means. One posexplode
    * collapse to 64 rows; moments from (n, Σv, Σv²). */
  private val DimStatsOracle =
    """WITH e AS (SELECT CAST(j AS INT) + 1 AS dim,
      |  CAST(embedding[CAST(j AS INT) + 1] AS DOUBLE) AS v
      |  FROM embeddings, unnest(range(0, 64)) t(j)),
      |mo AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
      |  sum(v) AS s, sum(v * v) AS q, min(v) AS mn, max(v) AS mx
      |  FROM e GROUP BY 1)
      |SELECT dim, n, round(s / n, 6) AS mu,
      |  round(sqrt((n * q - s * s) / (CAST(n AS DOUBLE) * (n - 1))), 6)
      |    AS sd,
      |  round(mn, 6) AS min_v, round(mx, 6) AS max_v
      |FROM mo ORDER BY dim""".stripMargin

  /** L2-norm profile of the embedding corpus — normalized stores drift
    * away from unit norm after bad ingestion; the non-unit count is the
    * alarm. One pass, in-row lambda reduction. */
  private val NormProfileOracle =
    """WITH n AS (SELECT vec_id,
      |  sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings)
      |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
      |  round(avg(nrm), 6) AS mean_norm,
      |  round(min(nrm), 6) AS min_norm,
      |  round(max(nrm), 6) AS max_norm,
      |  CAST(sum(CASE WHEN abs(nrm - 1.0e0) > 1.0e-3 THEN 1 ELSE 0
      |    END) AS BIGINT) AS n_nonunit
      |FROM n""".stripMargin

  /** Clustering quality of the labeled embedding space: Calinski-
    * Harabasz = (B/(k−1))/(W/(n−k)) and the simplified (centroid)
    * silhouette. Centroids 6 dp-snapped so both engines measure
    * distances to identical points. */
  private val ClusterQualityOracle =
    """WITH e AS (SELECT vec_id, label, CAST(j AS INT) + 1 AS dim,
      |  CAST(embedding[CAST(j AS INT) + 1] AS DOUBLE) AS v
      |  FROM embeddings, unnest(range(0, 64)) t(j)),
      |cen AS (SELECT label AS cl, dim, round(avg(v), 6) AS c
      |  FROM e GROUP BY 1, 2),
      |gc AS (SELECT dim, avg(v) AS g FROM e GROUP BY 1),
      |sizes AS (SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT)
      |    AS nl
      |  FROM e GROUP BY 1),
      |btw AS (SELECT sum(sizes.nl * (cen.c - gc.g) * (cen.c - gc.g))
      |    AS b
      |  FROM cen JOIN gc ON cen.dim = gc.dim
      |  JOIN sizes ON cen.cl = sizes.label),
      |d2 AS (SELECT e.vec_id, e.label, cen.cl,
      |  sum((e.v - cen.c) * (e.v - cen.c)) AS d2
      |  FROM e JOIN cen ON e.dim = cen.dim
      |  GROUP BY 1, 2, 3),
      |sil AS (SELECT vec_id, label,
      |  max(CASE WHEN cl = label THEN sqrt(d2) END) AS a,
      |  min(CASE WHEN cl <> label THEN sqrt(d2) END) AS b
      |  FROM d2 GROUP BY 1, 2),
      |w AS (SELECT sum(a * a) AS w,
      |  CAST(count(*) AS DOUBLE) AS n,
      |  avg((b - a) / greatest(a, b)) AS msil FROM sil),
      |k AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM sizes)
      |SELECT CAST(w.n AS BIGINT) AS n_vecs, CAST(k.k AS BIGINT)
      |    AS n_labels,
      |  round((btw.b / (k.k - 1)) / (w.w / (w.n - k.k)), 4)
      |    AS calinski_harabasz,
      |  round(w.msil, 6) AS mean_silhouette
      |FROM w, k, btw""".stripMargin

  /** Top-5 brand 3-itemsets by support with independence lift. The
    * oracle's triple self-join is the textbook form; the engine
    * expands combinations IN-ROW (C(k,3) per basket). */
  private val TriplesOracle =
    """WITH ob AS (SELECT DISTINCT l.l_orderkey AS k, p.p_brand AS b
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |tri AS (SELECT a.k, a.b AS b1, c.b AS b2, e.b AS b3
      |  FROM ob a
      |  JOIN ob c ON a.k = c.k AND c.b > a.b
      |  JOIN ob e ON a.k = e.k AND e.b > c.b),
      |cnt AS (SELECT b1, b2, b3, CAST(count(*) AS BIGINT) AS support
      |  FROM tri GROUP BY 1, 2, 3),
      |n AS (SELECT CAST(count(DISTINCT k) AS DOUBLE) AS n FROM ob),
      |f AS (SELECT b, CAST(count(*) AS BIGINT) AS fb FROM ob
      |  GROUP BY 1)
      |SELECT cnt.b1 AS brand_a, cnt.b2 AS brand_b, cnt.b3 AS brand_c,
      |  cnt.support,
      |  round(cnt.support * n.n * n.n
      |    / (CAST(fa.fb AS DOUBLE) * fb2.fb * fc.fb), 4) AS lift
      |FROM cnt, n
      |JOIN f fa ON fa.b = cnt.b1
      |JOIN f fb2 ON fb2.b = cnt.b2
      |JOIN f fc ON fc.b = cnt.b3
      |ORDER BY cnt.support DESC, brand_a, brand_b, brand_c
      |LIMIT 5""".stripMargin

  val defs: Seq[QDef] = Seq(

    // EMBEDDING DIM STATS: the one-pass health check every embedding
    // store needs — dead dims and scale drift as 64 bounded rows.
    QDef("x_embed_dim_stats", DimStatsOracle) { (s, d) =>
      val e = Tables(s, d).embeddings
        .select(posexplode(col("embedding")).as(Seq("j", "vf")))
        .select((col("j") + 1).cast("int").as("dim"),
          col("vf").cast("double").as("v"))
      val mo = e.groupBy("dim").agg(count(lit(1)).as("n"),
        sum("v").as("s"), sum(col("v") * col("v")).as("q"),
        min("v").as("mn"), max("v").as("mx"))
      mo.select(col("dim"), col("n"),
          round(col("s") / col("n"), 6).as("mu"),
          round(sqrt((col("n") * col("q") - col("s") * col("s"))
            / (col("n").cast("double") * (col("n") - 1))), 6).as("sd"),
          round(col("mn"), 6).as("min_v"),
          round(col("mx"), 6).as("max_v"))
        .orderBy("dim")
    },

    // NORM PROFILE: unit-norm contract check — one in-row lambda
    // reduction, one global aggregate.
    QDef("x_embed_norm_profile", NormProfileOracle) { (s, d) =>
      val n = Tables(s, d).embeddings.select(
        sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")))
          .as("nrm"))
      n.agg(count(lit(1)).as("n_vecs"),
        round(avg("nrm"), 6).as("mean_norm"),
        round(min("nrm"), 6).as("min_norm"),
        round(max("nrm"), 6).as("max_norm"),
        sum(when(abs(col("nrm") - 1.0) > 1e-3, 1L).otherwise(0L))
          .cast("bigint").as("n_nonunit"))
    },

    // CLUSTER QUALITY: is the labeled embedding space separable —
    // CH index + simplified silhouette from two bounded-frame passes.
    QDef("x_embed_cluster_quality", ClusterQualityOracle) { (s, d) =>
      val e = Tables(s, d).embeddings
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("j", "vf")))
        .select(col("vec_id"), col("label"),
          (col("j") + 1).cast("int").as("dim"),
          col("vf").cast("double").as("v"))
      val cen = e.groupBy(col("label").as("cl"), col("dim"))
        .agg(round(avg("v"), 6).as("c"))
      val gc = e.groupBy("dim").agg(avg("v").as("g"))
      val sizes = e.groupBy("label")
        .agg(countDistinct("vec_id").as("nl"))
      val btw = cen.join(broadcast(gc), "dim")
        .join(broadcast(sizes), col("cl") === col("label"))
        .agg(sum(col("nl") * (col("c") - col("g"))
          * (col("c") - col("g"))).as("b"))
      val d2 = e.join(broadcast(cen), "dim")
        .groupBy(col("vec_id"), col("label"), col("cl"))
        .agg(sum((col("v") - col("c")) * (col("v") - col("c")))
          .as("d2"))
      val sil = d2.groupBy("vec_id", "label").agg(
        max(when(col("cl") === col("label"), sqrt(col("d2"))))
          .as("a"),
        min(when(col("cl") =!= col("label"), sqrt(col("d2"))))
          .as("b"))
      val w = sil.agg(sum(col("a") * col("a")).as("w"),
        count(lit(1)).cast("double").as("n"),
        avg((col("b") - col("a")) / greatest(col("a"), col("b")))
          .as("msil"))
      val k = sizes.agg(count(lit(1)).cast("double").as("k"))
      w.crossJoin(broadcast(k)).crossJoin(broadcast(btw))
        .select(col("n").cast("bigint").as("n_vecs"),
          col("k").cast("bigint").as("n_labels"),
          round((col("b") / (col("k") - 1))
            / (col("w") / (col("n") - col("k"))), 4)
            .as("calinski_harabasz"),
          round(col("msil"), 6).as("mean_silhouette"))
    },

    // BASKET TRIPLES: 3-itemset mining with IN-ROW combination
    // expansion — C(k,3) rows per basket from nested HOFs over the
    // sorted brand set; the corpus is read once, never 3-way
    // self-joined (the oracle keeps the textbook join for contrast).
    QDef("x_basket_triples", TriplesOracle) { (s, d) =>
      val t = Tables(s, d)
      val ob = t.lineitem
        .join(broadcast(t.part.select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("k"), col("p_brand").as("b"))
        .distinct()
      val baskets = ob.groupBy("k")
        .agg(sort_array(collect_set("b")).as("bs"))
        .filter(size(col("bs")) >= 3)
      val tri = baskets.select(explode(expr(
        """flatten(transform(sequence(0, size(bs) - 3), i ->
          |  flatten(transform(sequence(i + 1, size(bs) - 2), j ->
          |    transform(sequence(j + 1, size(bs) - 1), k2 ->
          |      struct(bs[i] AS b1, bs[j] AS b2, bs[k2] AS b3))))))"""
          .stripMargin)).as("t"))
        .select(col("t.b1"), col("t.b2"), col("t.b3"))
      val cnt = tri.groupBy("b1", "b2", "b3")
        .agg(count(lit(1)).as("support"))
      val nOrd = ob.agg(countDistinct("k").cast("double").as("n"))
      val f = ob.groupBy("b").agg(count(lit(1)).as("fb"))
      cnt.crossJoin(broadcast(nOrd))
        .join(broadcast(f.select(col("b").as("ba"),
          col("fb").as("fa"))), col("b1") === col("ba"))
        .join(broadcast(f.select(col("b").as("bb"),
          col("fb").as("fbb"))), col("b2") === col("bb"))
        .join(broadcast(f.select(col("b").as("bc"),
          col("fb").as("fc"))), col("b3") === col("bc"))
        .select(col("b1").as("brand_a"), col("b2").as("brand_b"),
          col("b3").as("brand_c"), col("support"),
          round(col("support") * col("n") * col("n")
            / (col("fa").cast("double") * col("fbb") * col("fc")), 4)
            .as("lift"))
        .orderBy(col("support").desc, col("brand_a"), col("brand_b"),
          col("brand_c"))
        .limit(5)
    })
}
