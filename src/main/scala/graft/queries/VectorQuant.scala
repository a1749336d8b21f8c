package graft.queries

import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.llm.{Pq, Similarity}

/** Product-quantization queries over the `embeddings` table — train m
  * per-subspace codebooks (deterministic k-means), encode the corpus as m
  * small code ids, search via ADC lookup tables, and measure the
  * compression's recall against exact L2. The DuckDB oracles replay the
  * whole chain: m independent k-means CTE chains (StarExt.kmeansCtes with a
  * per-subspace prefix), argmin encode, per-query LUTs, and the summed
  * table lookups.
  *
  * Fixed test geometry: dims=64 split into M=4 subspaces of 16 floats,
  * KSUB=4 codes per subspace, ITERS=2 training rounds, queries = vec_id<10,
  * k=3.
  */
object VectorQuant {

  private val M = 4
  private val Dims = 64
  private val Dsub = Dims / M
  private val Ksub = 4
  private val Iters = 2

  /** Per-subspace CTEs: 0-based sub-embedding view `sub<s>`, the k-means
    * chain `s<s>c0..c2`, corpus encode `enc<s>(vec_id, code)` (argmin vs
    * the final centroids — identical contract to the chain's assignment
    * rounds), and per-query LUT `lut<s>(qid, code, d2)`. */
  private def subspaceCtes(s: Int): String = {
    val lo = s * Dsub
    val hi = lo + Dsub
    s"""sub$s AS (
       |  SELECT vec_id, j - $lo AS j, e FROM ee WHERE j >= $lo AND j < $hi),
       |${StarExt.kmeansCtes(Ksub, Iters, src = s"sub$s", p = s"s$s")},
       |enc$s AS (
       |  SELECT vec_id, CAST(cid AS INT) AS code FROM (
       |    SELECT v.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY round(sum((v.e - c.c) * (v.e - c.c)), 6), c.cid) AS rn
       |    FROM sub$s v JOIN s${s}c$Iters c ON c.j = v.j
       |    GROUP BY v.vec_id, c.cid) WHERE rn = 1),
       |lut$s AS (
       |  SELECT q.vec_id AS qid, CAST(c.cid AS INT) AS code,
       |    round(sum((q.e - c.c) * (q.e - c.c)), 6) AS d2
       |  FROM sub$s q JOIN s${s}c$Iters c ON c.j = q.j
       |  WHERE q.vec_id < 10
       |  GROUP BY 1, 2)""".stripMargin
  }

  private val AllSubspaces = (0 until M).map(subspaceCtes).mkString(",\n")

  /** ADC chain shared by the top-k and recall oracles: per-subspace LUT
    * lookups joined through the encode table, summed and ranked. */
  private val AdcCtes = {
    val contrib = (0 until M).map(s =>
      s"  SELECT l.qid, e.vec_id AS cid, l.d2 FROM lut$s l JOIN enc$s e ON e.code = l.code")
      .mkString("\n  UNION ALL\n")
    s"""contrib AS (
       |$contrib),
       |adc AS (
       |  SELECT qid, cid, round(sum(d2), 6) AS adc FROM contrib
       |  WHERE cid <> qid GROUP BY 1, 2),
       |ranked AS (
       |  SELECT qid, cid, adc,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS INT) AS rank
       |  FROM adc)""".stripMargin
  }

  /** IVF tier for the IVF-PQ composition: trained coarse centroids
    * (StarExt.kmeansCtes → c2), corpus cell assignment, the query's
    * `IvfPqNprobe` nearest cells, and the candidate set — the rows whose
    * ADC distances (from [[AdcCtes]]'s `adc`) IVF-PQ actually ranks. */
  private val IvfPqNprobe = 2

  private val IvfPqCtes =
    s"""ivfd2 AS (
       |  SELECT v.vec_id, c.cid AS centroid_id,
       |    round(sum((v.e - c.c) * (v.e - c.c)), 6) AS dist2
       |  FROM ee v JOIN c2 c ON c.j = v.j
       |  GROUP BY 1, 2),
       |assign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT vec_id, centroid_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, centroid_id) AS rn
       |    FROM ivfd2) WHERE rn = 1),
       |probe AS (
       |  SELECT vec_id AS qid, centroid_id FROM (
       |    SELECT vec_id, centroid_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, centroid_id) AS rn
       |    FROM ivfd2) WHERE rn <= $IvfPqNprobe AND vec_id < 10),
       |cand AS (
       |  SELECT p.qid, a.vec_id AS cid FROM probe p
       |  JOIN assign a ON a.centroid_id = p.centroid_id AND a.vec_id <> p.qid),
       |ivfranked AS (
       |  SELECT c.qid, c.cid, a.adc,
       |    CAST(row_number() OVER (PARTITION BY c.qid ORDER BY a.adc, c.cid) AS INT)
       |      AS rank
       |  FROM cand c JOIN adc a ON a.qid = c.qid AND a.cid = c.cid)""".stripMargin

  val defs: Seq[QDef] = Seq(

    // PQ encode: the corpus compressed to m=4 sub-centroid ids per vector
    // (256 bytes -> 4 codes). Map-only over a broadcast codebook; the
    // oracle replays all four subspace k-means chains and the argmin.
    QDef("x_pq_encode",
      s"""WITH ${StarExt.EmbExpl},
         |$AllSubspaces
         |SELECT vec_id, CAST(s AS INT) AS subspace, code FROM (
         |  SELECT vec_id, 0 AS s, code FROM enc0
         |  UNION ALL SELECT vec_id, 1 AS s, code FROM enc1
         |  UNION ALL SELECT vec_id, 2 AS s, code FROM enc2
         |  UNION ALL SELECT vec_id, 3 AS s, code FROM enc3)""".stripMargin) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val cb = Pq.pqTrain(emb, M, Dims, Ksub, Iters)
      Pq.pqEncode(emb, cb, M, Dims)
        .select(col("vec_id"), posexplode(col("codes")))
        .select(col("vec_id"), col("pos").cast("int").as("subspace"),
          col("col").as("code"))
    },

    // ADC top-3: approximate L2 search over the codes — per-query exact
    // LUT, candidate distance = sum of m table lookups, bounded-heap top-k.
    QDef("x_pq_adc_topk",
      s"""WITH ${StarExt.EmbExpl},
         |$AllSubspaces,
         |$AdcCtes
         |SELECT qid, cid, adc, rank FROM ranked WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val cb = Pq.pqTrain(emb, M, Dims, Ksub, Iters)
      val codes = Pq.pqEncode(emb, cb, M, Dims)
      Pq.pqSearchADC(emb.filter(col("vec_id") < 10), codes, cb, M, Dims, 3)
    },

    // PQ recall@3 vs exact L2 ground truth — the compression-loss number.
    QDef("x_pq_recall",
      s"""WITH ${StarExt.EmbExpl},
         |$AllSubspaces,
         |$AdcCtes,
         |bd AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(sum((q.e - c.e) * (q.e - c.e)), 6) AS d2
         |  FROM ee q JOIN ee c ON c.j = q.j AND q.vec_id < 10 AND c.vec_id <> q.vec_id
         |  GROUP BY 1, 2),
         |brute AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn
         |    FROM bd) WHERE rn <= 3),
         |pq AS (SELECT qid, cid FROM ranked WHERE rank <= 3)
         |SELECT b.qid, CAST(count(p.cid) AS INT) AS hits,
         |  round(count(p.cid) / 3.0, 6) AS recall
         |FROM brute b LEFT JOIN pq p ON p.qid = b.qid AND p.cid = b.cid
         |GROUP BY b.qid""".stripMargin) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val cb = Pq.pqTrain(emb, M, Dims, Ksub, Iters)
      Pq.pqRecall(emb.filter(col("vec_id") < 10), emb, cb, M, Dims, 3)
    },

    // Two-stage search: ADC top-8 shortlist, EXACT re-rank to top-3 — the
    // production retrieval shape (compressed scan over everything, full
    // precision over shortlist members only). Distances in the result are
    // exact L2², so the oracle re-ranks the same shortlist relationally.
    QDef("x_pq_rerank",
      s"""WITH ${StarExt.EmbExpl},
         |$AllSubspaces,
         |$AdcCtes,
         |short AS (SELECT qid, cid FROM ranked WHERE rank <= 8),
         |ex AS (
         |  SELECT s.qid, s.cid,
         |    round(sum((q.e - c.e) * (q.e - c.e)), 6) AS d2
         |  FROM short s
         |  JOIN ee q ON q.vec_id = s.qid
         |  JOIN ee c ON c.vec_id = s.cid AND c.j = q.j
         |  GROUP BY 1, 2),
         |rr AS (
         |  SELECT qid, cid, d2,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS INT)
         |      AS rank
         |  FROM ex)
         |SELECT qid, cid, d2 AS dist2, rank FROM rr WHERE rank <= 3""".stripMargin) {
      (s, d) =>
        val emb = Tables(s, d).embeddings
        val cb = Pq.pqTrain(emb, M, Dims, Ksub, Iters)
        Pq.pqRerank(emb.filter(col("vec_id") < 10), emb, cb, M, Dims,
          shortlist = 8, k = 3)
    },

    // IVF-PQ composition (the standard FAISS index posture): trained IVF
    // centroids prune candidates to the query's 2 nearest cells, PQ codes +
    // ADC rank what's left. One map-only corpus pass computes cell AND
    // codes; the oracle replays the IVF k-means, all 4 subspace k-means,
    // cell assignment, probe ranking, and the LUT sums.
    QDef("x_sim_ivfpq_topk",
      s"""WITH ${StarExt.EmbExpl},
         |${StarExt.kmeansCtes(4, 2)},
         |$AllSubspaces,
         |$AdcCtes,
         |$IvfPqCtes
         |SELECT qid, cid, adc, rank FROM ivfranked WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val cents = Similarity.kmeans(emb, 4, 2)
        .select(col("cluster_id").as("vec_id"), col("embedding"))
      val cb = Pq.pqTrain(emb, M, Dims, Ksub, Iters)
      Pq.ivfPqTopK(emb.filter(col("vec_id") < 10), emb, cents, cb, M, Dims,
        k = 3, nprobe = IvfPqNprobe)
    },

    // IVF-PQ recall@3 vs exact L2 — losses from BOTH tiers (a neighbor
    // outside the probed cells is unrecoverable; one inside can still be
    // mis-ranked by quantization). The honesty number for the composed
    // index, same measured-recall contract as x_pq_recall/x_sim_ivf_recall.
    QDef("x_sim_ivfpq_recall",
      s"""WITH ${StarExt.EmbExpl},
         |${StarExt.kmeansCtes(4, 2)},
         |$AllSubspaces,
         |$AdcCtes,
         |$IvfPqCtes,
         |bd AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cid,
         |    round(sum((q.e - c.e) * (q.e - c.e)), 6) AS d2
         |  FROM ee q JOIN ee c ON c.j = q.j AND q.vec_id < 10 AND c.vec_id <> q.vec_id
         |  GROUP BY 1, 2),
         |brute AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid,
         |      row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn
         |    FROM bd) WHERE rn <= 3),
         |ipq AS (SELECT qid, cid FROM ivfranked WHERE rank <= 3)
         |SELECT b.qid, CAST(count(p.cid) AS INT) AS hits,
         |  round(count(p.cid) / 3.0, 6) AS recall
         |FROM brute b LEFT JOIN ipq p ON p.qid = b.qid AND p.cid = b.cid
         |GROUP BY b.qid""".stripMargin) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val cents = Similarity.kmeans(emb, 4, 2)
        .select(col("cluster_id").as("vec_id"), col("embedding"))
      val cb = Pq.pqTrain(emb, M, Dims, Ksub, Iters)
      Pq.ivfPqRecall(emb.filter(col("vec_id") < 10), emb, cents, cb, M, Dims,
        k = 3, nprobe = IvfPqNprobe)
    },

    // The COMPLETE retrieval stack (FAISS IVF..,PQ.. + refine): IVF prunes
    // cells, ADC ranks codes, and only the top-6 shortlist has its
    // full-precision vectors read for exact top-3 ordering — at 100 TB the
    // exact stage touches |queries|·6 vectors of the whole corpus.
    QDef("x_sim_ivfpq_rerank",
      s"""WITH ${StarExt.EmbExpl},
         |${StarExt.kmeansCtes(4, 2)},
         |$AllSubspaces,
         |$AdcCtes,
         |$IvfPqCtes,
         |short AS (SELECT qid, cid FROM ivfranked WHERE rank <= 6),
         |ex AS (
         |  SELECT s.qid, s.cid,
         |    round(sum((q.e - c.e) * (q.e - c.e)), 6) AS d2
         |  FROM short s
         |  JOIN ee q ON q.vec_id = s.qid
         |  JOIN ee c ON c.vec_id = s.cid AND c.j = q.j
         |  GROUP BY 1, 2),
         |rr AS (
         |  SELECT qid, cid, d2,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS INT)
         |      AS rank
         |  FROM ex)
         |SELECT qid, cid, d2 AS dist2, rank FROM rr WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables(s, d).embeddings
      val cents = Similarity.kmeans(emb, 4, 2)
        .select(col("cluster_id").as("vec_id"), col("embedding"))
      val cb = Pq.pqTrain(emb, M, Dims, Ksub, Iters)
      Pq.ivfPqRerank(emb.filter(col("vec_id") < 10), emb, cents, cb, M, Dims,
        shortlist = 6, k = 3, nprobe = IvfPqNprobe)
    },

    // SemDeDup (arXiv:2303.09540): the LEARNED-partition sibling of
    // x_dedup_embedding — k-means clusters (not fixed hyperplanes) gate
    // the cosine verification, so only within-cluster pairs are scored.
    // Oracle replays training (kmeansCtes), final-centroid assignment,
    // and the in-cluster pair scoring. Threshold 0.4 is calibrated to
    // this synthetic corpus (max within-cluster cos ≈ 0.51 — the data
    // has no planted near-identical vectors).
    QDef("x_dedup_semantic",
      s"""WITH ${StarExt.EmbExpl},
         |${StarExt.NormsCte},
         |${semDedupCtes(0.4)}
         |SELECT d1, d2, cos FROM pairs""".stripMargin) { (s, d) =>
      Similarity.semDedupPairs(Tables(s, d).embeddings, 4, 2, 0.4)
    },

    // Prototype-distance filtering (D4, arXiv:2308.12284): rank vectors
    // by distance to their own k-means prototype, drop the nearest 10%
    // (redundancy around the prototype) and farthest 10% (outliers) per
    // cluster. Cut points are floor(p*n) INTEGER ranks in both engines.
    QDef("x_prototype_filter",
      s"""WITH ${StarExt.EmbExpl},
         |${StarExt.kmeansCtes(4, 2)},
         |pfa AS (
         |  SELECT vec_id, cid, d2 FROM (
         |    SELECT v.vec_id, c.cid,
         |      round(sum((v.e - c.c) * (v.e - c.c)), 6) AS d2,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(sum((v.e - c.c) * (v.e - c.c)), 6), c.cid) AS rn
         |    FROM ee v JOIN c2 c ON c.j = v.j
         |    GROUP BY v.vec_id, c.cid) WHERE rn = 1),
         |ranked AS (
         |  SELECT vec_id, cid, d2,
         |    row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) AS rk,
         |    count(*) OVER (PARTITION BY cid) AS n
         |  FROM pfa)
         |SELECT vec_id, cid AS centroid_id, d2 AS dist2 FROM ranked
         |WHERE rk > floor(0.1 * n) AND rk <= n - floor(0.1 * n)""".stripMargin) {
      (s, d) =>
      Similarity.prototypeFilter(Tables(s, d).embeddings, 4, 2, 0.1, 0.1)
    },

    // The SemDeDup CUT: transitive closure of the pairs (recursive CTE in
    // the oracle, pointer-jumping Dedup.clusters in the engine), keep the
    // min-id representative per semantic cluster, pass unpaired vectors
    // through — same survivor contract as x_dedup_survivors.
    QDef("x_dedup_semantic_survivors",
      s"""WITH RECURSIVE ${StarExt.EmbExpl},
         |${StarExt.NormsCte},
         |${semDedupCtes(0.4)},
         |${StarExt.ClosureCtes}
         |SELECT e.vec_id, e.label FROM embeddings e
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM comp c WHERE c.u = e.vec_id AND c.u <> c.component)
         |""".stripMargin) { (s, d) =>
      Similarity.semDedup(Tables(s, d).embeddings, 4, 2, 0.4)
        .select("vec_id", "label")
    }
  )

  /** Shared front half of the SemDeDup oracles: replay of
    * `Similarity.semDedupPairs(k=4, iters=2)` — final-centroid assignment
    * `fa` over the kmeansCtes chain, in-cluster candidates, and scored
    * `pairs(d1, d2, cos)` at the given threshold. */
  private def semDedupCtes(threshold: Double): String =
    s"""${StarExt.kmeansCtes(4, 2)},
       |fa AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT v.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY round(sum((v.e - c.c) * (v.e - c.c)), 6), c.cid) AS rn
       |    FROM ee v JOIN c2 c ON c.j = v.j
       |    GROUP BY v.vec_id, c.cid) WHERE rn = 1),
       |semcand AS (
       |  SELECT l.vec_id AS d1, r.vec_id AS d2
       |  FROM fa l JOIN fa r ON l.cid = r.cid AND l.vec_id < r.vec_id),
       |semdots AS (
       |  SELECT p.d1, p.d2, sum(e1.e * e2.e) AS dot
       |  FROM semcand p
       |  JOIN ee e1 ON e1.vec_id = p.d1
       |  JOIN ee e2 ON e2.vec_id = p.d2 AND e2.j = e1.j
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT d1, d2, round(dot / (sqrt(n1.n2) * sqrt(n2.n2)), 6) AS cos
       |  FROM semdots
       |  JOIN norms n1 ON n1.vec_id = d1
       |  JOIN norms n2 ON n2.vec_id = d2
       |  WHERE round(dot / (sqrt(n1.n2) * sqrt(n2.n2)), 6) >= $threshold)""".stripMargin
}
