package graft.queries

import graft.{QDef, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Round-54 batch: the dedup SCALE CANARIES — the monitoring operators
  * the round-10 sf1 sweep showed a 100 TB dedup deployment must run
  * BEFORE committing to an inverted-index or banded-LSH pass, plus the
  * capped-bucket LSH variant that survives when the canaries go red.
  *
  * Background (SCALE.md "Round 10"): inverted-index dedup costs
  * Σ C(min(df,cap),2) per shingle and banded LSH costs Σ C(bucket,2)
  * per (band,sig) bucket. Both are linear in corpus size ONLY while
  * the shingle universe keeps growing (Heaps' law) and bucket density
  * stays flat; a saturated vocabulary or adversarial duplication puts
  * either into its quadratic regime. These operators measure exactly
  * those two densities from one signature pass each — KB-sized
  * released frames a scheduler can alert on — and the capped variant
  * bounds the worst case by dropping hot buckets (a measured recall
  * trade, the same df-cap posture as Dedup.keptShingles /
  * Multimodal.hashNearDupPairs' maxBucket). */
object R54Ops {

  /** Shingle document-frequency profile as ONE portable text — the
    * "avg-df canary". Log2-binned (length(bin(df)) — exact integer bit
    * length, no float log) histogram of the word-trigram-hash
    * universe: shingle count, posting mass, max df, and max-df as a
    * fraction of the corpus per bin. When the high bins carry the
    * posting mass (df tracks corpus size), the exact inverted-index
    * pass is in its quadratic regime — coarsen the shingle or lower
    * the df cap before running it. */
  private[queries] val DfProfileSql =
    s"""WITH ${StarExt.WordShCte},
       |df AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM wsh
       |  GROUP BY 1),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |b AS (SELECT CAST(length(bin(df)) AS INT) AS bin, df FROM df)
       |SELECT bin, CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(df) AS BIGINT) AS n_postings,
       |  CAST(max(df) AS BIGINT) AS max_df,
       |  round(CAST(max(df) AS DOUBLE) / max(nd.n_docs), 6)
       |    AS max_df_corpus_ratio
       |FROM b, nd GROUP BY 1 ORDER BY 1""".stripMargin

  /** LSH band-bucket density profile as ONE portable text — the
    * banded-candidate canary. Per band: bucket count, max bucket,
    * exact candidate-pair count Σ C(n,2) (integral doubles — exact and
    * order-independent below 2^53), and buckets over the hot cap. The
    * pair column IS the cost of the band self-join the LSH pass would
    * run — read it before running the pass. */
  private[queries] val BandDensitySql =
    s"""WITH ${StarExt.WordShCte},
       |${StarExt.MhCte},
       |${StarExt.BandsCte},
       |bk AS (SELECT band, sig, CAST(count(*) AS BIGINT) AS n
       |  FROM bands GROUP BY 1, 2)
       |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(max(n) AS BIGINT) AS max_bucket,
       |  sum(CAST(n AS DOUBLE) * (n - 1) / 2) AS candidate_pairs,
       |  CAST(sum(CASE WHEN n > 32 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS buckets_over_32
       |FROM bk GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact-duplicate cluster-size histogram as ONE portable text — the
    * viral-cluster canary (copies → cluster count → doc mass → corpus
    * share). A crawl whose top rows grow round-over-round needs
    * rep-first dedup before any pairwise machinery. */
  private[queries] val ExactDupProfileSql =
    """WITH c AS (SELECT md5(text) AS k,
      |  CAST(count(*) AS BIGINT) AS copies FROM documents GROUP BY 1),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
      |SELECT copies, CAST(count(*) AS BIGINT) AS n_clusters,
      |  CAST(copies * count(*) AS BIGINT) AS n_docs,
      |  round(CAST(copies * count(*) AS DOUBLE) / max(nd.n_docs), 6)
      |    AS corpus_share
      |FROM c, nd GROUP BY copies ORDER BY copies""".stripMargin

  /** Capped-bucket MinHash-LSH near-dups as ONE portable text: the
    * x_dedup_minhash_lsh contract with (band, sig) buckets holding
    * more than 32 ids removed before the self-join — the
    * Multimodal.hashNearDupPairs maxBucket posture applied to text.
    * Below the cap the result is bit-identical to the uncapped pass;
    * when the cap engages, pairs whose only shared band was hot are
    * missed (a measured recall trade — x_band_density reports how much
    * mass the cap removed), and the band join's worst case is bounded
    * at 32²/2 rows per bucket no matter how adversarial the corpus. */
  private[queries] val CappedLshSql =
    s"""WITH ${StarExt.WordShCte},
       |${StarExt.MhCte},
       |${StarExt.BandsCte},
       |hot AS (SELECT band, sig FROM bands GROUP BY band, sig
       |  HAVING count(*) > 32),
       |kept AS (SELECT b.id, b.band, b.sig FROM bands b
       |  LEFT JOIN hot ON b.band = hot.band AND b.sig = hot.sig
       |  WHERE hot.band IS NULL),
       |cand AS (SELECT DISTINCT a.id AS d1, b.id AS d2 FROM kept a
       |  JOIN kept b ON a.band = b.band AND a.sig = b.sig
       |    AND a.id < b.id),
       |sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM wsh
       |  GROUP BY 1),
       |inter AS (SELECT c.d1, c.d2, CAST(count(*) AS BIGINT) AS i
       |  FROM cand c
       |  JOIN wsh s1 ON s1.id = c.d1
       |  JOIN wsh s2 ON s2.id = c.d2 AND s2.sh = s1.sh
       |  GROUP BY 1, 2)
       |SELECT d1, d2,
       |  round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 6) AS jaccard
       |FROM inter
       |JOIN sizes n1 ON n1.id = d1
       |JOIN sizes n2 ON n2.id = d2
       |WHERE round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 6) >= 0.7
       |""".stripMargin

  /** The grouped (oracle-mirroring) LSH band table: (id, band, sig)
    * from the 16-signature frame — shared by the density canary and
    * the capped pass. */
  private def bandTable(sigs: org.apache.spark.sql.DataFrame) =
    (0 until Dedup.NumBands).map { b =>
      val cols = (0 until Dedup.RowsPerBand)
        .map(r => col(s"m${b * Dedup.RowsPerBand + r}").cast("string"))
      sigs.select(col("id"), lit(b).as("band"),
        concat_ws(",", cols: _*).as("sig"))
    }.reduce(_ union _)

  val defs: Seq[QDef] = Seq(

    // SHINGLE-DF CANARY: is the trigram universe still growing, or is
    // df tracking the corpus? One distinct-shingle pass, df-keyed
    // aggregate, ≤8-bin release. The integer bit-length bin (no float
    // log2) keeps both engines on identical bins at every df.
    QDef("x_shingle_df_profile", DfProfileSql) { (s, d) =>
      val docs = Tables(s, d).documents
      val sh = Dedup.wordShingleSet(docs, "doc_id", "text")
      val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      val nd = docs.agg(count(lit(1)).as("n_docs"))
      df.select(length(bin(col("df"))).cast("int").as("b"), col("df"))
        .crossJoin(broadcast(nd))
        .groupBy(col("b").as("bin"))
        .agg(count(lit(1)).as("n_shingles"),
          sum("df").as("n_postings"), max("df").as("max_df"),
          round(max(col("df")).cast("double") / max(col("n_docs")), 6)
            .as("max_df_corpus_ratio"))
        .orderBy("bin")
    },

    // BAND-DENSITY CANARY: the exact candidate-pair bill of the LSH
    // band self-join, per band, BEFORE running it. Signature pass +
    // two bounded aggregates.
    QDef("x_band_density", BandDensitySql) { (s, d) =>
      val docs = Tables(s, d).documents
      val sigs = Dedup.minHashSignatures(
        Dedup.wordShingleSet(docs, "doc_id", "text"))
      val bk = bandTable(sigs).groupBy("band", "sig")
        .agg(count(lit(1)).as("n"))
      bk.groupBy("band")
        .agg(count(lit(1)).as("n_buckets"), max("n").as("max_bucket"),
          sum(col("n").cast("double") * (col("n") - 1) / 2)
            .as("candidate_pairs"),
          sum(when(col("n") > 32, 1L).otherwise(0L))
            .as("buckets_over_32"))
        .orderBy("band")
    },

    // EXACT-DUP CLUSTER PROFILE: md5-key cluster sizes → histogram.
    // 16-byte keys on the wire, never document bodies; the released
    // frame is max-clique-sized.
    QDef("x_exact_dup_profile", ExactDupProfileSql) { (s, d) =>
      val docs = Tables(s, d).documents
      val c = docs.groupBy(md5(col("text").cast("binary")).as("k"))
        .agg(count(lit(1)).as("copies"))
      val nd = docs.agg(count(lit(1)).as("n_docs"))
      c.crossJoin(broadcast(nd))
        .groupBy("copies")
        .agg(count(lit(1)).as("n_clusters"),
          (max(col("copies")) * count(lit(1))).as("n_docs"),
          round((max(col("copies")) * count(lit(1))).cast("double")
            / max(col("n_docs")), 6).as("corpus_share"))
        .orderBy("copies")
    },

    // CAPPED-BUCKET LSH: the dedup pass that survives adversarial
    // duplication — hot (band, sig) buckets (> 32 ids) removed by an
    // anti-join BEFORE the self-join (no forced broadcast: AQE owns
    // the build side, the x_dedup_substring lesson), exact-Jaccard
    // verify on the surviving candidates only. Since round 11 this runs
    // the PRODUCTION entry point — Dedup.minHashNearDups(maxBucket = 32),
    // the cap a caller can actually reach (round-10 verdict ask), native
    // MinHash16 signatures and all — while the grouped formulation stays
    // as the oracle text, so the re-point is itself oracle-gated.
    QDef("x_dedup_minhash_capped", CappedLshSql) { (s, d) =>
      Dedup.minHashNearDups(Tables(s, d).documents, "doc_id", "text",
        threshold = 0.7, maxBucket = 32)
    })
}
