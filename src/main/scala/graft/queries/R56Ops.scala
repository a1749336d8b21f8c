package graft.queries

import graft.{QDef, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Round-56 batch: the SHINGLE-COARSENING mitigation and the Heaps-law
  * regime canary — the two follow-ups the round-10 sf1 sweep asked for.
  *
  * Background (BENCH_NOTES round 10 / SCALE.md): the exact inverted-index
  * dedup tier costs Σ C(min(df, cap), 2) per shingle. On a corpus whose
  * trigram universe has SATURATED (the driver fixture's 31-word
  * vocabulary ⇒ ≤31³ ≈ 30k trigrams), df grows ∝ corpus and the pass is
  * quadratic inside the cap window. Two mitigations exist besides the df
  * cap itself: COARSEN the shingle (V^n universe — at n=5 the same
  * vocabulary gives ~28.6M possible shingles, so df collapses back
  * toward 1 and the pass is linear again), and detect the regime BEFORE
  * paying for the pass (the vocabulary-growth canary: if distinct
  * shingles stop growing with the corpus, Heaps' law is broken and the
  * inverted index is in its quadratic window). */
object R56Ops {

  /** 5-gram Jaccard near-dups as ONE portable text — the trigram
    * x_dedup_ngram_jaccard contract at shingle width 5. */
  private[queries] val NgramCoarseSql =
    """WITH g AS (
      |  SELECT DISTINCT doc_id AS id,
      |    toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT)+1] || ' '
      |      || toks[CAST(i AS INT)+2] || ' ' || toks[CAST(i AS INT)+3]
      |      || ' ' || toks[CAST(i AS INT)+4] AS g
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |       unnest(range(1, len(toks)-3)) t(i)),
      |sizes AS (SELECT id, count(*) AS n FROM g GROUP BY id),
      |inter AS (
      |  SELECT l.id AS d1, r.id AS d2, count(*) AS i
      |  FROM g l JOIN g r ON l.g = r.g AND l.id < r.id
      |  GROUP BY 1, 2)
      |SELECT d1, d2, round(i / (n1.n + n2.n - i), 6) AS jaccard
      |FROM inter
      |JOIN sizes n1 ON n1.id = d1
      |JOIN sizes n2 ON n2.id = d2
      |WHERE round(i / (n1.n + n2.n - i), 6) >= 0.5""".stripMargin

  /** Heaps-law vocabulary-growth profile as ONE portable text: distinct
    * word-trigram shingles and posting mass over three NESTED id-carved
    * corpus prefixes (25% / 50% / 100% — nested so each level is a
    * superset and the growth read is monotone). */
  private[queries] val HeapsProfileSql =
    s"""WITH ${StarExt.WordShCte},
       |l AS (SELECT id, sh,
       |  unnest(CASE WHEN id % 4 = 0 THEN [1, 2, 3]
       |    WHEN id % 2 = 0 THEN [2, 3] ELSE [3] END) AS lvl FROM wsh),
       |d AS (SELECT doc_id,
       |  unnest(CASE WHEN doc_id % 4 = 0 THEN [1, 2, 3]
       |    WHEN doc_id % 2 = 0 THEN [2, 3] ELSE [3] END) AS lvl
       |  FROM documents),
       |dc AS (SELECT lvl, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM d GROUP BY 1),
       |a AS (SELECT lvl, CAST(count(DISTINCT sh) AS BIGINT) AS n_shingles,
       |  CAST(count(*) AS BIGINT) AS n_postings FROM l GROUP BY 1)
       |SELECT CAST(a.lvl AS INT) AS lvl, dc.n_docs, a.n_shingles,
       |  a.n_postings,
       |  round(CAST(a.n_postings AS DOUBLE) / a.n_shingles, 6) AS mean_df
       |FROM a JOIN dc USING (lvl) ORDER BY lvl""".stripMargin

  val defs: Seq[QDef] = Seq(

    // COARSE-SHINGLE JACCARD: the x_dedup_ngram_jaccard inverted index at
    // width 5 — the "coarsen the shingle" mitigation as a registered,
    // oracle-gated operator (round-10 verdict ask). Same df-capped
    // posting-list machinery (Dedup.keptShingles/postingLists), only the
    // shingle expression changes; on the saturating fixture the 5-gram
    // universe is vocabulary^5, so df collapses toward 1 and the pass
    // returns to its linear regime (measured in BENCH_SF1_r11).
    QDef("x_dedup_ngram_coarse", NgramCoarseSql) { (s, d) =>
      Dedup.ngramJaccardPairs(Tables(s, d).documents, "doc_id", "text",
        threshold = 0.5, width = 5)
    },

    // HEAPS-LAW CANARY: is the shingle vocabulary still growing with the
    // corpus? Three nested prefixes (25/50/100% by id carve) → distinct
    // shingles, posting mass, mean df per level, from ONE shingle pass
    // exploded ≤3×. Read: n_shingles ~doubling level-over-level = healthy
    // Heaps growth (inverted-index dedup is linear); n_shingles flat
    // while n_postings doubles = saturated vocabulary (mean_df tracks the
    // corpus — coarsen the shingle or cap df before any inverted-index
    // pass). The companion x_shingle_df_profile reads the df SPECTRUM;
    // this one reads the GROWTH — together they decide the regime before
    // a 100 TB pass is committed.
    QDef("x_heaps_profile", HeapsProfileSql) { (s, d) =>
      val docs = Tables(s, d).documents
      val sh = Dedup.wordShingleSet(docs, "doc_id", "text")
      def lvls(id: org.apache.spark.sql.Column) =
        when(id % 4 === 0, array(lit(1), lit(2), lit(3)))
          .when(id % 2 === 0, array(lit(2), lit(3)))
          .otherwise(array(lit(3)))
      val byLvl = sh.select(col("sh"), explode(lvls(col("id"))).as("lvl"))
        .groupBy("lvl")
        .agg(countDistinct(col("sh")).as("n_shingles"),
          count(lit(1)).as("n_postings"))
      val dc = docs.select(explode(lvls(col("doc_id"))).as("lvl"))
        .groupBy("lvl").agg(count(lit(1)).as("n_docs"))
      byLvl.join(broadcast(dc), "lvl")
        .select(col("lvl"), col("n_docs"), col("n_shingles"), col("n_postings"),
          round(col("n_postings").cast("double") / col("n_shingles"), 6)
            .as("mean_df"))
        .orderBy("lvl")
    })
}
