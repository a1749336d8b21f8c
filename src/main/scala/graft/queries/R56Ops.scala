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

  /** 5-gram-hash shingle set (matches TextOps.wordNgramHashes(text, 5):
    * uniform 1000003 Horner multiplier — deliberately a DIFFERENT
    * universe from the 1000033-stepped trigram hash). Named `wsh` so the
    * shared MhCte/BandsCte compose unchanged. */
  private[queries] val WordSh5Cte = {
    def wh(off: Int) = StarExt.whSql(s"toks[CAST(i AS INT)+$off]")
    val p = "2147483647"
    // Horner left fold: h ← (h·1000003 + wh_k) mod p, seeded with wh_0.
    // % and * are same-precedence left-associative, so `x % p * m + w`
    // parses as ((x % p) * m) + w — each step's parens below only wrap
    // the running sum.
    val h = (1 to 4).foldLeft(wh(0))((acc, k) =>
      s"($acc * 1000003 + ${wh(k)}) % $p")
    s"""wsh AS (
       |  SELECT DISTINCT doc_id AS id,
       |    $h AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |       unnest(range(1, len(toks)-3)) t(i))""".stripMargin
  }

  /** MinHash-LSH over the COARSE (width-5) shingle universe as ONE
    * portable text — the LSH mitigation for saturated vocabularies:
    * signature minima concentrate when the trigram universe tops out,
    * and widening the shingle restores the diversity the bands need. */
  private[queries] val MinhashCoarseSql =
    s"""WITH $WordSh5Cte,
       |${StarExt.MhCte},
       |${StarExt.BandsCte},
       |cand AS (
       |  SELECT DISTINCT a.id AS d1, b.id AS d2 FROM bands a
       |  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id),
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
       |WHERE round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 6) >= 0.7""".stripMargin

  /** Grid-density canary as ONE portable text — oracle of
    * `x_grid_density` (cells mirror x_grid_knn's: width-5 cells over the
    * (custkey % 97, custkey·31 % 89) plane; bill = same-cell C(n,2) +
    * half-neighborhood cross products). */
  private[queries] val GridDensitySql =
    """WITH cells AS (
      |  SELECT CAST(floor((c_custkey % 97) / 5) AS BIGINT) AS cx,
      |    CAST(floor(((c_custkey * 31) % 89) / 5) AS BIGINT) AS cy,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2),
      |probe AS (
      |  SELECT n AS na, cx + 1 AS cx, cy FROM cells
      |  UNION ALL SELECT n, cx, cy + 1 FROM cells
      |  UNION ALL SELECT n, cx + 1, cy + 1 FROM cells
      |  UNION ALL SELECT n, cx - 1, cy + 1 FROM cells),
      |cp AS (SELECT CAST(sum(p.na * c.n) AS BIGINT) AS pairs_cross
      |  FROM probe p JOIN cells c ON c.cx = p.cx AND c.cy = p.cy),
      |sp AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
      |  CAST(sum(n) AS BIGINT) AS n_points,
      |  CAST(max(n) AS BIGINT) AS max_cell,
      |  CAST(sum(n * (n - 1) / 2) AS BIGINT) AS pairs_same FROM cells)
      |SELECT n_points, n_cells, max_cell, pairs_same, pairs_cross,
      |  pairs_same + pairs_cross AS candidate_pairs
      |FROM sp, cp""".stripMargin

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

  // x_dedup_srp_capped (round 11) is RETIRED in round 12: the capped tier
  // became x_dedup_srp itself (engine maxBucket = 32, oracle =
  // R9Ops.SrpCtesCapped — the surgery moved next to the shared CTE text),
  // so keeping a second registered query with the identical plan would be
  // exactly the twin-pair padding QDefDistinctnessSpec exists to forbid.
  // The ItemCfSql retirement precedent (R39Ops round 10).

  /** The x_grid_density engine body (extracted round 14 so the
    * x_grid_knn_auto dispatch reads the IDENTICAL bill): same-cell
    * Σ C(n,2) + half-neighborhood cross products over the bounded cell
    * frame. */
  private[queries] def gridDensityFrame(
      customer: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pts = customer.select(
        (col("c_custkey") % 97).cast("long").as("x"),
        ((col("c_custkey") * 31) % 89).cast("long").as("y"))
      .select(floor(col("x") / 5).as("cx"), floor(col("y") / 5).as("cy"))
    val cells = pts.groupBy("cx", "cy").agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // consumed by 3 aggregates below
    val offsets = Seq((1, 0), (0, 1), (1, 1), (-1, 1))
    val probe = cells.select(col("n").as("na"),
        explode(array(offsets.map { case (ox, oy) =>
          struct((col("cx") + ox).as("cx"), (col("cy") + oy).as("cy"))
        }: _*)).as("o"))
      .select(col("na"), col("o.cx"), col("o.cy"))
    val crossP = probe.join(cells, Seq("cx", "cy"))
      .agg(sum(col("na") * col("n")).as("pairs_cross"))
    val sameP = cells.agg(count(lit(1)).as("n_cells"),
      sum(col("n")).as("n_points"), max(col("n")).as("max_cell"),
      sum(col("n") * (col("n") - 1) / 2).cast("bigint").as("pairs_same"))
    sameP.crossJoin(crossP)
      .select(col("n_points"), col("n_cells"), col("max_cell"),
        col("pairs_same"), col("pairs_cross"),
        (col("pairs_same") + col("pairs_cross")).as("candidate_pairs"))
  }

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

    // COARSE-SHINGLE MINHASH-LSH: the LSH mitigation for saturated
    // vocabularies, completing the mitigation matrix (the maxBucket cap
    // covers viral duplication; coarsening covers saturation — measured
    // on the saturating fixture, where trigram-signature minima
    // concentrate and the band join runs x31-36, while the width-5
    // universe restores signature diversity). Grouped formulation
    // (wordNgramHashes(5) explode → 16 signature minima → 4x4 bands →
    // exact-Jaccard verify over the width-5 universe).
    QDef("x_dedup_minhash_coarse", MinhashCoarseSql) { (s, d) =>
      val sh = Tables(s, d).documents
        .select(col("doc_id").as("id"),
          explode(graft.llm.TextOps.wordNgramHashes(col("text"), 5)).as("sh"))
        .distinct()
        .localCheckpoint(false) // signatures + sizes + verify (pin lifecycle)
      val sigs = Dedup.minHashSignatures(sh)
      Dedup.verifiedJaccard(Dedup.lshCandidates(sigs), sh)
        .filter(col("jaccard") >= 0.7)
    },

    // GRID-DENSITY CANARY: the exact candidate bill of x_grid_knn's
    // cell-keyed spatial join, BEFORE running it — the x_band_density
    // posture for the spatial family. The cell table is grid-bounded
    // (≤360 cells for this coordinate domain), so both the same-cell
    // Σ C(n,2) and the half-neighborhood cross terms Σ n(c)·n(c+o)
    // compute from one grouped aggregate + an in-row offset explode +
    // one equi-join of two cell-sized frames. Read: candidate_pairs
    // tracking points² = density growing with the corpus (the bounded
    // coordinate domain regime, x_grid_knn's documented quadratic) —
    // re-cell or cap before the join.
    QDef("x_grid_density", GridDensitySql) { (s, d) =>
      gridDensityFrame(Tables(s, d).customer)
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
