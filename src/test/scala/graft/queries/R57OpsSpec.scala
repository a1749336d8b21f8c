package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-57 measurement/curation operators —
  * brute-force recomputations from collected rows, independent of both
  * the Dataset bodies and the DuckDB oracle texts (the two-oracle
  * discipline: this spec has caught shared-oracle bugs DuckDB agreement
  * alone could not, see R52OpsSpec). */
class R57OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def texts(): Array[(Long, String)] =
    graft.Tables(spark, sf).documents.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))

  /** Distinct word-trigram-hash sets per doc — the TextOps.wordHash /
    * wordTrigramHashes arithmetic replayed (same fold as R54OpsSpec).
    * Since round 12 this is THE recall universe: engine truth
    * (Dedup.ngramHashJaccardPairs), oracle truth (the wsh-based tinter
    * CTE), and the LSH verify all score hash-Jaccard over these sets, so
    * the replay validates the registered semantics, not a coincidentally
    * collision-free projection of them (ADVICE r11); the collision case
    * itself is pinned by the dedicated wordHash-collision test below. */
  private def shingleSets(): Map[Long, Set[Long]] = {
    val p = 2147483647L
    def wh(w: String): Long = {
      val pad = w + "___"
      pad.charAt(0).toLong * 65536 + pad.charAt(1).toLong * 256 +
        pad.charAt(2).toLong + w.length.toLong * 16777216L
    }
    texts().map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      val tri = ws.sliding(3).filter(_.length == 3).map { a =>
        ((wh(a(0)) * 1000003L + wh(a(1))) % p * 1000033L + wh(a(2))) % p
      }.toSet
      id -> tri
    }.toMap
  }

  private def jaccard(a: Set[Long], b: Set[Long]): Double = {
    val i = (a & b).size
    r6(i.toDouble / (a.size + b.size - i))
  }

  test("x_dedup_minhash_recall: counts match the brute-force truth and " +
      "LSH passes; recall = n_found / n_true") {
    val sets = shingleSets().filter(_._2.nonEmpty)
    val ids = sets.keys.toSeq.sorted
    val truth = (for {
      (d1, i1) <- ids.zipWithIndex; d2 <- ids.drop(i1 + 1)
      if jaccard(sets(d1), sets(d2)) >= 0.7
    } yield (d1, d2)).toSet
    // LSH side: 16 minhash minima -> 4 bands x 4 rows -> bucket pairs ->
    // exact-Jaccard verify (the minHashNearDups contract)
    val sigs = sets.map { case (id, sh) =>
      id -> graft.llm.Dedup.HashAB.map { case (a, b) =>
        sh.map(s => (a * s + b) % graft.llm.Dedup.Prime).min
      }
    }
    val cand = (0 until graft.llm.Dedup.NumBands).flatMap { band =>
      sigs.groupBy { case (_, ms) =>
        (band * 4 until band * 4 + 4).map(ms(_)).mkString(",")
      }.values.flatMap { bucket =>
        val bids = bucket.keys.toSeq.sorted
        for ((d1, i1) <- bids.zipWithIndex; d2 <- bids.drop(i1 + 1))
          yield (d1, d2)
      }
    }.toSet
    val lsh = cand.filter { case (d1, d2) => jaccard(sets(d1), sets(d2)) >= 0.7 }
    val row = run("x_dedup_minhash_recall").collect().head
    assert(row.getLong(0) == truth.size.toLong, "n_true")
    assert(row.getLong(1) == lsh.size.toLong, "n_lsh")
    assert(row.getLong(2) == (truth & lsh).size.toLong, "n_found")
    if (truth.isEmpty) assert(row.isNullAt(3))
    else assert(row.getDouble(3) ==
      r6((truth & lsh).size.toDouble / truth.size), "recall")
    // LSH can only ever MISS truth pairs, never invent them (the verify
    // step is the same exact Jaccard)
    assert((lsh -- truth).isEmpty, "verified LSH pairs must be true pairs")
  }

  test("recall truth universe: hash-Jaccard and string-Jaccard diverge " +
      "exactly at wordHash collisions, and lsh ⊆ hash-truth holds there") {
    import spark.implicits._
    // 'their'/'there' share first-3-chars ('the') AND length (5), so
    // wordHash collides: every trigram containing the differing word is
    // ONE hash shingle but TWO string shingles. 6 tokens → 4 trigrams.
    val docs = Seq(
      (1L, "alpha their beta gamma delta epsilon"),
      (2L, "alpha there beta gamma delta epsilon")).toDF("doc_id", "text")
    val hash = graft.llm.Dedup
      .ngramHashJaccardPairs(docs, "doc_id", "text", 0.0).collect()
    assert(hash.length == 1 && hash.head.getDouble(2) == 1.0,
      "hash universe: collision makes the shingle sets identical")
    val str = graft.llm.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", 0.0).collect()
    assert(str.length == 1 && str.head.getDouble(2) == r6(2.0 / 6.0),
      "string universe: 2 shared of 6 distinct trigrams")
    // the LSH chain verifies hash-Jaccard, so on this corpus it finds the
    // pair at τ = 0.7 — inside the hash truth (the registered recall
    // invariant) but OUTSIDE the string truth (the pre-round-12 mismatch)
    val lsh = graft.llm.Dedup
      .minHashNearDups(docs, "doc_id", "text", 0.7).collect()
    assert(lsh.length == 1 && lsh.head.getDouble(2) == 1.0,
      "LSH verify scores the same hash universe as the truth side")
  }

  test("x_mix_entropy: single-source corpus releases NULL evenness " +
      "(0/0 guard), H = 0, eff_sources = 1") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mix1").toString
    val src = graft.Tables(spark, sf).documents
      .select("source").limit(1).collect().head.getString(0)
    graft.Tables(spark, sf).documents
      .filter(org.apache.spark.sql.functions.col("source") === src)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val row = SparkEntry.queries("x_mix_entropy")(spark, tmp).collect().head
    assert(row.getLong(0) == 1L, "n_sources")
    assert(row.getDouble(2) == 0.0, "entropy")
    assert(row.getDouble(3) == 1.0, "eff_sources")
    assert(row.isNullAt(4), "evenness must be NULL, not NaN, at n_sources = 1")
  }

  test("x_contamination_13g: shared distinct 13-gram counts replayed " +
      "from raw token arrays against the pinned eval slice") {
    val evalIds = (3L until 500L by 5L).toSet
    val grams = texts().map { case (id, t) =>
      id -> t.split(" ", -1).sliding(13).filter(_.length == 13)
        .map(_.mkString(" ")).toSet
    }.toMap
    val evalGrams = grams.collect {
      case (id, g) if evalIds(id) => g }.foldLeft(Set.empty[String])(_ ++ _)
    val expected = grams.collect {
      case (id, g) if !evalIds(id) && (g & evalGrams).nonEmpty =>
        id -> (g & evalGrams).size.toLong
    }
    val got = run("x_contamination_13g").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // eval docs never appear on the training side of the report
    assert(got.keySet.forall(!evalIds(_)))
  }

  private def embeddings(): Array[(Long, Array[Double], Int)] =
    graft.Tables(spark, sf).embeddings
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))

  test("x_hard_negatives: per-anchor top-3 different-label in-cell " +
      "cosine, replayed brute-force") {
    val emb = embeddings()
    val cents = emb.filter(_._1 < 8)
    def l2(a: Array[Double], b: Array[Double]): Double =
      r6(a.indices.foldLeft(0.0)((s, j) => s + (a(j) - b(j)) * (a(j) - b(j))))
    def cell(v: Array[Double]): Long =
      cents.map { case (cid, ce, _) => (l2(v, ce), cid) }.minBy(identity)._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, j) => s + x(j) * y(j))
      r6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    }
    val assign = emb.map { case (id, v, l) => (id, cell(v), v, l) }
    val expected = assign.filter(_._1 < 10).flatMap { case (qid, qc, qv, ql) =>
      assign.filter { case (cid, cc, _, cl) =>
        cid != qid && cc == qc && cl != ql }
        .map { case (cid, _, cv, _) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }
        .take(3).zipWithIndex
        .map { case ((cid, c), i) => (qid, cid, c, i + 1) }
    }.toSet
    val got = run("x_hard_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == expected)
    // negatives must actually be negatives
    val labels = emb.map(t => t._1 -> t._3).toMap
    got.foreach { case (q, c, _, _) => assert(labels(q) != labels(c)) }
  }

  test("x_text_distinct_n: per-source type/token ratios replayed from " +
      "raw token arrays") {
    val docs = graft.Tables(spark, sf).documents
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = (for {
      n <- 1 to 3
      (src, grams) <- docs.toSeq.flatMap { case (src, t) =>
        val toks = t.split(" ", -1)
        toks.sliding(n).filter(_.length == n).map(a => (src, a.mkString(" ")))
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
    } yield (src, n) ->
      (grams.distinct.size.toLong, grams.size.toLong)).toMap
    val got = run("x_text_distinct_n").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getInt(1))
      val (types, total) = expected(key)
      assert(r.getLong(2) == types, s"$key types")
      assert(r.getLong(3) == total, s"$key grams")
      assert(r.getDouble(4) == r6(types.toDouble / total), s"$key ratio")
    }
  }

  test("x_mix_entropy: H, exp(H) and evenness from brute-force token " +
      "shares; uniform upper bound holds") {
    val per = graft.Tables(spark, sf).documents
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = per.values.sum
    val ent = -per.values.toSeq.sorted.map { t =>
      val p = t.toDouble / total
      p * math.log(p)
    }.sum
    val row = run("x_mix_entropy").collect().head
    assert(row.getLong(0) == per.size.toLong, "n_sources")
    assert(row.getLong(1) == total, "total_tokens")
    // engine sums Σ p·ln p in partition order, brute in sorted order, and
    // the engine releases at round 6 — assert at the released scale
    assert(math.abs(row.getDouble(2) - ent) < 1e-6, "entropy")
    assert(math.abs(row.getDouble(3) - math.exp(ent)) < 1e-5, "eff_sources")
    assert(math.abs(row.getDouble(4) - ent / math.log(per.size)) < 1e-6,
      "evenness")
    assert(row.getDouble(2) <= math.log(per.size) + 1e-6,
      "H bounded by ln(n_sources)")
    assert(row.getDouble(3) <= per.size + 1e-6)
  }
}
