package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Analytic invariants for the round-54 dedup scale canaries —
  * brute-force recomputations from collected documents, independent of
  * both the Dataset bodies and the DuckDB oracle texts. */
class R54OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def texts(): Array[(Long, String)] =
    graft.Tables(spark, sf).documents.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))

  /** Brute-force distinct word-trigram-hash sets per doc, replaying
    * TextOps.wordHash (first-3-chars + length, "___"-padded) and the
    * chained trigram fold of TextOps.wordTrigramHashes. */
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
        ((wh(a(0)) * 1000003L + wh(a(1))) % p * 1000033L
          + wh(a(2))) % p
      }.toSet
      id -> tri
    }.toMap
  }

  test("x_shingle_df_profile: bins partition the df universe; totals " +
      "match the brute-force posting count") {
    val rows = run("x_shingle_df_profile").collect()
    assert(rows.nonEmpty)
    // bins are the integer bit length of df: df in [2^(b-1), 2^b)
    rows.foreach { r =>
      val (bin, maxDf) = (r.getInt(0), r.getLong(3))
      assert(maxDf < (1L << bin) && maxDf >= (1L << (bin - 1)),
        s"bin $bin max_df $maxDf outside [2^${bin - 1}, 2^$bin)")
    }
    val sets = shingleSets()
    val postings = sets.values.map(_.size.toLong).sum
    assert(rows.map(_.getLong(2)).sum == postings, "posting mass")
    val universe = sets.values.flatten.toSet.size
    assert(rows.map(_.getLong(1)).sum == universe, "shingle universe")
  }

  test("x_band_density: candidate_pairs equals the exact pair bill of " +
      "the uncapped band self-join") {
    val rows = run("x_band_density").collect()
    assert(rows.length == graft.llm.Dedup.NumBands)
    // recompute buckets brute-force from the signature definition
    val sets = shingleSets()
    val sigs = sets.collect { case (id, sh) if sh.nonEmpty =>
      id -> graft.llm.Dedup.HashAB.map { case (a, b) =>
        sh.map(s => (a * s + b) % graft.llm.Dedup.Prime).min
      }
    }
    rows.foreach { r =>
      val band = r.getInt(0)
      val buckets = sigs.groupBy { case (_, ms) =>
        (band * 4 until band * 4 + 4).map(ms(_)).mkString(",")
      }.map(_._2.size)
      assert(r.getLong(1) == buckets.size, s"band $band buckets")
      assert(r.getLong(2) == buckets.max.toLong, s"band $band max")
      val pairs = buckets.map(n => n.toLong * (n - 1) / 2).sum.toDouble
      assert(r.getDouble(3) == pairs, s"band $band pairs")
    }
  }

  test("x_exact_dup_profile: histogram masses cover the corpus " +
      "exactly once") {
    val rows = run("x_exact_dup_profile").collect()
    val nDocs = texts().length.toLong
    assert(rows.map(_.getLong(2)).sum == nDocs, "doc mass")
    val cliques = texts().groupBy(_._2).map(_._2.length)
    rows.foreach { r =>
      val copies = r.getLong(0)
      assert(r.getLong(1) == cliques.count(_ == copies).toLong)
      assert(math.abs(r.getDouble(3)
        - r.getLong(2).toDouble / nDocs) < 1e-6)
    }
  }

  test("x_dedup_minhash_capped: subset of the uncapped pass; every " +
      "released pair has true Jaccard >= 0.7") {
    val capped = run("x_dedup_minhash_capped")
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val uncapped = run("x_dedup_minhash_lsh")
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(capped.toSet.subsetOf(uncapped),
      "cap may only DROP pairs, never add")
    val sets = shingleSets()
    capped.foreach { case (a, b) =>
      val (sa, sb) = (sets(a), sets(b))
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j >= 0.699999, s"pair ($a,$b) true jaccard $j")
    }
  }
}
