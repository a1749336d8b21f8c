package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Brute-force replay of the round-58 SRP band-density canary — the
  * two-oracle discipline: this recomputation is independent of both the
  * Dataset body and the DuckDB oracle text. */
class R58OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x_srp_band_density: per-band bucket histogram replayed from the " +
      "augmented corpus's integer-quantized LCG projections") {
    val base = graft.Tables(spark, sf).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // srpAugmented replay: 1 in 4 originals cloned at vec_id+10⁶, jitter
    // keyed by the ORIGINAL id, rounded through Float exactly as both
    // engines do (CAST(... AS REAL/FLOAT))
    val aug = base ++ base.filter(_._1 % 4 == 1).map { case (id, e) =>
      (id + 1000000L, e.zipWithIndex.map { case (x, k) =>
        (x.toDouble + ((id * 64 + k) * 2654435761L % 21 - 10) * 0.002).toFloat
      })
    }
    def half(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // srpSignatures replay: ±1 xorshift-multiply-mixed hyperplane weights
    // (the round-12 full-entropy family) over round(e·1000) integer
    // quantizations; float multiply first (the engine's
    // embedding[k] * 1000 stays in FloatType before round)
    val sigs = aug.flatMap { case (id, e) =>
      val q = e.map(x => half((x * 1000f).toDouble))
      (0 until 4).map { b =>
        val s = (0 until 8).map { i =>
          val dot = (0 until 64).map { k =>
            val h1 = (1103515245L * ((b * 8 + i) * 64 + k) + 12345L) %
              2147483648L
            val bit = (h1 ^ (h1 / 32768L)) * 2654435761L %
              2147483648L / 1024L % 2L
            if (bit == 1L) q(k) else -q(k)
          }.sum
          if (dot >= 0) 1L << i else 0L
        }.sum
        (id, b, s)
      }
    }
    val expected = sigs.groupBy(t => (t._2, t._3))
      .map { case (k, v) => k -> v.size.toLong }.toSeq
      .groupBy(_._1._1).map { case (band, buckets) =>
        val ns = buckets.map(_._2)
        band -> (ns.size.toLong, ns.max,
          ns.map(n => n.toDouble * (n - 1) / 2).sum, ns.count(_ > 32).toLong)
      }
    val got = SparkEntry.queries("x_srp_band_density")(spark, sf).collect()
    assert(got.length == expected.size)
    assert(got.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3), "4 bands, ordered")
    got.foreach { r =>
      val (nb, mx, cp, over) = expected(r.getInt(0))
      assert(r.getLong(1) == nb, s"band ${r.getInt(0)} n_buckets")
      assert(r.getLong(2) == mx, s"band ${r.getInt(0)} max_bucket")
      assert(r.getDouble(3) == cp, s"band ${r.getInt(0)} candidate_pairs")
      assert(r.getLong(4) == over, s"band ${r.getInt(0)} buckets_over_32")
    }
    // the canary must account for every augmented vector in every band
    val n = aug.length.toLong
    val sums = sigs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(sums.values.forall(_ == n))
  }
}
