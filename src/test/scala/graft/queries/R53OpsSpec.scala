package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Analytic invariants for the round-53 batch (embedding health +
  * basket triples) — brute-force recomputations from collected
  * vectors/baskets. */
class R53OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def rnd(v: Double, p: Int) =
    BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def vectors(): Array[(Long, Int, Array[Double])] =
    graft.Tables(spark, sf).embeddings.collect().map { r =>
      (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray)
    }

  test("x_embed_dim_stats: 64 rows matching brute-force per-dim " +
      "moments") {
    val rows = run("x_embed_dim_stats").collect()
    assert(rows.length == 64)
    val vs = vectors()
    rows.foreach { r =>
      val dim = r.getInt(0)
      val col = vs.map(_._3(dim - 1))
      assert(r.getLong(1) == col.length)
      val n = col.length.toDouble
      val s = col.sum
      val q = col.map(v => v * v).sum
      assert(r.getDouble(2) == rnd(s / n, 6), s"dim $dim mu")
      assert(math.abs(r.getDouble(3)
        - math.sqrt((n * q - s * s) / (n * (n - 1)))) < 1e-5,
        s"dim $dim sd")
      assert(r.getDouble(4) == rnd(col.min, 6))
      assert(r.getDouble(5) == rnd(col.max, 6))
    }
  }

  test("x_embed_norm_profile: matches brute-force norms; fixture is " +
      "unit-normalized") {
    val r = run("x_embed_norm_profile").collect().head
    val (n, mean, mn, mx, nonunit) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4))
    val norms = vectors().map(v =>
      math.sqrt(v._3.map(x => x * x).sum))
    assert(norms.length == n)
    assert(mean == rnd(norms.sum / norms.length, 6))
    assert(mn == rnd(norms.min, 6) && mx == rnd(norms.max, 6))
    assert(nonunit == norms.count(v => math.abs(v - 1.0) > 1e-3))
    assert(math.abs(mean - 1.0) < 0.01,
      "fixture embeddings are unit-normalized")
  }

  test("x_embed_cluster_quality: CH and silhouette match brute force " +
      "with snapped centroids") {
    val r = run("x_embed_cluster_quality").collect().head
    val (n, k, ch, sil) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3))
    val vs = vectors()
    assert(vs.length == n)
    val labels = vs.map(_._2).distinct.sorted
    assert(labels.length == k)
    val cen = labels.map { l =>
      val g = vs.filter(_._2 == l).map(_._3)
      (l, Array.tabulate(64)(d =>
        rnd(g.map(_(d)).sum / g.length, 6)))
    }.toMap
    val gc = Array.tabulate(64)(d => vs.map(_._3(d)).sum / vs.length)
    val b = labels.map { l =>
      val nl = vs.count(_._2 == l)
      nl * cen(l).zip(gc).map { case (c, g) =>
        (c - g) * (c - g) }.sum
    }.sum
    def dist(v: Array[Double], c: Array[Double]) =
      math.sqrt(v.zip(c).map { case (a, b2) =>
        (a - b2) * (a - b2) }.sum)
    val aArr = vs.map(v => dist(v._3, cen(v._2)))
    val bArr = vs.map(v =>
      labels.filter(_ != v._2).map(l => dist(v._3, cen(l))).min)
    val w = aArr.map(a => a * a).sum
    val chB = (b / (k - 1)) / (w / (n - k))
    assert(math.abs(ch - chB) < 0.02, s"CH $ch vs $chB")
    val silB = aArr.zip(bArr).map { case (a, b2) =>
      (b2 - a) / math.max(a, b2) }.sum / n
    assert(math.abs(sil - silB) < 1e-4)
    assert(sil > -1 && sil < 1)
  }

  test("x_basket_triples: top-5 supports and lifts match the " +
      "brute-force enumeration") {
    val rows = run("x_basket_triples").collect()
    assert(rows.length == 5)
    val t = graft.Tables(spark, sf)
    val ob = t.lineitem
      .join(t.part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getString(1)))
    val baskets = ob.groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted).toArray
    val nOrders = baskets.length.toDouble
    val freq = ob.groupBy(_._2).map { case (b, a) =>
      (b, a.length.toLong) }
    val cnt = scala.collection.mutable.Map
      .empty[(String, String, String), Long].withDefaultValue(0L)
    baskets.filter(_.length >= 3).foreach { bs =>
      for (i <- bs.indices; j <- i + 1 until bs.length;
           l <- j + 1 until bs.length)
        cnt((bs(i), bs(j), bs(l))) += 1
    }
    val top = cnt.toSeq
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(5)
    rows.zip(top).foreach { case (r, ((a, b, c), s)) =>
      assert((r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)) == ((a, b, c, s)))
      val lift = s * nOrders * nOrders /
        (freq(a).toDouble * freq(b) * freq(c))
      assert(r.getDouble(4) == rnd(lift, 4))
    }
  }
}
