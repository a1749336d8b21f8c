package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-26 corpus
  * diagnostics.
  */
class R26OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docs: Array[(Long, String, String, Array[String])] =
    Tables(spark, sf).documents
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).split(" ", -1).filter(_.nonEmpty)))

  test("x_dataset_card matches direct per-source summaries") {
    val ds = docs
    val out = SparkEntry.queries("x_dataset_card")(spark, sf).collect()
    assert(out.length === ds.map(_._2).distinct.length)
    out.foreach { r =>
      val xs = ds.filter(_._2 == r.getString(0))
      val toks = xs.map(_._4.length.toLong)
      assert(r.getLong(1) === xs.length.toLong)
      assert(r.getLong(2) === toks.sum)
      assert(math.abs(r.getDouble(3) - toks.sum.toDouble / xs.length) < 1e-3)
      assert(r.getLong(4) === xs.map(_._3).distinct.length.toLong)
      assert(math.abs(r.getDouble(5) -
        toks.count(_ < 50).toDouble / xs.length) < 1e-6)
    }
  }

  test("x_length_filter_sweep: shares monotone decreasing; counts exact") {
    val toks = docs.map(_._4.length.toLong)
    val out = SparkEntry.queries("x_length_filter_sweep")(spark, sf)
      .collect().sortBy(_.getInt(0))
    assert(out.map(_.getInt(0)).toSeq === (1 to 10).map(_ * 10))
    out.foreach { r =>
      val th = r.getInt(0)
      assert(r.getLong(1) === toks.count(_ >= th).toLong)
      assert(math.abs(r.getDouble(2) -
        toks.count(_ >= th).toDouble / toks.length) < 1e-6)
      assert(math.abs(r.getDouble(3) -
        toks.filter(_ >= th).sum.toDouble / toks.sum) < 1e-6)
    }
    out.sliding(2).foreach { case Array(p, q) =>
      assert(q.getDouble(2) <= p.getDouble(2) + 1e-12)
    }
  }

  test("x_ngram_novelty matches direct trigram sets") {
    val ds = docs
    def tris(ws: Array[String]): Seq[String] =
      if (ws.length < 3) Nil
      else ws.sliding(3).map(_.mkString(" ")).toSeq
    val train = ds.filter(_._1 % 10 < 8).flatMap(d => tris(d._4)).toSet
    val test = ds.filter(_._1 % 10 >= 8).flatMap(d => tris(d._4)).toSet
    val novel = test.count(t => !train(t))
    val row = SparkEntry.queries("x_ngram_novelty")(spark, sf).collect().head
    assert(row.getLong(0) === test.size.toLong)
    assert(row.getLong(1) === novel.toLong)
    assert(math.abs(row.getDouble(2) - novel.toDouble / test.size) < 1e-6)
  }

  test("x_vocab_overlap matches direct vocabulary Jaccard on a spot pair") {
    val ds = docs
    val bySrc = ds.groupBy(_._2).view
      .mapValues(_.flatMap(_._4).toSet).toMap
    val out = SparkEntry.queries("x_vocab_overlap")(spark, sf).collect()
    val srcs = bySrc.keys.toSeq.sorted
    assert(out.length === srcs.length * (srcs.length - 1) / 2)
    out.take(10).foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val va = bySrc(a); val vb = bySrc(b)
      val both = (va & vb).size
      assert(r.getLong(2) === va.size.toLong)
      assert(r.getLong(3) === vb.size.toLong)
      assert(r.getLong(4) === both.toLong)
      assert(math.abs(r.getDouble(5) -
        both.toDouble / (va.size + vb.size - both)) < 1e-6)
    }
  }

  test("x_doclen_powerlaw matches the direct binned-CCDF fit; alpha negative") {
    val toks = docs.map(_._4.length.toLong).filter(_ > 0)
    val n = toks.length.toDouble
    val bins = toks.groupBy(t => math.floor(math.log(t.toDouble) * 8).toLong)
      .view.mapValues(_.length.toLong).toMap
    val pts = bins.keys.toSeq.sorted.map { b =>
      val atOrAbove = bins.filter(_._1 >= b).values.sum
      (b / 8.0, math.log(atOrAbove / n))
    }
    val mx = pts.map(_._1).sum / pts.length
    val my = pts.map(_._2).sum / pts.length
    val slope = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
      pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val row = SparkEntry.queries("x_doclen_powerlaw")(spark, sf).collect().head
    assert(row.getLong(0) === docs.length.toLong)
    assert(row.getLong(1) === bins.size.toLong)
    assert(math.abs(row.getDouble(2) - slope) < 1e-3)
    assert(row.getDouble(2) < 0)
  }
}
