package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-18 operators:
  * loop-built SAX words, direct two-proportion z, per-nation diversity
  * ladders, argmax-based Grubbs, and a sequential runs counter.
  */
class R18OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def dailyCounts: Array[(Long, Double)] =
    Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d")).count()
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1).toDouble))
      .sortBy(_._1)

  test("x_sax_symbols matches the direct PAA + breakpoint mapping") {
    val daily = dailyCounts
    val d0 = daily.head._1
    val n = daily.length
    val mean = daily.map(_._2).sum / n
    val m = BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sd = BigDecimal(math.sqrt(
        daily.map(x => (x._2 - mean) * (x._2 - mean)).sum / (n - 1)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val segs = daily.groupBy(x => (x._1 - d0) / 3).map { case (s, xs) =>
      val paa = BigDecimal(xs.map(_._2).sum / xs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val z = (paa - m) / sd
      val sym = if (z < -0.6745) "a" else if (z < 0) "b"
        else if (z < 0.6745) "c" else "d"
      s -> (xs.length, paa, z, sym)
    }
    val out = SparkEntry.queries("x_sax_symbols")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet === segs.keySet)
    out.foreach { r =>
      val (nd, paa, z, sym) = segs(r.getLong(0))
      assert(r.getLong(1) === nd.toLong)
      assert(math.abs(r.getDouble(2) - paa) < 1e-6)
      assert(math.abs(r.getDouble(3) - z) < 1e-3)
      assert(r.getString(4) === sym, s"seg ${r.getLong(0)}")
    }
  }

  test("x_two_prop_z matches the direct pooled z computation") {
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val s0 = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val p1 = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val arms = s0.toSeq.map { case (u, t0) =>
      (u % 2, if (p1.get(u).exists(_ >= t0)) 1 else 0)
    }
    val (na, xa) = (arms.count(_._1 == 0), arms.filter(_._1 == 0).map(_._2).sum)
    val (nb, xb) = (arms.count(_._1 == 1), arms.filter(_._1 == 1).map(_._2).sum)
    val (pa, pb) = (xa.toDouble / na, xb.toDouble / nb)
    val pp = (xa + xb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    val row = SparkEntry.queries("x_two_prop_z")(spark, sf).collect().head
    assert(row.getLong(0) === na.toLong && row.getLong(1) === nb.toLong)
    assert(math.abs(row.getDouble(2) - pa) < 1e-5)
    assert(math.abs(row.getDouble(3) - pb) < 1e-5)
    assert(math.abs(row.getDouble(4) - z) < 1e-3)
  }

  test("x_hill_diversity: q-ladder ordered richness >= hill1 >= hill2; evenness in (0,1]") {
    val out = SparkEntry.queries("x_hill_diversity")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (rich, h1, h2) = (r.getLong(2).toDouble, r.getDouble(3), r.getDouble(4))
      assert(rich >= h1 - 1e-9 && h1 >= h2 - 1e-9, r.getString(0))
      assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0 + 1e-9)
    }
    // cross-check one nation directly
    val t = Tables(spark, sf)
    val rows = t.lineitem
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .select(col("n_name"), col("p_brand"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nat = rows.head._1
    val counts = rows.filter(_._1 == nat).groupBy(_._2).view.mapValues(_.size).toMap
    val nTot = counts.values.sum.toDouble
    val shannon = -counts.values.map(c => c / nTot * math.log(c / nTot)).sum
    val simpson = counts.values.map(c => (c / nTot) * (c / nTot)).sum
    val r0 = out.find(_.getString(0) == nat).get
    assert(r0.getLong(1) === nTot.toLong)
    assert(r0.getLong(2) === counts.size.toLong)
    assert(math.abs(r0.getDouble(3) - math.exp(shannon)) < 1e-3)
    assert(math.abs(r0.getDouble(4) - 1 / simpson) < 1e-3)
  }

  test("x_grubbs matches the direct argmax deviation") {
    val rows = Tables(spark, sf).orders
      .join(Tables(spark, sf).customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val out = SparkEntry.queries("x_grubbs")(spark, sf).collect()
    assert(out.length === rows.map(_._1).distinct.length)
    out.foreach { r =>
      val g = r.getString(0)
      val vs = rows.filter(_._1 == g).map(_._2)
      val mean = vs.sum / vs.length
      val mu = BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val sd = BigDecimal(math.sqrt(
          vs.map(x => (x - mean) * (x - mean)).sum / (vs.length - 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val gStat = vs.map(v => math.abs(v - mu) / sd).max
      val extreme = vs.filter(v => math.abs(v - mu) / sd == gStat).max
      assert(r.getLong(1) === vs.length.toLong)
      assert(math.abs(r.getDouble(2) - gStat) < 1e-3, g)
      assert(r.getDouble(3) === extreme, g)
    }
  }

  test("x_runs_test matches the sequential runs counter") {
    val daily = dailyCounts.map(_._2)
    val sorted = daily.sorted
    val n = sorted.length
    val md = if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2
    val signs = daily.filter(_ != md).map(c => if (c > md) 1 else 0)
    val n1 = signs.count(_ == 1).toLong
    val n2 = signs.count(_ == 0).toLong
    val runs = 1 + signs.zip(signs.tail).count(p => p._1 != p._2)
    val er = 1 + 2.0 * n1 * n2 / (n1 + n2)
    val vr = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
      ((n1 + n2).toDouble * (n1 + n2) * (n1 + n2 - 1))
    val z = (runs - er) / math.sqrt(vr)
    val row = SparkEntry.queries("x_runs_test")(spark, sf).collect().head
    assert(row.getLong(0) === n1 && row.getLong(1) === n2)
    assert(row.getLong(2) === runs.toLong)
    assert(math.abs(row.getDouble(3) - er) < 1e-3)
    assert(math.abs(row.getDouble(4) - z) < 1e-3)
  }
}
