package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
  }

  test("split assignment is a pure function of id: stable under repartitioning") {
    val a = Sampling.assignSplit(docs(1000), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.assignSplit(docs(1000).repartition(13), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // boundaries land near 80/10/10 (hash uniformity sanity)
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(sizes("train") - 800) < 40, sizes.toString)
    assert(math.abs(sizes("test") - 100) < 30, sizes.toString)
  }

  test("growing the train fraction never moves a doc out of test (contamination safety)") {
    val small = Sampling.assignSplit(docs(2000), "doc_id", trainPct = 70, valPct = 10)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = Sampling.assignSplit(docs(2000), "doc_id", trainPct = 85, valPct = 10)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // promoted docs come only from val/test-boundary shift upward:
    // anything in test under the SMALL train stays test unless val grew past it;
    // here the val width is constant so test membership differs only at the tail
    val testSmall = small.filter(_._2 == "test").keySet
    val testBig = big.filter(_._2 == "test").keySet
    assert(testBig.subsetOf(testSmall))
    // and nothing that was train ever demotes
    assert(small.filter(_._2 == "train").keySet.subsetOf(big.filter(_._2 == "train").keySet))
  }

  test("stratified sample keeps only hash-qualified rows at ~the stratum fraction") {
    val out = Sampling.stratifiedSample(docs(3000), "lang",
      Map("en" -> 0.2, "de" -> 0.7), "doc_id")
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") - 200) < 40, byLang.toString)   // 1000 en * 0.2
    assert(math.abs(byLang("de") - 1400) < 80, byLang.toString)  // 2000 de * 0.7
    // dropped stratum → dropped rows
    val none = Sampling.stratifiedSample(docs(300), "lang", Map("en" -> 0.5), "doc_id")
    assert(none.filter(col("lang") === "de").count() === 0)
    // deterministic: same call → same ids
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.stratifiedSample(docs(3000).repartition(7), "lang",
      Map("en" -> 0.2, "de" -> 0.7), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 === ids2)
  }

  test("per-key cap keeps exactly k rows per group and pushes a group limit below the exchange") {
    val capped = Sampling.perKeyCap(docs(500), "lang", "doc_id", 7)
    val counts = capped.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ === 7L), counts.toString)
    // small groups keep everything
    val tiny = Sampling.perKeyCap(docs(4), "lang", "doc_id", 7)
    assert(tiny.count() === 4)
    // Spark 4 plans the rank filter as WindowGroupLimit → partial top-k
    // runs map-side, the shuffle carries ≤ k rows per group per partition
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("weighted sampling keeps ~weight fraction, monotone in the weight") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("doc_id")
    val low = Sampling.weightedSample(df.withColumn("w", lit(0.3)), "doc_id", col("w"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val high = Sampling.weightedSample(df.withColumn("w", lit(0.6)), "doc_id", col("w"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(math.abs(low.size - 1200) < 120, low.size.toString)
    assert(math.abs(high.size - 2400) < 160, high.size.toString)
    // raising the weight only ADDS rows — a kept doc is never lost
    assert(low.subsetOf(high))
    // weights outside [0,1] clamp instead of misbehaving
    assert(Sampling.weightedSample(df.withColumn("w", lit(2.0)), "doc_id", col("w"))
      .count() === 4000L)
    assert(Sampling.weightedSample(df.withColumn("w", lit(-1.0)), "doc_id", col("w"))
      .count() === 0L)
  }

  test("negative sampling: exactly k distinct non-self partners per anchor, deterministic") {
    val out = Sampling.negativeSamples(docs(800), "doc_id", k = 3, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byAnchor = out.groupBy(_._1)
    assert(byAnchor.size === 800)
    assert(byAnchor.values.forall(_.length === 3))
    // a ring step never returns the anchor itself, and slots give distinct partners
    assert(out.forall { case (a, _, n) => a != n })
    assert(byAnchor.values.forall(v => v.map(_._3).distinct.length === 3))
    // pure function of ids: identical under a different partitioning
    val again = Sampling.negativeSamples(docs(800).repartition(11), "doc_id", 3, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sorted.toSeq === again.sorted.toSeq)
  }

  test("k-fold: exact partition of the corpus, near-uniform, repartition-invariant") {
    val out = Sampling.kFold(docs(5000), "doc_id", 5)
      .groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(0, 1, 2, 3, 4)) // every fold populated
    assert(out.values.sum === 5000L)           // exact partition: no doc lost/duplicated
    assert(out.values.forall(n => math.abs(n - 1000L) < 100), out.toString)
    val again = Sampling.kFold(docs(5000).repartition(7), "doc_id", 5)
      .groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again === out)
  }

  test("class balancing: every class reaches >= majority count, majority untouched") {
    import spark.implicits._
    // labels with counts 100 / 30 / 7
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 130).map(i => (i.toLong, "b")) ++
      (131 to 137).map(i => (i.toLong, "c"))).toDF("id", "label")
    val out = Sampling.balanceClasses(df, "label")
      .groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") === 100L)          // ceil(100/100)=1: majority untouched
    assert(out("b") === 120L)          // ceil(100/30)=4 copies of 30
    assert(out("c") === 105L)          // ceil(100/7)=15 copies of 7
    assert(out.values.forall(_ >= 100L))
    // copy index is dense 1..n_copies per row
    val copies = Sampling.balanceClasses(df, "label")
      .filter(col("label") === "c" && col("id") === 131L)
      .select("copy").collect().map(_.getLong(0)).sorted
    assert(copies.toSeq === (1L to 15L))
  }

  test("assignSplitByGroup: a group is never torn across splits; growing " +
      "trainPct never touches test") {
    import spark.implicits._
    val docs = (1 to 200).map(i => (i.toLong, s"grp${i % 23}"))
      .toDF("doc_id", "src")
    def splits(trainPct: Int) = Sampling
      .assignSplitByGroup(docs, "src", trainPct, 10)
      .select("src", "split", "doc_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val s80 = splits(80)
    // one split per group
    assert(s80.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 1))
    // all three splits occur over 23 groups
    assert(s80.map(_._2).distinct.sorted.toSeq == Seq("test", "train", "val"))
    // contamination safety: docs in test at 80% are still in test at 85%
    val test80 = s80.collect { case (_, "test", id) => id }.toSet
    val test85 = splits(85).collect { case (_, "test", id) => id }.toSet
    assert(test85.subsetOf(test80))
    // distinct group keys sharing an 8-char prefix + length still split
    // (hash covers prefix AND length; true prefix-collisions are accepted)
    val longs = Seq((1L, "aaaaaaaaX"), (2L, "aaaaaaaaY"), (3L, "aaaaaaaaXZ"))
      .toDF("doc_id", "src")
    val got = Sampling.assignSplitByGroup(longs, "src").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === got(2L)) // same prefix + same length -> same bucket
    assert(got.size === 3)
  }
}
