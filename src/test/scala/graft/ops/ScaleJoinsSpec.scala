package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is result-identical to the plain join under heavy skew") {
    // 90% of the fact rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i)).toDF("k", "v")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = ScaleJoins.saltedJoin(big, small, "k", 8).select("k", "v", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("bloomSemiJoin: result-identical to the plain semi-join AND the bloom prunes the scan") {
    // 10k fact rows, dim selects keys 0..9 of 0..499 → plain semi keeps ~2%
    val fact = (1 to 10000).map(i => (i.toLong % 500, i)).toDF("fk", "v")
    val dim = (0L to 9L).map(k => (k, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim.select(col("dk")), col("fk") === col("dk"), "left_semi")
      .collect().map(_.toSeq).sortBy(_.toString)
    val viaBloom = ScaleJoins.bloomSemiJoin(fact, dim, "fk", "dk")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(viaBloom === plain)
    assert(plain.nonEmpty)
    // the pruning win: rows surviving the bloom PRE-filter (before the
    // exact join) must be a small fraction of the fact table — this is the
    // shuffle volume the runtime filter saves at scale
    import graft.functions.GraftFunctions.{bloomFilterAgg, mightContain}
    val n = dim.count()
    val bf = dim.agg(bloomFilterAgg(col("dk"), n, n * 20L).as("f"))
      .first().getAs[Array[Byte]](0)
    val survivors = fact.filter(mightContain(bf, col("fk"))).count()
    assert(survivors < fact.count() / 10,
      s"bloom should prune the fact scan hard: $survivors of 10000 survived")
  }

  test("bucketed tables join without a shuffle exchange") {
    val a = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "va")
    val b = (1L to 300L).map(i => (i % 50, s"n$i")).toDF("k", "vb")
    ScaleJoins.writeBucketed(a, "graft_bucket_a", "k", 8)
    ScaleJoins.writeBucketed(b, "graft_bucket_b", "k", 8)
    // disable broadcast so the join would otherwise need a shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_a").join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 6000L) // 1000 rows × 6 matches each (300/50)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("fuzzyJoinLev1 equals the brute-force distance join; plan has no cross join") {
    val left = Seq("kitten", "flaw", "gear", "table", "zzz")
      .toDF("a").distinct()
    val right = Seq("sitten", "flaws", "law", "gear", "fable", "cable", "qqq")
      .toDF("b").distinct()

    val fuzzy = ScaleJoins.fuzzyJoinLev1(left, "a", right, "b")
    val got = fuzzy.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // brute force over the tiny fixture: the ground truth
    val expected = (for {
      a <- Seq("kitten", "flaw", "gear", "table", "zzz")
      b <- Seq("sitten", "flaws", "law", "gear", "fable", "cable", "qqq")
      if levDist(a, b) <= 1
    } yield (a, b)).toSet
    assert(got === expected)
    assert(got.contains(("kitten", "sitten"))) // substitution
    assert(got.contains(("flaw", "flaws")))    // insertion
    assert(got.contains(("flaw", "law")))      // deletion
    assert(got.contains(("gear", "gear")))     // exact
    assert(!got.exists(_._1 == "zzz"))         // no match
    assert(!got.contains(("table", "cable")) || levDist("table", "cable") <= 1)

    // blocking, not all-pairs: no cartesian/nested-loop join in the plan
    val plan = fuzzy.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("AQE splits a skewed join partition at runtime (the salting alternative)") {
    // saltedJoin is the MANUAL skew fix; this proves the engine's automatic
    // one fires on our plans: one hot key holds ~95% of the fact rows, so
    // one post-shuffle partition dwarfs the median and AQE's skew-join rule
    // must split it (visible as skew=true on the adaptive SMJ).
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // thresholds low enough that the test-sized hot partition counts as skewed
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      (1 to 40000).map(i => (if (i % 20 == 0) (i % 7).toLong + 1 else 0L, s"pay-$i-${"x" * 30}"))
        .toDF("k", "v").write.parquet(s"$dir/fact")
      (0L to 7L).map(k => (k, s"name-$k")).toDF("k", "name")
        .write.parquet(s"$dir/dim")
      val joined = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim"), "k")
      // execute THIS query execution (count() would plan a separate one),
      // then read back the finalized adaptive plan
      assert(joined.collect().length === 40000) // result correct regardless of splitting
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
