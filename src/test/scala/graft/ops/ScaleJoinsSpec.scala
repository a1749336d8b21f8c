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
}
