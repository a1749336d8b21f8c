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
