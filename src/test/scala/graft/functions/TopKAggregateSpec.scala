package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("bounded-heap top-k equals window row_number across partial-agg merges") {
    // many partitions → partial aggregation + serialize/merge paths exercised
    val scored = (1L to 5000L).map(i => (i % 7, (i * 37 % 101).toDouble, i))
      .toDF("key", "score", "id").repartition(16)
    val viaAgg = scored.groupBy("key")
      .agg(TopKByScore.topKByScore(col("score"), col("id"), 5).as("top"))
      .select(col("key"), posexplode(col("top")))
      .select(col("key"), col("col.id").as("id"), col("col.score").as("score"),
        (col("pos") + 1).as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("score").desc, col("id"))
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(1), r.getInt(3))).toSet
    assert(viaAgg === viaWindow)
  }

  test("ties break on the smaller id, like the window formulation") {
    val df = Seq((1L, 5.0, 10L), (1L, 5.0, 3L), (1L, 5.0, 7L), (1L, 4.0, 1L))
      .toDF("key", "score", "id")
    val top2 = df.groupBy("key")
      .agg(TopKByScore.topKByScore(col("score"), col("id"), 2).as("top"))
      .select(posexplode(col("top"))).select(col("col.id"))
      .collect().map(_.getLong(0)).toSeq
    assert(top2 === Seq(3L, 7L))
  }

  test("cosineTopKAgg equals the window-based cosineTopK") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val a = Similarity.cosineTopK(q, emb, 4)
      .select("qid", "cid", "cos", "rank")
      .collect().map(_.toSeq).toSet
    val b = Similarity.cosineTopKAgg(q, emb, 4)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
