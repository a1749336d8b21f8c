package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.ops.ExactQuantile

/** Within-session A/B of the percentile()→ExactQuantile swap on the four
  * reverted r14 sites, at the CPU count under test (r14 verdict item 2:
  * the rejection was measured under 8-core-flavored conditions; the 32-core
  * driver record read x_fligner_killeen at 8.2 s vs 4.0 s on 8 cores).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.AbQuantile [reps]"
  * Prints per-variant seconds (interleaved A/B, warm JVM) and asserts the
  * two variants' collected results are identical row-for-row.
  */
object AbQuantile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def fkOld(s: SparkSession, d: String): DataFrame = {
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      oc.groupBy("g").agg(expr("median(v)").as("med"))
    }
    def fkNew(s: SparkSession, d: String): DataFrame = {
      val t = Tables(s, d)
      val oc = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      ExactQuantile.percentiles(oc, Seq("g"), col("v"),
        v => floor(v / 1000), Seq("med" -> 0.5))
    }
    def madOld(s: SparkSession, d: String): DataFrame = {
      val li = Tables(s, d).lineitem
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      val med = li.groupBy("g")
        .agg(round(expr("percentile(x, 0.5D)"), 4).as("med"))
      val dev = li.join(broadcast(med), "g")
        .withColumn("ad", abs(col("x") - col("med")))
      dev.groupBy("g")
        .agg(min(col("med")).as("med"),
          round(expr("percentile(ad, 0.5D)"), 4).as("mad"))
    }
    def madNew(s: SparkSession, d: String): DataFrame = {
      val li = Tables(s, d).lineitem
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      val med = ExactQuantile.percentiles(li, Seq("g"), col("x"),
          v => floor(v / 1000), Seq("med" -> 0.5))
        .select(col("g"), round(col("med"), 4).as("med"))
      val dev = li.join(broadcast(med), "g")
        .withColumn("ad", abs(col("x") - col("med")))
      val mad = ExactQuantile.percentiles(dev, Seq("g"), col("ad"),
          v => floor(v / 1000), Seq("mad" -> 0.5))
        .select(col("g"), round(col("mad"), 4).as("mad"))
      dev.groupBy("g").agg(min(col("med")).as("med"))
        .join(mad, "g").select("g", "med", "mad")
    }
    def quantOld(s: SparkSession, d: String): DataFrame =
      Tables(s, d).lineitem.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_med"))
    def quantNew(s: SparkSession, d: String): DataFrame = {
      val li = Tables(s, d).lineitem
      val q = ExactQuantile.percentiles(li, Seq("l_returnflag"),
        col("l_quantity"), v => v.cast("bigint"),
        Seq("q25" -> 0.25, "q50" -> 0.5, "q75" -> 0.75))
      val p = ExactQuantile.percentiles(li, Seq("l_returnflag"),
          col("l_extendedprice"), v => floor(v / 1000),
          Seq("pm" -> 0.5))
        .select(col("l_returnflag"), round(col("pm"), 4).as("price_med"))
      q.join(p, "l_returnflag")
        .select("l_returnflag", "q25", "q50", "q75", "price_med")
    }
    def winsOld(s: SparkSession, d: String): DataFrame = {
      val o = Tables(s, d).orders
      val st = o.groupBy("o_orderpriority").agg(
        round(expr("percentile(o_totalprice, 0.01)"), 6).as("p01"),
        round(expr("percentile(o_totalprice, 0.99)"), 6).as("p99"))
      o.join(broadcast(st), "o_orderpriority")
        .groupBy("o_orderpriority", "p01", "p99")
        .agg(round(avg(least(greatest(col("o_totalprice"), col("p01")),
          col("p99"))), 4).as("avg_winsorized"),
          sum(when(col("o_totalprice") < col("p01")
            || col("o_totalprice") > col("p99"), 1L).otherwise(0L))
            .as("n_clamped"))
    }
    def winsNew(s: SparkSession, d: String): DataFrame = {
      val o = Tables(s, d).orders
      val st = ExactQuantile.percentiles(o, Seq("o_orderpriority"),
          col("o_totalprice"), v => floor(v / 1000),
          Seq("p01raw" -> 0.01, "p99raw" -> 0.99))
        .select(col("o_orderpriority"), round(col("p01raw"), 6).as("p01"),
          round(col("p99raw"), 6).as("p99"))
      o.join(broadcast(st), "o_orderpriority")
        .groupBy("o_orderpriority", "p01", "p99")
        .agg(round(avg(least(greatest(col("o_totalprice"), col("p01")),
          col("p99"))), 4).as("avg_winsorized"),
          sum(when(col("o_totalprice") < col("p01")
            || col("o_totalprice") > col("p99"), 1L).otherwise(0L))
            .as("n_clamped"))
    }

    val cases: Seq[(String, (SparkSession, String) => DataFrame,
        (SparkSession, String) => DataFrame)] = Seq(
      ("fligner_med", fkOld, fkNew),
      ("mad_outliers", madOld, madNew),
      ("quantiles", quantOld, quantNew),
      ("winsorize", winsOld, winsNew))

    def time(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup + equality check
    cases.foreach { case (name, old, neu) =>
      val a = old(spark, sfDir).collect().map(_.toString).sorted
      val b = neu(spark, sfDir).collect().map(_.toString).sorted
      require(a.sameElements(b),
        s"$name MISMATCH:\n  old=${a.mkString("|")}\n  new=${b.mkString("|")}")
      println(s"[ab] $name: results identical (${a.length} rows)")
    }
    for (r <- 1 to reps) {
      cases.foreach { case (name, old, neu) =>
        val to = time(old); val tn = time(neu)
        println(f"[ab] rep$r $name%-14s old=$to%6.2fs new=$tn%6.2fs")
      }
    }
    spark.stop()
  }
}
