package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-decade extension of the plan-probe data: a deterministic 10×
  * upscale of the driver's sf0.1 testdata, generated on demand into
  * `.sf1-probe/` (gitignored) so the dynamic carve-out probe can assert
  * "flat under 100×", not just "flat under 10×".
  *
  * The upscale replicates each corpus table 10 times with key offsets,
  * matching the driver generator's own sf0.01→sf0.1 scaling profile
  * (measured in round 9):
  *  - row counts, key domains, and the `events` user domain grow ×10;
  *  - calendar spans stay FIXED (events cover the same 30 days at every
  *    sf; orders stay 1995-2001) — timestamps get a +copy µs nudge so
  *    distinct-ts counts still grow;
  *  - continuous measures (prices, balances) keep their bounded value
  *    DOMAIN but get a +copy·0.01 nudge so distinct-value counts grow
  *    ≈ rows, exactly the property that separates a genuine bin frame
  *    (bounded bins) from a distinct-continuous-value frame (the
  *    round-7 x_quantile_norm defect class) under the probe;
  *  - categorical domains (brands, segments, flags, event types,
  *    sources, nations) stay fixed, as in the real generator.
  *
  * This data feeds ONLY the growth probe (record counts through
  * SinglePartition shuffles) — never the DuckDB correctness oracle, so
  * generator fidelity beyond the scaling profile is not required.
  */
object ProbeSf1 {

  val dir = "/root/repo/.sf1-probe"
  private val src = "/root/testdata/sf0.1"
  private val Copies = 10

  /** Generate once; a _SUCCESS-style marker makes re-runs free. */
  def ensure(spark: SparkSession): String = synchronized {
    val marker = new java.io.File(s"$dir/_PROBE_READY")
    if (!marker.exists()) {
      val t = Tables(spark, src)
      def span(df: DataFrame, key: String): Long =
        df.agg(max(col(key))).head.getLong(0) + 1L

      val oSpan = span(t.orders, "o_orderkey")
      val cSpan = span(t.customer, "c_custkey")
      val pSpan = span(t.part, "p_partkey")
      val sSpan = span(t.supplier, "s_suppkey")
      val eSpan = span(t.events, "event_id")
      val uSpan = span(t.events, "user_id")
      val dSpan = span(t.documents, "doc_id")
      val vSpan = span(t.embeddings, "vec_id")

      def upscaled(df: DataFrame)(per: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until Copies).map(c => per(df, c)).reduce(_ unionByName _)

      def write(df: DataFrame, name: String): Unit =
        df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

      write(upscaled(t.orders) { (df, c) =>
        df.select(
          (col("o_orderkey") + c * oSpan).as("o_orderkey"),
          (col("o_custkey") + c * cSpan).as("o_custkey"),
          col("o_orderstatus"),
          round(col("o_totalprice") + c * 0.01, 2).as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
      }, "orders")

      write(upscaled(t.lineitem) { (df, c) =>
        df.select(
          (col("l_orderkey") + c * oSpan).as("l_orderkey"),
          (col("l_partkey") + c * pSpan).as("l_partkey"),
          (col("l_suppkey") + c * sSpan).as("l_suppkey"),
          col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice") + c * 0.01, 2).as("l_extendedprice"),
          col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      }, "lineitem")

      write(upscaled(t.customer) { (df, c) =>
        df.select(
          (col("c_custkey") + c * cSpan).as("c_custkey"), col("c_name"),
          col("c_nationkey"),
          round(col("c_acctbal") + c * 0.01, 2).as("c_acctbal"),
          col("c_mktsegment"))
      }, "customer")

      write(upscaled(t.part) { (df, c) =>
        df.select((col("p_partkey") + c * pSpan).as("p_partkey"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
          col("p_retailprice"))
      }, "part")

      write(upscaled(t.supplier) { (df, c) =>
        df.select((col("s_suppkey") + c * sSpan).as("s_suppkey"),
          col("s_name"), col("s_nationkey"), col("s_acctbal"))
      }, "supplier")

      write(upscaled(t.events) { (df, c) =>
        df.select(
          (col("event_id") + c * eSpan).as("event_id"),
          (col("ts") + expr(s"INTERVAL $c MICROSECOND")).as("ts"),
          (col("user_id") + c * uSpan).as("user_id"),
          col("event_type"),
          round(col("value") + c * 0.0001, 4).as("value"), col("props"))
      }, "events")

      write(upscaled(t.documents) { (df, c) =>
        df.select((col("doc_id") + c * dSpan).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars"))
      }, "documents")

      write(upscaled(t.embeddings) { (df, c) =>
        df.select((col("vec_id") + c * vSpan).as("vec_id"),
          col("embedding"), col("label"))
      }, "embeddings")

      // dims copy verbatim (fixed 25/5-row domains at every sf)
      write(t.nation, "nation")
      write(t.region, "region")
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    dir
  }
}
