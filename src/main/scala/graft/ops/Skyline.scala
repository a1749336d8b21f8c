package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact 2-D skyline (Pareto frontier): the rows not dominated by any other
  * row, where domination means `minCol` ≤ and `maxCol` ≥ with at least one
  * strict. The classic formulation is the quadratic NOT-EXISTS self-join
  * (which the DuckDB oracle runs); at corpus scale this implementation is
  * the O(N log N) distribute-then-merge shape instead:
  *
  *  1. collapse to DISTINCT (minCol, maxCol) pairs — duplicates can't
  *     dominate each other, so dominance is decided on the pair set;
  *  2. LOCAL skylines over hash buckets: within a bucket, sort by
  *     (minCol asc, maxCol desc) and keep a pair iff the running max of
  *     maxCol over all strictly-preceding rows is below its own maxCol
  *     (on the distinct-pair set "preceding with running-max ≥ mine"
  *     is exactly "strictly dominating": an equal maxCol from an earlier
  *     row implies a strictly smaller minCol). Each bucket's window is an
  *     independent partition — the corpus-sized sort runs parallel;
  *  3. GLOBAL skyline of the union of local survivors — the skyline of a
  *     union is a subset of the union of skylines, so the same window over
  *     the (small) survivor set, single partition by construction, is
  *     exact;
  *  4. semi-join the original rows on surviving pairs (keeps genuine
  *     duplicate points, which are mutually non-dominated).
  *
  * Null measures are not meaningful for dominance; callers filter them.
  */
object Skyline {

  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
      buckets: Int = 32): DataFrame = {
    val pairs = df
      .select(col(minCol).as("_mn"), col(maxCol).as("_mx"))
      .distinct()

    def survivors(in: DataFrame, part: Column): DataFrame = {
      val w = Window.partitionBy(part)
        .orderBy(col("_mn").asc, col("_mx").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      in.withColumn("_pm", max(col("_mx")).over(w))
        .filter(col("_pm").isNull || col("_mx") > col("_pm"))
        .drop("_pm")
    }

    val local = survivors(
      pairs.withColumn("_b", pmod(xxhash64(col("_mn"), col("_mx")), lit(buckets))),
      col("_b")).drop("_b")
    // survivor set is staircase-sized per bucket; one partition is the point
    val global = survivors(local.withColumn("_b", lit(0)), col("_b")).drop("_b")

    df.join(global,
      col(minCol) === col("_mn") && col(maxCol) === col("_mx"), "left_semi")
  }
}
