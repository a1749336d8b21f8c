package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group interpolated percentiles on the [[BinnedRank]] histogram
  * scaffold — a drop-in replacement for Spark's `percentile(v, p)` /
  * `median(v)` ObjectAggregate, with BIT-IDENTICAL results (interpolation
  * replicated from `Percentile.getPercentile`):
  *
  *   position  = (N − 1) · p                    (double)
  *   lower     = floor(position), higher = ceil(position)
  *   lowerKey  = value at 0-based sorted index `lower`
  *   higherKey = value at index `higher`
  *   result    = lowerKey                       if higher == lower
  *             = lowerKey                       if higherKey == lowerKey
  *             = (higher−position)·lowerKey + (position−lower)·higherKey
  *
  * Why this exists (guide §5): `percentile()` buffers a per-group
  * (value → count) OpenHashMap — O(distinct values) memory per group, a
  * serialized map through the partial/final merge, and a single-threaded
  * final sort per group. On near-unique measures (prices) that is the
  * classic scale-killer and, at high local parallelism, pure GC debt. The
  * scaffold form computes the same ranks from a (groups, value) count
  * histogram whose only unpartitioned window runs over the BOUNDED bin
  * frame, so per-task state is rows-per-bin, never rows-per-group.
  *
  * Null values are excluded before the histogram (percentile() skips
  * nulls). A group whose values are ALL null disappears from the output
  * (the ObjectAggregate would emit a null row) — callers here never feed
  * such groups; documented rather than handled.
  */
object ExactQuantile {

  /** Per-group percentiles of `v`: one output row per group with one
    * column per `(name, p)`. `bin` maps the value column to a BOUNDED,
    * monotone non-decreasing bin key (e.g. `floor(v / 1000)`) — the
    * BinnedRank contract. */
  def percentiles(df: DataFrame, groups: Seq[String], v: Column,
      bin: Column => Column, ps: Seq[(String, Double)]): DataFrame = {
    val hist = df.filter(v.isNotNull)
      .groupBy((groups.map(col) :+ v.as("__v")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val r = BinnedRank.belowAndN(hist, groups,
      bin(col("__v")).cast("bigint"), Seq(col("__v")), col("__cnt"))
    // per-row (group-constant) rank positions, then one aggregate picks the
    // covering values: value at sorted index k is the row with
    // below <= k < below + c
    val aggs = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      val pos = (col("n") - 1).cast("double") * lit(p)
      val lo = floor(pos).cast("bigint")
      val hi = ceil(pos).cast("bigint")
      val vd = col("__v").cast("double")
      Seq(
        max(when(col("below") <= lo && lo < col("below") + col("__cnt"), vd))
          .as(s"__vlo$i"),
        max(when(col("below") <= hi && hi < col("below") + col("__cnt"), vd))
          .as(s"__vhi$i"),
        max(pos).as(s"__pos$i"), max(lo).as(s"__lo$i"), max(hi).as(s"__hi$i"))
    }
    val g = r.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val out = ps.zipWithIndex.map { case ((name, _), i) =>
      val (vlo, vhi) = (col(s"__vlo$i"), col(s"__vhi$i"))
      val (pos, lo, hi) = (col(s"__pos$i"), col(s"__lo$i"), col(s"__hi$i"))
      when(hi === lo, vlo)
        .when(vhi === vlo, vlo)
        .otherwise((hi.cast("double") - pos) * vlo
          + (pos - lo.cast("double")) * vhi)
        .as(name)
    }
    g.select(groups.map(col) ++ out: _*)
  }
}
