package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level "binned prefix sum": exact rank scaffolding (strictly-below
  * counts + group totals) whose only unpartitioned window runs over a
  * BOUNDED bin frame — never over the data rows.
  *
  * The naive form of a global (or low-cardinality-group) rank is
  * `Window.partitionBy(g).orderBy(v)` straight over the rows: one task
  * sorts the whole frame, which is the classic 100 TB plan killer when the
  * frame is sf-proportional (distinct continuous values, the customer
  * dimension, a vocabulary). The fix used across the repo (the
  * x_budget_select histogram pattern, generalized here) splits the prefix
  * sum in two exact levels:
  *
  *  1. coarse: aggregate rows into value-domain bins (`floor(v/width)`,
  *     `floor(log2 c)`, a string prefix — caller-chosen, BOUNDED by the
  *     value domain, not by N) and prefix-sum the BIN frame. This is the
  *     only window that may run unpartitioned — its input is the bin
  *     frame, KBs at any scale.
  *  2. fine: prefix-sum WITHIN each bin, partitioned by (groups, bin) —
  *     each task orders only its bin's slice, and the bins give the
  *     parallelism (hundreds of tasks instead of one).
  *
  *  below(row) = binBelow(bin) + withinBelow(row) — pure integer counts,
  *  so the result is bit-identical to the single-window form.
  *
  * Contract:
  *  - `bin` must be monotone non-decreasing along the row order defined by
  *    `order` (for descending ranks, negate the bin: `-floor(log2(c))`).
  *  - rows must be unique per `order` key within (groups, bin) — pass a
  *    distinct-value histogram with `cnt` = multiplicity, or raw unique
  *    rows with `cnt` = lit(1L) (then rank = below + 1 ≡ row_number).
  *
  * Output: the input columns + `below` (rows strictly before, in-group) +
  * `n` (group total). The bin frame re-joins on (groups, bin) — the same
  * keys the within-bin window already partitioned by — so the data frame
  * is shuffled exactly once, by (groups, bin), whichever join strategy
  * AQE picks.
  */
object BinnedRank {

  def belowAndN(df: DataFrame, groups: Seq[String], bin: Column,
      order: Seq[Column], cnt: Column): DataFrame = {
    val g = groups.map(col)
    val withBin = df.withColumn("__bin", bin).withColumn("__c", cnt)
    // level 1: bounded bin frame — the only (possibly) unpartitioned window
    val wBinPrefix = Window.partitionBy(g: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBinAll = Window.partitionBy(g: _*)
    val binPre = withBin
      .groupBy((g :+ col("__bin")): _*).agg(sum(col("__c")).as("__bc"))
      .withColumn("__binBelow",
        coalesce(sum(col("__bc")).over(wBinPrefix), lit(0L)))
      .withColumn("n", sum(col("__bc")).over(wBinAll))
      .drop("__bc")
    // level 2: within-bin prefix, hash-partitioned by (groups, bin)
    val wWithin = Window.partitionBy((g :+ col("__bin")): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // no broadcast hint: the join keys equal the window's partitioning, so
    // a shuffle join adds no exchange on the data side, and AQE still
    // picks broadcast when the (usually tiny) bin frame fits — robust even
    // when a composite bin key makes the bin frame grow
    withBin
      .withColumn("__withinBelow",
        coalesce(sum(col("__c")).over(wWithin), lit(0L)))
      .join(binPre, groups :+ "__bin")
      .withColumn("below", col("__binBelow") + col("__withinBelow"))
      .drop("__bin", "__c", "__withinBelow", "__binBelow")
  }
}
