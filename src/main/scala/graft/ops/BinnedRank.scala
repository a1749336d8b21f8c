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
      order: Seq[Column], cnt: Column): DataFrame =
    belowAndNMany(df, groups, bin, order, Seq("" -> cnt))

  /** [[belowAndN]] for SEVERAL count measures in ONE pass: each
    * (suffix, cnt) yields `below<suffix>` + `n<suffix>` columns, with the
    * whole scaffold sharing the single (groups, bin) shuffle — a
    * two-sample statistic (Anderson-Darling, the joint CDF family) needs
    * both its group cumulative and the combined cumulative, and two
    * belowAndN calls would shuffle the histogram twice. */
  def belowAndNMany(df: DataFrame, groups: Seq[String], bin: Column,
      order: Seq[Column], cnts: Seq[(String, Column)]): DataFrame = {
    val g = groups.map(col)
    val withBin0 = df.withColumn("__bin", bin)
    val withBin = cnts.foldLeft(withBin0) { case (d, (sfx, c)) =>
      d.withColumn(s"__c$sfx", c)
    }
    val wBinPrefix = Window.partitionBy(g: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBinAll = Window.partitionBy(g: _*)
    val binPre0 = withBin
      .groupBy((g :+ col("__bin")): _*)
      .agg(sum(col(s"__c${cnts.head._1}")).as(s"__bc${cnts.head._1}"),
        cnts.tail.map { case (sfx, _) =>
          sum(col(s"__c$sfx")).as(s"__bc$sfx")
        }: _*)
    val binPre = cnts.foldLeft(binPre0) { case (d, (sfx, _)) =>
      d.withColumn(s"__binBelow$sfx",
          coalesce(sum(col(s"__bc$sfx")).over(wBinPrefix), lit(0L)))
        .withColumn(s"n$sfx", sum(col(s"__bc$sfx")).over(wBinAll))
    }.drop(cnts.map(c => s"__bc${c._1}"): _*)
    val wWithin = Window.partitionBy((g :+ col("__bin")): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val joined = cnts.foldLeft(withBin) { case (d, (sfx, _)) =>
      d.withColumn(s"__withinBelow$sfx",
        coalesce(sum(col(s"__c$sfx")).over(wWithin), lit(0L)))
    }.join(binPre, groups :+ "__bin")
    cnts.foldLeft(joined) { case (d, (sfx, _)) =>
      d.withColumn(s"below$sfx",
          col(s"__binBelow$sfx") + col(s"__withinBelow$sfx"))
        .drop(s"__c$sfx", s"__withinBelow$sfx", s"__binBelow$sfx")
    }.drop("__bin")
  }

}
