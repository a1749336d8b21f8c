package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: every left row picks up the value of the LATEST right row
  * with the same key and `rightTs <= leftTs` (inclusive — DuckDB/kdb ASOF
  * semantics). Spark has no built-in as-of join; the composable
  * formulation here (preference order (a) — no custom plan needed) is the
  * scale-correct one:
  *
  * tag both sides, union, then one pass of
  * `last(_v, ignoreNulls).over(partitionBy(key).orderBy(ts, side))` carries
  * the most recent right value forward into each left row. ONE shuffle of
  * |L|+|R| rows partitioned by key + a per-key sort — versus the
  * per-row-subquery or range-join alternatives that are O(|L|·|R|) per key.
  * Skewed keys split under AQE like any other sort/window load.
  *
  * Right rows are pre-collapsed to one per (key, ts) (max value) so results
  * are deterministic when a key has several right rows at one timestamp;
  * right rows order BEFORE left rows at equal ts, which is exactly the
  * inclusive `l.ts >= r.ts` ASOF bound.
  */
object AsOfJoin {

  /** Left as-of join carrying `valueCol` from `right` as `valueAlias`.
    * Output = every `left` row + the as-of value (null when no right row
    * precedes it).
    *
    * Null-key caveat: the window partition groups NULL keys together,
    * where SQL equality-join semantics would match nothing — callers with
    * nullable keys should filter or coalesce them first. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String, valueAlias: String): DataFrame = {
    val vt = right.schema(valueCol).dataType
    val r = right.groupBy(col(key), col(ts))
      .agg(max(col(valueCol)).as("_v"))
      .withColumn("_side", lit(0))
    val leftCols = left.columns
    val l = left
      .withColumn("_v", lit(null).cast(vt))
      .withColumn("_side", lit(1))
    // align R to L's schema: null for every left-only column
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols :+ "_v" :+ "_side").map(col): _*)
    val unioned = l.select((leftCols :+ "_v" :+ "_side").map(col): _*)
      .unionByName(rAligned)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(valueAlias, last(col("_v"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_v", "_side")
  }
}
