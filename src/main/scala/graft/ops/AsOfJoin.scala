package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join: every left row picks up the value of the LATEST right row
  * with the same key and `rightTs <= leftTs` (inclusive — DuckDB/kdb ASOF
  * semantics). Spark has no built-in as-of join; two interchangeable
  * implementations live here:
  *
  *  - [[asofJoin]]: composable Dataset-API formulation (preference order
  *    (a)) — tag both sides, union, one pass of
  *    `last(_, ignoreNulls).over(partitionBy(key).orderBy(ts, side))`
  *    carries the most recent right value forward into each left row. ONE
  *    shuffle of |L|+|R| rows partitioned by key + a per-key sort — versus
  *    the per-row-subquery or range-join alternatives that are O(|L|·|R|)
  *    per key. Skewed keys split under AQE like any other sort/window load.
  *  - [[asofJoinMerge]]: whole-operator Catalyst integration (preference
  *    order (c)) — [[graft.plans.AsOfJoinNode]] planned by
  *    [[graft.plans.AsOfJoinStrategy]] as a dedicated sort-merge
  *    [[graft.plans.AsOfJoinExec]]: same shuffle/sort contract as a
  *    SortMergeJoin, then an O(|L|+|R|) forward merge with O(1) state per
  *    partition (no window buffer). The two are result-identical and
  *    cross-checked in AsOfJoinSpec and by the `x_asof_join` /
  *    `x_asof_join_native` oracle rows.
  *
  * Shared semantics (both match DuckDB `ASOF LEFT JOIN`):
  *  - NULL join keys and NULL timestamps never match (left rows with a NULL
  *    key or ts get a NULL value; right rows with a NULL key or ts are
  *    ignored) — SQL comparison semantics, enforced, not caveated.
  *  - Several right rows on the latest (key, ts): the MAX value wins
  *    (deterministic tie-break).
  *  - A matched right row whose VALUE is null yields null — presence is
  *    tracked separately from the value, so an earlier snapshot is NOT
  *    carried past a latest-but-null row.
  */
object AsOfJoin {

  /** Left as-of join carrying `valueCol` from `right` as `valueAlias`.
    * Output = every `left` row + the as-of value (null when no right row
    * precedes it). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String, valueAlias: String): DataFrame = {
    val vt = right.schema(valueCol).dataType
    val pvType = StructType(Seq(StructField("_v", vt)))
    // presence struct: non-null for every matched right row even when the
    // VALUE inside is null, so `last(ignoreNulls)` carries the latest MATCH
    // rather than the latest non-null value
    val r = right
      .filter(col(key).isNotNull && col(ts).isNotNull) // NULLs never match
      .groupBy(col(key), col(ts))
      .agg(max(col(valueCol)).as("_v"))
      .withColumn("_pv", struct(col("_v")))
      .drop("_v")
      .withColumn("_side", lit(0))
    val leftCols = left.columns
    val l = left
      .withColumn("_pv", lit(null).cast(pvType))
      .withColumn("_side", lit(1))
    // align R to L's schema: null for every left-only column
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols :+ "_pv" :+ "_side").map(col): _*)
    val unioned = l.select((leftCols :+ "_pv" :+ "_side").map(col): _*)
      .unionByName(rAligned)
    // right rows order BEFORE left rows at equal ts — the inclusive bound;
    // null key/ts left rows sort into all-left prefixes and get null
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_pvl", last(col("_pv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .withColumn(valueAlias, col("_pvl").getField("_v"))
      .drop("_pv", "_pvl", "_side")
  }

  /** FORWARD as-of join: every left row picks up the EARLIEST right row
    * with `rightTs >= leftTs` (inclusive) — the other direction of
    * pandas `merge_asof(direction=...)`; "what's the next quote/reading
    * at-or-after this event". Same single-shuffle shape as [[asofJoin]],
    * mirrored: the carry runs backward (`first` over the FOLLOWING frame)
    * and right rows sort AFTER left at equal ts so the inclusive bound
    * holds. NULL left key/ts yield NULL explicitly (a null ts sorts into
    * the ascending prefix where a following frame WOULD see refs). */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String, valueAlias: String): DataFrame = {
    val vt = right.schema(valueCol).dataType
    val pvType = StructType(Seq(StructField("_v", vt)))
    val r = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .groupBy(col(key), col(ts))
      .agg(max(col(valueCol)).as("_v"))
      .withColumn("_pv", struct(col("_v")))
      .drop("_v")
      .withColumn("_side", lit(1)) // right AFTER left at equal ts
    val leftCols = left.columns
    val l = left
      .withColumn("_pv", lit(null).cast(pvType))
      .withColumn("_side", lit(0))
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols :+ "_pv" :+ "_side").map(col): _*)
    val unioned = l.select((leftCols :+ "_pv" :+ "_side").map(col): _*)
      .unionByName(rAligned)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("_pvf", first(col("_pv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .withColumn(valueAlias,
        when(col(key).isNull || col(ts).isNull, lit(null).cast(vt))
          .otherwise(col("_pvf").getField("_v")))
      .drop("_pv", "_pvf", "_side")
  }

  /** As-of join WITH TOLERANCE (pandas `merge_asof(tolerance=...)`): the
    * latest at-or-before match counts only if it lies within
    * `tolMicros` of the left timestamp; staler matches yield NULL.
    *
    * Implemented on [[asofJoin]] by carrying the matched ref's timestamp
    * alongside its value in a struct (struct max preserves the max-value
    * tie-break: within a (key, ts) group the ts field is constant) and
    * nulling the value when the lag exceeds the bound — no second join, no
    * extra shuffle. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCol: String, valueAlias: String,
      tolerance: Long): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // lag in the ts column's own unit: exact micros for timestamps, the
    // raw value for numeric ts — `tolerance` is in that same unit
    def lagUnits(c: org.apache.spark.sql.Column) =
      left.schema(ts).dataType match {
        case TimestampType | TimestampNTZType => unix_micros(c.cast("timestamp"))
        case _ => c.cast("bigint")
      }
    val r2 = right.withColumn("_tv",
      struct(col(ts).as("_t"), col(valueCol).as("_v")))
    asofJoin(left, r2, key, ts, "_tv", "_tvo")
      .withColumn(valueAlias,
        when(lagUnits(col(ts)) - lagUnits(col("_tvo._t")) <= tolerance,
          col("_tvo._v")))
      .drop("_tvo")
  }

  /** As-of join through the dedicated physical operator
    * ([[graft.plans.AsOfJoinExec]]); result-identical to [[asofJoin]]. */
  def asofJoinMerge(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String, valueAlias: String): DataFrame = {
    // robust in ANY session: sessions built without
    // spark.sql.extensions=GraftExtensions still plan the node (public
    // ExperimentalMethods API; no-op when already registered either way)
    val exp = left.sparkSession.experimental
    if (!exp.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val lPlan = Shim.analyzed(left)
    val rPlan0 = Shim.analyzed(right)
    // self-join lineage: if both sides share attribute ids (left and right
    // carved from one source), re-alias the right side with FRESH exprIds —
    // otherwise the analyzer's relation dedup re-ids the right subtree
    // underneath the node while its attribute fields keep the stale ids
    val rPlan = if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(a => left.sparkSession.sessionState.conf.resolver(a.name, n))
        .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val rv = attr(rPlan, valueCol)
    val lk = attr(lPlan, key); val lt = attr(lPlan, ts)
    val rk = attr(rPlan, key); val rt = attr(rPlan, ts)
    // The merge compares rows across sides with orderings built from the
    // LEFT types; unlike an equi-join the node performs no implicit cast,
    // so an int-vs-bigint mismatch would read the right rows with the wrong
    // accessor. Fail at construction instead.
    def requireSameType(side: String,
        l: org.apache.spark.sql.catalyst.expressions.Attribute,
        r: org.apache.spark.sql.catalyst.expressions.Attribute): Unit =
      if (l.dataType != r.dataType) throw new IllegalArgumentException(
        s"asofJoinMerge: $side types must match exactly (no implicit cast): " +
          s"left ${l.name}: ${l.dataType.sql} vs right ${r.name}: ${r.dataType.sql}")
    requireSameType("key", lk, rk)
    requireSameType("timestamp", lt, rt)
    val out = AttributeReference(valueAlias, rv.dataType, nullable = true)()
    Shim.ofRows(left.sparkSession, graft.plans.AsOfJoinNode(
      lPlan, rPlan, lk, lt, rk, rt, rv, out))
  }
}
