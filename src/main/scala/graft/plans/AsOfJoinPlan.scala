package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator Catalyst integration for the as-of join (preference order
  * (c): custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered via
  * `SparkSessionExtensions` in [[graft.functions.GraftExtensions]]).
  *
  * Semantics (DuckDB/kdb ASOF LEFT JOIN, e.g. duckdb docs "ASOF JOIN"):
  * every left row picks up the value of the LATEST right row with the same
  * key and `right.ts <= left.ts` (inclusive); NULL keys and NULL timestamps
  * never match (SQL equality/comparison semantics); when several right rows
  * share the latest (key, ts), the MAX value wins (deterministic tie-break,
  * same as [[graft.ops.AsOfJoin.asofJoin]]'s pre-collapse); a matched right
  * row whose value is NULL yields NULL (presence ≠ value).
  *
  * Physical: a dedicated sort-merge pass. Each child is hash-clustered on
  * its key and sorted inside partitions by (key, ts) — the same distribution
  * contract as SortMergeJoin, so EnsureRequirements aligns the two sides and
  * AQE still coalesces/splits the exchanges. One forward merge per partition
  * then streams both sorted iterators in O(|L|+|R|) with O(1) state (the
  * current carry value) — no window buffer, no per-key group materialization,
  * which is what survives a 100 TB right side.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightValue: Attribute,
    outAttr: AttributeReference) extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.leftTs, n.rightKey, n.rightTs, n.rightValue,
        n.outAttr, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children arrive key-clustered and (key, ts[, value])
  * sorted (ascending, nulls first); the merge advances the right iterator
  * exactly once per partition, carrying the latest eligible value.
  *
  * The right ordering includes `value` so ties on (key, ts) resolve to the
  * max value without a pre-aggregation: the last tied row seen IS the max
  * (nulls sort first, so all-null ties still carry a present-but-null value).
  */
case class AsOfJoinExec(
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightValue: Attribute,
    outAttr: AttributeReference,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightValue, Ascending)))

  // left rows pass through in order, so the enforced (key, ts) sort survives
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    // local copies so the task closure doesn't drag the whole plan tree
    val lOutput = left.output
    val rOutput = right.output
    val lKeyExpr = leftKey; val lTsExpr = leftTs
    val rKeyExpr = rightKey; val rTsExpr = rightTs; val rValExpr = rightValue
    val outAttrs = output
    val joinedSchema = lOutput :+ outAttr
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    val lRdd = left.execute()
    val rRdd = right.execute()
    // EnsureRequirements aligns the two ClusteredDistribution children to
    // the same partitioning (the SortMergeJoin mechanism); make a future
    // change to that contract fail LOUD here rather than zip mismatched
    // key spaces.
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec requires co-partitioned children: left has " +
        s"${lRdd.getNumPartitions} partitions, right has ${rRdd.getNumPartitions}")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOutput)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOutput)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOutput)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOutput)
      val rValProj = UnsafeProjection.create(Seq(rValExpr), rOutput)
      val keyOrd = RowOrdering.create(Seq(SortOrder(
        BoundReference(0, lKeyExpr.dataType, nullable = true), Ascending)), Seq.empty)
      val tsOrd = RowOrdering.create(Seq(SortOrder(
        BoundReference(0, lTsExpr.dataType, nullable = true), Ascending)), Seq.empty)
      val resultProj = UnsafeProjection.create(outAttrs, joinedSchema)
      val joined = new JoinedRow
      val nullValue = new GenericInternalRow(1)

      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var carryKey: UnsafeRow = null
      var carryVal: UnsafeRow = null

      def advanceRight(): Unit = { rHead = if (rIter.hasNext) rIter.next() else null }

      // consume right rows up to (lKeyRow, lTsRow), updating the carry
      def advanceTo(lKeyRow: UnsafeRow, lTsRow: UnsafeRow): Unit = {
        var done = false
        while (!done && rHead != null) {
          val rk = rKeyProj(rHead)
          if (rk.isNullAt(0)) advanceRight() // NULL key matches nothing
          else {
            val c = keyOrd.compare(rk, lKeyRow)
            if (c < 0) advanceRight() // left is sorted: this key is exhausted
            else if (c == 0) {
              val rt = rTsProj(rHead)
              if (rt.isNullAt(0)) advanceRight() // NULL ts matches nothing
              else if (tsOrd.compare(rt, lTsRow) <= 0) { // inclusive bound
                carryKey = rk.copy()
                carryVal = rValProj(rHead).copy() // may hold a NULL value — presence ≠ value
                advanceRight()
              } else done = true
            } else done = true // right ran ahead; later left rows may catch up
          }
        }
      }

      lIter.map { lRow =>
        var v: InternalRow = nullValue
        val lk = lKeyProj(lRow)
        if (!lk.isNullAt(0)) {
          val lt = lTsProj(lRow)
          if (!lt.isNullAt(0)) {
            advanceTo(lk, lt)
            if (carryVal != null && keyOrd.compare(carryKey, lk) == 0) v = carryVal
          }
        }
        numOutputRows += 1
        if (v ne nullValue) numMatched += 1
        resultProj(joined(lRow, v))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
