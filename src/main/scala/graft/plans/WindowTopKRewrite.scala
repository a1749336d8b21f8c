package graft.plans

import graft.functions.TopKByScore
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule rewriting the classic top-k-per-key anti-pattern
  *
  * {{{ Filter(rank <= k, Window(row_number over (partition K order by s desc, id asc))) }}}
  *
  * into the bounded-heap [[graft.functions.TopKByScore]] aggregate +
  * posexplode. The window formulation shuffles and sorts EVERY candidate row
  * per key; the aggregate ships k rows per key per partition to a single
  * exchange (map-side partial aggregation) — at 100 TB that's the difference
  * between shuffling |corpus| rows and |partitions|·k.
  *
  * The rule fires ONLY when the rewrite is provably result-identical:
  *   - exactly one window expression: `row_number()` with the standard
  *     (UnboundedPreceding, CurrentRow) row frame;
  *   - the filter is `rank <= k` / `rank < k` on that row number, k ≥ 1;
  *   - ordering is exactly (score DESC, id ASC) — the aggregate's heap
  *     order — with score `double` and id `bigint`;
  *   - score and id are NON-NULLABLE attributes: the heap skips null
  *     scores while a nulls-last window would still rank them once a
  *     partition runs out of non-null rows, so nullable inputs are left to
  *     the window (correctness beats speed);
  *   - every output column is a partition key, the score, or the id — the
  *     aggregate can't reconstruct anything else.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]) or
  * `spark.experimental.extraOptimizations`.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    // single row_number() window expression with the default row frame
    val rankAlias = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, _,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) => a
      case _ => return None
    }
    // rank <= k (or rank < k+1) on exactly that attribute
    val k = cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(n: Int, IntegerType))
          if a.exprId == rankAlias.exprId => n
      case LessThan(a: AttributeReference, Literal(n: Int, IntegerType))
          if a.exprId == rankAlias.exprId => n - 1
      case GreaterThanOrEqual(Literal(n: Int, IntegerType), a: AttributeReference)
          if a.exprId == rankAlias.exprId => n
      case _ => return None
    }
    if (k < 1) return None
    // ordering must be the heap's: (score double DESC, id bigint ASC),
    // both non-nullable (the heap drops null scores; a window ranks them)
    val (score, id) = w.orderSpec match {
      case Seq(SortOrder(s: AttributeReference, Descending, _, _),
               SortOrder(i: AttributeReference, Ascending, _, _))
          if s.dataType == DoubleType && !s.nullable &&
             i.dataType == LongType && !i.nullable => (s, i)
      case _ => return None
    }
    val partAttrs = w.partitionSpec.map {
      case a: AttributeReference => a
      case _ => return None
    }
    // Spark 4's InferWindowGroupLimit inserts a logical WindowGroupLimit
    // pre-filter below the Window; the heap aggregate subsumes it (same
    // per-key prefix, no sort needed) — strip it or its sort+exchange
    // survives beneath the aggregate.
    val child = w.child match {
      case WindowGroupLimit(_, _, _: RowNumber, limit, c) if limit >= k => c
      case c => c
    }
    // every child output column must be reconstructible from (keys, id, score)
    val known = (partAttrs.map(_.exprId) :+ score.exprId :+ id.exprId).toSet
    if (!child.output.forall(a => known(a.exprId))) return None

    val topAlias = Alias(TopKByScore(score, id, k).toAggregateExpression(), "_topk")()
    val agg = Aggregate(partAttrs, partAttrs :+ topAlias, child)
    val structT = StructType(Seq(
      StructField("score", DoubleType), StructField("id", LongType)))
    val posAttr = AttributeReference("_pos", IntegerType, nullable = false)()
    val colAttr = AttributeReference("_col", structT, nullable = true)()
    val gen = Generate(PosExplode(topAlias.toAttribute), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(posAttr, colAttr), child = agg)
    // same output attributes (names, exprIds, order) as Filter(.., Window)
    val projList: Seq[NamedExpression] = child.output.map { a =>
      if (a.exprId == score.exprId)
        Alias(GetStructField(colAttr, 0, Some("score")), a.name)(exprId = a.exprId)
      else if (a.exprId == id.exprId)
        Alias(GetStructField(colAttr, 1, Some("id")), a.name)(exprId = a.exprId)
      else a
    } :+ Alias(Add(posAttr, Literal(1)), rankAlias.name)(exprId = rankAlias.exprId)
    Some(Project(projList, gen))
  }
}
