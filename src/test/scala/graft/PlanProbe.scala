package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Post-execution physical-plan introspection for the plan-invariant gates:
  * walks the final (AQE-resolved) plan, including query stages and
  * subqueries, and reads the shuffle-write record metric of every
  * SinglePartition exchange. This is the mechanized form of "how many rows
  * actually funneled through one task" — compared across scale factors it
  * separates bounded frames (bin/calendar/vocab-log histograms: flat) from
  * sf-proportional funnels (≈linear), which a static plan string can't. */
object PlanProbe {

  /** Records written into each SinglePartition shuffle of an EXECUTED plan
    * (collect() the DataFrame first — metrics are zero before execution).
    * Reused exchanges count once. */
  def singlePartitionShuffleRecords(plan: SparkPlan): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.HashSet.empty[Int]
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _: ReusedExchangeExec => // counted at the original exchange
        case s: ShuffleExchangeLike =>
          if (s.outputPartitioning == SinglePartition &&
              seen.add(System.identityHashCode(s))) {
            out += s.metrics.find(_._1.toLowerCase.contains("records"))
              .map(_._2.value).getOrElse(0L)
          }
          s.children.foreach(walk)
        case _ => p.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(plan)
    out.toSeq
  }
}
