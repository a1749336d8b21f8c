package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Behavior the round-7 oracle rows can't see: the observe() side channel. */
class R7OpsSpec extends SparkSpec {

  test("x_observe emits its named metrics to QueryExecutionListeners, one pass") {
    val seen = new java.util.concurrent.atomic.AtomicReference[org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("lineitem_audit").foreach(seen.set)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = SparkEntry.queries("x_observe")(spark, "/root/testdata/sf0.001").collect()
      val totalRows = graft.Tables(spark, "/root/testdata/sf0.001").lineitem.count()
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.get() == null && System.nanoTime() < deadline) Thread.sleep(50)
      val m = seen.get()
      assert(m != null, "observed metrics never arrived")
      assert(m.getAs[Long]("rows_seen") === totalRows) // whole scan audited
      assert(m.getAs[Long]("null_prices") === 0L)
      // and the observation did not perturb the query result
      assert(out.map(_.getLong(1)).sum === totalRows)
    } finally spark.listenerManager.unregister(listener)
  }
}
