package graft

import org.apache.spark.sql.functions.lit
import graft.queries.SqlSurface

/** Session-global temp-view hygiene (round-10 ADVICE): the SQL twins
  * register shared views — table views (SqlSurface.viewed, emb_sql, the
  * Connectors *_v trio) and from-birth materialization views with short
  * reserved names (SqlSurface.MaterializedViews: e, w, cal, rm, …). All
  * of them PERSIST in the shared SparkSession after their query runs, so
  * a future query's SQL referencing a bare reserved name it never defined
  * would silently resolve to a STALE frame from whichever query happened
  * to run earlier — order-dependent wrong results the per-query oracle
  * can only catch if the orders collide.
  *
  * This spec makes that failure mode a CI failure instead: before EVERY
  * query's plan construction it re-registers each shared view name as a
  * POISON view whose only column is `__poison__`, so any reference that
  * leaks through to the catalog (instead of a CTE or a self-registered
  * view) fails analysis on its first real column. A query passes iff it
  * constructs against the fully-poisoned catalog — i.e. it defines
  * everything it reads.
  */
class SqlViewHygieneSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def poisonAll(): Unit =
    (SqlSurface.MaterializedViews ++ SqlSurface.TableViews).foreach { n =>
      spark.range(1).select(lit(1).as("__poison__")).createOrReplaceTempView(n)
    }

  test("poison views actually poison (positive control)") {
    poisonAll()
    intercept[Exception] {
      spark.sql("SELECT d, x, y FROM cal").queryExecution.analyzed
    }
    intercept[Exception] {
      spark.sql("SELECT l_orderkey FROM lineitem").queryExecution.analyzed
    }
  }

  test("every registered query constructs against a fully-poisoned " +
      "catalog — no query depends on a view some other query registered") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        poisonAll()
        try { fn(spark, sfDir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    // leave no poison behind for suites sharing the session
    (SqlSurface.MaterializedViews ++ SqlSurface.TableViews)
      .foreach(n => spark.catalog.dropTempView(n))
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
