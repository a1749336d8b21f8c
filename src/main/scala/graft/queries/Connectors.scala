package graft.queries

import org.apache.spark.sql.functions._

import graft.QDef

/** Queries through the custom DataSource V2 connector
  * ([[graft.sources.GraftRangeSource]], format `"graft-range"`) — proving
  * the V2 read path end to end against DuckDB's `range()` table function.
  * Plan-level behavior (partition pruning, pushed filters, read schema) is
  * asserted separately in GraftRangeSourceSpec; these rows prove the
  * delivered DATA is right.
  */
object Connectors {

  val defs: Seq[QDef] = Seq(

    // Row-level scan through the connector: projection builds the payload
    // string in the reader; the id range comes from pushed filters.
    QDef("x_dsv2_scan",
      """SELECT range AS id, 'row-' || range AS payload
        |FROM range(250, 750)""".stripMargin) { (s, _) =>
      s.read.format("graft-range")
        .option("start", "0").option("end", "1000").option("slices", "8")
        .load()
        .filter(col("id") >= 250 && col("id") < 750)
    },

    // Aggregate over a pushdown-narrowed scan: 32 slices planned, only the
    // ~2 overlapping [2500, 7500) survive split pruning — the connector
    // analogue of partition pruning on a 100 TB source.
    QDef("x_dsv2_pushdown",
      """SELECT CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(range) AS BIGINT) AS total
        |FROM range(2500, 7500)""".stripMargin) { (s, _) =>
      s.read.format("graft-range")
        .option("start", "0").option("end", "100000").option("slices", "32")
        .load()
        .filter(col("id") >= 2500 && col("id") < 7500)
        .agg(count(lit(1)).as("cnt"), sum(col("id")).as("total"))
    }
  )
}
