package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator row of SURVEY.md §2 is registered here as a named query
  * over the driver testdata star schema, paired with the equivalent DuckDB
  * SQL for the correctness oracle. The query bodies live in
  * `graft.queries.*`; reusable engine modules in `graft.graph`, `graft.llm`,
  * `graft.flights`.
  */
object SparkEntry {

  private lazy val all: Seq[QDef] =
    StarCore.defs ++ StarJoins.defs ++ StarAggs.defs ++ StarGraph.defs ++
      StarFlights.defs ++ StarExt.defs ++ StarMisc.defs ++ SqlSurface.defs ++
      Sketches.defs ++ VectorQuant.defs ++ Cdc.defs ++ Connectors.defs ++
      TrainPrep.defs ++ R5Ops.defs ++ R7Ops.defs ++ R8Ops.defs ++ R9Ops.defs ++
      R10Ops.defs ++ R10Ops2.defs ++ R11Ops.defs ++ R12Ops.defs ++
      R13Ops.defs ++ R14Ops.defs ++ R15Ops.defs ++ R16Ops.defs ++
      R17Ops.defs ++ R18Ops.defs ++ R19Ops.defs ++ R20Ops.defs ++
      R21Ops.defs ++ R22Ops.defs ++ R23Ops.defs ++ R24Ops.defs ++
      R25Ops.defs ++ R26Ops.defs ++ R27Ops.defs ++ R28Ops.defs ++
      R29Ops.defs ++ R30Ops.defs ++ R31Ops.defs ++ R32Ops.defs ++
      R33Ops.defs ++ R34Ops.defs ++ R35Ops.defs ++ R36Ops.defs ++
      R37Ops.defs ++ R38Ops.defs ++ R39Ops.defs ++ R40Ops.defs ++
      R41Ops.defs ++ R42Ops.defs ++ R43Ops.defs ++ R44Ops.defs ++
      R45Ops.defs ++ R46Ops.defs ++ R47Ops.defs ++ R48Ops.defs ++
      R49Ops.defs ++ R50Ops.defs ++ R51Ops.defs ++ R52Ops.defs ++
      R53Ops.defs ++ R54Ops.defs ++ R55Ops.defs ++ R56Ops.defs ++
      R57Ops.defs ++ R58Ops.defs ++ R59Ops.defs ++ R60Ops.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarFlights.mostDelay(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. A duplicate
    * name would silently SHADOW the earlier operator in this Map (last
    * wins) and drop it from the correctness gate — caught once in
    * round 9 (a second x_power_analysis), now a hard failure. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = all.map(_.name)
    val dups = names.diff(names.distinct).distinct
    require(dups.isEmpty, s"duplicate QDef names: ${dups.mkString(", ")}")
    all.map(q => q.name -> q.fn).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
