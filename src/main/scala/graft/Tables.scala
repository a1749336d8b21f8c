package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata star schema (TESTDATA.md / FIXTURES.md §B).
  * One parquet file per table under `sfDir`. Parquet scans are columnar and
  * splittable, so at 100 TB these become parallel vectorized scans with
  * column pruning + predicate pushdown handled by the parquet data source.
  */
final case class Tables(spark: SparkSession, sfDir: String) {
  /** `spark.read.parquet(path)` re-infers the schema on EVERY call — a
    * driver-side footer read + Parquet->Catalyst conversion measured at
    * ~85 ms per table reference (optimization guide §5: the driver should
    * do almost no data work). A many-query session (Verify/Bench run ~740
    * queries, most referencing 1-3 tables) pays that ~1,250 times for
    * schemas that cannot change mid-run. Cache the inferred schema per
    * (sfDir, table) -- process-global, like the catalog a production
    * deployment would consult -- and hand it to the reader explicitly:
    * same files, same schema, same plan, ~14 ms instead of ~85 ms. This
    * caches METADATA only; every query still scans the parquet data. */
  private def t(name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = Tables.schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }
  lazy val region: DataFrame     = t("region")
  lazy val nation: DataFrame     = t("nation")
  lazy val customer: DataFrame   = t("customer")
  lazy val supplier: DataFrame   = t("supplier")
  lazy val part: DataFrame       = t("part")
  lazy val orders: DataFrame     = t("orders")
  lazy val lineitem: DataFrame   = t("lineitem")
  lazy val documents: DataFrame  = t("documents")
  lazy val embeddings: DataFrame = t("embeddings")

  /** The driver has shipped events.ts in three parquet flavors across
    * regenerations, so normalize all of them to `TimestampType` here — every
    * downstream `unix_micros`/window/watermark site assumes it:
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; the session
    *    sets `spark.sql.legacy.parquet.nanosAsLong` (see Verify/Bench), so
    *    `ts` arrives as nanos-since-epoch LONG. Rebuild the µs timestamp with
    *    integer division (`div` — a double division would lose precision
    *    above 2^53 ns). DuckDB's reader truncates ns→µs the same way.
    *  - µs `isAdjustedToUTC=false`: Spark reads TIMESTAMP_NTZ, which Spark 4
    *    time functions (`unix_micros`, watermarks) reject. Cast to TIMESTAMP —
    *    a pure reinterpretation under the session's UTC timezone (the same
    *    pattern ops/AsOfJoin.scala uses), matching DuckDB's naive-µs view.
    *  - µs `isAdjustedToUTC=true`: already `TimestampType`; pass through.
    */
  lazy val events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}

object Tables {
  /** (parquet path) -> inferred schema. Never invalidated: the driver
    * fixtures are immutable for the life of a Verify/Bench process, and a
    * stale entry could only arise by rewriting a fixture mid-run. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()
}

/** One registered query: a named DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two sides.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, None)
}
