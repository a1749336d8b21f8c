package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata star schema (TESTDATA.md / FIXTURES.md §B).
  * One parquet file per table under `sfDir`. Parquet scans are columnar and
  * splittable, so at 100 TB these become parallel vectorized scans with
  * column pruning + predicate pushdown handled by the parquet data source.
  */
final case class Tables(spark: SparkSession, sfDir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
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
