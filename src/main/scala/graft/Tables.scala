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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. The session sets `spark.sql.legacy.parquet.nanosAsLong` (see
    * Verify/Bench), so `ts` arrives as nanos-since-epoch LONG; rebuild the
    * µs timestamp with integer division (`div` — a double division would lose
    * precision above 2^53 ns). DuckDB's reader truncates ns→µs the same way.
    */
  lazy val events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
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
