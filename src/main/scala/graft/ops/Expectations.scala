package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY EXPECTATIONS (the Deequ/Great-Expectations
  * idea distilled): a rule set verified against a table in as few passes
  * as the rules allow, producing one row per rule with its violation
  * count — the audit artifact a 100 TB ingest gates on.
  *
  * Evaluation cost is the point. Every scan-local rule (not-null, range,
  * regex) AND every uniqueness rule compiles into a single `agg(...)` over
  * ONE scan — adding a rule adds a counter, not a pass. Only referential
  * integrity needs a second operator (a broadcast anti-join per referenced
  * dimension), the same shape a runtime-filtered join would use. Compare
  * the naive formulation — one `filter(...).count()` job per rule — which
  * re-reads the table |rules| times.
  *
  * NULL semantics are split on purpose: range/regex rules count only
  * NON-NULL violating values, so nullability is [[Expectations.NotNull]]'s
  * job alone and the two failure modes stay separately attributable.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** Column must never be NULL. */
  final case class NotNull(c: String) extends Rule { val name = s"${c}_not_null" }
  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(c: String, lo: Double, hi: Double) extends Rule {
    val name = s"${c}_range"
  }
  /** Non-null values must match the regex (full-match anchoring is the
    * caller's regex choice — this is `rlike`, i.e. find-anywhere). */
  final case class Matches(c: String, regex: String) extends Rule {
    val name = s"${c}_matches"
  }
  /** Column values must be unique; violations = rows beyond the first per
    * duplicated value (count − distinct-count). */
  final case class Unique(c: String) extends Rule { val name = s"${c}_unique" }
  /** Every value must exist in `dim.dimCol` (foreign-key integrity); the
    * dimension is broadcast — NULLs never match, counting as violations,
    * which is the conservative FK reading for an ingest gate. */
  final case class RefIntegrity(c: String, dim: DataFrame, dimCol: String)
      extends Rule { val name = s"${c}_ref" }

  /** Evaluate all rules; returns (rule, violations, passed) in RULE ORDER.
    * One scan for everything scan-local + unique; one broadcast anti-join
    * per RefIntegrity rule. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val aggExprs = rules.collect {
      case r: NotNull =>
        sum(when(col(r.c).isNull, 1L).otherwise(0L)).as(r.name)
      case r: InRange =>
        sum(when(col(r.c).isNotNull &&
          (col(r.c) < r.lo || col(r.c) > r.hi), 1L).otherwise(0L)).as(r.name)
      case r: Matches =>
        sum(when(col(r.c).isNotNull && !col(r.c).rlike(r.regex), 1L)
          .otherwise(0L)).as(r.name)
      case r: Unique =>
        (count(lit(1)) - countDistinct(col(r.c))).as(r.name)
    }
    val scanLocal: Map[String, Long] =
      if (aggExprs.isEmpty) Map.empty
      else {
        val row = df.agg(aggExprs.head, aggExprs.tail: _*).head
        aggExprs.indices.map(i => row.schema(i).name -> row.getLong(i)).toMap
      }
    val joins: Map[String, Long] = rules.collect {
      case r: RefIntegrity =>
        r.name -> df.join(broadcast(r.dim.select(col(r.dimCol)).distinct()),
          col(r.c) === col(r.dimCol), "left_anti").count()
    }.toMap
    val all = scanLocal ++ joins
    val spark = df.sparkSession
    import spark.implicits._
    rules.map(r => (r.name, all(r.name))).toDF("rule", "violations")
      .withColumn("passed", col("violations") === 0L)
  }
}
