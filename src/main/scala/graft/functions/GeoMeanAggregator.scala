package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Commutative-merge buffer for the log-space geometric mean. */
final case class GeoMeanBuf(sumLog: Double, n: Long)

/** Geometric mean of (1 + x) via the PUBLIC typed-`Aggregator` extension
  * point (`org.apache.spark.sql.expressions.Aggregator` + `functions.udaf`)
  * — the third rung of the custom-aggregate ladder this engine exercises:
  * native codegen'd expressions ([[VectorExpressions]]) >
  * `TypedImperativeAggregate` ([[TopKByScore]]) > this. An Aggregator is
  * the API an end user without Catalyst internals reaches for, so the
  * engine carries one oracle-checked exemplar; prefer the native tiers for
  * hot paths (Aggregator buffers round-trip through the Encoder per row).
  *
  * Math: exp(Σ ln(1+x) / n), computed in log space so partial aggregation
  * is a plain commutative (sum, count) merge — the map-side-combine
  * contract that makes any distributive aggregate scale. The +1 shift
  * keeps zero-valued inputs finite (inputs are ≥ 0 in this schema; NULLs
  * are skipped by the caller's filter).
  */
object GeoMeanAggregator extends Aggregator[Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf =
    GeoMeanBuf(b.sumLog + math.log1p(x), b.n + 1)
  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf =
    GeoMeanBuf(a.sumLog + b.sumLog, a.n + b.n)
  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form, usable in any untyped `agg(...)`. */
  def geoMean1p(c: Column): Column = udaf(GeoMeanAggregator).apply(c)
}
