package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector — the extension point a user reaches
  * for when their data lives behind an API/format Spark doesn't ship: a
  * synthetic `[start, end)` integer table (`id` plus a derived `payload`
  * string), registered as format `"graft-range"`.
  *
  * Small surface, but it exercises every piece of the V2 read contract the
  * way a 100 TB connector must:
  *
  *  - **Split planning**: the range is cut into `slices` input partitions —
  *    the connector-side analogue of parquet's file/row-group splits — so
  *    the scan parallelizes across executors.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): range predicates on
  *    `id` narrow the scanned interval at PLANNING time; slices falling
  *    entirely outside the residual interval are never emitted — partition
  *    pruning, the mechanism that lets `WHERE id BETWEEN a AND b` read
  *    1/1000th of a source instead of filtering it row by row. Handled
  *    filters are consumed exactly (the source guarantees the predicate),
  *    so Spark plans no redundant re-filter; unsupported predicates stay
  *    residual and Spark evaluates them above the scan.
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): a projection
  *    that drops `payload` reaches the reader, which then never
  *    materializes the string — the `ReadSchema` contract.
  *
  * GraftRangeSourceSpec asserts all three through the executed plan
  * (partition count, pushed filters, read schema); `x_dsv2_pushdown` /
  * `x_dsv2_scan` hold the results against a DuckDB `range()` oracle.
  */
class GraftRangeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-range"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.schemaFor(Option(options.get("buckets")).map(_.toInt))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftRangeTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      Option(properties.get("buckets")).map(_.toInt),
      properties.getOrDefault("layout", "sliced") == "grouped")
}

object GraftRangeSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** With the `buckets` option the table exposes a derived `bucket`
    * column (`id % buckets`) — the grouping key the GROUP-BY aggregate
    * pushdown answers in closed form. Absent the option, the schema is
    * unchanged so existing readers see no new column. */
  def schemaFor(buckets: Option[Int]): StructType =
    if (buckets.isDefined) Schema.add(StructField("bucket", IntegerType, nullable = false))
    else Schema
}

final class GraftRangeTable(start: Long, end: Long, slices: Int,
    buckets: Option[Int] = None, grouped: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range[$start,$end)"
  override def schema(): StructType = GraftRangeSource.schemaFor(buckets)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(start, end, slices, buckets, grouped)
}

final class GraftRangeScanBuilder(start: Long, end: Long, slices: Int,
    buckets: Option[Int] = None, groupedLayout: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  import org.apache.spark.sql.connector.expressions.aggregate._

  // the residual interval after pushdown, always within [start, end)
  private var lo = start
  private var hi = end
  private var pushed = Array.empty[Filter]
  private var required = GraftRangeSource.schemaFor(buckets)
  private var limit = Long.MaxValue
  private var aggs: Option[Seq[AggregateFunc]] = None
  private var grouped = false

  private def isCol(e: org.apache.spark.sql.connector.expressions.Expression,
      name: String) =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array(name))
      case _ => false
    }
  private def isId(e: org.apache.spark.sql.connector.expressions.Expression) =
    isCol(e, "id")

  /** COUNT(*) / COUNT(id) / MIN(id) / MAX(id) / SUM(id) over an integer
    * interval have CLOSED FORMS — the aggregate never touches a row.
    * DISTINCT variants are equivalent here because ids are unique by
    * construction. Grouping is accepted ONLY on the derived `bucket`
    * column (= id % buckets): each residue class of [lo, hi) is an
    * arithmetic progression with its own closed forms, so the grouped
    * aggregate is |buckets| rows of planning-time arithmetic — the V2
    * analogue of answering GROUP BY from per-partition catalog stats. */
  private def canPush(agg: Aggregation): Boolean = {
    val groupOk = agg.groupByExpressions.isEmpty ||
      (buckets.isDefined && agg.groupByExpressions.length == 1 &&
        isCol(agg.groupByExpressions.head, "bucket"))
    groupOk && agg.aggregateExpressions.forall {
      case _: CountStar => true
      case c: Count => isId(c.column)
      case m: Min => isId(m.column)
      case m: Max => isId(m.column)
      case s: Sum => isId(s.column)
      case _ => false
    }
  }

  /** COMPLETE pushdown: the "scan" is one planning-time-computed row and
    * Spark removes its aggregate entirely — the strongest form of the
    * contract (a real warehouse connector answers from catalog stats or
    * zone maps the same way). This is what turns `SELECT count(*) FROM
    * fact WHERE id < k` from a 100 TB scan into a metadata lookup. */
  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    canPush(agg) && {
      aggs = Some(agg.aggregateExpressions.toSeq)
      grouped = agg.groupByExpressions.nonEmpty
      true
    }

  /** LIMIT k truncates the residual interval itself — the source generates
    * k rows TOTAL instead of every executor generating its slice and the
    * global limit discarding the rest (`LIMIT 10` on a 1000-split source:
    * 1 surviving split, 10 rows materialized, not 1000 tasks). Sound here
    * because the slices enumerate [lo, hi) completely and Spark still
    * applies the exact limit above the scan. */
  override def pushLimit(l: Int): Boolean = { limit = l.toLong; true }

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None
  }

  /** Consume id-range predicates into [lo, hi); everything else stays
    * residual for Spark to evaluate above the scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case GreaterThan("id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get + 1); pushed :+= GreaterThan("id", v); false
      case GreaterThanOrEqual("id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); pushed :+= GreaterThanOrEqual("id", v); false
      case LessThan("id", v) if asLong(v).isDefined =>
        hi = math.min(hi, asLong(v).get); pushed :+= LessThan("id", v); false
      case LessThanOrEqual("id", v) if asLong(v).isDefined =>
        hi = math.min(hi, asLong(v).get + 1); pushed :+= LessThanOrEqual("id", v); false
      case EqualTo("id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, asLong(v).get + 1)
        pushed :+= EqualTo("id", v); false
      case _ => true
    }
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val cappedHi = if (limit == Long.MaxValue) hi
      else math.min(hi, lo + math.max(0L, limit))
    aggs match {
      case Some(fs) if grouped =>
        new GraftRangeGroupedAggScan(lo, cappedHi, buckets.get, fs)
      case Some(fs) => new GraftRangeAggScan(lo, cappedHi, fs)
      case None =>
        new GraftRangeScan(start, end, slices, lo, cappedHi, required,
          buckets.getOrElse(0), groupedLayout)
    }
  }
}

/** The aggregate-pushdown result scan: ONE partition, ONE row, every value
  * computed from the residual interval [lo, hi) at planning time — no row
  * generation, no shuffle, no aggregate exec. Empty intervals yield SQL
  * semantics: count 0, min/max/sum NULL. */
final class GraftRangeAggScan(lo: Long, hi: Long,
    fs: Seq[org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc])
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate._

  private val n = math.max(0L, hi - lo)

  override def readSchema(): StructType = StructType(fs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_: Count, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeAggScan interval=[$lo,$hi) PushedAggregates=[${fs.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(RangeSlice(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory = {
    // closed forms; sum via BigInt so (lo+hi-1)*n can't overflow midway
    val values: Array[Any] = fs.map {
      case _: CountStar => n
      case _: Count => n
      case _: Min => if (n > 0) lo else null
      case _: Max => if (n > 0) hi - 1 else null
      case _: Sum =>
        if (n > 0) ((BigInt(lo) + BigInt(hi - 1)) * n / 2).toLong else null
    }.toArray
    new GraftRangeAggReaderFactory(Array(values))
  }
}

/** GROUP-BY-pushdown result scan: one row per NON-EMPTY residue class of
  * `id % buckets` over [lo, hi). Each class is the arithmetic progression
  * x0, x0+B, …, x1, so count/min/max/sum are planning-time arithmetic —
  * |buckets| rows materialize, zero id rows, no aggregate exec (complete
  * pushdown form). Row layout per the V2 contract: grouping columns
  * first, then the aggregate columns in pushed order. */
final class GraftRangeGroupedAggScan(lo: Long, hi: Long, nBuckets: Int,
    fs: Seq[org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc])
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate._

  override def readSchema(): StructType = StructType(
    StructField("bucket", IntegerType, nullable = false) +: fs.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_: Count, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeGroupedAggScan interval=[$lo,$hi) buckets=$nBuckets " +
      s"PushedAggregates=[${fs.mkString(", ")}] PushedGroupBy=[bucket]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(RangeSlice(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory = {
    val b = nBuckets.toLong
    val rows = (0 until nBuckets).iterator.flatMap { r =>
      // first/last member of residue class r inside [lo, hi)
      val x0 = lo + java.lang.Math.floorMod(r - lo, b)
      if (x0 >= hi) None
      else {
        val x1 = x0 + ((hi - 1 - x0) / b) * b
        val n = (x1 - x0) / b + 1
        val aggVals: Seq[Any] = fs.map {
          case _: CountStar => n
          case _: Count => n
          case _: Min => x0
          case _: Max => x1
          case _: Sum => ((BigInt(x0) + BigInt(x1)) * n / 2).toLong
        }
        Some((r +: aggVals).toArray[Any])
      }
    }.toArray
    new GraftRangeAggReaderFactory(rows)
  }
}

final class GraftRangeAggReaderFactory(rows: Array[Array[Any]])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = InternalRow.fromSeq(rows(i).toIndexedSeq)
      override def close(): Unit = ()
    }
}

/** One fixed slice of the ORIGINAL range, clipped to the pushed interval —
  * slicing before clipping models how a real source prunes pre-existing
  * splits (files, blocks, shards) rather than re-splitting the survivors. */
final case class RangeSlice(lo: Long, hi: Long) extends InputPartition

/** One residue class of `id % step` under the `layout=grouped` table
  * option: ids `first, first+step, …` below `hi` — every row in the split
  * shares `bucket`, which [[partitionKey]] reports so Spark can plan
  * storage-partitioned joins against it (the `HasPartitionKey` contract:
  * split contents and key MUST agree, or co-partitioned joins silently
  * drop matches). */
final case class BucketSlice(first: Long, hi: Long, step: Long, bucket: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

final class GraftRangeScan(start: Long, end: Long, slices: Int,
    lo0: Long, hi0: Long, required: StructType, nBuckets: Int = 0,
    groupedLayout: Boolean = false)
    extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeV2Filtering
    with SupportsReportPartitioning {

  // runtime filtering narrows these AFTER planning (see filter below)
  private var lo = lo0
  private var hi = hi0

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeScan range=[$start,$end) pushed=[$lo0,$hi0) cols=${required.fieldNames.mkString(",")}"

  /** Dynamic "partition" pruning for the connector: Spark collects the
    * OTHER side of an equi-join on `id` first, hands the observed key set
    * here, and re-plans this scan's splits — the V2 runtime-filter
    * contract. We narrow the interval to [min(keys), max(keys)] ∩ the
    * static interval; pruning is allowed to be conservative (rows that
    * later fail the join are dropped by the join), so interval narrowing
    * is sound even though the key set may have holes. At 100 TB this is
    * the star-join accelerator: the dimension's filter runs FIRST and the
    * huge fact scan materializes only matching splits. */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  override def filter(predicates: Array[Predicate]): Unit = predicates.foreach { p =>
    if (p.name() == "IN") {
      val vals = p.children().collect {
        case l: Literal[_] => l.value() match {
          case v: java.lang.Long => v.longValue()
          case v: java.lang.Integer => v.intValue().toLong
        }
      }
      if (vals.nonEmpty) {
        lo = math.max(lo, vals.min)
        hi = math.min(hi, vals.max + 1)
      }
    }
  }

  /** Post-pushdown size estimate. Without this a V2 scan reports
    * `defaultSizeInBytes` (effectively infinite), so a connector table can
    * NEVER be auto-chosen as a broadcast side and every join against it
    * shuffles — statistics are what let Catalyst make the 100 TB-critical
    * broadcast-vs-shuffle call for external sources. ~24 bytes/row: 8 for
    * id + payload's "row-NNNN" UTF8. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * 24L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] =
    if (groupedLayout && nBuckets > 0) {
      // layout=grouped: one split PER RESIDUE CLASS of id % nBuckets —
      // the connector-side analogue of a bucketed table layout. Each
      // split is the arithmetic progression of its class inside [lo, hi).
      (0 until nBuckets).iterator
        .map { r =>
          val first = lo + java.lang.Math.floorMod(r - lo, nBuckets.toLong)
          BucketSlice(first, hi, nBuckets.toLong, r)
        }
        .filter(s => s.first < s.hi)
        .toArray[InputPartition]
    } else {
      val width = math.max(1L, (end - start + slices - 1) / slices)
      (0 until slices).iterator
        .map { i =>
          val sliceLo = start + i * width
          val sliceHi = math.min(end, sliceLo + width)
          RangeSlice(math.max(sliceLo, lo), math.min(sliceHi, hi))
        }
        .filter(s => s.lo < s.hi) // pruned: slice entirely outside the interval
        .toArray[InputPartition]
    }

  /** Under `layout=grouped`, report the bucket layout as a
    * `KeyGroupedPartitioning(identity(bucket))` — the DSv2 contract behind
    * STORAGE-PARTITIONED JOINS: two sources co-partitioned on the same key
    * join with ZERO exchanges (`spark.sql.sources.v2.bucketing.enabled`),
    * and grouping on the key needs no re-shuffle either. At 100 TB this is
    * the fact-to-fact join enabler — the layout the warehouse already
    * maintains replaces the single biggest shuffle in the plan. The
    * sliced layout reports UnknownPartitioning, Spark's default
    * assumption. */
  override def outputPartitioning(): partitioning.Partitioning =
    if (groupedLayout && nBuckets > 0)
      new partitioning.KeyGroupedPartitioning(
        Array(Expressions.identity("bucket")), planInputPartitions().length)
    else new partitioning.UnknownPartitioning(planInputPartitions().length)

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required, nBuckets)
}

/** Row- AND columnar-capable reader factory. The columnar path fills
  * `ColumnarBatch`es of up to 4096 values directly into column vectors —
  * the shape every high-throughput source (parquet, ORC) uses, because it
  * feeds WholeStageCodegen's batch loop instead of a per-row iterator:
  * no per-row virtual calls, no InternalRow boxing, and the downstream
  * stage reads vectors. `BatchScanExec` flips to columnar automatically
  * when every split supports it. */
final class GraftRangeReaderFactory(required: StructType, nBuckets: Int = 0)
    extends PartitionReaderFactory {

  /** Both layouts reduce to (first id, exclusive bound, stride). */
  private def bounds(p: InputPartition): (Long, Long, Long) = p match {
    case RangeSlice(lo, hi) => (lo, hi, 1L)
    case BucketSlice(first, hi, step, _) => (first, hi, step)
  }

  override def supportColumnarReads(p: InputPartition): Boolean = true

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val (first, hi, step) = bounds(p)
      private var cur = first - step
      // resolved once per partition, not per row
      private val fields: Array[Long => Any] = required.fieldNames.map {
        case "id" => (id: Long) => id
        case "payload" => (id: Long) => UTF8String.fromString(s"row-$id")
        case "bucket" => (id: Long) => java.lang.Math.floorMod(id, nBuckets.toLong).toInt
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = { cur += step; cur < hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toIndexedSeq.map(f => f(cur)))
      override def close(): Unit = ()
    }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    new PartitionReader[ColumnarBatch] {
      private val (first, hi, step) = bounds(p)
      private var cur = first
      private val capacity = 4096
      private val vectors: Array[OnHeapColumnVector] =
        required.fields.map(f => new OnHeapColumnVector(capacity, f.dataType))
      private val batch = new ColumnarBatch(vectors.toArray[
        org.apache.spark.sql.vectorized.ColumnVector])

      override def next(): Boolean = {
        if (cur >= hi) return false
        // ids remaining in this (possibly strided) split
        val remaining = (hi - cur + step - 1) / step
        val n = math.min(capacity.toLong, remaining).toInt
        vectors.foreach(_.reset())
        required.fieldNames.zipWithIndex.foreach {
          case ("id", vi) =>
            var i = 0
            while (i < n) { vectors(vi).putLong(i, cur + i * step); i += 1 }
          case ("payload", vi) =>
            var i = 0
            while (i < n) {
              val b = s"row-${cur + i * step}".getBytes("UTF-8")
              vectors(vi).putByteArray(i, b, 0, b.length); i += 1
            }
          case ("bucket", vi) =>
            var i = 0
            while (i < n) {
              vectors(vi).putInt(i,
                java.lang.Math.floorMod(cur + i * step, nBuckets.toLong).toInt)
              i += 1
            }
          case (other, _) => throw new IllegalArgumentException(s"unknown column $other")
        }
        batch.setNumRows(n)
        cur += n * step
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
}
