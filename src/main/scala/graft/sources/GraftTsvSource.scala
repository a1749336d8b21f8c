package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A read/WRITE DataSource V2 connector (format `"graft-tsv"`): escaped
  * tab-separated files under a directory, schema persisted beside the data.
  * [[GraftRangeSource]] proved the V2 read contract; this one proves the
  * WRITE contract — the part a user needs the day their pipeline must LAND
  * results somewhere Spark has no sink for.
  *
  * The write is the classic two-phase commit (the same shape as Hadoop's
  * FileOutputCommitter v1, which parquet writes ride on):
  *
  *  - each task's [[DataWriter]] streams rows to an INVISIBLE temp file
  *    (`_tmp-…`, excluded by readers) and returns its name + row count as
  *    the [[WriterCommitMessage]] — executors never publish;
  *  - the driver's `BatchWrite.commit` renames every temp file to a
  *    visible `part-N.tsv` and writes `_schema.json` + `_SUCCESS` last —
  *    a reader either sees the complete committed set or (no `_SUCCESS`)
  *    nothing; `abort` deletes the temps. A task retried by the scheduler
  *    leaves at most an orphaned temp that commit never publishes —
  *    exactly-once output without a transactional store.
  *  - `SupportsTruncate` maps `mode("overwrite")` onto truncate-then-write.
  *
  * Reads mirror [[GraftRangeSource]]: one input partition per committed
  * file (split planning) and column pruning by field index. On a real
  * cluster the `java.nio` calls would be Hadoop FileSystem calls against a
  * shared store; the protocol — temp, message, driver-side publish — is
  * unchanged, and is the part under test in GraftTsvSourceSpec.
  */
class GraftTsvSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tsv"

  // writes hand the incoming DataFrame's schema to getTable (a brand-new
  // directory has no _schema.json to infer from yet)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = options.get("path")
    require(dir != null, "graft-tsv requires a 'path' option")
    GraftTsv.readSchema(dir).getOrElse(new StructType())
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftTsvTable(properties.get("path"), schema)
}

object GraftTsv {
  /** Field codec: `\N` for NULL; tabs/newlines/backslashes escaped so any
    * string round-trips on one line. */
  def escape(s: String): String = s.replace("\\", "\\\\")
    .replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")
  def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b += '\\'
          case 't' => b += '\t'
          case 'n' => b += '\n'
          case 'r' => b += '\r'
          case other => b += other
        }
        i += 2
      } else { b += c; i += 1 }
    }
    b.toString
  }

  private[sources] val SupportedTypes: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, StringType, BooleanType)

  def checkSchema(schema: StructType): Unit = schema.fields.foreach { f =>
    require(SupportedTypes.contains(f.dataType),
      s"graft-tsv supports ${SupportedTypes.map(_.simpleString).mkString("/")}; " +
        s"column '${f.name}' is ${f.dataType.simpleString}")
  }

  /** Schema JSON written at commit; `StructType.fromJson` on read. */
  def writeSchema(dir: String, schema: StructType): Unit =
    Files.write(Paths.get(dir, "_schema.json"),
      schema.json.getBytes(StandardCharsets.UTF_8))
  def readSchema(dir: String): Option[StructType] = {
    val p = Paths.get(dir, "_schema.json")
    if (Files.exists(p))
      Some(DataType.fromJson(
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8)).asInstanceOf[StructType])
    else None
  }

  def committedFiles(dir: String): Array[File] = {
    val d = new File(dir)
    if (!new File(d, "_SUCCESS").exists()) Array.empty
    else d.listFiles((_, n) => n.startsWith("part-") && n.endsWith(".tsv")).sortBy(_.getName)
  }

  // ------------------------------------------------- hive-style partitioning

  /** Partition column NAMES (in partition order), persisted beside the
    * schema so the layout survives a catalog restart. Absent file ⇒
    * unpartitioned — every pre-existing table keeps working unchanged. */
  def writePartCols(dir: String, cols: Seq[String]): Unit =
    Files.write(Paths.get(dir, "_partitions.json"),
      cols.mkString("\n").getBytes(StandardCharsets.UTF_8))
  def readPartCols(dir: String): Seq[String] = {
    val p = Paths.get(dir, "_partitions.json")
    if (!Files.exists(p)) Nil
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Directory-segment codec for partition values (`col=value`): URL-encoded
    * so any string is filesystem-safe, with an explicit NULL sentinel
    * (hive's `__HIVE_DEFAULT_PARTITION__`, same idea). */
  private[sources] val NullPart = "__GRAFT_NULL__"
  def encodeSeg(col: String, v: String): String =
    col + "=" + (if (v == null) NullPart
                 else java.net.URLEncoder.encode(v, "UTF-8"))
  def decodeSegValue(seg: String): String = {
    val raw = seg.substring(seg.indexOf('=') + 1)
    if (raw == NullPart) null else java.net.URLDecoder.decode(raw, "UTF-8")
  }

  /** All committed data files with their partition values (partition-order
    * strings; empty seq for an unpartitioned table). Commit visibility is
    * table-level — one root `_SUCCESS` — so a reader sees a whole commit or
    * none of it, exactly as in the flat layout. */
  def committedPartFiles(dir: String, partCols: Seq[String]): Array[(Seq[String], File)] = {
    val root = new File(dir)
    if (!new File(root, "_SUCCESS").exists()) return Array.empty
    def walk(d: File, depth: Int, vals: List[String]): Array[(Seq[String], File)] =
      if (depth == partCols.length)
        Option(d.listFiles((_, n) => n.startsWith("part-") && n.endsWith(".tsv")))
          .getOrElse(Array.empty).sortBy(_.getName)
          .map(f => (vals.reverse: Seq[String], f))
      else
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.contains('='))
          .sortBy(_.getName)
          .flatMap(sub => walk(sub, depth + 1, decodeSegValue(sub.getName) :: vals))
    walk(root, 0, Nil)
  }

  /** Textual repr used BOTH in data cells and partition dir names, so a
    * value round-trips identically through either path. */
  private[sources] def reprOf(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => row.getDouble(i).toString
      case BooleanType => row.getBoolean(i).toString
      case StringType => row.getUTF8String(i).toString
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }

  private[sources] def parseTyped(raw: String, dt: DataType): Any =
    if (raw == null) null
    else dt match {
      case LongType => raw.toLong
      case IntegerType => raw.toInt
      case DoubleType => raw.toDouble
      case BooleanType => raw.toBoolean
      case StringType => UTF8String.fromString(raw)
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }
}

final class GraftTsvTable(dir: String, writeSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  require(dir != null, "graft-tsv requires a 'path' option")
  private def partCols: Seq[String] = GraftTsv.readPartCols(dir)
  override def name(): String = s"graft_tsv[$dir]"
  override def schema(): StructType =
    GraftTsv.readSchema(dir).getOrElse(writeSchema)
  override def partitioning(): Array[Transform] =
    partCols.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(c)).toArray
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTsvScanBuilder(dir, schema(), partCols)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftTsvWriteBuilder(dir, info.schema(), partCols)
}

// ---------------------------------------------------------------- write path

final class GraftTsvWriteBuilder(dir: String, schema: StructType,
    partCols: Seq[String]) extends WriteBuilder with SupportsTruncate {
  GraftTsv.checkSchema(schema)
  partCols.foreach(c => require(schema.fieldNames.contains(c),
    s"partition column '$c' missing from write schema"))
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftTsvBatchWrite(dir, schema, partCols, doTruncate)
  }
}

/** One commit message per task: each entry is (temp file path RELATIVE to
  * the table root, rows). Partitioned writes yield one entry per partition
  * value the task saw (dynamic partitioning — no clustering required of
  * the incoming data); unpartitioned writes yield exactly one. */
final case class TsvCommit(entries: Seq[(String, Long)]) extends WriterCommitMessage

final class GraftTsvBatchWrite(dir: String, schema: StructType,
    partCols: Seq[String], truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(dir))
    new GraftTsvWriterFactory(dir, schema, partCols)
  }

  /** Driver-side publish: temps → visible parts, schema + _SUCCESS last. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncate) {
      // drop every committed part file (flat or inside partition dirs) and
      // now-empty partition dirs; schema + partition spec survive truncate
      def purge(d: File): Unit = {
        Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
          if (f.isDirectory && f.getName.contains('=')) { purge(f); f.delete() }
          else if (f.getName.startsWith("part-") || f.getName == "_SUCCESS") f.delete()
        }
      }
      purge(new File(dir))
    }
    // commit-unique part names: a later APPEND's commit must never rename
    // onto an earlier commit's parts (rename would silently replace them)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    var k = 0
    messages.foreach { case m: TsvCommit =>
      m.entries.foreach { case (relTemp, _) =>
        val temp = Paths.get(dir, relTemp)
        Files.move(temp, temp.resolveSibling(f"part-$commitId-$k%05d.tsv"),
          StandardCopyOption.ATOMIC_MOVE)
        k += 1
      }
    }
    // a data commit NEVER changes an existing table's schema (an INSERT of
    // non-null literals must not flip a column to nullable=false — readers
    // would then interpret older rows' NULLs as primitive garbage); only
    // the FIRST write derives one, and then fully nullable: any TSV row
    // can carry \N, so storage-level nullability is the honest contract
    if (GraftTsv.readSchema(dir).isEmpty)
      GraftTsv.writeSchema(dir, StructType(schema.fields.map(_.copy(nullable = true))))
    Files.write(Paths.get(dir, "_SUCCESS"), Array.empty[Byte])
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case TsvCommit(entries) =>
        entries.foreach { case (relTemp, _) =>
          Files.deleteIfExists(Paths.get(dir, relTemp)) }
      case _ => ()
    }
}

final class GraftTsvWriterFactory(dir: String, schema: StructType,
    partCols: Seq[String]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftTsvDataWriter(dir, schema, partCols, partitionId, taskId)
}

final class GraftTsvDataWriter(dir: String, schema: StructType,
    partCols: Seq[String], partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val partIdx: Array[(Int, DataType)] =
    partCols.map(c => (schema.fieldIndex(c), schema(c).dataType)).toArray
  // data files carry only the NON-partition columns — partition values live
  // in the directory name exactly once (hive layout), not in every row
  private val dataIdx: Array[(Int, DataType)] = schema.fields.zipWithIndex
    .collect { case (f, i) if !partCols.contains(f.name) => (i, f.dataType) }

  // one open temp file per partition value THIS task has seen; task+attempt
  // -unique names so a retried task writes DIFFERENT temp files
  private val open = scala.collection.mutable.LinkedHashMap
    .empty[String, (java.io.BufferedWriter, Long)]
  private var seq = 0

  private def writerFor(relDir: String): java.io.BufferedWriter =
    open.get(relDir) match {
      case Some((w, _)) => w
      case None =>
        val d = if (relDir.isEmpty) Paths.get(dir) else Paths.get(dir, relDir)
        Files.createDirectories(d)
        val rel = (if (relDir.isEmpty) "" else relDir + "/") +
          s"_tmp-$partitionId-$taskId-$seq.tsv"
        seq += 1
        val w = Files.newBufferedWriter(Paths.get(dir, rel), StandardCharsets.UTF_8)
        open(relDir) = (w, 0L)
        relPaths(relDir) = rel
        w
    }
  private val relPaths = scala.collection.mutable.LinkedHashMap.empty[String, String]

  override def write(row: InternalRow): Unit = {
    val relDir = partIdx.zip(partCols).map { case ((i, dt), c) =>
      GraftTsv.encodeSeg(c, GraftTsv.reprOf(row, i, dt))
    }.mkString("/")
    val out = writerFor(relDir)
    val line = dataIdx.map { case (i, dt) =>
      if (row.isNullAt(i)) "\\N"
      else dt match {
        case StringType => GraftTsv.escape(row.getUTF8String(i).toString)
        case other => GraftTsv.reprOf(row, i, other)
      }
    }.mkString("\t")
    out.write(line); out.write("\n")
    open(relDir) = (out, open(relDir)._2 + 1)
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_._1.close())
    TsvCommit(open.toSeq.map { case (relDir, (_, rows)) => (relPaths(relDir), rows) })
  }
  override def abort(): Unit = {
    open.values.foreach(_._1.close())
    relPaths.values.foreach(r => Files.deleteIfExists(Paths.get(dir, r)))
  }
  override def close(): Unit = ()
}

// ----------------------------------------------------------------- read path

final class GraftTsvScanBuilder(dir: String, full: StructType, partCols: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required = full
  private var pushedPart = Array.empty[org.apache.spark.sql.sources.Filter]
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** PARTITION PRUNING: equality / IN predicates on a partition column are
    * resolved against the directory index — non-matching partition dirs are
    * never listed into splits, so zero bytes of their files open. They are
    * handled EXACTLY (membership decided from the dir name), so they are
    * consumed here (not returned as residual). Everything else stays with
    * Spark. The file-source analogue is `PartitionFilters`; for a V2
    * connector the same contract arrives through filter pushdown. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    val (part, residual) = filters.partition {
      case EqualTo(a, v) => partCols.contains(a) && v != null
      case In(a, vs) => partCols.contains(a) && vs.forall(_ != null)
      case _ => false
    }
    pushedPart = part
    residual
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushedPart

  override def build(): Scan = new GraftTsvScan(dir, full, required, partCols, pushedPart)
}

final case class TsvFileSplit(path: String, partVals: Seq[String]) extends InputPartition

final class GraftTsvScan(dir: String, full: StructType, required: StructType,
    partCols: Seq[String], pushedPart: Array[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftTsvScan dir=$dir cols=${required.fieldNames.mkString(",")}" +
      (if (pushedPart.nonEmpty) s" partitionFilters=${pushedPart.mkString(",")}" else "")

  private def survivors: Array[(Seq[String], File)] = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    val types = partCols.map(c => full(c).dataType)
    def typedVals(vals: Seq[String]): Map[String, Any] =
      partCols.lazyZip(vals).lazyZip(types).map { (c, raw, dt) =>
        c -> (if (raw == null) null else dt match {
          case StringType => raw
          case LongType => raw.toLong
          case IntegerType => raw.toInt
          case DoubleType => raw.toDouble
          case BooleanType => raw.toBoolean
          case other => throw new IllegalArgumentException(s"unsupported $other")
        })
      }.toMap
    GraftTsv.committedPartFiles(dir, partCols).filter { case (vals, _) =>
      val tv = typedVals(vals)
      pushedPart.forall {
        case EqualTo(a, v) => tv(a) != null && tv(a) == v
        case In(a, vs) => tv(a) != null && vs.contains(tv(a))
        case _ => true
      }
    }
  }

  /** Committed bytes on disk — same role as a parquet footer scan: lets
    * Catalyst auto-broadcast a small committed table (see
    * GraftRangeScan.estimateStatistics for why V2 sources must report).
    * Partition pruning is already reflected: statistics follow the
    * SURVIVING files, so a pruned scan also broadcasts more readily. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = survivors.map(_._2.length()).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  /** One split per committed file that SURVIVES partition pruning. */
  override def planInputPartitions(): Array[InputPartition] =
    survivors.map { case (vals, f) => TsvFileSplit(f.getAbsolutePath, vals) }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTsvReaderFactory(full, required, partCols)
}

final class GraftTsvReaderFactory(full: StructType, required: StructType,
    partCols: Seq[String]) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val split = p.asInstanceOf[TsvFileSplit]
      private val lines = Files.lines(Paths.get(split.path), StandardCharsets.UTF_8)
      private val it = lines.iterator()
      // data-file columns are the non-partition fields, in schema order
      private val dataFields = full.fields.filter(f => !partCols.contains(f.name))
      // column pruning: each required field is either a parsed data cell
      // (by index in the data file) or a constant from the partition path
      private val picks: Array[Either[(Int, DataType), Any]] =
        required.fields.map { f =>
          val pi = partCols.indexOf(f.name)
          if (pi >= 0)
            Right(GraftTsv.parseTyped(split.partVals(pi), f.dataType))
          else
            Left((dataFields.indexWhere(_.name == f.name), f.dataType))
        }
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (!it.hasNext) return false
        val cols = it.next().split("\t", -1)
        // schema evolution: files written before an ADD COLUMN carry fewer
        // fields — the missing trailing columns read as NULL (same
        // contract as parquet mergeSchema), so old data is never rewritten
        row = InternalRow.fromSeq(picks.toIndexedSeq.map {
          case Right(const) => const
          case Left((i, dt)) =>
            val raw = if (i < cols.length) cols(i) else "\\N"
            if (raw == "\\N") null
            else dt match {
              case LongType => raw.toLong
              case IntegerType => raw.toInt
              case DoubleType => raw.toDouble
              case BooleanType => raw.toBoolean
              case StringType => UTF8String.fromString(GraftTsv.unescape(raw))
              case other => throw new IllegalArgumentException(s"unsupported $other")
            }
        })
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = lines.close()
    }
}
