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
}

final class GraftTsvTable(dir: String, writeSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  require(dir != null, "graft-tsv requires a 'path' option")
  override def name(): String = s"graft_tsv[$dir]"
  override def schema(): StructType =
    GraftTsv.readSchema(dir).getOrElse(writeSchema)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTsvScanBuilder(dir, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftTsvWriteBuilder(dir, info.schema())
}

// ---------------------------------------------------------------- write path

final class GraftTsvWriteBuilder(dir: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  GraftTsv.checkSchema(schema)
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftTsvBatchWrite(dir, schema, doTruncate)
  }
}

final case class TsvCommit(tempName: String, rows: Long) extends WriterCommitMessage

final class GraftTsvBatchWrite(dir: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(dir))
    new GraftTsvWriterFactory(dir, schema)
  }

  /** Driver-side publish: temps → visible parts, schema + _SUCCESS last. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncate) {
      val d = new File(dir)
      Option(d.listFiles((_, n) => n.startsWith("part-") || n == "_SUCCESS"))
        .getOrElse(Array.empty).foreach(_.delete())
    }
    // commit-unique part names: a later APPEND's commit must never rename
    // onto an earlier commit's parts (rename would silently replace them)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    messages.zipWithIndex.foreach { case (m: TsvCommit, i) =>
      Files.move(Paths.get(dir, m.tempName),
        Paths.get(dir, f"part-$commitId-$i%05d.tsv"),
        StandardCopyOption.ATOMIC_MOVE)
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
      case TsvCommit(temp, _) => Files.deleteIfExists(Paths.get(dir, temp))
      case _ => ()
    }
}

final class GraftTsvWriterFactory(dir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftTsvDataWriter(dir, schema, partitionId, taskId)
}

final class GraftTsvDataWriter(dir: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  // task+attempt-unique name: a retried task writes a DIFFERENT temp file
  private val tempName = s"_tmp-$partitionId-$taskId.tsv"
  private val out = Files.newBufferedWriter(
    Paths.get(dir, tempName), StandardCharsets.UTF_8)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.indices.map { i =>
      if (row.isNullAt(i)) "\\N"
      else schema.fields(i).dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType => GraftTsv.escape(row.getUTF8String(i).toString)
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
    }.mkString("\t")
    out.write(line); out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = { out.close(); TsvCommit(tempName, rows) }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(Paths.get(dir, tempName)) }
  override def close(): Unit = ()
}

// ----------------------------------------------------------------- read path

final class GraftTsvScanBuilder(dir: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new GraftTsvScan(dir, full, required)
}

final case class TsvFileSplit(path: String) extends InputPartition

final class GraftTsvScan(dir: String, full: StructType, required: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftTsvScan dir=$dir cols=${required.fieldNames.mkString(",")}"

  /** Committed bytes on disk — same role as a parquet footer scan: lets
    * Catalyst auto-broadcast a small committed table (see
    * GraftRangeScan.estimateStatistics for why V2 sources must report). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = GraftTsv.committedFiles(dir).map(_.length()).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  /** One split per committed file — the connector's split planning. */
  override def planInputPartitions(): Array[InputPartition] =
    GraftTsv.committedFiles(dir).map(f => TsvFileSplit(f.getAbsolutePath))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTsvReaderFactory(full, required)
}

final class GraftTsvReaderFactory(full: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val lines = Files.lines(
        Paths.get(p.asInstanceOf[TsvFileSplit].path), StandardCharsets.UTF_8)
      private val it = lines.iterator()
      // column pruning: parse only the required field indexes
      private val picks: Array[(Int, DataType)] =
        required.fields.map(f => (full.fieldIndex(f.name), f.dataType))
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (!it.hasNext) return false
        val cols = it.next().split("\t", -1)
        // schema evolution: files written before an ADD COLUMN carry fewer
        // fields — the missing trailing columns read as NULL (same
        // contract as parquet mergeSchema), so old data is never rewritten
        row = InternalRow.fromSeq(picks.toIndexedSeq.map { case (i, dt) =>
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
