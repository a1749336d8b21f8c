package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs. */
final class TopKBuffer(val k: Int) {
  // min-heap ordered so the WORST kept element is at the head, ready to evict
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }
  val heap: mutable.PriorityQueue[(Double, Long)] = mutable.PriorityQueue.empty(ord)

  def add(score: Double, id: Long): Unit = {
    heap.enqueue((score, id))
    if (heap.size > k) heap.dequeue() // drops the current worst
  }

  def merge(other: TopKBuffer): Unit = other.heap.foreach { case (s, i) => add(s, i) }

  /** Best-first. */
  def sorted: Seq[(Double, Long)] =
    heap.toSeq.sortBy { case (s, i) => (-s, i) }
}

/** Top-k-per-group as a custom `TypedImperativeAggregate` — the scale-correct
  * alternative to `row_number().over(Window.partitionBy(key)) <= k`:
  * a window shuffles and sorts EVERY scored row per key; this aggregate
  * keeps a k-element heap and combines map-side (partial aggregation), so
  * only k rows per key per partition reach the exchange. For ANN top-k over
  * a 100 TB corpus that's the difference between shuffling |corpus| rows
  * and shuffling |partitions|·k.
  *
  * Returns `array<struct<score:double, id:bigint>>`, best-first; ties break
  * on the smaller id (same order as the window formulation).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buffer.sorted
    out.writeInt(items.size)
    items.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k)
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** `topKByScore(col("cos"), col("cid"), 5)` → array<struct<score,id>>. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Shim.column(
      TopKByScore(Shim.expression(score), Shim.expression(id), k).toAggregateExpression())
}
