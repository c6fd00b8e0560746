package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k aggregate: keeps the k smallest struct values
  * under the struct's natural ascending lexicographic order (encode a
  * descending numeric key with [[graft.operators.TopK.descNum]]).
  *
  * This is the grouped twin of TakeOrderedAndProject's heap: the
  * PARTIAL aggregate already truncates to k per group per map
  * partition, so the shuffle carries at most k rows per (group,
  * partition) — where `row_number().over(partitionBy(g))` ships every
  * candidate row into the single reducer that owns group g. With a
  * 10-query ANN ranker over a 100× corpus that window shape collapses
  * the whole corpus into ≤10 tasks; this aggregate keeps the scan fully
  * parallel and moves only k·partitions rows per query.
  *
  * Buffer discipline: an unsorted append buffer, compacted (sort +
  * truncate to k) whenever it reaches 4k — amortized O(log k) per row,
  * worst-case memory 4k rows per open group, independent of group size.
  * eval() returns the k survivors ascending as array<struct>; rank is
  * the 1-based array position (posexplode downstream).
  */
case class TopKStruct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"topk_struct requires k > 0, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val ordering =
    InterpretedOrdering.forSchema(structType.fields.toSeq.map(_.dataType))

  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "topk_struct"

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    ArrayBuffer.empty

  private def compact(buf: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] =
    if (buf.length <= k) buf
    else {
      val kept = buf.sorted(ordering).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      // copy: the evaluated row aliases the (reused) input buffer
      buf += v.asInstanceOf[InternalRow].copy()
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(a: ArrayBuffer[InternalRow], b: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    a ++= b
    if (a.length >= 4 * k) compact(a)
    a
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.sorted(ordering).take(k).toArray[Any])

  /** Length-prefixed UnsafeRow stream (the Collect/Percentile pattern). */
  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val compacted = compact(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new Array[Byte](4096)
    compacted.foreach { row =>
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, scratch)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val buf = ArrayBuffer.empty[InternalRow]
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val nFields = structType.length
    while (in.available() > 0) {
      val size = in.readInt()
      val b = new Array[Byte](size)
      in.readFully(b)
      val u = new UnsafeRow(nFields)
      u.pointTo(b, size)
      buf += u
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKStruct =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): TopKStruct =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): TopKStruct =
    copy(child = newChild)
}

object TopKStruct {

  /** Column API: bounded top-k of a struct column under its natural
    * ascending order, as an array<struct> aggregate.
    */
  def topk_struct(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKStruct(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
