package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Per-group smallest-2 (ord, id) pairs as a mergeable aggregate — the
  * multi-probe selector for IVF-style assignment (p52): every corpus vector
  * needs its top-[[graft.pipeline.PipelineOps.IvfProbes]] nearest centroids,
  * and the two built-in spellings both break at scale:
  *
  *   - `row_number() OVER (PARTITION BY vec_id ...)` materializes all
  *     corpus×K scored rows into window state before filtering rank ≤ 2 —
  *     the exact shape kmeansStep's assignment avoids for rank 1;
  *   - `sort_array(collect_list(...))[0:2]` buffers K entries per vector in
  *     the aggregation state — fine at K=16, fatal at a production K=2^20.
  *
  * This aggregate keeps TWO pairs of state per group, updates map-side, and
  * merges shuffle-side like any sum: the shuffle carries one 32-byte buffer
  * per vector regardless of K. Ties break by id ascending (the cross-engine
  * determinism rule every ranked operator here follows). Output: the ids in
  * rank order, length ≤ 2 (length < 2 only when the group has < 2 inputs).
  *
  * Buffer layout: [bits(ord1), id1, bits(ord2), id2] as raw longs, length
  * 0/2/4 — doubleToRawLongBits round-trips exactly, and packed longs
  * serialize without an encoder round-trip (the KmvSketch argument). */
object Bottom2 {

  private def lt(o1: Double, i1: Long, o2: Double, i2: Long): Boolean =
    o1 < o2 || (o1 == o2 && i1 < i2)

  /** Insert (o, i) into a 0/2/4-length buffer, keeping the 2 smallest. */
  private[functions] def insert(buf: Array[Long], o: Double, i: Long): Array[Long] = {
    if (buf.length == 0) return Array(java.lang.Double.doubleToRawLongBits(o), i)
    val o1 = java.lang.Double.longBitsToDouble(buf(0)); val i1 = buf(1)
    if (buf.length == 2) {
      return if (lt(o, i, o1, i1))
        Array(java.lang.Double.doubleToRawLongBits(o), i, buf(0), buf(1))
      else Array(buf(0), buf(1), java.lang.Double.doubleToRawLongBits(o), i)
    }
    val o2 = java.lang.Double.longBitsToDouble(buf(2)); val i2 = buf(3)
    if (lt(o, i, o1, i1))
      Array(java.lang.Double.doubleToRawLongBits(o), i, buf(0), buf(1))
    else if (lt(o, i, o2, i2))
      Array(buf(0), buf(1), java.lang.Double.doubleToRawLongBits(o), i)
    else buf
  }

  final case class Agg(
      left: Expression, right: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression]
      with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

    override def inputTypes = Seq(DoubleType, LongType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

    override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
      val o = left.eval(input)
      val i = right.eval(input)
      if (o == null || i == null) buffer
      else insert(buffer, o.asInstanceOf[Double], i.asInstanceOf[Long])
    }

    override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
      var b = buffer
      var k = 0
      while (k < other.length) {
        b = insert(b, java.lang.Double.longBitsToDouble(other(k)), other(k + 1))
        k += 2
      }
      b
    }

    override def eval(buffer: Array[Long]): Any = {
      val ids = new Array[Long](buffer.length / 2)
      var k = 0
      while (k < ids.length) { ids(k) = buffer(2 * k + 1); k += 1 }
      new GenericArrayData(ids)
    }

    override def serialize(buffer: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buffer.length * 8)
      buffer.foreach(bb.putLong)
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong())
    }

    override def withNewMutableAggBufferOffset(n: Int): Agg = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): Agg = copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Agg =
      copy(left = l, right = r)
    override def prettyName: String = "bottom2"
  }

  /** Aggregate column: ids of the 2 smallest (ord, id) pairs, rank order. */
  def apply(ord: Column, id: Column): Column =
    ColumnBridge.column(
      Agg(ColumnBridge.expression(ord), ColumnBridge.expression(id)).toAggregateExpression())
}
