package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Elementwise sum of `array<bigint>` columns: `vec_sum(arr)[k] ≡
  * sum(arr[k])` over the group, with ragged inputs summed as if
  * zero-padded to the longest. The aggregate Spark lacks for dense count
  * vectors: the relational spelling (`posexplode` + `groupBy(pos)`)
  * manufactures |arr| rows per input row just to add longs — for q79's
  * 256-slot DSIR vectors that explode was ~2 s of the 10× wall (r17
  * decomposition probe) where this aggregate is one in-place vector add
  * per row. Runs with map-side partial aggregation: each task ships one
  * vector-sized buffer, so the exchange is #partitions × |arr| longs no
  * matter the corpus size.
  */
case class LongVecSum(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum expects array<bigint>, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
    var i = 0
    while (i < n) { b(i) += arr.getLong(i); i += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): LongVecSum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): LongVecSum =
    copy(child = newChild)

  override def prettyName: String = "vec_sum"
}

object LongVecSum {

  /** Column-in, Column-out (Cols bridge). */
  def vec_sum(c: Column): Column =
    Cols.column(LongVecSum(Cols.expressionOf(c)).toAggregateExpression())
}
