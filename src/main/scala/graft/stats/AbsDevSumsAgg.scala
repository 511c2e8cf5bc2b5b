package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge

/** Element-wise Σ|v−mᵢ| and Σ|v−mᵢ|² against a per-row medians array, as
  * one mergeable typed-imperative aggregate.
  *
  * This is the one-vs-rest Brown–Forsythe kernel: each row needs its
  * absolute deviation from k different side medians (one per comparison).
  * Expressing that as an `explode` materializes k× the input through the
  * aggregation; this aggregate keeps the input at 1× and runs the k-length
  * loop inside the buffer update — per row: one array read + k fused
  * abs/add flops, no row multiplication, partials merge element-wise (so
  * map-side combine and checkpoint/resume both work).
  *
  * Buffer layout: [Σz₀…Σz_{k−1}, Σz₀²…Σz_{k−1}²] (length 2k, k fixed by
  * the first non-null medians array seen; mixed lengths throw — the
  * caller builds one ordered array per scope). Null/NaN-safe like the
  * explode form it replaces: null v skips (sums unchanged), NaN v
  * poisons the sums to NaN exactly as `sum(abs(v−m))` would.
  */
@ExpressionDescription(usage = "abs_dev_sums_agg(v, meds) - [sum|v-m_i|, sum|v-m_i|^2] per median")
case class AbsDevSumsAggExpr(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with BinaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "abs_dev_sums_agg"

  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = left.eval(input)
    val ms = right.eval(input)
    if (v == null || ms == null) return buf
    val meds = ms.asInstanceOf[ArrayData]
    val k = meds.numElements()
    val b = if (buf.length == 2 * k) buf
      else if (buf.isEmpty) new Array[Double](2 * k)
      else throw new IllegalStateException(
        s"abs_dev_sums_agg: medians length ${k} != buffer ${buf.length / 2}")
    val d = v match {
      case d: Double => d
      case f: Float => f.toDouble
      case other => other.toString.toDouble
    }
    var i = 0
    while (i < k) {
      // null median entry (side sketch empty) contributes NaN, matching
      // abs(v - null) → null only for the WHOLE-row-null case; a null
      // element inside the array is treated as NaN
      val m = if (meds.isNullAt(i)) Double.NaN else meds.getDouble(i)
      val z = math.abs(d - m)
      b(i) += z
      b(k + i) += z * z
      i += 1
    }
    b
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf.length == other.length,
      s"abs_dev_sums_agg merge: ${buf.length} vs ${other.length}")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): AbsDevSumsAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): AbsDevSumsAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AbsDevSumsAggExpr =
    copy(left = newLeft, right = newRight)
}

object AbsDevSumsAgg {
  /** Column API: agg(AbsDevSumsAgg.sums($"v", $"meds")) → array[2k]. */
  def sums(v: Column, meds: Column): Column =
    GraftBridge.toColumn(
      AbsDevSumsAggExpr(GraftBridge.toExpression(v), GraftBridge.toExpression(meds))
        .toAggregateExpression())
}
