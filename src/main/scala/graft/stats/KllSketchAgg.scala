package graft.stats

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge

/** Mergeable KLL quantile sketch as a Catalyst typed-imperative aggregate.
  *
  * Column-stats checks need quantiles whose partial states are mergeable
  * ACROSS runs (checkpoint/resume, SURVEY.md §7.5) — Spark's builtin
  * `approx_percentile` yields a final value only, so resumed runs could not
  * combine with completed-partition state. This aggregate emits the
  * serialized sketch (BinaryType); `KllSketchAgg.quantiles` /
  * `KllSketchAgg.merge` read and combine the binaries driver-side or in a
  * later pass.
  *
  * The buffer stays a heap object per partition (serialized only at shuffle
  * boundaries), so per-row cost is one sketch update.
  */
@ExpressionDescription(usage = "kll_sketch_agg(col) - mergeable KLL doubles sketch (binary)")
case class KllSketchAggExpr(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case other => other.toString.toDouble
      }
      if (!d.isNaN) buf.update(d)
    }
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAggExpr =
    copy(child = newChild)
}

object KllSketchAgg {
  /** Column API: df.agg(KllSketchAgg.sketch($"x")) → binary sketch. */
  def sketch(c: Column, k: Int = 200): Column =
    GraftBridge.toColumn(
      KllSketchAggExpr(GraftBridge.toExpression(c), k).toAggregateExpression())

  /** Read quantiles out of a serialized sketch (driver-side / UDF). */
  def quantiles(bytes: Array[Byte], qs: Array[Double]): Array[Double] = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) Array.fill(qs.length)(Double.NaN) else qs.map(sk.getQuantile)
  }

  def n(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN

  /** Merge serialized sketches — resumed-run state ∪ fresh state ≡ one run. */
  def merge(parts: Seq[Array[Byte]], k: Int = 200): Array[Byte] = {
    val acc = KllDoublesSketch.newHeapInstance(k)
    parts.foreach(b => acc.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
    acc.toByteArray
  }
}
