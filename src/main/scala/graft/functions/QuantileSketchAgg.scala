package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable bounded-state quantile summary with `quantile_cont`
  * (linear-interpolation) semantics, as a `TypedImperativeAggregate`.
  *
  * Why it exists: Spark's exact `percentile` buffers EVERY value per group
  * (an OpenHashMap the size of the group — a 10⁹-row group OOMs the
  * executor), while `approx_percentile` bounds state but returns an actual
  * element of the group, not the interpolated quantile — so neither gives
  * bounded-state `quantile_cont`. This aggregate keeps ≤ `capacity`
  * weighted centroids per partial state (shuffle carries O(capacity), not
  * O(group)) and evaluates the same interpolated quantile DuckDB's
  * `quantile_cont` / Spark's `percentile` define.
  *
  * Exactness regimes (what the oracle can pin):
  *   - EQUAL VALUES ALWAYS COLLAPSE to one (value, weight) centroid, so on
  *     a column with ≤ capacity distinct values per group the summary is
  *     exact at ANY row count — discrete measures (quantities, ratings,
  *     token counts) get exact quantiles at 100 TB with constant state.
  *   - With ≤ capacity total values the buffer never approximates either.
  *   - Beyond that, adjacent centroids with the minimal combined weight
  *     merge into their weighted mean (deterministic leftmost tiebreak):
  *     centroid weights stay balanced, so the rank error of a query is
  *     bounded by the heaviest centroid — O(W/capacity) — spec-tested
  *     rather than oracle-pinned (the merge tree depends on partition
  *     layout, as with any mergeable sketch).
  *
  * Nulls and NaNs are skipped (SQL aggregate convention; NaN has no order
  * position under interpolation). Empty group → null.
  */
case class QuantileSketchAgg(
    child: Expression,
    probs: Seq[Double],
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[QuantileSketchAgg.Buffer] {

  import QuantileSketchAgg.Buffer

  require(capacity >= 2, s"capacity must be >= 2: $capacity")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probs must be in [0,1]: $probs")

  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Buffer =
    new Buffer(mutable.ArrayBuffer.empty)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: Long => x.toDouble
        case x: Int => x.toDouble
        case x: Short => x.toDouble
        case x: Byte => x.toDouble
        case x: org.apache.spark.sql.types.Decimal => x.toDouble
      }
      if (!d.isNaN) {
        buf.cs += ((d, 1L))
        // amortize: compact only when the raw buffer outgrows 4× target
        if (buf.cs.length > 4 * capacity) QuantileSketchAgg.compact(buf, capacity)
      }
    }
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    b1.cs ++= b2.cs
    if (b1.cs.length > capacity) QuantileSketchAgg.compact(b1, capacity)
    b1
  }

  override def eval(buf: Buffer): Any = {
    // final collapse of exact duplicates only — never approximates
    QuantileSketchAgg.sortCollapse(buf)
    if (buf.cs.isEmpty) return null
    val means = buf.cs.map(_._1).toArray
    val weights = buf.cs.map(_._2).toArray
    val total = weights.sum
    val out = probs.map { p =>
      // rank pos = p·(W−1), value-at-index by cumulative weight, linear
      // interpolation across the boundary — quantile_cont exactly when
      // centroids are exact
      val pos = p * (total - 1).toDouble
      val lo = math.floor(pos).toLong
      val hi = math.ceil(pos).toLong
      val vLo = QuantileSketchAgg.valueAt(means, weights, lo)
      if (hi == lo) vLo
      else {
        val vHi = QuantileSketchAgg.valueAt(means, weights, hi)
        vLo + (pos - lo.toDouble) * (vHi - vLo)
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.cs.length)
    buf.cs.foreach { case (m, w) => out.writeDouble(m); out.writeLong(w) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val cs = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { cs += ((in.readDouble(), in.readLong())); i += 1 }
    new Buffer(cs)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
}

object QuantileSketchAgg {

  /** Centroid list (mean, weight); kept unsorted between compactions. */
  final class Buffer(val cs: mutable.ArrayBuffer[(Double, Long)])

  /** Sort by mean and collapse EXACT duplicates (lossless). */
  private[functions] def sortCollapse(buf: Buffer): Unit = {
    if (buf.cs.isEmpty) return
    val sorted = buf.cs.sortBy(_._1)
    buf.cs.clear()
    var (cm, cw) = sorted.head
    for (i <- 1 until sorted.length) {
      val (m, w) = sorted(i)
      if (m == cm) cw += w
      else { buf.cs += ((cm, cw)); cm = m; cw = w }
    }
    buf.cs += ((cm, cw))
  }

  /** Collapse duplicates, then merge minimal-combined-weight adjacent
    * pairs (leftmost tiebreak) until ≤ cap centroids remain. Weighted-mean
    * merge keeps the summary's cumulative-weight curve within half the
    * heaviest centroid of the truth. */
  private[functions] def compact(buf: Buffer, cap: Int): Unit = {
    sortCollapse(buf)
    while (buf.cs.length > cap) {
      var best = 0
      var bestW = Long.MaxValue
      var i = 0
      while (i < buf.cs.length - 1) {
        val w = buf.cs(i)._2 + buf.cs(i + 1)._2
        if (w < bestW) { bestW = w; best = i }
        i += 1
      }
      val (m1, w1) = buf.cs(best)
      val (m2, w2) = buf.cs(best + 1)
      val w = w1 + w2
      buf.cs(best) = ((m1 * w1 + m2 * w2) / w, w)
      buf.cs.remove(best + 1)
    }
  }

  /** Value of the k-th element (0-based) of the expanded sorted multiset,
    * by cumulative weight. */
  private[functions] def valueAt(
      means: Array[Double], weights: Array[Long], k: Long): Double = {
    var cum = 0L
    var i = 0
    while (i < weights.length) {
      cum += weights(i)
      if (k < cum) return means(i)
      i += 1
    }
    means(means.length - 1) // k == W−1 boundary from p = 1.0
  }

  /** Aggregate Column: `quantile_sketch(x, probs, capacity)` →
    * array<double> (one interpolated quantile per prob). */
  def apply(child: Column, probs: Seq[Double], capacity: Int): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      new QuantileSketchAgg(
        org.apache.spark.sql.GraftInternal.expressionOf(child),
        probs, capacity).toAggregateExpression())
}
