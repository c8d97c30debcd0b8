package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector sum aggregate: Σ over rows of an
  * `array<float|double>` column, plus the contributing row count — the
  * mean-pooling primitive (class prototypes, cluster centroids, grouped
  * embedding averages) as ONE partial+final ObjectHashAggregate.
  *
  * The built-in spellings either shuffle dim× the rows (posexplode +
  * groupBy(pos)) or run an interpreted lambda per row
  * (`aggregate(zip_with(...))` is CodegenFallback); this buffer is a
  * primitive double array merged element-wise, so the shuffle carries one
  * d-vector per (group × partition). Rows that are null, have a null
  * element, or disagree with `dim` are SKIPPED (count excludes them) —
  * the caller filters if those should error.
  *
  * Output: struct(n long, sums array<double>). n = 0 ⇒ sums is the zero
  * vector.
  */
case class VectorSumAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Double]] {

  require(dim >= 1, s"dim must be >= 1: $dim")

  override def children: Seq[Expression] = Seq(child)

  // buffer: [0] = n, [1..dim] = element sums
  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim + 1)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return buf
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return buf
      i += 1
    }
    buf(0) += 1.0
    i = 0
    while (i < dim) {
      buf(i + 1) += (if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i))
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    new GenericInternalRow(Array[Any](
      buf(0).toLong,
      new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, dim + 1))))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate((dim + 1) * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](dim + 1)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum needs an array<float|double> input, got ${other.simpleString}")
    }

  override def withNewMutableAggBufferOffset(offset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren.head)
}

object VectorSumAgg {
  /** Aggregate Column: struct(n, sums) of element-wise sums over `vec`. */
  def apply(vec: Column, dim: Int): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      new VectorSumAgg(
        org.apache.spark.sql.GraftInternal.expressionOf(vec),
        dim).toAggregateExpression())
}
