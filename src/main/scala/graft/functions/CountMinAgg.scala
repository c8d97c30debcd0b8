package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch point-frequency estimates as a
  * `TypedImperativeAggregate` (Cormode & Muthukrishnan 2005).
  *
  * Complements [[FreqItemsAgg]]: Misra-Gries answers "what are the top
  * items" with bounded state but FORGETS everything outside its capacity;
  * Count-Min answers "how often did THIS item occur" for any item, with
  * d×w counters of state and one-sided error (est ≥ true,
  * est ≤ true + 2·N/w with probability 1−2⁻ᵈ per classic analysis).
  *
  * The property the other sketches here don't have: merge is ELEMENTWISE
  * ADDITION — commutative and associative — so the estimate is a pure
  * function of the data multiset, bit-identical under ANY partition
  * layout or merge tree, even in the approximation regime. Hashing is
  * seeded MurmurHash3 over UTF-8 bytes (pure, engine-independent), so a
  * given (depth, width) sketch is reproducible everywhere.
  *
  * `queryItems` are baked into the aggregate: eval returns
  * `array<struct<item, est>>` in query order — the sketch itself stays
  * executor-side and the shuffle carries the d×w counter grid per
  * partition, never per group of values.
  *
  * child may be `string` or `array<string>`; nulls skipped.
  */
case class CountMinAgg(
    child: Expression,
    queryItems: Seq[String],
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
  require(width >= 2, s"width must be >= 2: $width")
  require(queryItems.nonEmpty, "queryItems must be non-empty")

  private def isArrayInput: Boolean = child.dataType.isInstanceOf[ArrayType]

  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  private def add(buf: Array[Long], item: String): Unit = {
    val bytes = item.getBytes(StandardCharsets.UTF_8)
    var r = 0
    while (r < depth) {
      val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, r)
      buf(r * width + math.floorMod(h, width)) += 1L
      r += 1
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    if (isArrayInput) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) add(buf, arr.getUTF8String(i).toString)
        i += 1
      }
    } else add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    new GenericArrayData(queryItems.map { item =>
      val bytes = item.getBytes(StandardCharsets.UTF_8)
      var est = Long.MaxValue
      var r = 0
      while (r < depth) {
        val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, r)
        val c = buf(r * width + math.floorMod(h, width))
        if (c < est) est = c
        r += 1
      }
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), est))
    }.toArray[Any])
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {

  /** Aggregate Column: `count_min(tokensOrToken, items, depth, width)` →
    * array<struct<item, est>> in `items` order. */
  def apply(child: Column, queryItems: Seq[String], depth: Int, width: Int): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      new CountMinAgg(
        org.apache.spark.sql.GraftInternal.expressionOf(child),
        queryItems, depth, width).toAggregateExpression())
}
