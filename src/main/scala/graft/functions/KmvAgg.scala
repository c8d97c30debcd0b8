package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002) as a
  * `TypedImperativeAggregate`: keep the `k` smallest DISTINCT md5-derived
  * hash values seen; with fewer than k distinct hashes the count is
  * exact, otherwise the estimate is (k−1) / normalized k-th minimum.
  *
  * Why it exists next to `approx_count_distinct` (HLL): the KMV state is
  * an order-independent SET — merge = union then re-truncate — so the
  * estimate is a pure function of the data multiset (layout-invariant,
  * like [[CountMinAgg]]), AND the estimator is simple enough to write in
  * one line of SQL over the same md5 hash. That makes the sketch
  * oracle-pinnable IN THE APPROXIMATION REGIME — an external engine
  * computes the bit-identical estimate — where HLL's register layout is
  * implementation-defined. Hash = first 8 hex chars of md5 (the engine's
  * cross-engine [[graft.pipeline.TextOps.hash32]] convention), uniform on
  * [0, 2³²); distinct VALUES with colliding hashes under-count by the
  * collision rate (~n²/2³³ — negligible below ~10⁴ distinct, documented).
  *
  * child may be `string` or `array<string>`; nulls skipped. Output:
  * struct(estimate double, n_kept int, kth_hash long, exact boolean).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, s"k must be >= 2: $k")

  private def isArrayInput: Boolean = child.dataType.isInstanceOf[ArrayType]

  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[Long], item: UTF8String): Unit = {
    val h = KmvAgg.hash32(item.toString)
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf += h; buf -= buf.last }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    if (isArrayInput) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) add(buf, arr.getUTF8String(i))
        i += 1
      }
    } else add(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b1 ++= b2
    while (b1.size > k) b1 -= b1.last
    b1
  }

  override def eval(buf: mutable.TreeSet[Long]): Any = {
    val exact = buf.size < k
    val est =
      if (exact) buf.size.toDouble
      else (k - 1).toDouble / (buf.last.toDouble / KmvAgg.HashSpace)
    new GenericInternalRow(Array[Any](
      est, buf.size, if (buf.isEmpty) 0L else buf.last, exact))
  }

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { s += in.readLong(); i += 1 }
    s
  }

  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("kth_hash", LongType, nullable = false),
    StructField("exact", BooleanType, nullable = false)))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): KmvAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
}

object KmvAgg {

  /** 2³² as double — the hash-space normalizer. */
  val HashSpace: Double = 4294967296.0

  /** The engine's cross-engine hash: first 8 hex chars of md5 as a long
    * (JVM twin of the DuckDB `('0x' || substr(md5(x),1,8))::BIGINT`). */
  private[functions] def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 hex chars = first 4 bytes, big-endian
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Aggregate Column: `kmv_distinct(tokensOrToken, k)` →
    * struct(estimate, n_kept, kth_hash, exact). */
  def apply(child: Column, k: Int): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      new KmvAgg(
        org.apache.spark.sql.GraftInternal.expressionOf(child),
        k).toAggregateExpression())
}
