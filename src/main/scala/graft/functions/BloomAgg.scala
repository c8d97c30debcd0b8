package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter build aggregate: fold 64-bit key hashes into an m-bit
  * filter with k probes each (Kirsch-Mitzenmacher double hashing: the
  * i-th probe is `h_hi + i·(h_lo | 1) mod m`). The buffer is a plain
  * bit array, so partial aggregates merge by OR — a mergeable sketch
  * with map-side combine, the same distribution contract as
  * [[KmvAgg]]/[[CountMinAgg]].
  *
  * This is the build side of the classic runtime-filter shape
  * ([[graft.operators.BloomJoin]]): aggregate the SMALL side's join keys
  * into one binary row, broadcast it, and drop non-matching big-side rows
  * BEFORE the shuffle join. At 100 TB the win is shuffle volume: a
  * selective semi join moves only the (bloom-surviving) fraction of the
  * fact table instead of all of it, at the cost of one byte-array
  * broadcast. False positives only cost unpruned rows — the verifying
  * join keeps results exact.
  *
  * child must be LongType (pass `xxhash64(key)`); nulls are skipped.
  * Output: the filter as `binary` ((numBits+7)/8 bytes; bit j is
  * `bytes[j >> 3] & (1 << (j & 7))`).
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]] {

  require(numBits >= 64, s"numBits must be >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1,16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg needs a bigint child (pass xxhash64(key)), got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte]((numBits + 7) >> 3)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val h1 = (h >>> 32).toInt
      val h2 = h.toInt | 1
      var i = 0
      while (i < numHashes) {
        val bit = java.lang.Math.floorMod(h1 + i * h2, numBits)
        buf(bit >> 3) = (buf(bit >> 3) | (1 << (bit & 7))).toByte
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {
  /** Aggregate Column: `bloom_agg(xxhash64(key), m, k)` → binary filter. */
  def apply(child: Column, numBits: Int, numHashes: Int): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      new BloomAgg(
        org.apache.spark.sql.GraftInternal.expressionOf(child),
        numBits, numHashes).toAggregateExpression())
}

/** Codegen'd Bloom membership probe — the read side of [[BloomAgg]] (same
  * bit layout, same double-hashing probe sequence). Sits in the scan's
  * filter, inside whole-stage codegen, so the runtime filter costs k bit
  * reads per row with early exit — no UDF, no interpreted dispatch.
  *
  * The filter bytes are a CONSTRUCTOR FIELD, not a child expression:
  * codegen references them through `addReferenceObj` (one constant per
  * generated class — zero per-row copies), and the plan string prints
  * the array's identity instead of megabytes of hex. Earlier designs
  * paid dearly here: a 1-row-broadcast filter column is re-copied out
  * of the UnsafeRow on EVERY probe row by the join's eager column
  * evaluation (cost linear in m — BENCH_NOTES), and a `Literal` child
  * dumps the whole filter into every explain/AQE log line.
  *
  * `child` = the 64-bit key hash; NULL hash → NULL (row dropped by
  * filter semantics).
  */
case class BloomMightContain(
    child: Expression,
    filterBytes: Array[Byte],
    numBits: Int,
    numHashes: Int
) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(numBits >= 64, s"numBits must be >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes must be in [1,16], got $numHashes")
  require(filterBytes != null && filterBytes.length == (numBits + 7) >> 3,
    s"filterBytes must hold numBits=$numBits bits")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  // The Array[Byte] field would give the case class REFERENCE equality,
  // so two semantically identical probes would never compare equal and
  // canonicalization / subexpression elimination / exchange reuse would
  // silently fail for this expression. Compare the filter by content.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && numBits == b.numBits && numHashes == b.numHashes &&
        java.util.Arrays.equals(filterBytes, b.filterBytes)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(numBits),
      Integer.valueOf(numHashes),
      Integer.valueOf(java.util.Arrays.hashCode(filterBytes)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a bigint key hash, got " +
        child.dataType.simpleString)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val h = v.asInstanceOf[Long]
    val h1 = (h >>> 32).toInt
    val h2 = h.toInt | 1
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits)
      if ((filterBytes(bit >> 3) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val bytes = ctx.addReferenceObj("bloomFilterBytes", filterBytes, "byte[]")
    val h1 = ctx.freshName("h1")
    val h2 = ctx.freshName("h2")
    val i = ctx.freshName("i")
    val bit = ctx.freshName("bit")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          int $h1 = (int) (${childGen.value} >>> 32);
          int $h2 = ((int) ${childGen.value}) | 1;
          ${ev.value} = true;
          for (int $i = 0; $i < $numHashes; $i++) {
            int $bit = java.lang.Math.floorMod($h1 + $i * $h2, $numBits);
            if (($bytes[$bit >> 3] & (1 << ($bit & 7))) == 0) {
              ${ev.value} = false;
              break;
            }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(hash: Column, filterBytes: Array[Byte],
      numBits: Int, numHashes: Int): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      new BloomMightContain(
        org.apache.spark.sql.GraftInternal.expressionOf(hash),
        filterBytes, numBits, numHashes))
}

/** Pass-through boolean marked non-deterministic: an explicit OPTIMIZER
  * PLACEMENT BARRIER. Catalyst's reorder rules (PushDownLeftSemiAntiJoin
  * and friends) only move operators across DETERMINISTIC filters; wrapping
  * a predicate in this pins the filter exactly where the plan author put
  * it. [[graft.operators.BloomJoin]] needs it: spelled plainly, the
  * optimizer sinks the verifying semi join BELOW the bloom pre-filter —
  * executing join-then-bloom, the exact inverse of a runtime filter.
  * The child must itself be deterministic (the wrapper only lies to the
  * optimizer about movability, never about values).
  */
case class PinnedPredicate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override lazy val deterministic: Boolean = false
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pinned predicate needs a boolean child, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PinnedPredicate =
    copy(child = newChild)
}

object PinnedPredicate {
  def apply(pred: Column): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      new PinnedPredicate(
        org.apache.spark.sql.GraftInternal.expressionOf(pred)))
}
