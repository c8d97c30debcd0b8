package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash signature over a string array.
  *
  * The HOF spelling — `transform(sharr, s => hash32(s) % P)` staged into a
  * bound attribute, then 16 separate `array_min(transform(xs, x =>
  * (x·aᵢ + bᵢ) % P))` — is CodegenFallback: every row pays interpreted
  * lambda dispatch for 17 lambdas and materializes two intermediate
  * arrays, and it sits on the dominant CPU pass of the whole MinHash
  * family (every signature build/apply/refresh). This expression walks
  * the array ONCE: per element, md5 → first-4-bytes unsigned → mod P,
  * then 16 running minima updated in a tight loop (r16, guide §4).
  *
  * Semantics are EXACTLY the HOF spelling's, element for element:
  *   xᵢ = conv(substring(md5(s), 1, 8), 16, 10) % P   (integer, exact)
  *   sig(j) = min over non-null elements of (xᵢ·a(j) + b(j)) % P
  * A null element contributes nothing (array_min skips nulls); an empty
  * array (or one with only null elements) yields a signature of k nulls
  * (array_min of an empty array is null) — and so does a NULL input
  * array, because the HOF spelling wrapped the per-hash nulls in a
  * non-null `array(...)` constructor (array_min(transform(null)) = null
  * per slot, but the outer array is never null). Identical to the
  * previous output, so every oracle hash is unchanged. Integer ranges: x < P ≤
  * 2²⁰, a(j) ≤ ~1.2e5 ⇒ x·a + b < 2⁴¹, no overflow.
  */
case class MinhashSig(
    child: Expression,
    p: Long,
    as: Seq[Long],
    bs: Seq[Long]
) extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty,
    s"coefficient arrays must be same-length and non-empty: ${as.length}/${bs.length}")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  // never null: a NULL/empty input yields the all-null-slot signature,
  // exactly like the HOF spelling's outer array(...) constructor
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got ${other.simpleString}")
    }

  private val aArr = as.toArray
  private val bArr = bs.toArray

  /** Shared by eval and codegen: one pass, k running minima. */
  def compute(arr: ArrayData): ArrayData = {
    val k = aArr.length
    val mins = new Array[Any](k)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = MinhashSig.hash32(arr.getUTF8String(i)) % p
        var j = 0
        while (j < k) {
          val v = (x * aArr(j) + bArr(j)) % p
          val cur = mins(j)
          if (cur == null || v < cur.asInstanceOf[Long]) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  private val emptyInput: ArrayData = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    compute(if (v == null) emptyInput else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSig].getName)
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.compute(${childGen.isNull} ? $ref.emptyInputForCodegen()
            : ${childGen.value});
      """
    ev.copy(code = code)
  }

  /** codegen helper: the shared empty input for the NULL-array branch */
  def emptyInputForCodegen(): ArrayData = emptyInput

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** Native 32-bit md5-prefix hash: the first 8 md5 hex chars of the UTF-8
  * bytes as a BIGINT in [0, 2³²) — bit-identical to the builtin chain
  * `conv(substring(md5(s), 1, 8), 16, 10)::long` (TextOps.hash32: the
  * first 8 hex chars ARE the first 4 digest bytes), without
  * materializing the 32-char hex string, the substring copy, or the
  * base-16 re-parse. This hash sits in every deterministic
  * sampling/split/bucketing filter and the SimHash token loop (r16,
  * guide §4). NULL in, NULL out (same as the builtin chain). */
case class Hash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hash32 needs a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    MinhashSig.hash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSig.javaHash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash32 =
    copy(child = newChild)

  override def prettyName: String = "graft_hash32"
}

object Hash32 {
  def apply(s: Column): Column = {
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(new Hash32(GraftInternal.expressionOf(s)))
  }
}

/** Native one-pass SimHash over a token array, wrapped for a generator:
  * returns a 0-or-1-element array<long> so `explode(SimhashArr(toks))`
  * reproduces the old explode+groupBy semantics EXACTLY — a doc with no
  * tokens (or a NULL token array) emits NO row, every other doc emits
  * its signature — while evaluating the tokens exactly once (Generate
  * evaluates its generator input once per row; a separate
  * size/isnotnull filter would be pushdown-substituted below the
  * projection and re-run the token pipeline per row, the documented
  * HOF-pushdown trap).
  *
  * The old shape exploded every token and shuffled the full (id, hash)
  * token table into a 16-aggregate groupBy — at corpus scale that
  * shuffle carries |tokens| rows for a per-doc-computable value. This
  * is the guide-§2.4 removal: SimHash becomes a narrow projection with
  * NO exchange anywhere (r16).
  *
  * Bit arithmetic is the old aggregate's exactly: bit k of the
  * signature is set iff Σ_tokens (bit k of hash32(token) ? +1 : −1) is
  * strictly positive; a null token element contributes −1 to every bit
  * (the old `when(null % 2 === 1, 1).otherwise(-1)` branch). */
case class SimhashArr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 32, s"simhash bits must be in [1,32], got $bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_arr needs array<string>, got ${other.simpleString}")
    }

  /** Shared by eval and codegen. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return SimhashArr.Empty
    val sums = new Array[Long](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // old aggregate: a null hash falls to the otherwise(-1) branch
        var k = 0
        while (k < bits) { sums(k) -= 1; k += 1 }
      } else {
        val x = MinhashSig.hash32(arr.getUTF8String(i))
        var k = 0
        while (k < bits) {
          if (((x >>> k) & 1L) == 1L) sums(k) += 1 else sums(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < bits) {
      if (sums(k) > 0) sig |= (1L << k)
      k += 1
    }
    new GenericArrayData(Array[Any](sig))
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) SimhashArr.Empty // explode of a null array emits no row
    else compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashArr", this, classOf[SimhashArr].getName)
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull} ? graft.functions.SimhashArr.javaEmpty()
            : $ref.compute(${childGen.value});
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashArr =
    copy(child = newChild)

  override def prettyName: String = "simhash_arr"
}

object SimhashArr {
  private[functions] val Empty: ArrayData =
    new GenericArrayData(Array.empty[Any])

  /** Java-callable for codegen. */
  def javaEmpty(): ArrayData = Empty

  def apply(toks: Column, bits: Int): Column = {
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(
      new SimhashArr(GraftInternal.expressionOf(toks), bits))
  }
}

object MinhashSig {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Java-callable static forwarder for codegen ([[Hash32]]). */
  def javaHash32(s: org.apache.spark.unsafe.types.UTF8String): Long = hash32(s)

  /** First 8 md5 hex chars as an unsigned 32-bit value — bit-identical to
    * `conv(substring(md5(s), 1, 8), 16, 10)::long` (TextOps.hash32):
    * the first 8 hex chars ARE the first 4 digest bytes. */
  def hash32(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def apply(sharr: Column, p: Long, as: Seq[Long], bs: Seq[Long]): Column = {
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(
      new MinhashSig(GraftInternal.expressionOf(sharr), p, as, bs))
  }
}
