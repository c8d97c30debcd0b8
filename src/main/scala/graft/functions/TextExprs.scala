package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode normalization (java.text.Normalizer).
  *
  * Unicode normalization is a standard first cleaning step for web-scale
  * corpora (CCNet normalizes before hashing; exact-dedup fingerprints on
  * un-normalized text miss composed-vs-decomposed duplicates: "é" as
  * U+00E9 vs U+0065 U+0301 hash differently while rendering identically).
  * Spark has no built-in for it and a Scala UDF would break the engine's
  * zero-UDF/codegen discipline, so this is a custom `UnaryExpression` with
  * `doGenCode` — preference order (b) of SURVEY.md §7: a scalar expression,
  * not a whole-operator plan node.
  *
  * `form` ∈ NFC | NFD | NFKC | NFKD (validated at construction). The
  * JDK normalizer is the reference implementation both engines share:
  * DuckDB's `nfc_normalize` matches byte-for-byte on NFC (oracle q102).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.mkString("|")}, got $form")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize needs a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form))""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}

/** Native one-pass word n-gram shingles over a token array (n ≥ 2).
  *
  * The HOF spelling —
  * `when(size(toks) < n, []).otherwise(transform(sequence(1, size−n+1),
  * i => concat_ws(" ", element_at(toks, i), …, element_at(toks, i+n−1))))`
  * — is CodegenFallback: interpreted lambda dispatch per shingle plus an
  * n-way element_at/concat_ws expression tree per element, on the
  * projection every shingle-family operator (MinHash, contamination,
  * span/window dedup) runs over the whole corpus. This walks the token
  * array once and emits `size − n + 1` space-joined shingles (r16,
  * guide §4).
  *
  * Semantics are EXACTLY the HOF spelling's under the session defaults:
  * fewer than n tokens → the EMPTY array (non-null); a NULL token array
  * → the one-empty-shingle array [""] (size(null) is null under the
  * Spark 4 ANSI default, so the HOF fell through to its otherwise
  * branch, where greatest(null, 1) = 1 drives one concat_ws over null
  * element_ats = ""); null elements are SKIPPED by the join with no
  * separator (UTF8String.concatWs = the concat_ws builtin's own
  * implementation). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"WordShingles needs n >= 2 (n = 1 is the identity), got $n")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  // never null: the HOF's when(...).otherwise(...) always yields an array
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles needs array<string>, got ${other.simpleString}")
    }

  /** Shared by eval and codegen. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val size = arr.numElements()
    if (size < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val sep = WordShingles.Space
    val m = size - n + 1
    val out = new Array[Any](m)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var k = 0
      while (k < n) {
        // concat_ws skips nulls — UTF8String.concatWs implements exactly that
        window(k) = if (arr.isNullAt(i + k)) null
          else arr.getUTF8String(i + k)
        k += 1
      }
      out(i) = UTF8String.concatWs(sep, window: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // the HOF's NULL-array result: one empty-string shingle (see scaladoc)
  private val nullInputResult =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](UTF8String.EMPTY_UTF8))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) nullInputResult
    else compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("wordShingles", this,
      classOf[WordShingles].getName)
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull} ? $ref.emptyForCodegen()
            : $ref.compute(${childGen.value});
      """
    ev.copy(code = code)
  }

  /** codegen helper: the [""] result for the NULL-array branch */
  def emptyForCodegen(): org.apache.spark.sql.catalyst.util.ArrayData =
    nullInputResult

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")
}

/** Native one-pass whitespace tokenizer: the maximal runs of
  * non-whitespace bytes, in order — bit-identical to
  * `filter(split(s, "\\s+"), t => length(t) > 0)`, whose ArrayFilter HOF
  * is CodegenFallback (an interpreted lambda per element on the
  * tokenization EVERY text-family operator runs corpus-wide) and whose
  * split pays a regex matcher plus the empty leading/trailing tokens the
  * filter then discards (r17, guide §4).
  *
  * Whitespace = Java regex `\s` without UNICODE_CHARACTER_CLASS, exactly
  * as the split spelling: { space, \t, \n, \x0B, \f, \r } — six ASCII
  * bytes, which in UTF-8 never occur inside a multi-byte sequence, so a
  * byte-level scan splits identically to the regex (unicode whitespace
  * like U+00A0 does NOT split, matching `\s`). Empty/whitespace-only
  * input → empty array; NULL → NULL (split/filter both propagate). */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"whitespace_tokens needs a string input, got ${child.dataType.simpleString}")

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Shared by eval and codegen. */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // pass 1: count tokens (branch-cheap; bytes stay in cache for pass 2)
    var count = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) count += 1
      while (i < n && !isWs(bytes(i))) i += 1
    }
    if (count == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    // pass 2: slice tokens over the shared byte array (fromBytes wraps,
    // no per-token copy)
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        out(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("whitespaceTokens", this,
      classOf[WhitespaceTokens].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)

  override def prettyName: String = "whitespace_tokens"
}

/** Native count of array elements contained in a fixed string set —
  * bit-identical to `size(filter(arr, x => x.isInCollection(values)))`,
  * whose ArrayFilter lambda is CodegenFallback (interpreted dispatch per
  * token on the language-ID / stopword projections every text-quality
  * pass runs corpus-wide; r17, guide §4). NULL elements are skipped (the
  * filter's three-valued predicate dropped them); NULL array → NULL
  * (size(null) is null under the Spark 4 ANSI default). Membership is
  * UTF8String binary equality, exactly isInCollection's under the
  * default collation. */
case class CountInSet(child: Expression, values: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"count_in_set needs array<string>, got ${other.simpleString}")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  /** Shared by eval and codegen. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countInSet", this,
      classOf[CountInSet].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)

  override def prettyName: String = "count_in_set"
}

/** Native total character length of a string array — bit-identical to
  * `aggregate(arr, 0L, (acc, x) => acc + length(x))`, whose interpreted
  * fold sat on the mean-token-length projections (r17, guide §4):
  * length() counts CODEPOINTS (UTF8String.numChars); a NULL element
  * poisons the accumulator (acc + null = null) so the whole result is
  * NULL from that element on, exactly as the fold; empty array → 0;
  * NULL array → NULL. */
case class SumCharLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sum_char_length needs array<string>, got ${other.simpleString}")
    }

  /** Shared by eval and codegen; boxed Long or null. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      s += arr.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("sumCharLength", this,
      classOf[SumCharLength].getName)
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("boxedSum")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed = $ref.compute(${childGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.longValue();
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): SumCharLength =
    copy(child = newChild)

  override def prettyName: String = "sum_char_length"
}

object TextExprs {
  /** Unicode-normalize a string column (default NFC). Codegen'd; NULL in,
    * NULL out. */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      UnicodeNormalize(org.apache.spark.sql.GraftInternal.expressionOf(c), form))

  /** Word n-gram shingles (n ≥ 2) — the codegen'd [[WordShingles]]. */
  def wordShingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      WordShingles(org.apache.spark.sql.GraftInternal.expressionOf(toks), n))

  /** Non-empty whitespace tokens — the codegen'd [[WhitespaceTokens]]. */
  def whitespaceTokens(s: Column): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      WhitespaceTokens(org.apache.spark.sql.GraftInternal.expressionOf(s)))

  /** Count of array elements in a fixed set — the codegen'd [[CountInSet]]. */
  def countInSet(arr: Column, values: Seq[String]): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      CountInSet(org.apache.spark.sql.GraftInternal.expressionOf(arr), values))

  /** Total codepoint length of a string array — the codegen'd
    * [[SumCharLength]]. */
  def sumCharLength(arr: Column): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      SumCharLength(org.apache.spark.sql.GraftInternal.expressionOf(arr)))
}
