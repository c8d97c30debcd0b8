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

object TextExprs {
  /** Unicode-normalize a string column (default NFC). Codegen'd; NULL in,
    * NULL out. */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      UnicodeNormalize(org.apache.spark.sql.GraftInternal.expressionOf(c), form))
}
