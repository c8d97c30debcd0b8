package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two numeric arrays.
  *
  * The built-in spelling `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is a
  * higher-order function — CodegenFallback, so every row pays interpreted
  * lambda dispatch per element, and it sits in the hot loop of every
  * similarity operator (brute kNN scores |corpus|·|queries| dots; k-means
  * scores |corpus|·k per iteration). This expression generates a tight
  * `while` loop instead.
  *
  * Semantics mirror the HOF spelling exactly, including the accumulation
  * ORDER (ascending index, 0.0 seed) so results are bit-identical to the
  * previous implementation and to the DuckDB oracles' `list_sum`:
  * null input array, length mismatch, or any null element → NULL.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    def getter(float: Boolean, arr: String, i: String) =
      if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          int $n = ${leftGen.value}.numElements();
          if (${rightGen.value}.numElements() == $n) {
            boolean anyNull = false;
            double $acc = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
                anyNull = true; break;
              }
              $acc += ${getter(elemIsFloat(left), leftGen.value.toString, i)} *
                ${getter(elemIsFloat(right), rightGen.value.toString, i)};
            }
            if (!anyNull) { ${ev.isNull} = false; ${ev.value} = $acc; }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Codegen'd `Σ a_i · b_i` over two `array<float|double>` columns. */
  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(
      DotProduct(GraftInternal.expressionOf(a), GraftInternal.expressionOf(b)))
  }
}
