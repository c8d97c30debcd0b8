package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Intersection SIZE of two ASC-sorted, duplicate-free, null-free arrays
  * (both `array<string>` or both `array<bigint>`), as a codegen'd
  * two-pointer merge — the hot inner loop of the exact set-similarity
  * join's verification step.
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect builds a hash
  * set PER ROW (SQLOpenHashSet + null-check lambdas) and materializes
  * the intersection array just to count it — at 33M candidate pairs
  * that allocation churn dominated the ×100 profile. The merge loop
  * allocates nothing and short-circuits at the shorter array's end.
  * The bigint variant exists because SetSimJoin verifies over 64-bit
  * TOKEN HASHES (8-byte fixed elements vs variable-length UTF8 —
  * several-fold smaller candidate-join payloads, primitive compares).
  *
  * CONTRACT (enforced by the caller, not re-checked per row): both
  * arrays sorted ascending (UTF8 binary order for strings — the
  * `sort_array` default — numeric order for bigints), no nulls, no
  * duplicates. NULL array input → NULL.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(dt: DataType): Option[DataType] = dt match {
      case ArrayType(StringType, _) => Some(StringType)
      case ArrayType(LongType, _) => Some(LongType)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs two array<string> or two " +
          s"array<bigint> inputs, got ${left.dataType.simpleString} and " +
          s"${right.dataType.simpleString}")
    }
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    if (isLong) {
      while (i < n && j < m) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < n && j < m) {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("a"); val b = ctx.freshName("b")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val n = ctx.freshName("n"); val m = ctx.freshName("m")
    val cmp = ctx.freshName("cmp")
    val loop =
      if (isLong)
        s"""long $cmp;
           |while ($i < $n && $j < $m) {
           |  $cmp = $a.getLong($i) == $b.getLong($j) ? 0
           |    : ($a.getLong($i) < $b.getLong($j) ? -1 : 1);
           |  if ($cmp == 0) { ${ev.value}++; $i++; $j++; }
           |  else if ($cmp < 0) { $i++; } else { $j++; }
           |}""".stripMargin
      else
        s"""int $cmp;
           |while ($i < $n && $j < $m) {
           |  $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if ($cmp == 0) { ${ev.value}++; $i++; $j++; }
           |  else if ($cmp < 0) { $i++; } else { $j++; }
           |}""".stripMargin
    val code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = 0;
        if (!${leftGen.isNull}) {
          ${rightGen.code}
          if (!${rightGen.isNull}) {
            ${ev.isNull} = false;
            org.apache.spark.sql.catalyst.util.ArrayData $a = ${leftGen.value};
            org.apache.spark.sql.catalyst.util.ArrayData $b = ${rightGen.value};
            int $n = $a.numElements();
            int $m = $b.numElements();
            int $i = 0; int $j = 0;
            $loop
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftInternal.columnOf(
      new SortedIntersectCount(
        org.apache.spark.sql.GraftInternal.expressionOf(a),
        org.apache.spark.sql.GraftInternal.expressionOf(b)))
}
