package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native codegen'd bucket assignment against a sorted cut-point array:
  * `bin(v) = 1 + |{j : v > c_j}|` — EXACTLY the contract of
  * `Dbbinsreg.caseChainBin`'s literal CASE chain (left-closed cuts, ties to
  * the lower bin, duplicated cuts leave their bin empty), including the
  * fall-through corners: a NULL or NaN input lands in bin `cuts.length + 1`
  * (no `when` matches → `otherwise`), so this is a drop-in for the chain.
  *
  * The chain is the right spelling up to a few dozen cuts (literal
  * comparisons, folded into the surrounding codegen); past that its cost is
  * linear in the cut count per ROW while this is a binary search (≤ ⌈log₂ B⌉
  * probes) with the cut array riding as ONE plan reference — O(1) plan size
  * in B, the [[NearestCentroid]] lesson. `Dbbinsreg.caseChainBin` switches
  * here automatically above 64 cuts, so every bucketed operator (lift, WoE,
  * the Eval rank metrics) inherits the bound without changing call sites.
  *
  * The Array field would make case-class equality reference-based (breaking
  * canonicalization/CSE), so equals/hashCode are overridden deep.
  */
case class BucketBin(child: Expression, cuts: Array[Double])
    extends UnaryExpression {

  override def equals(other: Any): Boolean = other match {
    case that: BucketBin =>
      child == that.child && java.util.Arrays.equals(cuts, that.cuts)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(
      child, Integer.valueOf(java.util.Arrays.hashCode(cuts)))

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_bin needs a double input, got ${other.simpleString}")
    }

  // lower bound: first index with v <= cuts[i]; bin = index + 1. Monotone
  // predicate over the sorted cuts, so binary search = the CASE chain's
  // first-match. NaN compares false against everything → falls to B + 1,
  // the chain's `otherwise`.
  private def binOf(v: Double): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= cuts(mid)) hi = mid else lo = mid + 1
    }
    lo + 1
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) cuts.length + 1 else binOf(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val code =
      code"""
        ${childGen.code}
        int ${ev.value} = ${cutsRef}.length + 1;
        if (!${childGen.isNull}) {
          int $lo = 0;
          int $hi = ${cutsRef}.length;
          while ($lo < $hi) {
            int $mid = ($lo + $hi) >>> 1;
            if (${childGen.value} <= ${cutsRef}[$mid]) $hi = $mid; else $lo = $mid + 1;
          }
          ${ev.value} = $lo + 1;
        }
      """
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketBin =
    copy(child = newChild)
}

object BinExprs {
  /** Codegen'd binary-search bucket id against sorted interior cuts —
    * `caseChainBin` semantics at O(log B) per row and O(1) plan size. */
  def bucketBin(v: Column, cuts: Array[Double]): Column = {
    require(cuts.nonEmpty, "cuts must be non-empty (0 cuts = the constant bin 1)")
    require((1 until cuts.length).forall(i => cuts(i - 1) <= cuts(i)),
      "cuts must be sorted ascending")
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(BucketBin(GraftInternal.expressionOf(v), cuts))
  }
}
