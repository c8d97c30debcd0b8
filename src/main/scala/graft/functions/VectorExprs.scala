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

/** Native codegen'd nearest-centroid assignment: the 0-based index of the
  * centroid with the highest cosine similarity to the input vector, ties →
  * lowest index (identical to the previous `array_max` over
  * `(cos, -cell)` structs and to the oracles' `row_number() OVER (ORDER BY
  * cos DESC, cell ASC)`).
  *
  * The centroid matrix rides along as a plan REFERENCE (`addReferenceObj`),
  * not as k literal columns — the old spelling built k struct literals per
  * row, whose plan size and codegen grow with k (k·dim literals; k ≳ 100
  * blows past JVM method limits into interpreted fallback). Here the plan is
  * O(1) in k and the generated code is two tight primitive loops, so
  * k-means/IVF/SemDeDup can run the k ≈ n/100 regime real corpora need.
  * Row norms and centroid norms accumulate ascending like [[DotProduct]],
  * so assignments are bit-identical to the literal path. Null vector or any
  * null element → NULL.
  *
  * Preconditions (enforced by [[VectorExprs.nearestCentroid]]): all
  * centroids share one dimension and have strictly positive norm — a
  * zero-norm centroid would make its cosine NaN, which `>` never selects,
  * silently diverging from the oracle's `ORDER BY cos DESC` (NaN sorts
  * greatest there). An input vector whose length differs from the centroid
  * dimension fails fast at eval rather than truncating the dot product.
  *
  * The Array fields would make the synthesized case-class equality
  * reference-based (breaking canonicalization / common-subexpression
  * elimination between semantically identical instances), so equals and
  * hashCode are overridden with deep comparisons.
  */
case class NearestCentroid(
    child: Expression,
    cents: Array[Array[Double]],
    cnorms: Array[Double]
) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def centDim: Int = cents(0).length

  override def equals(other: Any): Boolean = other match {
    case that: NearestCentroid =>
      child == that.child &&
        java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], that.cents.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(cnorms, that.cnorms)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(
      child,
      Integer.valueOf(java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.hashCode(cnorms)))

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid needs an array<float|double> input, got ${other.simpleString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val d = a.numElements()
    val xs = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (a.isNullAt(i)) return null
      xs(i) = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    if (d != centDim)
      throw new IllegalArgumentException(
        s"nearest_centroid: input vector has $d elements but centroids have $centDim")
    var nv = 0.0
    i = 0
    while (i < d) { nv += xs(i) * xs(i); i += 1 }
    nv = math.sqrt(nv)
    var best = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var dot = 0.0
      i = 0
      while (i < d) { dot += xs(i) * cc(i); i += 1 }
      val cos = dot / (nv * cnorms(c))
      if (cos > bestCos) { best = c; bestCos = cos }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    val getter =
      if (elemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val d = ctx.freshName("d")
    val xs = ctx.freshName("xs")
    val nv = ctx.freshName("nv")
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val cc = ctx.freshName("cc")
    val dot = ctx.freshName("dot")
    val cos = ctx.freshName("cos")
    val best = ctx.freshName("best")
    val bestCos = ctx.freshName("bestCos")
    val anyNull = ctx.freshName("anyNull")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = 0;
        if (!${childGen.isNull}) {
          int $d = ${childGen.value}.numElements();
          boolean $anyNull = false;
          double[] $xs = new double[$d];
          for (int $i = 0; $i < $d; $i++) {
            if (${childGen.value}.isNullAt($i)) { $anyNull = true; break; }
            $xs[$i] = ${getter(childGen.value.toString, i)};
          }
          if (!$anyNull) {
            if ($d != $centsRef[0].length) {
              throw new IllegalArgumentException(
                "nearest_centroid: input vector has " + $d +
                " elements but centroids have " + $centsRef[0].length);
            }
            double $nv = 0.0;
            for (int $i = 0; $i < $d; $i++) { $nv += $xs[$i] * $xs[$i]; }
            $nv = Math.sqrt($nv);
            int $best = 0;
            double $bestCos = Double.NEGATIVE_INFINITY;
            for (int $c = 0; $c < $centsRef.length; $c++) {
              double[] $cc = $centsRef[$c];
              double $dot = 0.0;
              for (int $i = 0; $i < $d; $i++) { $dot += $xs[$i] * $cc[$i]; }
              double $cos = $dot / ($nv * $normsRef[$c]);
              if ($cos > $bestCos) { $best = $c; $bestCos = $cos; }
            }
            ${ev.isNull} = false;
            ${ev.value} = $best;
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Native codegen'd top-`nprobe` centroid selection: the 0-based indices of
  * the `nprobe` centroids with the highest cosine similarity to the input
  * vector, ordered cos-descending with ties → lowest index — exactly the
  * first `nprobe` rows of the oracles' `row_number() OVER (ORDER BY cos
  * DESC, cent_id ASC)`. The multi-cell generalization of
  * [[NearestCentroid]], built for corpus-sided IVF probing (kNN self-join):
  * when EVERY row is a query, the window-over-(n·k rows) spelling of
  * "nprobe nearest cells" becomes an n·k-row shuffle, while this is a
  * narrow projection followed by an explode.
  *
  * Selection is an insertion pass over a length-`nprobe` buffer (nprobe is
  * single-digit in practice); strict-greater insertion keeps equal-cos
  * candidates in arrival (= index-ascending) order. The centroid matrix
  * rides as a plan REFERENCE (O(1) plan size in k, the NearestCentroid
  * lesson). Null vector or any null element → NULL; a zero-norm input
  * (all-NaN cosines) selects no cells and returns an empty array — callers
  * see an unprobed row, never a NaN-ordered one. Array fields ⇒ deep
  * equals/hashCode for canonicalization/CSE.
  */
case class NearestCells(
    child: Expression,
    cents: Array[Array[Double]],
    cnorms: Array[Double],
    nprobe: Int
) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def centDim: Int = cents(0).length

  override def equals(other: Any): Boolean = other match {
    case that: NearestCells =>
      child == that.child && nprobe == that.nprobe &&
        java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], that.cents.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(cnorms, that.cnorms)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(
      child, Integer.valueOf(nprobe),
      Integer.valueOf(java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.hashCode(cnorms)))

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells needs an array<float|double> input, got ${other.simpleString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val d = a.numElements()
    val xs = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (a.isNullAt(i)) return null
      xs(i) = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    if (d != centDim)
      throw new IllegalArgumentException(
        s"nearest_cells: input vector has $d elements but centroids have $centDim")
    var nv = 0.0
    i = 0
    while (i < d) { nv += xs(i) * xs(i); i += 1 }
    nv = math.sqrt(nv)
    val p = math.min(nprobe, cents.length)
    val bi = new Array[Int](p)
    val bc = new Array[Double](p)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var dot = 0.0
      i = 0
      while (i < d) { dot += xs(i) * cc(i); i += 1 }
      val cos = dot / (nv * cnorms(c))
      var j = filled
      while (j > 0 && cos > bc(j - 1)) j -= 1
      // NaN (zero-norm input) must never occupy a slot — an unfilled
      // buffer would otherwise admit it unconditionally
      if (!java.lang.Double.isNaN(cos) && j < p) {
        var m = math.min(filled, p - 1)
        while (m > j) { bi(m) = bi(m - 1); bc(m) = bc(m - 1); m -= 1 }
        bi(j) = c; bc(j) = cos
        if (filled < p) filled += 1
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(bi, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    val getter =
      if (elemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val d = ctx.freshName("d")
    val xs = ctx.freshName("xs")
    val nv = ctx.freshName("nv")
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val cc = ctx.freshName("cc")
    val dot = ctx.freshName("dot")
    val cos = ctx.freshName("cos")
    val p = ctx.freshName("p")
    val bi = ctx.freshName("bi")
    val bc = ctx.freshName("bc")
    val filled = ctx.freshName("filled")
    val j = ctx.freshName("j")
    val m = ctx.freshName("m")
    val anyNull = ctx.freshName("anyNull")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          int $d = ${childGen.value}.numElements();
          boolean $anyNull = false;
          double[] $xs = new double[$d];
          for (int $i = 0; $i < $d; $i++) {
            if (${childGen.value}.isNullAt($i)) { $anyNull = true; break; }
            $xs[$i] = ${getter(childGen.value.toString, i)};
          }
          if (!$anyNull) {
            if ($d != $centsRef[0].length) {
              throw new IllegalArgumentException(
                "nearest_cells: input vector has " + $d +
                " elements but centroids have " + $centsRef[0].length);
            }
            double $nv = 0.0;
            for (int $i = 0; $i < $d; $i++) { $nv += $xs[$i] * $xs[$i]; }
            $nv = Math.sqrt($nv);
            int $p = Math.min($nprobe, $centsRef.length);
            int[] $bi = new int[$p];
            double[] $bc = new double[$p];
            int $filled = 0;
            for (int $c = 0; $c < $centsRef.length; $c++) {
              double[] $cc = $centsRef[$c];
              double $dot = 0.0;
              for (int $i = 0; $i < $d; $i++) { $dot += $xs[$i] * $cc[$i]; }
              double $cos = $dot / ($nv * $normsRef[$c]);
              int $j = $filled;
              while ($j > 0 && $cos > $bc[$j - 1]) $j--;
              if (!Double.isNaN($cos) && $j < $p) {
                for (int $m = Math.min($filled, $p - 1); $m > $j; $m--) {
                  $bi[$m] = $bi[$m - 1]; $bc[$m] = $bc[$m - 1];
                }
                $bi[$j] = $c; $bc[$j] = $cos;
                if ($filled < $p) $filled++;
              }
            }
            ${ev.isNull} = false;
            ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
              .fromPrimitiveArray(java.util.Arrays.copyOf($bi, $filled));
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** Native codegen'd affine projection `W·(x − shift)`: array<float|double>
  * in, `array<double>` of length `W.rows` out — the primitive behind PCA
  * transform / whitening / dense random projection. The weight matrix and
  * shift ride along as plan REFERENCES (`addReferenceObj`), not literal
  * columns, so the plan is O(1) in k·d and the generated code is two tight
  * primitive loops (the [[NearestCentroid]] pattern — k·d literal columns
  * would blow past JVM codegen limits at real embedding widths).
  *
  * Null vector or any null element → NULL; an input whose length differs
  * from `shift.length` fails fast rather than truncating. Array fields ⇒
  * deep equals/hashCode (canonicalization/CSE, as NearestCentroid).
  */
case class AffineProject(
    child: Expression,
    shift: Array[Double],
    mat: Array[Array[Double]] // k rows × d cols
) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def d: Int = shift.length

  override def equals(other: Any): Boolean = other match {
    case that: AffineProject =>
      child == that.child &&
        java.util.Arrays.equals(shift, that.shift) &&
        java.util.Arrays.deepEquals(
          mat.asInstanceOf[Array[AnyRef]], that.mat.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(
      child,
      Integer.valueOf(java.util.Arrays.hashCode(shift)),
      Integer.valueOf(java.util.Arrays.deepHashCode(mat.asInstanceOf[Array[AnyRef]])))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"affine_project needs an array<float|double> input, got ${other.simpleString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != d)
      throw new IllegalArgumentException(
        s"affine_project: input vector has $n elements but shift has $d")
    val xs = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (a.isNullAt(i)) return null
      xs(i) = (if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)) - shift(i)
      i += 1
    }
    val out = new Array[Double](mat.length)
    var j = 0
    while (j < mat.length) {
      val row = mat(j)
      var acc = 0.0
      i = 0
      while (i < d) { acc += row(i) * xs(i); i += 1 }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val shiftRef = ctx.addReferenceObj("shift", shift, "double[]")
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    val getter =
      if (elemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val n = ctx.freshName("n")
    val xs = ctx.freshName("xs")
    val out = ctx.freshName("out")
    val row = ctx.freshName("row")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val anyNull = ctx.freshName("anyNull")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          int $n = ${childGen.value}.numElements();
          if ($n != $shiftRef.length) {
            throw new IllegalArgumentException(
              "affine_project: input vector has " + $n +
              " elements but shift has " + $shiftRef.length);
          }
          boolean $anyNull = false;
          double[] $xs = new double[$n];
          for (int $i = 0; $i < $n; $i++) {
            if (${childGen.value}.isNullAt($i)) { $anyNull = true; break; }
            $xs[$i] = ${getter(childGen.value.toString, i)} - $shiftRef[$i];
          }
          if (!$anyNull) {
            double[] $out = new double[$matRef.length];
            for (int $j = 0; $j < $matRef.length; $j++) {
              double[] $row = $matRef[$j];
              double $acc = 0.0;
              for (int $i = 0; $i < $n; $i++) { $acc += $row[$i] * $xs[$i]; }
              $out[$j] = $acc;
            }
            ${ev.isNull} = false;
            ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
              .fromPrimitiveArray($out);
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): AffineProject =
    copy(child = newChild)
}

/** Native codegen'd PQ-ADC lookup-table construction: for a query vector of
  * length m·sub and a PQ codebook tensor (m books × k codewords × sub dims),
  * emit the full `array<double>` LUT of all m·k sub-vector dot products,
  * laid out book-major (`lut[b·k + c] = Σ_j vec[b·sub + j] · cb[b][c][j]`) —
  * exactly the layout [[graft.pipeline.Similarity.pqRerankTopK]]'s ADC
  * scorer indexes with `element_at(lut, b·k + code_b + 1)`.
  *
  * The previous spelling built the SAME values as m·k SEPARATE
  * `aggregate(zip_with(slice(...)))` higher-order-function expressions —
  * CodegenFallback each, so plan size, codegen and per-row dispatch all grew
  * with m·k (measured: k=16 parity with the exact join, k=64 ≈ 6× WORSE —
  * and production PQ uses k=256). Here the codebooks ride as ONE plan
  * reference (`addReferenceObj`, the [[NearestCentroid]] lesson) and the
  * generated code is one tight m·k·sub loop, so the plan is O(1) in the
  * codebook size. Accumulation order is ascending-j with a 0.0 seed,
  * bit-identical to the HOF spelling and the DuckDB oracle's `list_sum`.
  *
  * Null vector or any null element → NULL; an input whose length differs
  * from m·sub fails fast rather than truncating a sub-vector. Array fields
  * ⇒ deep equals/hashCode (canonicalization/CSE, as NearestCentroid).
  */
case class AdcLut(
    child: Expression,
    codebooks: Array[Array[Array[Double]]]
) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def m: Int = codebooks.length
  private def kCodes: Int = codebooks(0).length
  private def sub: Int = codebooks(0)(0).length

  override def equals(other: Any): Boolean = other match {
    case that: AdcLut =>
      child == that.child &&
        java.util.Arrays.deepEquals(
          codebooks.asInstanceOf[Array[AnyRef]],
          that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(
      child,
      Integer.valueOf(java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adc_lut needs an array<float|double> input, got ${other.simpleString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != m * sub)
      throw new IllegalArgumentException(
        s"adc_lut: input vector has $n elements but codebooks expect ${m * sub} " +
          s"($m books x $sub dims)")
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      xs(i) = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val out = new Array[Double](m * kCodes)
    var b = 0
    while (b < m) {
      val book = codebooks(b)
      val off = b * sub
      var c = 0
      while (c < kCodes) {
        val w = book(c)
        var acc = 0.0
        var j = 0
        while (j < sub) { acc += xs(off + j) * w(j); j += 1 }
        out(b * kCodes + c) = acc
        c += 1
      }
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val getter =
      if (elemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val n = ctx.freshName("n")
    val xs = ctx.freshName("xs")
    val out = ctx.freshName("out")
    val book = ctx.freshName("book")
    val w = ctx.freshName("w")
    val acc = ctx.freshName("acc")
    val off = ctx.freshName("off")
    val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val c = ctx.freshName("c")
    val j = ctx.freshName("j")
    val anyNull = ctx.freshName("anyNull")
    val mV = m; val kV = kCodes; val subV = sub
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          int $n = ${childGen.value}.numElements();
          if ($n != $mV * $subV) {
            throw new IllegalArgumentException(
              "adc_lut: input vector has " + $n + " elements but codebooks expect " +
              ($mV * $subV) + " ($mV books x $subV dims)");
          }
          boolean $anyNull = false;
          double[] $xs = new double[$n];
          for (int $i = 0; $i < $n; $i++) {
            if (${childGen.value}.isNullAt($i)) { $anyNull = true; break; }
            $xs[$i] = ${getter(childGen.value.toString, i)};
          }
          if (!$anyNull) {
            double[] $out = new double[$mV * $kV];
            for (int $b = 0; $b < $mV; $b++) {
              double[][] $book = $cbRef[$b];
              int $off = $b * $subV;
              for (int $c = 0; $c < $kV; $c++) {
                double[] $w = $book[$c];
                double $acc = 0.0;
                for (int $j = 0; $j < $subV; $j++) { $acc += $xs[$off + $j] * $w[$j]; }
                $out[$b * $kV + $c] = $acc;
              }
            }
            ${ev.isNull} = false;
            ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
              .fromPrimitiveArray($out);
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): AdcLut =
    copy(child = newChild)
}

/** Native codegen'd LUT-free PQ-ADC score: given a query vector (length
  * m·sub) and a candidate's PQ code array (m ints), reconstruct the
  * asymmetric distance Σ_b vec[b·sub..]·cb[b][codes[b]] directly from the
  * codebook tensor (a plan reference). The large-codebook sibling of
  * [[AdcLut]]: the LUT amortizes the per-book dot products across a cell's
  * candidates but costs 8·m·k bytes PER PROBE ROW through the shuffle join
  * (16 KB at m=8, k=256 — 32× the d=64 query vector it replaces), so past
  * `m·k ≈ d` the join payload, not the arithmetic, is the bottleneck.
  * This expression lets the probe side carry only the 8·d-byte vector;
  * per pair it spends m·sub = d multiplies (exact-dot arithmetic) while
  * the CANDIDATE side still ships m-byte codes instead of 8·d-byte
  * vectors — the payload asymmetry that is the whole point of PQ on a
  * corpus-sized candidate side.
  *
  * Bit parity with the [[AdcLut]] path by construction: each book's dot
  * accumulates ascending-j into its own partial (one LUT entry), partials
  * add book-ascending (the `element_at` sum order). Null vector/codes or
  * any null element → NULL; wrong vector length or a code outside
  * [0, k) fails fast. Array fields ⇒ deep equals/hashCode.
  */
case class AdcScore(
    left: Expression,  // query vector, array<float|double> of length m·sub
    right: Expression, // candidate codes, array<int> of length m
    codebooks: Array[Array[Array[Double]]]
) extends BinaryExpression {

  private def m: Int = codebooks.length
  private def kCodes: Int = codebooks(0).length
  private def sub: Int = codebooks(0)(0).length

  override def equals(other: Any): Boolean = other match {
    case that: AdcScore =>
      left == that.left && right == that.right &&
        java.util.Arrays.deepEquals(
          codebooks.asInstanceOf[Array[AnyRef]],
          that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(
      left, right,
      Integer.valueOf(java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val codesOk = right.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    }
    if (vecOk && codesOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"adc_score needs (array<float|double>, array<int>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val cd = right.eval(input)
    if (cd == null) return null
    val a = v.asInstanceOf[ArrayData]
    val codes = cd.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != m * sub)
      throw new IllegalArgumentException(
        s"adc_score: query vector has $n elements but codebooks expect ${m * sub}")
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"adc_score: code array has ${codes.numElements()} elements but there are $m books")
    var acc = 0.0
    var b = 0
    while (b < m) {
      if (codes.isNullAt(b)) return null
      val c = codes.getInt(b)
      if (c < 0 || c >= kCodes)
        throw new IllegalArgumentException(
          s"adc_score: code $c out of range [0, $kCodes) in book $b")
      val w = codebooks(b)(c)
      val off = b * sub
      var part = 0.0
      var j = 0
      while (j < sub) {
        if (a.isNullAt(off + j)) return null
        val x = if (elemIsFloat) a.getFloat(off + j).toDouble else a.getDouble(off + j)
        part += x * w(j)
        j += 1
      }
      acc += part
      b += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val getter =
      if (elemIsFloat) (a: String, i: String) => s"(double) $a.getFloat($i)"
      else (a: String, i: String) => s"$a.getDouble($i)"
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val part = ctx.freshName("part")
    val w = ctx.freshName("w")
    val off = ctx.freshName("off")
    val b = ctx.freshName("b")
    val c = ctx.freshName("c")
    val j = ctx.freshName("j")
    val anyNull = ctx.freshName("anyNull")
    val mV = m; val kV = kCodes; val subV = sub
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          int $n = ${leftGen.value}.numElements();
          if ($n != $mV * $subV) {
            throw new IllegalArgumentException(
              "adc_score: query vector has " + $n + " elements but codebooks expect " +
              ($mV * $subV));
          }
          if (${rightGen.value}.numElements() != $mV) {
            throw new IllegalArgumentException(
              "adc_score: code array has " + ${rightGen.value}.numElements() +
              " elements but there are " + $mV + " books");
          }
          boolean $anyNull = false;
          double $acc = 0.0;
          for (int $b = 0; $b < $mV && !$anyNull; $b++) {
            if (${rightGen.value}.isNullAt($b)) { $anyNull = true; break; }
            int $c = ${rightGen.value}.getInt($b);
            if ($c < 0 || $c >= $kV) {
              throw new IllegalArgumentException(
                "adc_score: code " + $c + " out of range [0, " + $kV + ") in book " + $b);
            }
            double[] $w = $cbRef[$b][$c];
            int $off = $b * $subV;
            double $part = 0.0;
            for (int $j = 0; $j < $subV; $j++) {
              if (${leftGen.value}.isNullAt($off + $j)) { $anyNull = true; break; }
              $part += ${getter(leftGen.value.toString, s"$off + $j")} * $w[$j];
            }
            $acc += $part;
          }
          if (!$anyNull) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Codegen'd `Σ a_i · b_i` over two `array<float|double>` columns. */
  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(
      DotProduct(GraftInternal.expressionOf(a), GraftInternal.expressionOf(b)))
  }

  /** Codegen'd argmax-cosine cell assignment against a centroid matrix
    * embedded as a plan reference (plan size O(1) in k). Ties → lowest
    * index; norms accumulate ascending (bit-compatible with the oracle's
    * unrolled SQL). */
  def nearestCentroid(vec: Column, cents: Array[Array[Double]]): Column = {
    require(cents.nonEmpty, "cents must be non-empty")
    require(cents.forall(_.length == cents(0).length),
      s"all centroids must share one dimension, got lengths " +
        cents.map(_.length).distinct.mkString(","))
    val norms = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    require(norms.forall(_ > 0),
      "zero-norm centroid: cosine against it is NaN, which argmax would " +
        "never select — drop empty cells or re-seed k-means before assigning")
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(
      NearestCentroid(GraftInternal.expressionOf(vec), cents, norms))
  }

  /** Codegen'd top-`nprobe` cell selection against a centroid matrix
    * embedded as a plan reference: `array<int>` of centroid indices in
    * cos-descending order, ties → lowest index (the first nprobe rows of
    * the oracle's `row_number() OVER (ORDER BY cos DESC, cent_id ASC)`).
    * The corpus-as-queries IVF probe primitive — see [[NearestCells]]. */
  def nearestCells(vec: Column, cents: Array[Array[Double]], nprobe: Int): Column = {
    require(cents.nonEmpty, "cents must be non-empty")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(cents.forall(_.length == cents(0).length),
      s"all centroids must share one dimension, got lengths " +
        cents.map(_.length).distinct.mkString(","))
    val norms = cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    require(norms.forall(_ > 0),
      "zero-norm centroid: cosine against it is NaN, which the selection " +
        "would never take — drop empty cells or re-seed k-means first")
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(
      NearestCells(GraftInternal.expressionOf(vec), cents, norms, nprobe))
  }

  /** Codegen'd PQ-ADC LUT: all m·k codeword dot products in one tight loop,
    * book-major layout (`lut[b·k+c]`), codebooks as a plan reference (plan
    * size O(1) in m·k — see [[AdcLut]]). */
  def adcLut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    require(codebooks.nonEmpty, "codebooks must be non-empty")
    require(codebooks.forall(_.length == codebooks(0).length),
      s"all codebooks must have the same codeword count, got " +
        codebooks.map(_.length).distinct.mkString(","))
    require(codebooks(0).nonEmpty, "each codebook needs at least one codeword")
    require(codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
      s"all codewords must share one sub-dimension, got " +
        codebooks.flatMap(_.map(_.length)).distinct.mkString(","))
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(AdcLut(GraftInternal.expressionOf(vec), codebooks))
  }

  /** Codegen'd LUT-free PQ-ADC score from (query vector, candidate codes)
    * with the codebook tensor as a plan reference — the large-codebook
    * path where shipping the m·k LUT would dominate the join payload
    * (see [[AdcScore]]). Bit-identical to `element_at`-summing an
    * [[adcLut]] array. */
  def adcScore(vec: Column, codes: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    require(codebooks.nonEmpty, "codebooks must be non-empty")
    require(codebooks.forall(_.length == codebooks(0).length),
      s"all codebooks must have the same codeword count, got " +
        codebooks.map(_.length).distinct.mkString(","))
    require(codebooks(0).nonEmpty, "each codebook needs at least one codeword")
    require(codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
      s"all codewords must share one sub-dimension, got " +
        codebooks.flatMap(_.map(_.length)).distinct.mkString(","))
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(AdcScore(
      GraftInternal.expressionOf(vec), GraftInternal.expressionOf(codes), codebooks))
  }

  /** Codegen'd affine projection `mat·(x − shift)` (k×d matrix as a plan
    * reference): the PCA-transform / whitening / random-projection
    * primitive. Returns `array<double>` of length `mat.length`. */
  def affineProject(vec: Column, shift: Array[Double], mat: Array[Array[Double]]): Column = {
    require(mat.nonEmpty, "mat must be non-empty")
    require(mat.forall(_.length == shift.length),
      s"every mat row must have length ${shift.length}, got " +
        mat.map(_.length).distinct.mkString(","))
    import org.apache.spark.sql.GraftInternal
    GraftInternal.columnOf(
      AffineProject(GraftInternal.expressionOf(vec), shift, mat))
  }
}
