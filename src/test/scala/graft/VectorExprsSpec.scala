package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** The native DotProduct expression must be BIT-identical to the HOF
  * spelling it replaced (same accumulation order), and honor the HOF's
  * null semantics. */
class VectorExprsSpec extends SparkTestBase {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the aggregate/zip_with spelling on float arrays") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rng.nextFloat() * 2 - 1),
      Array.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorExprs.dotProduct(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("mixed float/double (literal centroid) matches, and codegen survives wide use") {
    val rng = new scala.util.Random(8)
    val cent = Array.fill(64)(rng.nextDouble() - 0.5)
    val df = Seq.fill(20)(Array.fill(64)(rng.nextFloat())).toDF("a")
    val got = df.select(
      VectorExprs.dotProduct(col("a"), typedLit(cent)).as("native"),
      hofDot(col("a"), typedLit(cent)).as("hof")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array, length mismatch, and null element give NULL") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))), // 11.0
      (None, Some(Seq(1.0f))),                        // null input
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f)))        // length mismatch
    ).toDF("a", "b")
    val got = df.select(VectorExprs.dotProduct(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT array(1.0D, NULL) AS a, array(1.0D, 2.0D) AS b")
    assert(withNullElem.select(VectorExprs.dotProduct(col("a"), col("b")))
      .collect()(0).isNullAt(0))
  }

  test("nearestCentroid matches a driver-side argmax at k=300, ties to lowest") {
    val rng = new scala.util.Random(9)
    val k = 300 // the regime the old k-literal spelling could not compile
    val d = 32
    val cents = Array.fill(k)(Array.fill(d)(rng.nextDouble() - 0.5))
    val vecs = Seq.fill(200)(Array.fill(d)(rng.nextFloat() * 2 - 1))
    def expected(v: Array[Float]): Int = {
      val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
      val cos = cents.map { c =>
        val dot = v.zip(c).map { case (x, y) => x.toDouble * y }.sum
        dot / (nv * math.sqrt(c.map(x => x * x).sum))
      }
      cos.indexOf(cos.max) // indexOf -> first (lowest) on ties
    }
    val got = vecs.toDF("v")
      .select(VectorExprs.nearestCentroid(col("v"), cents))
      .collect().map(_.getInt(0))
    vecs.zip(got).foreach { case (v, g) =>
      assert(g == expected(v), s"vec ${v.take(3).mkString(",")}...")
    }
    // exact tie: duplicate centroid -> the lower index wins
    val dup = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val tied = Seq(Array(2.0f, 0.0f)).toDF("v")
      .select(VectorExprs.nearestCentroid(col("v"), dup))
      .collect()(0).getInt(0)
    assert(tied == 0)
  }

  test("nearestCentroid fails fast on zero-norm and ragged centroids") {
    // zero-norm centroid: cosine NaN can never win argmax, so building the
    // expression at all is the bug — must be rejected eagerly
    val zero = intercept[IllegalArgumentException] {
      VectorExprs.nearestCentroid(col("v"), Array(Array(1.0, 0.0), Array(0.0, 0.0)))
    }
    assert(zero.getMessage.contains("zero-norm"))
    val ragged = intercept[IllegalArgumentException] {
      VectorExprs.nearestCentroid(col("v"), Array(Array(1.0, 0.0), Array(1.0)))
    }
    assert(ragged.getMessage.contains("dimension"))
  }

  test("nearestCentroid fails fast on a vector/centroid dimension mismatch") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val err = intercept[Exception] {
      Seq(Array(1.0f, 2.0f, 3.0f)).toDF("v")
        .select(VectorExprs.nearestCentroid(col("v"), cents))
        .collect()
    }
    // surfaced either directly or wrapped in a SparkException cause chain
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.getMessage != null) &&
      chain(err).exists(t =>
        t.getMessage != null && t.getMessage.contains("3 elements but centroids have 2")))
  }

  test("NearestCentroid equality is deep (canonicalization-safe) over array fields") {
    import graft.functions.NearestCentroid
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val childExpr = BoundReference(0, ArrayType(DoubleType), nullable = true)
    def mk() = NearestCentroid(
      childExpr,
      Array(Array(1.0, 2.0), Array(3.0, 4.0)),
      Array(math.sqrt(5.0), math.sqrt(25.0)))
    val a = mk(); val b = mk()
    assert(a == b, "semantically identical instances must compare equal")
    assert(a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    val c = NearestCentroid(childExpr,
      Array(Array(1.0, 2.0), Array(3.0, 5.0)),
      Array(math.sqrt(5.0), math.sqrt(34.0)))
    assert(a != c)
  }

  test("adcLut is bit-identical to the m·k zip_with/aggregate HOF spelling") {
    val rng = new scala.util.Random(11)
    val m = 4; val kc = 5; val sub = 8
    val books = Array.fill(m, kc, sub)(rng.nextDouble() - 0.5)
    val df = Seq.fill(20)(Array.fill(m * sub)(rng.nextFloat())).toDF("v")
    // the previous implementation: one HOF aggregate per LUT entry
    val hofLut = array((for (b <- 0 until m; c <- 0 until kc) yield {
      aggregate(
        zip_with(
          slice(col("v"), b * sub + 1, sub),
          array(books(b)(c).toIndexedSeq.map(lit(_)): _*),
          (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
    }): _*)
    val got = df.select(
      VectorExprs.adcLut(col("v"), books).as("native"), hofLut.as("hof")).collect()
    got.foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      assert(a.length == m * kc && b.length == m * kc)
      a.zip(b).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y))
      }
    }
  }

  test("adcScore is bit-identical to element_at sums over the adcLut array") {
    val rng = new scala.util.Random(12)
    val m = 3; val kc = 7; val sub = 4
    val books = Array.fill(m, kc, sub)(rng.nextDouble() - 0.5)
    val df = Seq.fill(25)((
      Array.fill(m * sub)(rng.nextFloat()),
      Array.fill(m)(rng.nextInt(kc)))).toDF("v", "codes")
    val viaLut = (0 until m)
      .map(b => element_at(VectorExprs.adcLut(col("v"), books),
        lit(b * kc + 1) + element_at(col("codes"), b + 1)))
      .reduce(_ + _)
    val got = df.select(
      VectorExprs.adcScore(col("v"), col("codes"), books).as("native"),
      viaLut.as("lut")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("adcLut/adcScore null and validation behavior") {
    val books = Array.fill(2, 3, 2)(0.5)
    val dfNull = Seq((null.asInstanceOf[Array[Double]], Array(0, 1)))
      .toDF("v", "codes")
    val r = dfNull.select(
      VectorExprs.adcLut(col("v"), books),
      VectorExprs.adcScore(col("v"), col("codes"), books)).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    // wrong vector length fails fast rather than truncating
    val bad = Seq((Array(1.0, 2.0, 3.0), Array(0, 1))).toDF("v", "codes")
    val e1 = intercept[Exception] {
      bad.select(VectorExprs.adcLut(col("v"), books)).collect()
    }
    assert(e1.getMessage.contains("adc_lut") ||
      e1.getCause != null && e1.getCause.getMessage.contains("adc_lut"))
    // out-of-range code fails fast
    val oob = Seq((Array(1.0, 2.0, 3.0, 4.0), Array(0, 9))).toDF("v", "codes")
    val e2 = intercept[Exception] {
      oob.select(VectorExprs.adcScore(col("v"), col("codes"), books)).collect()
    }
    assert(e2.getMessage.contains("adc_score") ||
      e2.getCause != null && e2.getCause.getMessage.contains("adc_score"))
    // ragged codebooks are rejected at construction
    intercept[IllegalArgumentException] {
      VectorExprs.adcLut(col("v"), Array(Array(Array(1.0)), Array(Array(1.0, 2.0))))
    }
  }

  test("meanPool equals the collected per-group mean; misfit rows skipped") {
    import graft.pipeline.Similarity
    val emb = sf("sf0.001", "embeddings")
    val pooled = Similarity.meanPool(emb, "label", "embedding", dim = 64)
      .collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Double](2).toArray)))
      .toMap
    val truth = emb.select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .groupBy(_._1)
    assert(pooled.keySet == truth.keySet)
    truth.foreach { case (label, rows) =>
      val (n, centroid) = pooled(label)
      assert(n == rows.length)
      for (i <- 0 until 64) {
        val want = rows.map(_._2(i)).sum / rows.length
        assert(math.abs(centroid(i) - want) < 1e-12, s"label $label dim $i")
      }
    }

    // null vectors and wrong-dimension vectors are excluded from n
    val mixed = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)),
      (1, null.asInstanceOf[Seq[Float]]), (1, Seq(9.0f)))
      .toDF("g", "v").repartition(4)
    val out = Similarity.meanPool(mixed, "g", "v", dim = 2).collect()(0)
    assert(out.getLong(1) == 2L)
    assert(out.getSeq[Double](2) == Seq(2.0, 3.0))
  }
}
