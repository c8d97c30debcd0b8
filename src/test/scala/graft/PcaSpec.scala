package graft

import breeze.linalg.{eigSym, DenseMatrix}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs
import graft.pipeline.Pca

/** PCA correctness against an independent driver-side eigendecomposition of
  * the materialized covariance (collected rows, no shared code with the
  * engine's one-pass kernel), on the real 64-dim embeddings table.
  */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private val Dim = 64
  private lazy val emb = sf("sf0.001", "embeddings")
  private lazy val vecs: Array[Array[Double]] = emb
    .select("embedding").collect()
    .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  private def refCov(): (Array[Double], DenseMatrix[Double]) = {
    val n = vecs.length.toDouble
    val mean = Array.tabulate(Dim)(i => vecs.map(_(i)).sum / n)
    val cov = DenseMatrix.tabulate(Dim, Dim)((i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1.0))
    (mean, cov)
  }

  test("one-pass fit matches the dense eigendecomposition (64-dim, fused kernel)") {
    val model = Pca.fit(emb, "embedding", Dim, k = 8)
    val (mean, cov) = refCov()
    val es = eigSym(cov)
    val order = (0 until Dim).sortBy(i => -es.eigenvalues(i))
    for (i <- 0 until Dim)
      assert(math.abs(model.mean(i) - mean(i)) < 1e-10)
    for (r <- 0 until Dim)
      assert(math.abs(model.eigenvalues(r) - es.eigenvalues(order(r))) < 1e-10,
        s"eigenvalue $r")
    // components match up to the engine's sign convention
    for (r <- 0 until 8) {
      val ref0 = Array.tabulate(Dim)(i => es.eigenvectors(i, order(r)))
      var best = 0
      for (i <- 1 until Dim) if (math.abs(ref0(i)) > math.abs(ref0(best))) best = i
      val ref = if (ref0(best) < 0) ref0.map(-_) else ref0
      for (i <- 0 until Dim)
        assert(math.abs(model.components(r)(i) - ref(i)) < 1e-8, s"component $r elem $i")
    }
    assert(model.n == vecs.length)
    // components are orthonormal
    for (a <- 0 until 8; b <- a until 8) {
      val dot = (0 until Dim).map(i => model.components(a)(i) * model.components(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-10)
    }
  }

  test("projected score variance equals the eigenvalue; scores are uncorrelated") {
    val model = Pca.fit(emb, "embedding", Dim, k = 4)
    val scores = model.transform(emb, "embedding", "pc")
      .select("pc").collect().map(_.getSeq[Double](0).toArray)
    val n = scores.length.toDouble
    for (j <- 0 until 4) {
      val m = scores.map(_(j)).sum / n
      val v = scores.map(s => (s(j) - m) * (s(j) - m)).sum / (n - 1.0)
      assert(math.abs(v - model.eigenvalues(j)) < 1e-8 * model.eigenvalues(j),
        s"variance of PC$j")
      assert(math.abs(m) < 1e-10, s"mean of PC$j") // centered
    }
    val c01 = scores.map(s => s(0) * s(1)).sum / (n - 1.0)
    assert(math.abs(c01) < 1e-8)
  }

  test("k = d projection is an isometry (pairwise distances preserved)") {
    val model = Pca.fit(emb, "embedding", Dim, k = Dim)
    val proj = model.transform(emb.limit(10), "embedding", "pc")
      .select("embedding", "pc").collect()
      .map(r => (r.getSeq[Float](0).map(_.toDouble).toArray, r.getSeq[Double](1).toArray))
    for (a <- proj.indices; b <- a + 1 until proj.length) {
      val d0 = math.sqrt((0 until Dim).map(i =>
        math.pow(proj(a)._1(i) - proj(b)._1(i), 2)).sum)
      val d1 = math.sqrt((0 until Dim).map(i =>
        math.pow(proj(a)._2(i) - proj(b)._2(i), 2)).sum)
      assert(math.abs(d0 - d1) < 1e-9, s"distance $a-$b")
    }
  }

  test("explained variance is descending and sums to the top-k share") {
    val model = Pca.fit(emb, "embedding", Dim, k = 8)
    val ev = model.explainedVariance
    assert(ev.zip(ev.tail).forall { case (hi, lo) => hi >= lo })
    assert(ev.sum > 0.0 && ev.sum <= 1.0 + 1e-12)
    assert(math.abs(ev.sum -
      model.eigenvalues.take(8).sum / model.eigenvalues.sum) < 1e-12)
  }

  test("fitCols + transformCols round-trip on scalar columns") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 200).map { _ =>
      val a = rng.nextGaussian(); (a, 2.0 * a + 0.1 * rng.nextGaussian())
    }
    val df = rows.toDF("a", "b")
    val model = Pca.fitCols(df, Seq("a", "b"), k = 1)
    // dominant direction ≈ (1, 2)/√5, sign-fixed so the largest loading > 0
    val v = model.components(0)
    assert(v(1) > 0)
    assert(math.abs(v(1) / v(0) - 2.0) < 0.1)
    val out = Pca.transformCols(df, Seq("a", "b"), model, "pc")
      .select("pc").collect().map(_.getSeq[Double](0).head)
    assert(out.length == 200)
    val n = out.length.toDouble
    val variance = out.map(x => x * x).sum / (n - 1.0) // scores are centered
    assert(math.abs(variance - model.eigenvalues(0)) < 1e-8 * model.eigenvalues(0))
  }

  test("affineProject: null array -> null, null element -> null, dim mismatch throws") {
    val good = Seq((1, Seq(1.0f, 2.0f)), (2, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "v")
    val shift = Array(0.5, 0.5)
    val mat = Array(Array(1.0, 1.0), Array(1.0, -1.0))
    val res = good.select(col("id"),
        VectorExprs.affineProject(col("v"), shift, mat).as("p"))
      .orderBy("id").collect()
    assert(res(0).getSeq[Double](1) == Seq(2.0, -1.0))
    assert(res(1).isNullAt(1))
    val withNullElem = Seq((1, Seq(Some(1.0), None))).toDF("id", "v")
    val r2 = withNullElem.select(
      VectorExprs.affineProject(col("v"), shift, mat).as("p")).collect()
    assert(r2(0).isNullAt(0))
    val bad = Seq((1, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val e = intercept[Throwable] { // surfaces directly or wrapped in SparkException
      bad.select(VectorExprs.affineProject(col("v"), shift, mat)).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      t.getMessage != null && t.getMessage.contains("affine_project")))
  }
}
