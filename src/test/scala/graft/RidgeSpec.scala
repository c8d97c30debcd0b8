package graft

import breeze.linalg.{DenseMatrix, DenseVector, inv => binv, trace}

import graft.reg.{Dbreg, Ridge}

/** Ridge correctness: checked against an independent driver-side solve on
  * the collected rows (materialized centered design, explicit penalized
  * normal equations — no shared code with the engine's moments path).
  */
class RidgeSpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private val rows = (1 to 400).map { i =>
    val x1 = rng.nextDouble() * 10
    val x2 = 0.5 * x1 + rng.nextGaussian() // correlated with x1
    val y = 2.0 + 1.5 * x1 - 0.8 * x2 + rng.nextGaussian()
    (y, x1, x2)
  }
  private lazy val df = rows.toDF("y", "x1", "x2")

  /** Reference: centered design, (A + λD)β = b solved densely. */
  private def refRidge(lambda: Double, standardize: Boolean)
      : (Double, DenseVector[Double], Double, Double) = {
    val n = rows.length.toDouble
    val p = 2
    val xs = rows.map(r => Array(r._2, r._3)).toArray
    val ys = rows.map(_._1).toArray
    val xbar = Array.tabulate(p)(j => xs.map(_(j)).sum / n)
    val ybar = ys.sum / n
    val a = DenseMatrix.tabulate(p, p)((i, j) =>
      xs.map(r => (r(i) - xbar(i)) * (r(j) - xbar(j))).sum)
    val b = DenseVector.tabulate(p)(i =>
      xs.zip(ys).map { case (r, yv) => (r(i) - xbar(i)) * (yv - ybar) }.sum)
    val m = a.copy
    for (j <- 0 until p)
      m(j, j) += (if (standardize) lambda * a(j, j) / n else lambda)
    val minv = binv(m)
    val beta = minv * b
    val dfEff = trace(minv * a) + 1.0
    val resid = xs.zip(ys).map { case (r, yv) =>
      yv - ybar - (0 until p).map(j => beta(j) * (r(j) - xbar(j))).sum
    }
    val rss = resid.map(v => v * v).sum
    (ybar - (0 until p).map(j => beta(j) * xbar(j)).sum, beta, dfEff, rss)
  }

  test("lambda = 0 reproduces OLS") {
    val r = Ridge.fit("y ~ x1 + x2", df, lambda = 0.0)
    val ols = Dbreg.fit("y ~ x1 + x2", df, strategy = "moments")
    val olsCoef = ols.coeftable.map(c => c.term -> c.estimate).toMap
    r.terms.zip(r.estimates).foreach { case (t, e) =>
      assert(math.abs(e - olsCoef(t)) < 1e-8, s"$t: $e vs ${olsCoef(t)}")
    }
    assert(math.abs(r.dfEff - 3.0) < 1e-8)
    assert(math.abs(r.rss - ols.rss) < 1e-6 * r.rss)
  }

  test("matches the independent dense solve, both penalty scales") {
    for (standardize <- Seq(true, false); lambda <- Seq(0.5, 10.0, 1000.0)) {
      val r = Ridge.fit("y ~ x1 + x2", df, lambda, standardize)
      val (b0, beta, dfEff, rss) = refRidge(lambda, standardize)
      assert(math.abs(r.estimates(0) - b0) < 1e-8, s"intercept λ=$lambda")
      assert(math.abs(r.estimates(1) - beta(0)) < 1e-8)
      assert(math.abs(r.estimates(2) - beta(1)) < 1e-8)
      assert(math.abs(r.dfEff - dfEff) < 1e-8)
      assert(math.abs(r.rss - rss) < 1e-6 * rss, s"rss λ=$lambda: ${r.rss} vs $rss")
    }
  }

  test("path from one pass equals per-lambda fits; df shrinks toward 1") {
    val lambdas = Seq(0.0, 1.0, 100.0, 1e8)
    val path = Ridge.path("y ~ x1 + x2", df, lambdas)
    lambdas.zip(path).foreach { case (l, pf) =>
      val single = Ridge.fit("y ~ x1 + x2", df, l)
      assert(pf.estimates == single.estimates)
    }
    // effective df decreases monotonically from p+1 toward 1
    val dfs = path.map(_.dfEff)
    assert(dfs.zip(dfs.tail).forall { case (hi, lo) => hi >= lo - 1e-12 })
    assert(math.abs(dfs.head - 3.0) < 1e-8)
    assert(dfs.last < 1.05)
    // at huge λ the slopes vanish and the fit degenerates to ȳ
    val big = path.last
    assert(math.abs(big.estimates(1)) < 1e-3)
    assert(math.abs(big.estimates(2)) < 1e-3)
    assert(math.abs(big.rss - big.tss) < 1e-3 * big.tss)
  }

  test("constant column is dropped, not penalized into the fit") {
    val dfc = rows.map(r => (r._1, r._2, 1.0)).toDF("y", "x1", "c")
    val r = Ridge.fit("y ~ x1 + c", dfc, lambda = 5.0)
    assert(r.estimates(r.terms.indexOf("c")) == 0.0)
    // slope for x1 matches the 1-regressor ridge
    val r1 = Ridge.fit("y ~ x1", rows.map(r => (r._1, r._2)).toDF("y", "x1"), 5.0)
    assert(math.abs(r.estimates(r.terms.indexOf("x1")) -
      r1.estimates(r1.terms.indexOf("x1"))) < 1e-10)
  }

  test("fitGrouped equals per-group Ridge.fit") {
    val grouped = rows.zipWithIndex.map { case ((y, x1, x2), i) =>
      (if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c", y, x1, x2)
    }
    val gdf = grouped.toDF("g", "y", "x1", "x2")
    val out = Ridge.fitGrouped("y ~ x1 + x2", gdf, "g", lambda = 25.0)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getDouble(4))))
      .toMap
    for (g <- Seq("a", "b", "c")) {
      val sub = grouped.filter(_._1 == g).map(t => (t._2, t._3, t._4))
        .toDF("y", "x1", "x2")
      val single = Ridge.fit("y ~ x1 + x2", sub, lambda = 25.0)
      single.terms.zip(single.estimates).foreach { case (t, e) =>
        val (est, dfEff) = out((g, t))
        assert(math.abs(est - e) < 1e-9, s"group $g term $t")
        assert(math.abs(dfEff - single.dfEff) < 1e-9)
      }
    }
    assert(out.size == 9)
  }

  test("gcv is minimized at an interior lambda on collinear noisy data") {
    // strongly collinear design where some shrinkage must help GCV
    val rng2 = new scala.util.Random(11)
    val noisy = (1 to 120).map { _ =>
      val x1 = rng2.nextGaussian()
      val x2 = x1 + 0.01 * rng2.nextGaussian()
      (1.0 + x1 + x2 + rng2.nextGaussian() * 2.0, x1, x2)
    }.toDF("y", "x1", "x2")
    val lambdas = Seq(0.0, 0.01, 0.1, 1.0, 10.0, 100.0)
    val path = Ridge.path("y ~ x1 + x2", noisy, lambdas)
    val best = path.minBy(_.gcv)
    assert(best.lambda > 0.0, "GCV should prefer some shrinkage here")
  }
}
