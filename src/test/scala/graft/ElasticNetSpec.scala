package graft

import graft.reg.{ElasticNet, Ridge}

/** Elastic-net correctness: an independent driver-side coordinate descent
  * on the materialized centered design, KKT optimality conditions, and the
  * α=0 ≡ ridge cross-check (two different algorithms, same optimum).
  */
class ElasticNetSpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(19)
  private val rows = (1 to 500).map { _ =>
    val x1 = rng.nextDouble() * 10
    val x2 = 0.6 * x1 + rng.nextGaussian() * 2.0
    val x3 = rng.nextGaussian() // pure noise regressor
    val y = 1.0 + 2.0 * x1 - 1.0 * x2 + rng.nextGaussian()
    (y, x1, x2, x3)
  }
  private lazy val df = rows.toDF("y", "x1", "x2", "x3")

  /** Independent cyclic CD on centered data, fixed sweeps from 0. */
  private def refCd(lambda: Double, alpha: Double, sweeps: Int): Array[Double] = {
    val n = rows.length.toDouble
    val p = 3
    val xs = rows.map(r => Array(r._2, r._3, r._4)).toArray
    val ys = rows.map(_._1).toArray
    val xbar = Array.tabulate(p)(j => xs.map(_(j)).sum / n)
    val ybar = ys.sum / n
    val a = Array.tabulate(p, p)((i, j) =>
      xs.map(r => (r(i) - xbar(i)) * (r(j) - xbar(j))).sum)
    val b = Array.tabulate(p)(i =>
      xs.zip(ys).map { case (r, yv) => (r(i) - xbar(i)) * (yv - ybar) }.sum)
    val s = Array.tabulate(p)(j => math.sqrt(a(j)(j) / n))
    val beta = Array.fill(p)(0.0)
    for (_ <- 1 to sweeps; j <- 0 until p) {
      val z = b(j) - (0 until p).filter(_ != j).map(k => a(j)(k) * beta(k)).sum
      val thr = lambda * alpha * s(j)
      val denom = a(j)(j) + lambda * (1.0 - alpha) * s(j) * s(j)
      beta(j) = math.signum(z) * math.max(math.abs(z) - thr, 0.0) / denom
    }
    val b0 = ybar - (0 until p).map(j => beta(j) * xbar(j)).sum
    b0 +: beta
  }

  test("fixed sweeps match the independent coordinate descent") {
    for (alpha <- Seq(1.0, 0.5); lambda <- Seq(10.0, 500.0); sweeps <- Seq(1, 5)) {
      val fit = ElasticNet.fit("y ~ x1 + x2 + x3", df, lambda, alpha,
        maxIter = sweeps, tol = 0.0)
      val ref = refCd(lambda, alpha, sweeps)
      for (i <- 0 to 3)
        assert(math.abs(fit.estimates(i) - ref(i)) < 1e-9,
          s"coef $i α=$alpha λ=$lambda sweeps=$sweeps: ${fit.estimates(i)} vs ${ref(i)}")
      assert(fit.iterations == sweeps)
    }
  }

  test("alpha = 0 converges to the ridge solution (different algorithm)") {
    for (lambda <- Seq(1.0, 100.0)) {
      val en = ElasticNet.fit("y ~ x1 + x2 + x3", df, lambda, alpha = 0.0,
        maxIter = 20000, tol = 1e-14)
      val r = Ridge.fit("y ~ x1 + x2 + x3", df, lambda)
      for (i <- 0 to 3)
        assert(math.abs(en.estimates(i) - r.estimates(i)) < 1e-7,
          s"coef $i λ=$lambda: ${en.estimates(i)} vs ${r.estimates(i)}")
      assert(en.converged)
    }
  }

  test("KKT optimality holds at lasso convergence") {
    val lambda = 300.0
    val fit = ElasticNet.fit("y ~ x1 + x2 + x3", df, lambda, alpha = 1.0,
      maxIter = 20000, tol = 1e-14)
    // rebuild centered sums
    val n = rows.length.toDouble
    val p = 3
    val xs = rows.map(r => Array(r._2, r._3, r._4)).toArray
    val ys = rows.map(_._1).toArray
    val xbar = Array.tabulate(p)(j => xs.map(_(j)).sum / n)
    val ybar = ys.sum / n
    val a = Array.tabulate(p, p)((i, j) =>
      xs.map(r => (r(i) - xbar(i)) * (r(j) - xbar(j))).sum)
    val b = Array.tabulate(p)(i =>
      xs.zip(ys).map { case (r, yv) => (r(i) - xbar(i)) * (yv - ybar) }.sum)
    val s = Array.tabulate(p)(j => math.sqrt(a(j)(j) / n))
    val beta = fit.estimates.drop(1).toArray
    for (j <- 0 until p) {
      val grad = b(j) - (0 until p).map(k => a(j)(k) * beta(k)).sum
      if (beta(j) == 0.0)
        assert(math.abs(grad) <= lambda * s(j) * (1 + 1e-8), s"inactive KKT $j")
      else
        assert(math.abs(grad - lambda * s(j) * math.signum(beta(j))) <
          1e-6 * lambda * s(j), s"active KKT $j")
    }
  }

  test("lasso zeroes the noise regressor at moderate lambda") {
    val fit = ElasticNet.fit("y ~ x1 + x2 + x3", df, lambda = 1000.0,
      alpha = 1.0, maxIter = 20000, tol = 1e-14)
    assert(fit.coef("x3") == 0.0, s"noise coef ${fit.coef("x3")}")
    assert(fit.coef("x1") != 0.0)
    assert(fit.nonzero < 3)
  }

  test("huge lambda gives the null model; path warm start equals cold fits") {
    val lambdas = Seq(1e9, 5000.0, 500.0, 10.0) // descending, glmnet-style
    val path = ElasticNet.path("y ~ x1 + x2 + x3", df, lambdas,
      maxIter = 20000, tol = 1e-14)
    assert(path.head.nonzero == 0)
    assert(math.abs(path.head.estimates(0) - rows.map(_._1).sum / rows.length) < 1e-9)
    lambdas.zip(path).foreach { case (l, pf) =>
      val cold = ElasticNet.fit("y ~ x1 + x2 + x3", df, l,
        maxIter = 20000, tol = 1e-14)
      for (i <- 0 to 3)
        assert(math.abs(pf.estimates(i) - cold.estimates(i)) < 1e-7,
          s"λ=$l coef $i")
    }
    // rss decreases as λ relaxes
    val rsss = path.map(_.rss)
    assert(rsss.zip(rsss.tail).forall { case (hi, lo) => hi >= lo - 1e-9 })
  }

  test("constant column is pinned at zero") {
    val dfc = rows.map(r => (r._1, r._2, 7.0)).toDF("y", "x1", "c")
    val fit = ElasticNet.fit("y ~ x1 + c", dfc, lambda = 10.0,
      maxIter = 1000, tol = 1e-12)
    assert(fit.coef("c") == 0.0)
  }
}
