package graft

import breeze.linalg.{DenseMatrix, DenseVector, inv => binv}

import graft.reg.{Dbreg, Rlm}

/** Huber/IRLS correctness: checked against an independent driver-side
  * implementation on the collected rows (materialized design, explicit
  * reweighted solves and sandwich — no shared code with the engine's
  * aggregation path).
  */
class RlmSpec extends SparkTestBase {
  import spark.implicits._

  // clean linear signal plus a block of gross y-outliers
  private val rng = new scala.util.Random(42)
  private val clean = (1 to 300).map { _ =>
    val x = rng.nextDouble() * 10
    (3.0 + 2.0 * x + rng.nextGaussian(), x)
  }
  private val outliers = (1 to 20).map { _ =>
    val x = rng.nextDouble() * 10
    (200.0 + 50.0 * rng.nextGaussian(), x)
  }
  private val rows = clean ++ outliers
  private lazy val df = rows.toDF("y", "x")

  /** κ(k) = E[min(|Z|,k)²] by Simpson quadrature of 2∫₀ᵏ z²φ(z)dz
    * + 2k²(1−Φ(k)) — numerically, independent of the engine's closed form. */
  private def kappaNum(k: Double): Double = {
    def phi(z: Double) = math.exp(-z * z / 2.0) / math.sqrt(2.0 * math.Pi)
    val m = 20000
    val h = k / m
    var inner = 0.0
    for (i <- 0 until m) {
      val a = i * h; val b = a + h; val c = (a + b) / 2
      inner += h / 6.0 * (a * a * phi(a) + 4 * c * c * phi(c) + b * b * phi(b))
    }
    // tail P(|Z|>k) by quadrature of φ out to k+12σ
    val tailEnd = k + 12.0
    var tail = 0.0
    val m2 = 40000
    val h2 = (tailEnd - k) / m2
    for (i <- 0 until m2) {
      val a = k + i * h2; val b = a + h2; val c = (a + b) / 2
      tail += h2 / 6.0 * (phi(a) + 4 * phi(c) + phi(b))
    }
    2.0 * inner + 2.0 * k * k * tail
  }

  /** Reference: OLS init, `iters` Huber reweighted solves with the
    * Proposal-2 scale update, A⁻¹BA⁻¹·n/(n−p) sandwich. */
  private def refHuber(data: Seq[(Double, Double)], k: Double, iters: Int)
      : (DenseVector[Double], DenseVector[Double], Double) = {
    val n = data.length.toDouble
    val xs = data.map { case (_, x) => Array(1.0, x) }.toArray
    val ys = data.map(_._1).toArray
    def wls(ws: Array[Double]): DenseVector[Double] = {
      val xtx = DenseMatrix.zeros[Double](2, 2)
      val xty = DenseVector.zeros[Double](2)
      for (r <- xs.indices; i <- 0 until 2) {
        xty(i) += ws(r) * xs(r)(i) * ys(r)
        for (j <- 0 until 2) xtx(i, j) += ws(r) * xs(r)(i) * xs(r)(j)
      }
      binv(xtx) * xty
    }
    var beta = wls(Array.fill(xs.length)(1.0))
    val rss = xs.indices.map { r =>
      val e = ys(r) - beta(0) - beta(1) * xs(r)(1); e * e
    }.sum
    var sigma = math.sqrt(rss / (n - 2))
    val kap = kappaNum(k)
    for (_ <- 1 to iters) {
      val band = k * sigma
      val resids = xs.indices.map(r => ys(r) - beta(0) - beta(1) * xs(r)(1))
      val ws = resids.map { e =>
        if (math.abs(e) <= band) 1.0 else band / math.abs(e)
      }.toArray
      val clip2 = resids.map(e => math.pow(math.min(math.abs(e), band), 2)).sum
      beta = wls(ws)
      sigma = math.sqrt(clip2 / ((n - 2) * kap))
    }
    val band = k * sigma
    val aM = DenseMatrix.zeros[Double](2, 2)
    val bM = DenseMatrix.zeros[Double](2, 2)
    for (r <- xs.indices) {
      val e = ys(r) - beta(0) - beta(1) * xs(r)(1)
      val ins = math.abs(e) <= band
      val psi = if (ins) e else band * math.signum(e)
      for (i <- 0 until 2; j <- 0 until 2) {
        if (ins) aM(i, j) += xs(r)(i) * xs(r)(j)
        bM(i, j) += psi * psi * xs(r)(i) * xs(r)(j)
      }
    }
    val aInv = binv(aM)
    val v = (aInv * bM * aInv) * (n / (n - 2))
    (beta, DenseVector(math.sqrt(v(0, 0)), math.sqrt(v(1, 1))), sigma)
  }

  test("matches the independent IRLS + sandwich, several k and iteration counts") {
    for (k <- Seq(1.345, 2.0); iters <- Seq(1, 3, 6)) {
      val fit = Rlm.fit("y ~ x", df, k = k, maxIter = iters, tol = 0.0)
      val (beta, se, sigma) = refHuber(rows, k, iters)
      assert(math.abs(fit.sigma - sigma) < 1e-8 * sigma)
      val c = fit.coef
      assert(math.abs(c("(Intercept)") - beta(0)) < 1e-7, s"b0 k=$k iters=$iters")
      assert(math.abs(c("x") - beta(1)) < 1e-7)
      val s = fit.se
      assert(math.abs(s("(Intercept)") - se(0)) < 1e-6 * se(0))
      assert(math.abs(s("x") - se(1)) < 1e-6 * se(1))
      assert(fit.iterations == iters)
    }
  }

  test("robust to gross outliers where OLS is not") {
    val fit = Rlm.fit("y ~ x", df, maxIter = 100)
    val ols = Dbreg.fit("y ~ x", df, strategy = "moments")
    val huberSlope = fit.coef("x")
    val olsSlope = ols.coef("x")
    // true slope is 2; the outlier block drags OLS far away
    assert(math.abs(huberSlope - 2.0) < 0.3, s"huber slope $huberSlope")
    assert(math.abs(olsSlope - 2.0) > 1.0, s"ols slope $olsSlope should be contaminated")
    assert(fit.converged)
    assert(fit.insideFrac > 0.8 && fit.insideFrac < 1.0)
  }

  test("with no outliers and a huge band, equals OLS") {
    val cleanDf = clean.toDF("y", "x")
    val fit = Rlm.fit("y ~ x", cleanDf, k = 100.0, maxIter = 3, tol = 0.0)
    val ols = Dbreg.fit("y ~ x", cleanDf, strategy = "moments")
    assert(math.abs(fit.coef("x") - ols.coef("x")) < 1e-9)
    assert(math.abs(fit.coef("(Intercept)") - ols.coef("(Intercept)")) < 1e-9)
    assert(fit.insideFrac == 1.0)
  }

  test("user-supplied scale overrides the OLS estimate") {
    val fit = Rlm.fit("y ~ x", df, maxIter = 2, tol = 0.0, scale = Some(5.0))
    assert(fit.sigma == 5.0)
  }

  test("collinear column dropped at init and reported") {
    val dup = rows.map { case (y, x) => (y, x, x * 2.0) }.toDF("y", "x", "x2")
    val fit = Rlm.fit("y ~ x + x2", dup, maxIter = 3, tol = 0.0)
    assert(fit.collinDropped == Seq("x2"))
    assert(fit.coef.contains("x"))
  }

  test("sqlOnly renders one statement with the expected iteration count") {
    val sql = Rlm.sqlOnly("lineitem", "l_quantity", "l_extendedprice", iters = 3)
    assert(sql.startsWith("WITH "))
    assert(sql.contains("f3"))
    assert(!sql.contains("f4"))
    assert(sql.contains("CROSS JOIN f2"))
    assert(sql.contains("sand AS"))
  }
}
