package graft

import org.apache.spark.sql.functions._
import graft.reg.Qreg

/** Quantile regression: check-loss optimality, known-quantile recovery,
  * robustness vs OLS, monotone quantile lines, Powell SEs against the
  * iid-error asymptotic formula, and the degenerate/edge contracts. */
class QregSpec extends SparkTestBase {
  import spark.implicits._

  private def pinball(df: org.apache.spark.sql.DataFrame, tau: Double,
      b0: Double, b1: Double): Double = {
    val r = col("y") - (lit(b0) + lit(b1) * col("x"))
    df.select(sum(when(r >= 0, lit(tau) * r).otherwise(lit(tau - 1.0) * r)))
      .collect()(0).getDouble(0)
  }

  // y = 2 + 3x + uniform(−1,1) noise: all conditional quantiles share the
  // slope 3; the τ-intercept is 2 + (2τ − 1)
  private lazy val uniformData = {
    val rng = new scala.util.Random(42)
    (1 to 4000).map { _ =>
      val x = rng.nextDouble() * 4.0
      (x, 2.0 + 3.0 * x + (rng.nextDouble() * 2.0 - 1.0))
    }.toDF("x", "y")
  }

  test("known-quantile recovery and monotone quantile lines on uniform noise") {
    // tol=1e-6: the eps-floored IRLS surrogate oscillates below ~1e-7
    // relative as rows cross the |r|<eps band — the documented smoothing
    // granularity, not a fit failure
    val fits = Seq(0.25, 0.5, 0.75).map(t =>
      t -> Qreg.fit("y ~ x", uniformData, tau = t, tol = 1e-6, maxIter = 300))
    fits.foreach { case (t, fit) =>
      assert(math.abs(fit.coef("x") - 3.0) < 0.1, s"slope at tau=$t: ${fit.coef("x")}")
      val want = 2.0 + (2.0 * t - 1.0)
      assert(math.abs(fit.coef("(Intercept)") - want) < 0.12,
        s"intercept at tau=$t: ${fit.coef("(Intercept)")} want $want")
      assert(fit.converged, s"not converged at tau=$t after ${fit.iterations} sweeps")
      assert(fit.nobs === 4000L)
    }
    val icpts = fits.map(_._2.coef("(Intercept)"))
    assert(icpts(0) < icpts(1) && icpts(1) < icpts(2))
  }

  test("fitted beta is a local minimum of the empirical check loss") {
    val fit = Qreg.fit("y ~ x", uniformData, tau = 0.7)
    val b0 = fit.coef("(Intercept)"); val b1 = fit.coef("x")
    val at = pinball(uniformData, 0.7, b0, b1)
    for (d0 <- Seq(-0.05, 0.05); d1 <- Seq(-0.02, 0.0, 0.02)) {
      if (d0 != 0.0 || d1 != 0.0)
        assert(at <= pinball(uniformData, 0.7, b0 + d0, b1 + d1) + 1e-9,
          s"perturbation ($d0,$d1) lowered the loss")
    }
    assert(math.abs(fit.pinball - at / 4000.0) < 1e-12)
  }

  test("median fit shrugs off one-sided outliers that drag OLS") {
    val rng = new scala.util.Random(7)
    val clean = (1 to 900).map { _ =>
      val x = rng.nextDouble() * 4.0
      (x, 1.0 + 2.0 * x + (rng.nextDouble() - 0.5))
    }
    val outliers = (1 to 100).map { _ =>
      val x = rng.nextDouble() * 4.0
      (x, 1.0 + 2.0 * x + 50.0 + rng.nextDouble() * 10.0)
    }
    val df = (clean ++ outliers).toDF("x", "y")
    val med = Qreg.fit("y ~ x", df, tau = 0.5)
    val ols = graft.reg.Dbreg.fit("y ~ x", df, strategy = "moments")
    assert(math.abs(med.coef("(Intercept)") - 1.0) < 0.35,
      s"median intercept ${med.coef("(Intercept)")}")
    // OLS intercept absorbs the +50 contamination mass (~ +5)
    assert(ols.coef("(Intercept)") > 3.0)
  }

  test("Powell SE matches the iid asymptotic tau(1-tau)/(n f^2) at the intercept scale") {
    // centered x (mean ~0) so (X'X)^-1[0,0] ~ 1/n and the intercept
    // asymptotics reduce to tau(1-tau)/(n f^2)
    val rng = new scala.util.Random(99)
    val df = (1 to 4000).map { _ =>
      (rng.nextDouble() * 2.0 - 1.0, 5.0 + (rng.nextDouble() * 2.0 - 1.0))
    }.toDF("x", "y")
    val fit = Qreg.fit("y ~ x", df, tau = 0.5)
    // uniform(−1,1): f(median) = 1/2 ⇒ avar(intercept) ≈ τ(1−τ)/(n·f²) = 1/n
    val want = 1.0 / math.sqrt(4000.0)
    val got = fit.se("(Intercept)")
    assert(got > 0.6 * want && got < 1.6 * want, s"se $got want ~$want")
  }

  test("collinear regressor drops and stays dropped") {
    val df = (1 to 200).map { i =>
      val x = i.toDouble / 10.0
      (x, 2.0 * x, 1.0 + x + (i % 7) * 0.1)
    }.toDF("x", "x2", "y")
    val fit = Qreg.fit("y ~ x + x2", df, tau = 0.5)
    assert(fit.collinDropped === Seq("x2"))
    assert(fit.coef.contains("x") && !fit.coef.contains("x2"))
  }

  test("exact linear data: zero bandwidth refused, explicit bandwidth recovers the line") {
    val df = (1 to 100).map { i => (i.toDouble, 3.0 + 2.0 * i) }.toDF("x", "y")
    val err = intercept[IllegalArgumentException] {
      Qreg.fit("y ~ x", df, tau = 0.3)
    }
    assert(err.getMessage.contains("bandwidth"))
    val fit = Qreg.fit("y ~ x", df, tau = 0.3, bandwidth = Some(1.0))
    assert(math.abs(fit.coef("x") - 2.0) < 1e-8)
    assert(math.abs(fit.coef("(Intercept)") - 3.0) < 1e-6)
    assert(fit.pinball < 1e-10)
  }

  test("grouped fit equals the per-group ungrouped fit (coef + SE + n)") {
    val rng = new scala.util.Random(5)
    val df = (1 to 1200).map { i =>
      val g = Seq("a", "b", "c")(i % 3)
      val x = rng.nextDouble() * 4.0
      val slope = Map("a" -> 1.0, "b" -> 3.0, "c" -> -2.0)(g)
      (g, x, 1.0 + slope * x + (rng.nextDouble() * 2.0 - 1.0))
    }.toDF("g", "x", "y")
    val grouped = Qreg.fitGrouped("y ~ x", df, "g", tau = 0.6, maxIter = 4,
      eps = 1e-6)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    Seq("a", "b", "c").foreach { g =>
      val solo = Qreg.fit("y ~ x", df.filter(col("g") === g), tau = 0.6,
        maxIter = 4, tol = 0.0, eps = 1e-6)
      solo.coeftable.foreach { cr =>
        val (est, se, n) = grouped((g, cr.term))
        assert(math.abs(est - cr.estimate) < 1e-9 * math.max(1.0, math.abs(est)),
          s"estimate mismatch $g/${cr.term}: $est vs ${cr.estimate}")
        assert(math.abs(se - cr.stdError) < 1e-9 * math.max(1.0, se),
          s"se mismatch $g/${cr.term}: $se vs ${cr.stdError}")
        assert(n === solo.nobs)
      }
    }
  }

  test("grouped fit: a collinear group reports only kept terms with finite SEs") {
    val rng = new scala.util.Random(31)
    // group "bad" carries x2 = 2x (rank-deficient); group "ok" is clean
    val rows = (1 to 600).map { i =>
      val g = if (i % 2 == 0) "bad" else "ok"
      val x = rng.nextDouble() * 5.0
      val x2 = if (g == "bad") 2.0 * x else rng.nextDouble() * 5.0
      (g, x, x2, 1.0 + 2.0 * x + 0.5 * x2 + (rng.nextDouble() - 0.5))
    }
    val df = rows.toDF("g", "x", "x2", "y")
    val got = graft.reg.Qreg.fitGrouped("y ~ x + x2", df, "g", tau = 0.5,
      maxIter = 3, eps = 1e-4).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    // bad group: x2 dropped, surviving terms carry FINITE SEs
    assert(!got.contains(("bad", "x2")))
    assert(got(("bad", "x"))._2 > 0 && !got(("bad", "x"))._2.isNaN)
    assert(got(("bad", "(Intercept)"))._2 > 0 && !got(("bad", "(Intercept)"))._2.isNaN)
    // ok group: all three terms present and equal to the solo fit
    val solo = graft.reg.Qreg.fit("y ~ x + x2",
      df.filter(col("g") === "ok"), tau = 0.5, maxIter = 3, tol = 0.0, eps = 1e-4)
    solo.coeftable.foreach { cr =>
      val (est, se) = got(("ok", cr.term))
      assert(math.abs(est - cr.estimate) < 1e-9 * math.max(1.0, math.abs(est)))
      assert(math.abs(se - cr.stdError) < 1e-9 * math.max(1.0, se))
    }
  }

  test("CQR: NaN labels in the calibration split are treated as missing") {
    val rng = new scala.util.Random(41)
    val df = (1 to 800).map { i =>
      val y = if (i % 97 == 0) Double.NaN
              else 2.0 + (rng.nextDouble() * 2.0 - 1.0)
      (i.toLong, rng.nextDouble() * 4.0, y)
    }.toDF("id", "x", "y")
    val cm = graft.reg.Conformal.cqr("y ~ x", df, "id", alpha = 0.2,
      maxIter = 2, eps = 1e-4, salt = "nan")
    // qhat is finite and nCal counts only real-label calibration rows
    assert(!cm.qhat.isNaN)
    val dealt = graft.sources.ScaleOps.hashSplit(df, "id",
      Seq("train" -> 0.5, "cal" -> 0.5), salt = "nan")
    val calReal = dealt.filter(col("split") === "cal" && !isnan(col("y"))).count()
    assert(cm.nCal === calReal)
  }

  test("CQR: marginal coverage holds and width adapts to heteroscedastic noise") {
    // y = 2 + x + x·uniform(−1,1): noise scale grows with x — the setting
    // where symmetric split-conformal wastes width and CQR adapts
    val rng = new scala.util.Random(17)
    val df = (1 to 6000).map { i =>
      val x = 0.5 + rng.nextDouble() * 9.5
      (i.toLong, x, 2.0 + x + x * (rng.nextDouble() * 2.0 - 1.0))
    }.toDF("id", "x", "y")
    val cm = graft.reg.Conformal.cqr("y ~ x", df, "id", alpha = 0.2,
      maxIter = 4, eps = 1e-4)
    assert(cm.lo.tau === 0.1 && cm.hi.tau === 0.9)
    // fresh exchangeable sample: coverage within [1−α−slack, 1]
    val rng2 = new scala.util.Random(18)
    val fresh = (1 to 4000).map { i =>
      val x = 0.5 + rng2.nextDouble() * 9.5
      (i.toLong, x, 2.0 + x + x * (rng2.nextDouble() * 2.0 - 1.0))
    }.toDF("id", "x", "y")
    val iv = cm.intervals(fresh)
      .select(col("x"), col("y"), col("lo"), col("hi")).collect()
    val cov = iv.count(r => r.getDouble(1) >= r.getDouble(2) &&
      r.getDouble(1) <= r.getDouble(3)).toDouble / iv.length
    assert(cov > 0.76 && cov <= 1.0, s"coverage $cov")
    // adaptivity: intervals at small x are much narrower than at large x
    val wLow = iv.filter(_.getDouble(0) < 3.0).map(r => r.getDouble(3) - r.getDouble(2))
    val wHigh = iv.filter(_.getDouble(0) > 7.0).map(r => r.getDouble(3) - r.getDouble(2))
    assert(wLow.sum / wLow.length < 0.6 * (wHigh.sum / wHigh.length),
      s"width not adaptive: low=${wLow.sum / wLow.length} high=${wHigh.sum / wHigh.length}")
  }

  test("CQR: qhat is the k-th smallest CQR score (hand-checked on a tiny frame)") {
    // fixed tiny data: verify the order-statistic arithmetic end-to-end by
    // recomputing scores from the returned fits
    val rng = new scala.util.Random(23)
    val df = (1 to 400).map { i =>
      (i.toLong, rng.nextDouble() * 5.0, rng.nextDouble() * 10.0)
    }.toDF("id", "x", "y")
    val cm = graft.reg.Conformal.cqr("y ~ x", df, "id", alpha = 0.3,
      maxIter = 2, eps = 1e-4, salt = "t")
    val dealt = graft.sources.ScaleOps.hashSplit(df, "id",
      Seq("train" -> 0.5, "cal" -> 0.5), salt = "t")
    val cal = dealt.filter(col("split") === "cal")
    val scores = cal.select(greatest(
      cm.lo.fitCol - col("y"), col("y") - cm.hi.fitCol).as("s"))
      .collect().map(_.getDouble(0)).sorted
    assert(cm.nCal === scores.length)
    val k = math.ceil(0.7 * (scores.length + 1)).toInt
    assert(cm.k === k)
    assert(cm.qhat === scores(k - 1))
  }

  test("parameter validation") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    intercept[IllegalArgumentException](Qreg.fit("y ~ x", df, tau = 0.0))
    intercept[IllegalArgumentException](Qreg.fit("y ~ x", df, tau = 1.0))
    intercept[IllegalArgumentException](Qreg.fit("y ~ x", df, eps = 0.0))
    intercept[IllegalArgumentException](Qreg.fit("y ~ x | fe", df, tau = 0.5))
  }
}
