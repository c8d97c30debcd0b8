package graft

import org.apache.spark.sql.functions._
import graft.reg.Conformal
import graft.sources.ScaleOps

class ConformalSpec extends SparkTestBase {
  import spark.implicits._

  private def frame = {
    // y = 3 + 2x + bounded deterministic "noise" (sin keeps it exchangeable
    // enough for the rank assertions; nothing here assumes gaussianity)
    val rows = (1 to 400).map { i =>
      val x = (i % 37).toDouble
      (i.toLong, x, 3.0 + 2.0 * x + 5.0 * math.sin(i.toDouble))
    }
    rows.toDF("id", "x", "y")
  }

  test("conformal qhat is the k-th smallest calibration residual") {
    val cm = Conformal.fit("y ~ x", frame, "id", alpha = 0.2, salt = "s",
      strategy = "moments")
    // recompute the calibration residual multiset with the same public deal
    val cal = ScaleOps
      .hashSplit(frame, "id", Seq("train" -> 0.5, "cal" -> 0.5), salt = "s")
      .filter(col("split") === "cal").drop("split")
    val resid = cm.fit.predict(cal)
      .select(abs(col("y") - col("fit")).as("r")).as[Double].collect().sorted
    assert(cm.nCal == resid.length)
    assert(cm.k == math.ceil(0.8 * (resid.length + 1)).toLong)
    assert(cm.qhat == resid(cm.k.toInt - 1)) // exact order statistic
    // rank property: at least k residuals are <= qhat
    assert(resid.count(_ <= cm.qhat) >= cm.k)
  }

  test("intervals are fit +/- qhat and cover >= 1-alpha of calibration") {
    val cm = Conformal.fit("y ~ x", frame, "id", alpha = 0.2, salt = "s",
      strategy = "moments")
    val cal = ScaleOps
      .hashSplit(frame, "id", Seq("train" -> 0.5, "cal" -> 0.5), salt = "s")
      .filter(col("split") === "cal").drop("split")
    val iv = cm.intervals(cal)
    val bad = iv.filter(
      abs(col("hi") - col("fit") - lit(cm.qhat)) > 1e-12 ||
        abs(col("fit") - col("lo") - lit(cm.qhat)) > 1e-12).count()
    assert(bad == 0L)
    val cov = iv.agg(avg((col("y") >= col("lo") && col("y") <= col("hi"))
      .cast("double"))).head.getDouble(0)
    assert(cov >= 0.8, s"calibration coverage $cov below 1-alpha")
  }

  test("alpha too small for the calibration size fails loudly") {
    val tiny = (1 to 8).map(i => (i.toLong, i.toDouble, i.toDouble))
      .toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Conformal.fit("y ~ x", tiny, "id", alpha = 0.01, salt = "s",
        strategy = "moments")
    }
    assert(e.getMessage.contains("calibration set too small"))
  }
}
