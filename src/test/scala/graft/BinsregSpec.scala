package graft

import breeze.linalg.{DenseMatrix, DenseVector, inv}
import graft.binsreg.Dbbinsreg

class BinsregSpec extends SparkTestBase {

  // deterministic scatter: y = sin(x) + structured noise
  case class Pt(y: Double, x: Double, w: Double, g: String)
  private lazy val data: Seq[Pt] = {
    val rng = new scala.util.Random(7)
    (0 until 2000).map { i =>
      val x = rng.nextDouble() * 10.0
      val w = rng.nextDouble()
      val g = s"g${i % 4}"
      val y = math.sin(x) + 0.3 * w + (i % 4) * 0.1 + rng.nextGaussian() * 0.2
      Pt(y, x, w, g)
    }
  }
  private lazy val df = spark.createDataFrame(data)

  private def assertClose(a: Double, b: Double, t: Double, msg: String) =
    assert(math.abs(a - b) <= t * math.max(1.0, math.abs(b)), s"$msg: $a vs $b")

  test("canonical binscatter (0,0) equal-spaced: per-bin means, pooled sigma") {
    val r = Dbbinsreg.fit("y ~ x", df, nbins = 5, binspos = "es", degree = 0)
    assert(r.nbins == 5 && r.nobs == 2000)
    // dense check: bin means and pooled-variance SEs
    val mn = data.map(_.x).min; val mx = data.map(_.x).max
    def bin(x: Double) = (1 until 5).count(k => x > mn + (mx - mn) * k / 5)
    val groups = data.groupBy(p => bin(p.x))
    val binMeans = groups.map { case (b, ps) => b -> ps.map(_.y).sum / ps.size }
    val rss = groups.values.flatMap { ps =>
      val m = ps.map(_.y).sum / ps.size; ps.map(p => math.pow(p.y - m, 2))
    }.sum
    val sigma2 = rss / (2000 - 5)
    r.points.foreach { p =>
      assertClose(p.fit, binMeans(p.bin), 1e-7, s"bin ${p.bin} mean")
      val n = groups(p.bin).size
      assertClose(p.se, math.sqrt(sigma2 / n), 1e-7, s"bin ${p.bin} se")
      assert(p.lwr < p.fit && p.fit < p.upr)
    }
  }

  test("quantile bins give near-equal counts") {
    val r = Dbbinsreg.fit("y ~ x", df, nbins = 10, binspos = "qs", degree = 0)
    assert(r.bins.length == 10)
    val counts = r.bins.map(_.n)
    assert(counts.min > 100 && counts.max < 400, s"counts: $counts") // ~200 each
  }

  test("histQuantiles matches exact quantiles to the relErr contract") {
    import org.apache.spark.sql.functions.col
    val base = df.select(col("x")).filter(col("x").isNotNull)
    val probs = Array(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Dbbinsreg.histQuantiles(base, "x", probs, relErr = 1e-4)
    val sorted = data.map(_.x).sorted
    val range = sorted.last - sorted.head
    probs.zip(got).foreach { case (p, q) =>
      // exact order statistic at ceil(p*n); bound = one bucket width
      val exact =
        if (p <= 0.0) sorted.head
        else if (p >= 1.0) sorted.last
        else sorted(math.min(sorted.length - 1, math.ceil(p * sorted.length).toInt - 1))
      assert(math.abs(q - exact) <= range * 1e-3 + 1e-12,
        s"p=$p: hist=$q exact=$exact (range=$range)")
    }
    // endpoints are the exact min/max
    assert(got.head == sorted.head && got.last == sorted.last)
    // degenerate: constant column collapses to a single break
    val const = df.select((col("x") * 0.0 + 5.0).as("x"))
    assert(Dbbinsreg.histQuantiles(const, "x", probs, 1e-4).toSeq == Seq(5.0))
    // NaN rows are excluded (na.rm semantics), not propagated into breaks
    import spark.implicits._
    val withNan = df.select(col("x"))
      .unionAll(Seq(Double.NaN, Double.NaN).toDF("x"))
    val gotNan = Dbbinsreg.histQuantiles(withNan, "x", probs, 1e-4)
    assert(gotNan.forall(v => !v.isNaN))
    assert(gotNan.head == sorted.head && gotNan.last == sorted.last)
  }

  test("histQuantiles property: within one bucket width of the exact order statistic") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val probs = Array(0.05, 0.25, 0.5, 0.75, 0.95)
    val shapes: Seq[(String, Int => Double)] = Seq(
      ("uniform", _ => rng.nextDouble() * 100),
      ("exponential-skew", _ => -math.log(rng.nextDouble() + 1e-12) * 10),
      ("few-distinct", _ => (rng.nextInt(7) * 13).toDouble),
      ("spike-90pct", i => if (i % 10 == 0) rng.nextDouble() * 50 else 42.0))
    for ((name, gen) <- shapes; trial <- 1 to 3) {
      val n = 500 + rng.nextInt(2500)
      val xs = (0 until n).map(gen)
      val df = xs.toDF("x")
      // relErr=1e-3 floors at 1024 buckets -> bound is one bucket width
      val got = Dbbinsreg.histQuantiles(df.select(col("x")), "x", probs, 1e-3)
      val sorted = xs.sorted
      val width = (sorted.last - sorted.head) / 1024.0
      if (sorted.head == sorted.last) {
        assert(got.toSeq == Seq(sorted.head), s"$name/$trial constant")
      } else {
        assert(got.toSeq == got.toSeq.sorted, s"$name/$trial monotone: ${got.toSeq}")
        probs.zip(got).foreach { case (p, q) =>
          val exact = sorted(math.min(n - 1, math.ceil(p * n).toInt - 1))
          assert(math.abs(q - exact) <= width + 1e-9,
            s"$name/$trial p=$p: hist=$q exact=$exact width=$width n=$n")
        }
      }
    }
  }

  test("degree-1 unconstrained matches dense per-bin linear model") {
    val r = Dbbinsreg.fit("y ~ x", df, nbins = 4, binspos = "es", degree = 1)
    // dense: X = [1_b, 1_b * u_b] per bin
    val mn = data.map(_.x).min; val mx = data.map(_.x).max
    val edges = (0 to 4).map(i => mn + (mx - mn) * i / 4)
    def bin(x: Double) = (1 until 4).count(k => x > edges(k))
    val lefts = data.groupBy(p => bin(p.x)).map { case (b, ps) => b -> ps.map(_.x).min }
    val hs = data.groupBy(p => bin(p.x)).map { case (b, ps) =>
      b -> (ps.map(_.x).max - ps.map(_.x).min)
    }
    val n = data.size
    val xm = DenseMatrix.zeros[Double](n, 8)
    val yv = DenseVector(data.map(_.y).toArray)
    data.zipWithIndex.foreach { case (p, i) =>
      val b = bin(p.x)
      val u = (p.x - lefts(b)) / hs(b)
      xm(i, b) = 1.0
      xm(i, 4 + b) = u
    }
    val beta = inv(xm.t * xm) * (xm.t * yv)
    val xmeans = data.groupBy(p => bin(p.x)).map { case (b, ps) => b -> ps.map(_.x).sum / ps.size }
    r.points.foreach { p =>
      val u = (xmeans(p.bin) - lefts(p.bin)) / hs(p.bin)
      val expect = beta(p.bin) + beta(4 + p.bin) * u
      assertClose(p.fit, expect, 1e-6, s"bin ${p.bin} fit")
    }
  }

  test("linear spline (1,1) matches dense truncated-power fit") {
    val r = Dbbinsreg.fit("y ~ x", df, nbins = 4, binspos = "es", degree = 1, smoothness = 1)
    val mn = data.map(_.x).min; val mx = data.map(_.x).max
    val knots = (1 until 4).map(k => mn + (mx - mn) * k / 4)
    val n = data.size
    val xm = DenseMatrix.zeros[Double](n, 5) // 1, x, (x-k)+ ×3
    val yv = DenseVector(data.map(_.y).toArray)
    data.zipWithIndex.foreach { case (p, i) =>
      xm(i, 0) = 1.0; xm(i, 1) = p.x
      knots.zipWithIndex.foreach { case (k, j) =>
        xm(i, 2 + j) = if (p.x > k) p.x - k else 0.0
      }
    }
    val beta = inv(xm.t * xm) * (xm.t * yv)
    val xmeans = data.groupBy { p =>
      (1 until 4).count(k => p.x > mn + (mx - mn) * k / 4)
    }.map { case (b, ps) => b -> ps.map(_.x).sum / ps.size }
    r.points.foreach { p =>
      val xv = xmeans(p.bin)
      val expect = beta(0) + beta(1) * xv +
        knots.zipWithIndex.map { case (k, j) =>
          if (xv > k) beta(2 + j) * (xv - k) else 0.0
        }.sum
      assertClose(p.fit, expect, 1e-6, s"bin ${p.bin} spline fit")
    }
    // line is continuous across knots for s=1
    val sortedLine = r.line.sortBy(_.x)
    sortedLine.sliding(2).foreach { case Seq(a, b2) =>
      assert(math.abs(b2.fit - a.fit) < 0.5, s"jump at ${a.x} -> ${b2.x}")
    }
  }

  test("controls and FE compose with binning") {
    val r = Dbbinsreg.fit("y ~ x + w | g", df, nbins = 5, binspos = "qs", degree = 0)
    assert(r.points.length == 5)
    assert(r.model.fe == Seq("g"))
    assert(r.points.forall(p => p.se > 0 && !p.fit.isNaN))
  }

  test("sup-t confidence bands are wider than pointwise CIs") {
    val r = Dbbinsreg.fit("y ~ x", df, nbins = 6, degree = 0, cb = true)
    r.points.foreach { p =>
      assert(!p.cbLwr.isNaN && !p.cbUpr.isNaN)
      assert(p.cbLwr <= p.lwr + 1e-12 && p.cbUpr >= p.upr - 1e-12,
        s"band must contain CI: $p")
    }
    // deterministic under fixed seed
    val r2 = Dbbinsreg.fit("y ~ x", df, nbins = 6, degree = 0, cb = true)
    r.points.zip(r2.points).foreach { case (a, b) => assert(a.cbLwr == b.cbLwr) }
    // constrained path refuses bands (reference parity): NaN columns
    val rc = Dbbinsreg.fit("y ~ x", df, nbins = 6, degree = 1, smoothness = 1, cb = true)
    assert(rc.points.forall(_.cbLwr.isNaN))
  }

  test("separate points/line params fit two models (points constant, line spline)") {
    val r = Dbbinsreg.fit("y ~ x", df, nbins = 5, binspos = "es", degree = 0,
      line = Some((1, 1)))
    // points are per-bin means (degree 0)...
    val r0 = Dbbinsreg.fit("y ~ x", df, nbins = 5, binspos = "es", degree = 0)
    r.points.zip(r0.points).foreach { case (a, b) => assert(a.fit == b.fit) }
    // ...but the line comes from the continuous spline fit
    val r1 = Dbbinsreg.fit("y ~ x", df, nbins = 5, binspos = "es",
      degree = 1, smoothness = 1)
    r.line.zip(r1.line).foreach { case (a, b) => assert(a.fit == b.fit) }
  }

  test("manual knots define the bins") {
    val r = Dbbinsreg.fit("y ~ x", df, manualKnots = Some(Array(2.5, 5.0, 7.5)), degree = 0)
    assert(r.nbins == 4)
    assert(r.knots == Seq(2.5, 5.0, 7.5))
    val counts = r.bins.map(_.n).sum
    assert(counts == 2000)
  }

  test("hc1 and cluster vcov flow through") {
    val rh = Dbbinsreg.fit("y ~ x", df, nbins = 5, degree = 0, vcov = "hc1")
    val rc = Dbbinsreg.fit("y ~ x", df, nbins = 5, degree = 0, vcov = "~g")
    assert(rh.model.vcovType == "hc1")
    assert(rc.model.vcovType == "cluster")
    assert(rh.points.forall(_.se > 0) && rc.points.forall(_.se > 0))
  }

  test("lagrangeInterp3 hits the control points and reproduces quadratics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the interpolant of a quadratic IS that quadratic: q(x) = 2x² - 3x + 1
    def q(x: Double) = 2.0 * x * x - 3.0 * x + 1.0
    val xPts = Seq(0.0, 2.0, 5.0)
    val xs = Seq(0.0, 1.0, 2.0, 3.5, 5.0, -1.0, 10.0).toDF("x")
    val out = xs.select(col("x"),
      Dbbinsreg.lagrangeInterp3(col("x"), xPts, xPts.map(q)).as("y"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1))
    out.foreach { case (x, y) => assert(math.abs(y - q(x)) < 1e-9, s"x=$x") }
    intercept[IllegalArgumentException] {
      Dbbinsreg.lagrangeInterp3(col("x"), Seq(1.0, 1.0, 2.0), Seq(0.0, 0.0, 0.0))
    }
    intercept[IllegalArgumentException] {
      Dbbinsreg.lagrangeInterp3(col("x"), Seq(1.0, 2.0), Seq(0.0, 0.0))
    }
  }

  test("plotSpec emits valid Vega-Lite JSON mirroring the reference plot layers") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val r = Dbbinsreg.fit("y ~ x", df, nbins = 6, degree = 0, cb = true,
      line = Some((0, 0)))
    val spec = JsonMethods.parse(r.plotSpec(xLab = "x \"quoted\"", yLab = "y"))
    // top-level: schema + inline point data + 4 layers (ribbon, line,
    // rule, point) — cb and ci present on this fit
    val JString(schema) = spec \ "$schema"
    assert(schema.contains("vega-lite"))
    val JArray(values) = spec \ "data" \ "values"
    assert(values.length === r.points.length)
    val JArray(layers) = spec \ "layer"
    assert(layers.length === 4)
    val marks = layers.map(l => l \ "mark" \ "type").collect {
      case JString(m) => m
    }
    assert(marks === List("errorband", "line", "rule", "point"))
    // the line layer carries its own per-bin data + detail break
    val lineLayer = layers(1)
    val JArray(lineVals) = lineLayer \ "data" \ "values"
    assert(lineVals.length === r.line.length && r.line.nonEmpty)
    val JString(detailField) = lineLayer \ "encoding" \ "detail" \ "field"
    assert(detailField === "bin")
    // escaping survived the round trip
    val JString(xTitle) =
      layers(3) \ "encoding" \ "x" \ "title"
    assert(xTitle === "x \"quoted\"")
    // a constrained fit (cb refused → NaN bounds) drops ribbon AND
    // serializes the NaN columns as null, never the literal NaN
    val rc = Dbbinsreg.fit("y ~ x", df, nbins = 6, degree = 1,
      smoothness = 1, cb = true)
    val raw = rc.plotSpec()
    assert(!raw.contains("NaN"))
    val JArray(cLayers) = JsonMethods.parse(raw) \ "layer"
    val cMarks = cLayers.map(l => l \ "mark" \ "type").collect {
      case JString(m) => m
    }
    assert(!cMarks.contains("errorband"))
    // switches mirror the reference's ci/cb/line args
    val JArray(bare) = JsonMethods.parse(
      r.plotSpec(ci = false, cb = false, showLine = false)) \ "layer"
    assert(bare.length === 1)
  }
}
