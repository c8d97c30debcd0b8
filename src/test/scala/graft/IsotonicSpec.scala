package graft

import org.apache.spark.sql.functions._

import graft.reg.Isotonic

/** Isotonic/PAV correctness via the minimax characterization
  * ŷ(s) = max_{j≤s} min_{k≥s} weightedAvg(j..k), computed brute-force —
  * an independent algorithm for the same optimum.
  */
class IsotonicSpec extends SparkTestBase {
  import spark.implicits._

  private def minimax(points: Seq[(Double, Double, Double)]) // (s, w, sumy) ascending
      : Seq[Double] = {
    val m = points.length
    def avg(j: Int, k: Int): Double = {
      val w = (j to k).map(points(_)._2).sum
      val sy = (j to k).map(points(_)._3).sum
      sy / w
    }
    (0 until m).map { i =>
      (0 to i).map(j => (i until m).map(k => avg(j, k)).min).max
    }
  }

  test("matches the brute-force minimax on random data, several seeds") {
    for (seed <- Seq(1, 2, 3)) {
      val rng = new scala.util.Random(seed)
      val data = (1 to 500).map { _ =>
        val s = rng.nextInt(12).toDouble
        val y = rng.nextDouble() < (0.2 + 0.05 * s + 0.3 * rng.nextGaussian())
        (s, y)
      }
      val fitDF = Isotonic.fit(data.toDF("s", "y"), col("s"), col("y"))
        .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
      val grouped = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, rows) =>
        (s, rows.length.toDouble, rows.count(_._2).toDouble)
      }
      val want = minimax(grouped)
      assert(fitDF.length == grouped.length)
      fitDF.zip(grouped.zip(want)).foreach { case ((s, n, cal), ((s2, w, _), m)) =>
        assert(s == s2 && n == w.toLong)
        assert(math.abs(cal - m) < 1e-12, s"score $s: $cal vs $m")
      }
      // monotone non-decreasing
      val cals = fitDF.map(_._3)
      assert(cals.zip(cals.tail).forall { case (a, b) => a <= b + 1e-15 })
    }
  }

  test("already-monotone rates pass through; anti-monotone pools to the mean") {
    val mono = Seq.tabulate(5)(i => (i.toDouble, i / 10.0))
      .flatMap { case (s, p) =>
        (1 to 100).map(j => (s, j <= (p * 100).round))
      }
    val f1 = Isotonic.fit(mono.toDF("s", "y"), col("s"), col("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(2)))
    f1.foreach { case (s, cal) => assert(math.abs(cal - s / 10.0) < 1e-12) }

    val anti = Seq.tabulate(5)(i => (i.toDouble, (4 - i) / 10.0))
      .flatMap { case (s, p) =>
        (1 to 100).map(j => (s, j <= (p * 100).round))
      }
    val f2 = Isotonic.fit(anti.toDF("s", "y"), col("s"), col("y"))
      .collect().map(_.getDouble(2))
    val grand = anti.count(_._2).toDouble / anti.length
    f2.foreach(cal => assert(math.abs(cal - grand) < 1e-12))
  }

  test("calibrate applies via broadcast join; unseen scores come back null") {
    val train = Seq((1.0, false), (1.0, true), (2.0, true), (2.0, true))
      .toDF("s", "y")
    val model = Isotonic.fit(train, col("s"), col("y"))
    val applied = Isotonic.calibrate(
      Seq(1.0, 2.0, 3.0).toDF("s"), col("s"), model)
      .orderBy("s").collect()
    assert(applied(0).getAs[Double]("calibrated") == 0.5)
    assert(applied(1).getAs[Double]("calibrated") == 1.0)
    assert(applied(2).isNullAt(applied(2).fieldIndex("calibrated")))
  }

  test("quantize bins continuous scores; maxBins guard fires without it") {
    val rng = new scala.util.Random(9)
    val cont = (1 to 300).map(_ => (rng.nextDouble(), rng.nextBoolean()))
      .toDF("s", "y")
    val e = intercept[IllegalArgumentException] {
      Isotonic.fit(cont, col("s"), col("y"), maxBins = 100)
    }
    assert(e.getMessage.contains("quantize"))
    val binned = Isotonic.fit(cont, col("s"), col("y"), quantize = Some(1))
    assert(binned.count() <= 11)
  }
}
