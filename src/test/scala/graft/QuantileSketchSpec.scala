package graft

import org.apache.spark.sql.functions._

import graft.functions.QuantileSketchAgg

/** Bounded-state quantile sketch: exact-regime quantile_cont parity,
  * distinct-collapse exactness at high row counts, approximation-regime
  * rank-error bounds, and partition-layout invariance where guaranteed. */
class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference quantile_cont over an in-memory sample. */
  private def qc(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val pos = p * (s.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) s(lo) else s(lo) + (pos - lo) * (s(hi) - s(lo))
  }

  test("exact regime: matches quantile_cont interpolation bit-for-bit") {
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val probs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = xs.toDF("x")
      .agg(QuantileSketchAgg(col("x"), probs, 64).as("q"))
      .collect().head.getSeq[Double](0)
    probs.zip(got).foreach { case (p, g) => assert(g === qc(xs, p), s"p=$p") }
  }

  test("distinct-collapse: exact with capacity >= distinct values at any row count") {
    // 9,000 rows over 20 distinct values, capacity 32 — the buffer
    // collapses equal values, so the sketch never approximates
    val xs = (1 to 9000).map(i => (i % 20 + 1).toDouble)
    val probs = Seq(0.1, 0.5, 0.75, 0.99)
    val got = xs.toDF("x").repartition(13)
      .agg(QuantileSketchAgg(col("x"), probs, 32).as("q"))
      .collect().head.getSeq[Double](0)
    probs.zip(got).foreach { case (p, g) => assert(g === qc(xs, p), s"p=$p") }
  }

  test("exact regime is partition-layout invariant") {
    val xs = (1 to 40).map(_.toDouble * 1.5)
    val probs = Seq(0.25, 0.5, 0.75)
    val a = xs.toDF("x").repartition(1)
      .agg(QuantileSketchAgg(col("x"), probs, 64).as("q"))
      .collect().head.getSeq[Double](0)
    val b = xs.toDF("x").repartition(11)
      .agg(QuantileSketchAgg(col("x"), probs, 64).as("q"))
      .collect().head.getSeq[Double](0)
    assert(a === b)
  }

  test("approximation regime: rank error bounded by the balanced-centroid guarantee") {
    // 20,000 distinct uniform values, capacity 100 → rank error of each
    // reported quantile within 2·W/capacity of the target rank
    val n = 20000
    val xs = (1 to n).map(_.toDouble)
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val got = xs.toDF("x").repartition(8)
      .agg(QuantileSketchAgg(col("x"), probs, 100).as("q"))
      .collect().head.getSeq[Double](0)
    val tol = 2.0 * n / 100
    probs.zip(got).foreach { case (p, g) =>
      val rank = xs.count(_ <= g).toDouble
      assert(math.abs(rank - p * n) <= tol, s"p=$p est=$g rank=$rank")
    }
  }

  test("grouped sketch, nulls and NaN skipped, empty group -> null") {
    val d = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("a", Some(Double.NaN)),
      ("b", None))
      .toDF("g", "x")
    val rows = d.groupBy("g")
      .agg(QuantileSketchAgg(col("x"), Seq(0.5), 16).as("q"))
      .orderBy("g").collect()
    assert(rows(0).getSeq[Double](1) === Seq(2.0))
    assert(rows(1).isNullAt(1))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      Seq(1.0).toDF("x").agg(QuantileSketchAgg(col("x"), Seq(0.5), 1)).collect()
    }
    intercept[IllegalArgumentException] {
      Seq(1.0).toDF("x").agg(QuantileSketchAgg(col("x"), Seq(1.5), 8)).collect()
    }
  }
}
