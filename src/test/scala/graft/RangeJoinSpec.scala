package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** The bucketized range joins must be EXACTLY the naive theta join —
  * every pair once, no bucket-boundary duplicates or drops — across
  * bucket widths that tile the intervals finely and coarsely. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(41)
  // points and intervals over a small integer domain so boundary cases
  // (exact bucket edges, touching endpoints, negatives) occur naturally
  private lazy val pts = Seq.fill(300)((rng.nextInt(60) + 1).toLong,
    rng.nextLong(400) - 100).toDF("p_id", "p")
  private lazy val ivs = Seq.fill(120) {
    val lo = rng.nextLong(400) - 100
    (rng.nextInt(40) + 1000L, lo, lo + rng.nextLong(60))
  }.toDF("iv_id", "lo", "hi")

  private def naivePoint = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
    .select("p_id", "p", "iv_id", "lo", "hi")
    .collect().map(_.toSeq).toSeq.sortBy(_.toString)

  test("pointInInterval equals the naive theta join at fine/matched/coarse widths") {
    val expected = naivePoint
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", bucketWidth = w)
        .select("p_id", "p", "iv_id", "lo", "hi")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(got == expected, s"bucketWidth=$w: ${got.length} vs ${expected.length} rows")
    }
  }

  test("intervalOverlap equals the naive theta join, touching endpoints included") {
    val l = ivs.withColumnRenamed("iv_id", "l_id")
      .withColumnRenamed("lo", "l_lo").withColumnRenamed("hi", "l_hi")
    val r = Seq.fill(120) {
      val lo = rng.nextLong(400) - 100
      (rng.nextInt(40) + 2000L, lo, lo + rng.nextLong(60))
    }.toDF("r_id", "r_lo", "r_hi")
    val expected = l.join(r, col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 13L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi",
        bucketWidth = w)
        .select("l_id", "r_id").collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(got == expected, s"bucketWidth=$w: ${got.length} vs ${expected.length} rows")
    }
    // exact touch: [0,10] and [10,20] overlap at one point (inclusive)
    val a = Seq((1L, 0L, 10L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((2L, 10L, 20L)).toDF("b_id", "b_lo", "b_hi")
    assert(RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", 5L).count() == 1)
  }

  test("equality keys compose with the band predicate") {
    val p = pts.withColumn("k", pmod(col("p_id"), lit(3L)))
    val iv2 = ivs.withColumn("k", pmod(col("iv_id"), lit(3L)))
    val expected = p.join(iv2,
      p("k") === iv2("k") && col("p") >= col("lo") && col("p") <= col("hi"))
      .select(p("p_id"), col("iv_id")).collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val got = RangeJoin.pointInInterval(p, "p", iv2, "lo", "hi",
      bucketWidth = 16L, keys = Seq("k"))
      .select("p_id", "iv_id").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(got == expected && got.nonEmpty)
  }

  test("null points, null/inverted intervals drop; name clashes and bad widths rejected") {
    val p = Seq((1L, Some(5L)), (2L, None)).toDF("p_id", "p")
    val iv2 = Seq((1L, Some(0L), Some(10L)), (2L, None, Some(10L)), (3L, Some(9L), Some(2L)))
      .toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "p", iv2, "lo", "hi", 4L)
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L)))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "p", ivs.withColumnRenamed("iv_id", "p_id"),
        "lo", "hi", 4L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 0L)
    }
  }

  test("fan-out valve fails fast on a domain-spanning interval") {
    val iv2 = Seq((1L, 0L, 10000000L)).toDF("iv_id", "lo", "hi")
    val err = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "p", iv2, "lo", "hi",
        bucketWidth = 2L, maxBucketsPerInterval = 64L).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(t =>
      t.getMessage != null && t.getMessage.contains("raise bucketWidth")),
      s"got: ${err.getMessage}")
  }

  test("bucketized point join plans shuffled equi-joins, not a nested loop") {
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested loop in plan:\n$plan")
  }
}
