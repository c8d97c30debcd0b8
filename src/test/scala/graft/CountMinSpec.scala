package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMinAgg

/** Count-Min sketch: exact-regime equality, one-sided error under planted
  * saturation, and the elementwise-merge layout invariance that holds even
  * when the sketch is approximating. */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private val tokens =
    Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++ Seq("d")

  private def ests(items: Seq[String], depth: Int, width: Int,
      parts: Int = 4): Map[String, Long] =
    tokens.toDF("t").repartition(parts)
      .agg(CountMinAgg(col("t"), items, depth, width).as("e"))
      .select(explode(col("e")).as("x"))
      .collect()
      .map(r => r.getStruct(0).getAs[String]("item") ->
        r.getStruct(0).getAs[Long]("est")).toMap

  test("wide sketch returns exact counts, absent item 0") {
    val e = ests(Seq("a", "b", "c", "d", "nope"), depth = 4, width = 1024)
    assert(e === Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 1L, "nope" -> 0L))
  }

  test("saturated sketch overcounts one-sidedly, bounded by the stream size") {
    val e = ests(Seq("a", "b", "c", "d"), depth = 2, width = 2)
    val truth = Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 1L)
    truth.foreach { case (k, t) =>
      assert(e(k) >= t, s"$k underestimated")
      assert(e(k) <= tokens.length.toLong, s"$k above stream size")
    }
  }

  test("estimates are partition-layout invariant EVEN while approximating") {
    val items = Seq("a", "b", "c", "d")
    val one = ests(items, depth = 2, width = 2, parts = 1)
    val many = ests(items, depth = 2, width = 2, parts = 13)
    assert(one === many)
  }

  test("array input counts every element; nulls skipped") {
    val d = Seq(
      (1L, Some(Seq("x", "y", "x"))),
      (2L, Some(Seq("y"))),
      (3L, None)).toDF("id", "ts")
    val e = d.agg(CountMinAgg(col("ts"), Seq("x", "y"), 4, 64).as("e"))
      .select(explode(col("e")).as("s")).collect()
      .map(r => r.getStruct(0).getString(0) -> r.getStruct(0).getLong(1)).toMap
    assert(e === Map("x" -> 2L, "y" -> 2L))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      Seq("a").toDF("t").agg(CountMinAgg(col("t"), Seq("a"), 0, 8)).collect()
    }
    intercept[IllegalArgumentException] {
      Seq("a").toDF("t").agg(CountMinAgg(col("t"), Seq(), 2, 8)).collect()
    }
  }
}
