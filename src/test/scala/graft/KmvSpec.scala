package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvAgg

/** KMV distinct sketch: exact below k, hand-computed estimator above k,
  * and set-union mergeability (layout invariance in the approx regime). */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(values: Seq[String], k: Int, parts: Int = 4) =
    values.toDF("v").repartition(parts)
      .agg(KmvAgg(col("v"), k).as("s"))
      .select("s.*").collect().head

  test("exact regime: estimate is the exact distinct count, duplicates collapse") {
    val r = sketch(Seq("a", "b", "c", "a", "b", "a"), k = 16)
    assert(r.getAs[Double]("estimate") === 3.0)
    assert(r.getAs[Int]("n_kept") === 3)
    assert(r.getAs[Boolean]("exact"))
  }

  test("approximation regime: estimate equals the (k-1)/kth-minimum formula") {
    val vals = (1 to 200).map(i => s"item$i")
    val k = 16
    val r = sketch(vals, k)
    assert(!r.getAs[Boolean]("exact"))
    // independent recomputation through the same md5-derived hash
    val hashes = vals.map { s =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }.distinct.sorted.take(k)
    val expected = (k - 1).toDouble / (hashes.last.toDouble / 4294967296.0)
    assert(r.getAs[Double]("estimate") === expected)
    assert(r.getAs[Long]("kth_hash") === hashes.last)
    // the estimate is in the right ballpark (KMV std error ~ 1/sqrt(k-2))
    assert(math.abs(r.getAs[Double]("estimate") - 200.0) < 200.0)
  }

  test("layout invariance holds IN the approximation regime (set-union merge)") {
    val vals = (1 to 500).map(i => s"x$i")
    val a = sketch(vals, k = 8, parts = 1)
    val b = sketch(vals, k = 8, parts = 17)
    assert(a === b)
  }

  test("array input, nulls skipped, grouped") {
    val d = Seq(
      ("g1", Some(Seq("a", "b"))), ("g1", Some(Seq("b", "c"))),
      ("g2", None)).toDF("g", "ts")
    val rows = d.groupBy("g").agg(KmvAgg(col("ts"), 8).as("s"))
      .orderBy("g").select(col("g"), col("s.estimate")).collect()
    assert(rows(0).getDouble(1) === 3.0)
    assert(rows(1).getDouble(1) === 0.0)
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      Seq("a").toDF("v").agg(KmvAgg(col("v"), 1)).collect()
    }
  }
}
