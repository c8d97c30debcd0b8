package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Expectations: one-pass conditional counts, null-counts-as-violation
  * semantics, rule ordering, validation. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("violations count false AND null predicates") {
    val d = Seq(Some(5.0), Some(-1.0), None, Some(10.0)).toDF("price")
    val out = Quality.expectations(d, Seq(
        "positive" -> (col("price") > 0),
        "not_null" -> col("price").isNotNull))
      .orderBy("rule").collect()
    val byRule = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // -1 fails, null is unprovable → 2 violations of "positive"
    assert(byRule("positive") === ((4L, 2L, 0.5)))
    assert(byRule("not_null") === ((4L, 1L, 0.25)))
  }

  test("clean table reports zero violations; empty table zero rate") {
    val d = Seq(1.0, 2.0).toDF("v")
    val out = Quality.expectations(d, Seq("pos" -> (col("v") > 0))).head
    assert((out.getLong(1), out.getLong(2), out.getDouble(3)) === ((2L, 0L, 0.0)))
    val empty = spark.emptyDataset[Double].toDF("v")
    val e = Quality.expectations(empty, Seq("pos" -> (col("v") > 0))).head
    assert((e.getLong(1), e.getLong(2), e.getDouble(3)) === ((0L, 0L, 0.0)))
  }

  test("validation: empty and duplicate rule names refused") {
    val d = Seq(1).toDF("v")
    intercept[IllegalArgumentException] { Quality.expectations(d, Seq.empty) }
    intercept[IllegalArgumentException] {
      Quality.expectations(d, Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }
}
