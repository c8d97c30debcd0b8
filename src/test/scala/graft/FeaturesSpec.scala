package graft

import org.apache.spark.sql.functions._
import graft.operators.Features

class FeaturesSpec extends SparkTestBase {
  import spark.implicits._

  test("target encoding: hand-computed shrinkage, m=0 gives raw means, null cat gets null") {
    val d = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(3.0)), (Some("b"), Some(5.0)),
      (None, Some(9.0)), (Some("a"), None))
      .toDF("cat", "y")
    // prior over both-non-null rows = (1+3+5)/3 = 3
    val enc = Features.targetEncode(d, "cat", col("y"), m = 1.0)
      .select(col("cat"), col("te")).collect()
      .map(r => Option(r.getString(0)) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
    val byCat = enc.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toSeq).toMap
    assert(byCat(Some("a")) == Seq(Some(7.0 / 3.0))) // (4 + 1*3)/(2+1)
    assert(byCat(Some("b")) == Seq(Some(4.0)))       // (5 + 3)/(1+1)
    assert(byCat(None) == Seq(None))                 // null category
    val raw = Features.targetEncode(d, "cat", col("y"), m = 0.0)
      .filter(col("cat") === "a").select(col("te")).distinct()
      .collect().map(_.getDouble(0))
    assert(raw.toSeq == Seq(2.0)) // unshrunk category mean
    // refusals
    assert(intercept[IllegalArgumentException] {
      Features.targetEncode(d, "nope", col("y"))
    }.getMessage.contains("not found"))
    assert(intercept[IllegalArgumentException] {
      Features.targetEncode(d, "cat", col("y"), outCol = "y")
    }.getMessage.contains("exists"))
  }

  test("winsorize: exact percentile bounds clip tails, nulls pass through") {
    val d = (1 to 11).map(i => Some(i.toDouble)).toDF("v")
    val w = Features.winsorize(d, col("v"), 0.1, 0.9)
      .select(col("v"), col("w")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(w(1.0) == 2.0 && w(11.0) == 10.0) // p10 = 2, p90 = 10
    assert(w(5.0) == 5.0)                     // interior untouched
    val withNull = (Seq(Some(1.0), None) ++ (2 to 11).map(i => Some(i.toDouble)))
      .toDF("v")
    val nw = Features.winsorize(withNull, col("v"), 0.1, 0.9)
      .filter(col("v").isNull).select(col("w")).collect()
    assert(nw.length == 1 && nw(0).isNullAt(0))
    assert(intercept[IllegalArgumentException] {
      Features.winsorize(d, col("v"), 0.9, 0.1)
    }.getMessage.contains("pLo"))
  }

  test("robust outliers: hand-computed median/MAD, single planted outlier flagged") {
    val d = ((1 to 9).map(_.toDouble) :+ 100.0).toDF("v")
    val r = Features.robustOutlierStats(d, col("v"), k = 3.0).head
    assert(r.getDouble(0) == 5.5)
    assert(r.getDouble(1) == 2.5) // median of |v - 5.5|
    assert(r.getLong(2) == 1L)    // only 100 beyond 3*1.4826*2.5
    assert(r.getLong(3) == 10L)
    // clean data: no outliers
    val clean = Features.robustOutlierStats(
      (1 to 9).map(_.toDouble).toDF("v"), col("v")).head
    assert(clean.getLong(2) == 0L)
  }
}
