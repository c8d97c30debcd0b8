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
