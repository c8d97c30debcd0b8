package graft

import org.apache.spark.sql.functions._
import graft.functions.BinExprs

/** The binary-search BucketBin expression must agree with the literal CASE
  * chain it replaces above 64 cuts — same bin for every input, including
  * the fall-through corners (NULL, NaN, ties on a cut, duplicated cuts). */
class BinExprsSpec extends SparkTestBase {
  import spark.implicits._

  // the chain spelling, copied semantics-for-semantics from caseChainBin
  private def chain(v: org.apache.spark.sql.Column, cuts: Array[Double]) =
    cuts.drop(1).zipWithIndex
      .foldLeft(when(v <= lit(cuts(0)), lit(1))) { case (acc, (c, i)) =>
        acc.when(v <= lit(c), lit(i + 2))
      }
      .otherwise(lit(cuts.length + 1))

  test("bucketBin equals the literal chain on random cuts and inputs") {
    val rng = new scala.util.Random(42)
    val cuts = Array.fill(113)(rng.nextDouble() * 100).sorted
    val vals: Seq[java.lang.Double] =
      Seq.fill(400)(java.lang.Double.valueOf(rng.nextDouble() * 120 - 10)) ++
        cuts.take(50).map(java.lang.Double.valueOf) ++ // exact ties on cuts
        Seq(java.lang.Double.valueOf(Double.NaN), null,
          java.lang.Double.valueOf(-1e18), java.lang.Double.valueOf(1e18))
    val df = vals.toDF("v").select(col("v").cast("double").as("v"))
    val got = df.select(
      BinExprs.bucketBin(col("v"), cuts).as("bs"),
      chain(col("v"), cuts).as("ch")).collect()
    got.foreach { r => assert(r.getInt(0) == r.getInt(1), s"row $r") }
  }

  test("bucketBin handles duplicated cuts like the chain (first match wins)") {
    val cuts = Array(1.0, 5.0, 5.0, 5.0, 9.0) ++ (10 to 80).map(_.toDouble)
    val df = Seq(0.5, 1.0, 3.0, 5.0, 5.5, 9.0, 9.5, 80.0, 99.0).toDF("v")
    val got = df.select(
      BinExprs.bucketBin(col("v"), cuts).as("bs"),
      chain(col("v"), cuts).as("ch")).collect()
    got.foreach { r => assert(r.getInt(0) == r.getInt(1), s"row $r") }
  }

  test("bucketBin rejects unsorted cuts") {
    intercept[IllegalArgumentException] {
      BinExprs.bucketBin(lit(1.0), Array(2.0, 1.0))
    }
  }

  test("caseChainBin transparently switches to bucketBin above 64 cuts") {
    val cuts65 = (1 to 65).map(_.toDouble).toArray
    val cuts64 = (1 to 64).map(_.toDouble).toArray
    val df = Seq(0.0, 1.0, 32.5, 64.0, 64.5, 65.0, 99.0).toDF("v")
      .select(col("v").cast("double").as("v"))
    val got = df.select(
      graft.binsreg.Dbbinsreg.caseChainBin(col("v"), cuts65).as("big"),
      graft.binsreg.Dbbinsreg.caseChainBin(col("v"), cuts64).as("small"),
      BinExprs.bucketBin(col("v"), cuts65).as("bs")).collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(2)) // >64 path == binary search
    }
    // the ≤64 path is still the literal chain: same contract on its domain
    val small = df.select(
      graft.binsreg.Dbbinsreg.caseChainBin(col("v"), cuts64).as("ch"),
      BinExprs.bucketBin(col("v"), cuts64).as("bs")).collect()
    small.foreach { r => assert(r.getInt(0) == r.getInt(1)) }
  }
}
