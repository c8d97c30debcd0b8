package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextOps

/** The native one-pass WordShingles expression must be BIT-identical to
  * the HOF spelling it replaced (when/sequence/transform/concat_ws),
  * including short-doc, exact-n, null-element, and NULL-array semantics
  * (size(null) = −1 under the default legacy sizeOfNull, so a NULL token
  * array takes the `< n` branch → the empty array). */
class WordShinglesSpec extends SparkTestBase {
  import spark.implicits._

  // the pre-r16 HOF spelling, verbatim
  private def hofShingles(toks: org.apache.spark.sql.Column, n: Int) =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)
      ))

  test("bit-identical to the HOF spelling across n and token counts") {
    val rng = new scala.util.Random(31)
    val rows = Seq.fill(80)(
      Seq.fill(rng.nextInt(12))(s"w${rng.nextInt(30)}"))
    val df = rows.toDF("toks")
    Seq(2, 3, 5, 8).foreach { n =>
      val got = df.select(
        TextOps.wordShingles(col("toks"), n).as("native"),
        hofShingles(col("toks"), n).as("hof")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("short docs (size < n) and exact-n docs match the HOF") {
    val df = Seq(
      Seq.empty[String], Seq("a"), Seq("a", "b"), Seq("a", "b", "c")
    ).toDF("toks")
    val got = df.select(
      TextOps.wordShingles(col("toks"), 3).as("native"),
      hofShingles(col("toks"), 3).as("hof")).collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("null elements are skipped by the join exactly like concat_ws") {
    val df = Seq(1).toDF("id").withColumn("toks",
      array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")))
    val got = df.select(
      TextOps.wordShingles(col("toks"), 2).as("native"),
      hofShingles(col("toks"), 2).as("hof")).collect()(0)
    assert(got.getSeq[String](0) == got.getSeq[String](1))
    // pin the concat_ws rule itself: ("a", null) joins to "a", not "a "
    assert(got.getSeq[String](0) == Seq("a", "b", "b c"))
  }

  test("NULL token array matches the HOF: the one-empty-shingle array") {
    // under the Spark 4 ANSI default size(null) is null, so the HOF fell
    // through to its otherwise branch and produced [""] — pinned exactly
    val df = Seq(1).toDF("id")
      .withColumn("toks", lit(null).cast("array<string>"))
    val got = df.select(
      TextOps.wordShingles(col("toks"), 2).as("native"),
      hofShingles(col("toks"), 2).as("hof")).collect()(0)
    assert(!got.isNullAt(0))
    assert(got.getSeq[String](0) == got.getSeq[String](1))
    assert(got.getSeq[String](0) == Seq(""))
  }

  test("interpreted eval matches codegen") {
    val rng = new scala.util.Random(37)
    val df = Seq.fill(30)(Seq.fill(1 + rng.nextInt(9))(s"t${rng.nextInt(9)}"))
      .toDF("toks")
    val viaCodegen = df.select(TextOps.wordShingles(col("toks"), 3).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    val old = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = df.select(TextOps.wordShingles(col("toks"), 3).as("s"))
        .collect().map(_.getSeq[String](0)).toSeq
      assert(viaCodegen == viaEval)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", old)
  }
}
