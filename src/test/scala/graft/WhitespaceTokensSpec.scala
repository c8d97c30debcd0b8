package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextOps

/** The native one-pass WhitespaceTokens expression must be BIT-identical
  * to the HOF spelling it replaced —
  * `filter(split(lower(text), "\\s+"), t => length(t) > 0)` — including
  * leading/trailing whitespace (where split emits empty tokens the filter
  * discarded), whitespace-only and empty strings, NULL input, every Java
  * `\s` class member, and unicode whitespace `\s` does NOT match. */
class WhitespaceTokensSpec extends SparkTestBase {
  import spark.implicits._

  // the pre-r17 HOF spelling, verbatim
  private def hofTokens(text: org.apache.spark.sql.Column) =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  private def assertParity(rows: Seq[String]): Unit = {
    val df = rows.toDF("text")
    val got = df.select(
      TextOps.tokens(col("text")).as("native"),
      hofTokens(col("text")).as("hof")).collect()
    got.zip(rows).foreach { case (r, in) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"input=${in.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("bit-identical to the HOF spelling on random ASCII+unicode text") {
    val rng = new scala.util.Random(41)
    val alphabet = "ab YZ\t\n\ré世   .!"
    val rows = Seq.fill(200)(
      Seq.fill(rng.nextInt(40))(alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    assertParity(rows)
  }

  test("edge shapes: empty, whitespace-only, leading/trailing, all \\s members") {
    assertParity(Seq(
      "", " ", "\t\n\r ", "a", " a", "a ", " a ",
      "a  b", "a\tb\nc\rdef",
      "Mixed CASE Text", "café NAÏVE",
      // unicode whitespace must NOT split (Java \s is ASCII-only)
      "a\u00a0b", "a\u2028b", "a\u3000b",
      "\u4e16\u754c \u4e16\u754c"))
  }

  test("NULL text is NULL (split/filter both propagate)") {
    val df = Seq(1).toDF("id").withColumn("text", lit(null).cast("string"))
    val got = df.select(
      TextOps.tokens(col("text")).as("native"),
      hofTokens(col("text")).as("hof")).collect()(0)
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("interpreted eval matches codegen") {
    val rows = Seq(" a  b\tc ", "", "\r\n", "x", " ", " 世 j ")
    val df = rows.toDF("text")
    val viaCodegen = df.select(TextOps.tokens(col("text")).as("t"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0)).toSeq
    val old = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.select(TextOps.tokens(col("text")).as("t"))
        .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0)).toSeq
      assert(viaCodegen == interpreted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", old)
  }

  test("real corpus parity (sf0.001 documents)") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_SMALL",
      "/root/testdata/sf0.001")
    val p = java.nio.file.Paths.get(s"$dir/documents.parquet")
    assume(java.nio.file.Files.exists(p), s"no testdata at $p")
    val docs = spark.read.parquet(p.toString)
    val mismatches = docs.select(
        TextOps.tokens(col("text")).as("native"),
        hofTokens(col("text")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mismatches == 0L)
  }
}
