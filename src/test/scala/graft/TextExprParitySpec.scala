package graft

import org.apache.spark.sql.functions._

import graft.functions.TextExprs
import graft.pipeline.TextOps

/** CountInSet / SumCharLength must be BIT-identical to the HOF spellings
  * they replaced: `size(filter(arr, _.isInCollection(set)))` and
  * `aggregate(arr, 0L, (a, x) => a + length(x))` — including NULL
  * elements (skipped by the filter's three-valued predicate; poisoning
  * the aggregate's accumulator), NULL arrays, empties, and unicode
  * codepoint counting. */
class TextExprParitySpec extends SparkTestBase {
  import spark.implicits._

  private val set = Seq("the", "a", "of", "世界")

  private def hofCount(c: org.apache.spark.sql.Column) =
    size(filter(c, x => x.isInCollection(set)))
  private def hofSumLen(c: org.apache.spark.sql.Column) =
    aggregate(c, lit(0L), (a, x) => a + length(x))

  test("CountInSet == size(filter(isInCollection)) on random arrays") {
    val rng = new scala.util.Random(53)
    val words = Seq("the", "a", "of", "b", "xx", "世界", "The", "", "thee")
    val rows = Seq.fill(150)(
      Seq.fill(rng.nextInt(12))(words(rng.nextInt(words.length))))
    val df = rows.toDF("arr")
    df.select(TextExprs.countInSet(col("arr"), set).as("n"),
        hofCount(col("arr")).as("h")).collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("CountInSet: null elements skipped, null array null, empty 0") {
    val withNull = Seq(1).toDF("id").withColumn("arr",
      array(lit("the"), lit(null).cast("string"), lit("of"), lit("q")))
    val g1 = withNull.select(TextExprs.countInSet(col("arr"), set).as("n"),
      hofCount(col("arr")).as("h")).collect()(0)
    assert(g1.getInt(0) == 2 && g1.getInt(1) == 2)
    val nullArr = Seq(1).toDF("id")
      .withColumn("arr", lit(null).cast("array<string>"))
    val g2 = nullArr.select(TextExprs.countInSet(col("arr"), set).as("n"),
      hofCount(col("arr")).as("h")).collect()(0)
    assert(g2.isNullAt(0) && g2.isNullAt(1))
    val empty = Seq(Seq.empty[String]).toDF("arr")
    val g3 = empty.select(TextExprs.countInSet(col("arr"), set).as("n"),
      hofCount(col("arr")).as("h")).collect()(0)
    assert(g3.getInt(0) == 0 && g3.getInt(1) == 0)
  }

  test("SumCharLength == aggregate fold, unicode codepoints, null poisoning") {
    val rng = new scala.util.Random(59)
    val words = Seq("a", "abc", "世界", "naïve", "", "xxxxxxxxxx")
    val rows = Seq.fill(150)(
      Seq.fill(rng.nextInt(10))(words(rng.nextInt(words.length))))
    val df = rows.toDF("arr")
    df.select(TextExprs.sumCharLength(col("arr")).as("n"),
        hofSumLen(col("arr")).as("h")).collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // null element poisons the fold → NULL result, exactly as aggregate
    val withNull = Seq(1).toDF("id").withColumn("arr",
      array(lit("ab"), lit(null).cast("string"), lit("cd")))
    val g = withNull.select(TextExprs.sumCharLength(col("arr")).as("n"),
      hofSumLen(col("arr")).as("h")).collect()(0)
    assert(g.isNullAt(0) && g.isNullAt(1))
    // null array → NULL both ways
    val nullArr = Seq(1).toDF("id")
      .withColumn("arr", lit(null).cast("array<string>"))
    val g2 = nullArr.select(TextExprs.sumCharLength(col("arr")).as("n"),
      hofSumLen(col("arr")).as("h")).collect()(0)
    assert(g2.isNullAt(0) && g2.isNullAt(1))
  }

  test("interpreted eval matches codegen for both") {
    val df = Seq(Seq("the", "of", "世界", "z"), Seq.empty[String]).toDF("arr")
    def both() = df.select(
        TextExprs.countInSet(col("arr"), set).as("c"),
        TextExprs.sumCharLength(col("arr")).as("s")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val viaCodegen = both()
    val old = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(both() == viaCodegen)
    finally spark.conf.set("spark.sql.codegen.wholeStage", old)
  }

  test("langId / qualityScore / meanTokenLen / gopher keep their values on real docs") {
    val dir = "/root/testdata/sf0.001"
    val p = java.nio.file.Paths.get(s"$dir/documents.parquet")
    assume(java.nio.file.Files.exists(p), s"no testdata at $p")
    val docs = spark.read.parquet(p.toString)
    // HOF re-spellings of the consumers, verbatim pre-r17
    def hofTok(text: org.apache.spark.sql.Column) =
      filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val t = hofTok(col("text"))
    def hofStop(tc: org.apache.spark.sql.Column) =
      when(size(tc) === 0, 0.0).otherwise(
        size(filter(tc, x => x.isInCollection(TextOps.EnglishStopwords)))
          .cast("double") / size(tc).cast("double"))
    def hofLang(tc: org.apache.spark.sql.Column, lang: String) = {
      val markers = TextOps.LangMarkers.toMap.apply(lang)
      when(size(tc) === 0, 0.0).otherwise(
        size(filter(tc, x => x.isInCollection(markers)))
          .cast("double") / size(tc).cast("double"))
    }
    def hofMeanLen(tc: org.apache.spark.sql.Column) =
      when(size(tc) === 0, 0.0).otherwise(
        aggregate(tc, lit(0L), (acc, x) => acc + length(x)).cast("double") /
          size(tc).cast("double"))
    val tn = TextOps.tokens(col("text"))
    val mismatches = docs.select(
        TextOps.stopwordRatioT(tn).as("a1"), hofStop(t).as("b1"),
        TextOps.langScoreT(tn, "en").as("a2"), hofLang(t, "en").as("b2"),
        TextOps.langScoreT(tn, "de").as("a3"), hofLang(t, "de").as("b3"),
        TextOps.meanTokenLen(col("text")).as("a4"), hofMeanLen(t).as("b4"))
      .filter(!(col("a1") <=> col("b1")) || !(col("a2") <=> col("b2")) ||
        !(col("a3") <=> col("b3")) || !(col("a4") <=> col("b4")))
      .count()
    assert(mismatches == 0L)
  }
}
