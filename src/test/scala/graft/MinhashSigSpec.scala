package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextOps}

/** The native one-pass MinhashSig expression must be BIT-identical to the
  * HOF spelling it replaced (hash each element mod P, then NumHashes
  * array_min affine re-hashes), including the null/empty semantics the
  * family depends on (empty set ⇒ all-null signature). */
class MinhashSigSpec extends SparkTestBase {
  import spark.implicits._

  // the pre-r16 HOF spelling, verbatim
  private def hofSig(sharr: org.apache.spark.sql.Column) = {
    val xs = transform(sharr, s => TextOps.hash32(s) % Dedup.MinhashP)
    array((0 until Dedup.NumHashes).map { i =>
      array_min(transform(xs,
        x => (x * Dedup.minhashA(i) + Dedup.minhashB(i)) % Dedup.MinhashP))
    }: _*)
  }

  test("bit-identical to the HOF spelling on random shingle arrays") {
    val rng = new scala.util.Random(19)
    val rows = Seq.fill(60)(
      Seq.fill(1 + rng.nextInt(40))(
        Seq.fill(2)(s"w${rng.nextInt(50)}").mkString(" ")))
    val df = rows.toDF("sharr")
    val got = df.select(
      Dedup.minhashSigCol(col("sharr")).as("native"),
      hofSig(col("sharr")).as("hof")).collect()
    got.foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1))
    }
  }

  test("empty array yields the all-null signature; null elements are skipped") {
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("a b", "c d")),
      (3L, Seq("only one"))
    ).toDF("id", "sharr")
      // inject a null element alongside live ones (HOF array_min skips nulls)
      .withColumn("sharr2",
        when(col("id") === 2L,
          concat(col("sharr"), array(lit(null).cast("string"))))
          .otherwise(col("sharr")))
    val got = df.select(col("id"),
      Dedup.minhashSigCol(col("sharr2")).as("native"),
      hofSig(col("sharr2")).as("hof")).orderBy("id").collect()
    got.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"id=${r.getLong(0)}")
    }
    // the empty-set row: NumHashes nulls, not an empty array
    val emptyRow = got.find(_.getLong(0) == 1L).get.getSeq[Any](1)
    assert(emptyRow.length == Dedup.NumHashes && emptyRow.forall(_ == null))
  }

  test("null input array matches the HOF: a NON-null array of k nulls") {
    // the HOF spelling wraps per-hash nulls in a non-null array(...)
    // constructor, so even a NULL sharr yields array(null × NumHashes)
    val df = Seq(1L).toDF("id")
      .withColumn("sharr", lit(null).cast("array<string>"))
    val got = df.select(
      Dedup.minhashSigCol(col("sharr")).as("native"),
      hofSig(col("sharr")).as("hof")).collect()(0)
    assert(!got.isNullAt(0) && !got.isNullAt(1))
    assert(got.getSeq[Any](0) == got.getSeq[Any](1))
    assert(got.getSeq[Any](0).length == Dedup.NumHashes &&
      got.getSeq[Any](0).forall(_ == null))
  }

  test("Hash32 is bit-identical to the conv(substring(md5)) builtin chain") {
    val rng = new scala.util.Random(41)
    val rows = Seq.fill(60)(rng.alphanumeric.take(rng.nextInt(30)).mkString) ++
      Seq("", " ", "héllo wörld ünïcode", "", "日本語テキスト")
    val df = rows.toDF("s")
    val got = df.select(
      graft.functions.Hash32(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("chain"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
    // null in, null out — same as the chain
    val nr = Seq(1).toDF("id").withColumn("s", lit(null).cast("string"))
      .select(graft.functions.Hash32(col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("chain"))
      .collect()(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("interpreted eval matches codegen (filter context forces eval paths)") {
    val rng = new scala.util.Random(23)
    val rows = Seq.fill(30)(
      Seq.fill(1 + rng.nextInt(10))(s"t${rng.nextInt(20)}"))
    val df = rows.toDF("sharr")
    val viaCodegen = df.select(Dedup.minhashSigCol(col("sharr")).as("s"))
      .collect().map(_.getSeq[Any](0)).toSeq
    // evaluate the same expression interpreted (no wholestage codegen)
    val old = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaEval = df.select(Dedup.minhashSigCol(col("sharr")).as("s"))
        .collect().map(_.getSeq[Any](0)).toSeq
      assert(viaCodegen == viaEval)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", old)
  }
}
