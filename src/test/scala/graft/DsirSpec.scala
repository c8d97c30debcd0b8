package graft

import graft.pipeline.Dsir

/** DSIR importance scoring: the self-target identity, direction of the
  * preference, occurrence counting, and the <2-token exclusion. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "the quick brown fox runs"),
    (3L, "lorem ipsum dolor sit amet"),
    (4L, "solo"))
    .toDF("doc_id", "text")

  test("raw == target makes every weight exactly zero") {
    val out = Dsir.importanceScores(corpus, corpus, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    assert(out.size === 3) // doc 4 has one token → no bigram → absent
    assert(out.values.forall(_ === 0.0))
  }

  test("target-like documents outscore dissimilar ones") {
    val target = corpus.filter($"doc_id" === 1L)
    val out = Dsir.importanceScores(corpus, target, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
    // doc 2 shares 3 of 4 bigrams with the target; doc 3 shares none
    assert(out(1L) > out(3L))
    assert(out(2L) > out(3L))
  }

  test("n_grams counts bigram OCCURRENCES (repeats included)") {
    val rep = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val out = Dsir.importanceScores(rep, rep, "doc_id", "text")
      .collect().head
    assert(out.getAs[Long]("n_grams") === 4L)
  }

  test("flagged single-scan variant reproduces the two-frame result exactly") {
    val two = Dsir.importanceScores(corpus, corpus.filter($"doc_id" <= 2L),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val one = Dsir.importanceScoresFlagged(corpus, "doc_id", "text",
      $"doc_id" <= 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(one === two)
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      Dsir.importanceScores(corpus, corpus, "doc_id", "text", buckets = 1)
    }
    intercept[IllegalArgumentException] {
      Dsir.importanceScores(corpus, corpus, "doc_id", "text", lambda = 0.0)
    }
  }
}
