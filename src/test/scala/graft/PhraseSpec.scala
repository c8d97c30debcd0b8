package graft

import graft.pipeline.Phrase

/** Positional phrase search: consecutive-match semantics, overlaps,
  * repeated terms, case folding. */
class PhraseSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "new york city is in new york state"),
    (2L, "york new has the words but not the phrase"),
    (3L, "new york"),
    (4L, "completely unrelated text"),
    (5L, "NEW YORK uppercase still matches"))
    .toDF("doc_id", "text")

  private def hits(phrase: String*) =
    Phrase.phraseSearch(docs, "doc_id", "text", phrase)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_hits")).toMap

  test("counts every occurrence; order matters; lowercased match") {
    val h = hits("new", "york")
    assert(h === Map(1L -> 2L, 3L -> 1L, 5L -> 1L)) // doc 2 has reversed order
  }

  test("three-term phrase crosses both join hops") {
    assert(hits("new", "york", "city") === Map(1L -> 1L))
  }

  test("repeated term in the phrase aligns positions correctly") {
    val d = Seq((1L, "a a a b"), (2L, "a b a")).toDF("doc_id", "text")
    val h = Phrase.phraseSearch(d, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_hits")).toMap
    assert(h === Map(1L -> 2L)) // positions (0,1) and (1,2); doc 2 has none
  }

  test("single-term phrase degenerates to term counting") {
    assert(hits("york") === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("no matches -> empty result; validation") {
    assert(hits("zz", "qq").isEmpty)
    intercept[IllegalArgumentException] {
      Phrase.phraseSearch(docs, "doc_id", "text", Seq())
    }
  }
}
