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

  test("textRank: hub token outranks leaves; ranks replicate the def") {
    // path graph aa - bb - cc (bb is the hub), plus single-char tokens
    // that minLen = 2 must drop before pairing
    val d = Seq((1L, "aa bb x"), (2L, "bb cc"), (3L, "y cc bb"))
      .toDF("doc_id", "text")
    val out = Phrase.textRank(d, "text", k = 3, iters = 5).collect()
    assert(out.map(_.getString(0)).toSet === Set("aa", "bb", "cc"))
    // reference damped PageRank on the undirected path, 5 rounds
    var r = Map("aa" -> 1.0 / 3, "bb" -> 1.0 / 3, "cc" -> 1.0 / 3)
    for (_ <- 1 to 5) {
      val c = Map(
        "aa" -> r("bb") / 2,
        "cc" -> r("bb") / 2,
        "bb" -> (r("aa") + r("cc")))
      r = c.map { case (k2, v) => k2 -> (0.15 / 3 + 0.85 * v) }
    }
    val got = out.map(x => x.getString(0) -> x.getDouble(1)).toMap
    r.foreach { case (tok, want) =>
      assert(math.abs(got(tok) - want) < 1e-12, tok)
    }
    assert(out(0).getString(0) === "bb") // hub first
    // k truncates after the deterministic (rank desc, token) order
    val top1 = Phrase.textRank(d, "text", k = 1, iters = 5).collect()
    assert(top1.length === 1 && top1(0).getString(0) === "bb")
  }
}
