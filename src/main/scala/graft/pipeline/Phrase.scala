package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase search over a document corpus: exact consecutive-token
  * phrase matching through a positional postings list — the retrieval
  * primitive BM25's bag-of-words scoring can't express ("new york" as a
  * phrase, not two tokens).
  *
  * Scale shape: the postings explode is filtered to the PHRASE'S TERMS
  * inside the scan projection (the BM25 pre-shuffle filter pattern, §27),
  * so the shuffle carries O(docs containing a query term · phrase length)
  * postings, never the corpus token stream. The phrase chain is
  * (phrase length − 1) equi-joins ALL KEYED ON (doc, aligned position) —
  * one partitioning serves every hop (exchange reuse), each hop can only
  * shrink the candidate set. No window, no sort, no per-doc arrays.
  */
object Phrase {

  /** Documents containing `phrase` as consecutive tokens (the corpus
    * tokenizer: lowercased whitespace tokens), with occurrence counts.
    * Returns (id, n_hits), matching docs only. */
  def phraseSearch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]
  ): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    require(phrase.forall(_.nonEmpty), s"phrase terms must be non-empty: $phrase")
    val terms = phrase.distinct
    // staged: each chain hop filters the SAME materialized postings —
    // without it every hop re-scans and re-explodes the corpus
    // (plan-audited: 3 FileScans for a 3-term phrase)
    val postings = graft.Staging.stage(df
      .select(col(idCol).as("id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(terms: _*)))
    // start positions of term 0; each hop j keeps starts whose j-th
    // successor matches term j (join key = the aligned start position)
    var starts = postings.filter(col("tok") === phrase.head).select(col("id"), col("pos"))
    for (j <- 1 until phrase.length) {
      starts = starts.join(
        postings.filter(col("tok") === phrase(j))
          .select(col("id"), (col("pos") - j).as("pos")),
        Seq("id", "pos"))
    }
    starts.groupBy("id").agg(count(lit(1)).as("n_hits"))
  }
}
