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

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): rank corpus
    * tokens by PageRank over the adjacent-token co-occurrence graph and
    * return the top-k — the unsupervised keyword/keyphrase primitive
    * (salience from graph centrality, not raw frequency, so function-y
    * connector tokens that co-occur with everything still lose to hub
    * terms of tight topical neighborhoods).
    *
    * Graph: one DISTINCT edge per ordered adjacent token pair (classic
    * TextRank is undirected — symmetry comes from keeping both
    * directions of each bigram), tokens shorter than `minLen` dropped
    * before pairing so the graph isn't dominated by stop-length tokens.
    * Ranks from [[graft.operators.Graphs.pageRank]] with `iters` damped
    * rounds. Ties break by token (rank desc, token asc).
    *
    * Scale shape: the bigram explode is a pure projection off the corpus
    * scan; the edge set collapses through one distinct before any graph
    * work (vocabulary², not corpus, bounds everything downstream — the
    * q201 pair-generation lesson); each PageRank round is two
    * vocab-keyed joins + one keyed agg with staged lineage. Returns
    * (token, rank) — the top-k rows only.
    */
  def textRank(
      df: DataFrame,
      textCol: String,
      k: Int,
      iters: Int = 5,
      damping: Double = 0.85,
      minLen: Int = 2
  ): DataFrame = {
    require(k > 0, s"top-k must be positive, got $k")
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    // bind the filtered token array ONCE as an attribute before the
    // shingle HOF (HOF lambdas get no CSE — the tokenizer would re-run
    // per element otherwise)
    val toksDf = df
      .select(filter(TextOps.tokens(col(textCol)),
        t => length(t) >= minLen).as("t"))
    val edges = toksDf
      .select(explode(TextOps.wordShingles(col("t"), 2)).as("bg"))
      .select(split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"))
      .filter(col("w1") =!= col("w2"))
    val sym = edges.union(edges.select(col("w2").as("w1"), col("w1").as("w2")))
    graft.operators.Graphs.pageRank(sym, "w1", "w2", iters, damping)
      .select(col("node").as("token"), col("rank"))
      .orderBy(col("rank").desc, col("token").asc)
      .limit(k)
  }
}
