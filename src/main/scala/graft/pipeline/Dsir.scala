package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score raw-corpus documents by how target-like their
  * hashed n-gram distribution is, so a small high-quality target set
  * steers selection from a web-scale raw pool.
  *
  * The importance weight of a document is Σ over its bigram occurrences of
  * log p̂_target(bucket) − log p̂_raw(bucket), with hashed-bigram bucket
  * unigram models and add-λ smoothing — the paper's "hashed n-gram
  * features" estimator. Selection = top-k by score (deterministic id
  * tiebreak; the paper's Gumbel-noise resample swaps in by adding noise
  * upstream of the top-k — keep the default deterministic so runs are
  * reproducible).
  *
  * Scale shape: each side streams ONCE through tokenize → explode →
  * bucket-keyed count (map-side combine; ≤ `buckets` rows out — the whole
  * point of feature hashing is that model size is `buckets`, not
  * vocabulary). The weight table is ≤ `buckets` rows and BROADCASTS to the
  * per-doc scoring join; totals ride 1-row broadcast cross-joins. Nothing
  * corpus-sized shuffles except the (doc, bucket) pairs into the per-doc
  * sum — bounded by the corpus token count.
  */
object Dsir {

  /** Per-document importance scores of `raw` against `target`.
    * Returns (id, n_grams, score); documents with no bigrams (< 2 tokens)
    * are absent — they carry no evidence either way.
    */
  def importanceScores(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 8192,
      lambda: Double = 1.0
  ): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(lambda > 0.0, s"lambda must be positive, got $lambda")

    def bucketed(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"),
        TextOps.wordShingles(TextOps.tokens(col(textCol)), 2).as("bgs"))
      .select(col("id"), explode(col("bgs")).as("bg"))
      .select(col("id"), (TextOps.hash32(col("bg")) % buckets).as("bucket"))

    val rawB = bucketed(raw)
    val tgtCounts = bucketed(target)
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val rawCounts = rawB.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val tgtTotal = tgtCounts.agg(coalesce(sum(col("ct")), lit(0L)).as("tt"))
    val rawTotal = rawCounts.agg(coalesce(sum(col("cr")), lit(0L)).as("tr"))
    // weight per OBSERVED raw bucket (buckets unseen in raw carry no raw
    // occurrences to score); target side left-joins with zero fallback
    val weights = rawCounts
      .join(tgtCounts, Seq("bucket"), "left")
      .crossJoin(broadcast(tgtTotal))
      .crossJoin(broadcast(rawTotal))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + lambda) /
            (col("tt") + lit(lambda * buckets))) -
          log((col("cr") + lambda) /
            (col("tr") + lit(lambda * buckets)))).as("logw"))
    rawB
      .join(broadcast(weights), Seq("bucket"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"), sum(col("logw")).as("score"))
  }
}
