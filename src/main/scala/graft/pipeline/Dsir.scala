package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

    // tokens bound as an attribute BEFORE shingling (HOF lambdas get no
    // CSE — inline tokens(text) re-runs the regex per shingle element,
    // measured 20×+; the shingleSets pattern), and the source normalized
    // so a single-row-group extract doesn't pin the stage to one core
    def bucketed(df: DataFrame): DataFrame =
      graft.sources.ScaleOps.normalizeParallelism(
        df.select(col(idCol).as("id"), col(textCol).as("__text")),
        df.sparkSession.sparkContext.defaultParallelism)
        .select(col("id"), TextOps.tokens(col("__text")).as("__t"))
        .select(col("id"), TextOps.wordShingles(col("__t"), 2).as("bgs"))
        .select(col("id"), explode(col("bgs")).as("bg"))
        .select(col("id"), (TextOps.hash32(col("bg")) % buckets).as("bucket"))

    // staged: the raw side feeds BOTH the bucket counts and the scoring
    // join — without it the tokenize+hash pass runs twice
    val rawB = graft.Staging.stage(bucketed(raw))
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

  /** Single-scan variant for the common case where the target set is a
    * PREDICATE over the raw corpus (a language slice, a quality flag):
    * both bucket models come from ONE tokenize+hash pass — the target
    * count is a conditional sum in the same aggregate — instead of
    * scanning the corpus twice. Identical math and results to
    * [[importanceScores]]`(raw, raw.filter(targetFlag), …)`.
    */
  def importanceScoresFlagged(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      targetFlag: Column,
      buckets: Int = 8192,
      lambda: Double = 1.0
  ): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(lambda > 0.0, s"lambda must be positive, got $lambda")
    val bucketedFlagged = graft.sources.ScaleOps.normalizeParallelism(
      raw.select(col(idCol).as("id"), col(textCol).as("__text"),
        targetFlag.as("__tf")),
      raw.sparkSession.sparkContext.defaultParallelism)
      .select(col("id"), col("__tf"), TextOps.tokens(col("__text")).as("__t"))
      .select(col("id"), col("__tf"), TextOps.wordShingles(col("__t"), 2).as("bgs"))
      .select(col("id"), col("__tf"), explode(col("bgs")).as("bg"))
      .select(col("id"), col("__tf"),
        (TextOps.hash32(col("bg")) % buckets).as("bucket"))
    val rawB = graft.Staging.stage(bucketedFlagged)
    // ONE keyed aggregate carries both models: cr = all occurrences,
    // ct = occurrences under the flag
    val counts = rawB.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("__tf"), 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(
      coalesce(sum(col("cr")), lit(0L)).as("tr"),
      coalesce(sum(col("ct")), lit(0L)).as("tt"))
    val weights = counts
      .crossJoin(broadcast(totals))
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
