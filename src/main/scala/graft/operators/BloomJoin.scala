package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BloomAgg, BloomMightContain}

/** Bloom-filtered semi join — the explicit spelling of the runtime-filter
  * rewrite distributed engines apply to selective fact ⋈ dim joins.
  *
  * `semiJoin(big, bigKey, small, smallKey)` computes exactly
  * `big SEMI JOIN small ON bigKey = smallKey`, in three steps:
  *
  *   1. aggregate the small side's key hashes into ONE m-bit Bloom filter
  *      row ([[graft.functions.BloomAgg]] — mergeable, map-side combined);
  *   2. broadcast that single row onto the big side (1-row crossJoin, the
  *      engine's A4 pattern) and drop every row whose key hash cannot be
  *      in the filter ([[graft.functions.BloomMightContain]] — codegen'd,
  *      runs inside the scan's WholeStageCodegen span);
  *   3. finish with the real semi join to remove Bloom false positives.
  *
  * Why it matters at 100 TB: step 3 alone shuffles the ENTIRE big side on
  * the join key; with the pre-filter, only rows that (probably) match —
  * selectivity + FP rate — reach the exchange. For a 1% -selective semi
  * join with a 1% FP filter that is a ~50× cut in shuffle bytes for the
  * cost of one broadcast byte array. Results are exact regardless of m/k
  * (the filter can only FAIL TO PRUNE, never wrongly drop: might_contain
  * has no false negatives).
  *
  * Sizing: FP rate ≈ (1 − e^{−kn/m})^k; the default 2²³ bits / 5 hashes
  * holds ~1M keys at ~2% FP in a 1 MiB broadcast. At larger n, grow m
  * linearly (m ≈ 10n bits for ~1% at k=5).
  */
object BloomJoin {

  def semiJoin(
      big: DataFrame,
      bigKey: Column,
      small: DataFrame,
      smallKey: Column,
      numBits: Int = 1 << 23,
      numHashes: Int = 5
  ): DataFrame = {
    val bloom = small
      .select(xxhash64(smallKey).as("__h"))
      .agg(BloomAgg(col("__h"), numBits, numHashes).as("__bloom"))
    val keys = small.select(smallKey.as("__k")).distinct()
    // The probe is wrapped in PinnedPredicate: spelled as a plain
    // deterministic filter, PushDownLeftSemiAntiJoin sinks the verifying
    // semi join BELOW the bloom filter (join-then-bloom — the exact
    // inverse of a runtime filter; observed on this Spark, whether the
    // probe is a standalone filter or a left-only join conjunct). The
    // barrier pins execution to bloom-then-join, so only pruned rows
    // reach the semi join's exchange.
    big.crossJoin(broadcast(bloom))
      .filter(graft.functions.PinnedPredicate(
        BloomMightContain(col("__bloom"), xxhash64(bigKey), numBits, numHashes)))
      .drop("__bloom")
      .join(keys, bigKey === col("__k"), "left_semi")
  }
}
