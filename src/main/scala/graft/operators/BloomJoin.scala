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
  *      ([[graft.functions.BloomAgg]] — mergeable, map-side combined),
  *      collected EAGERLY (a sketch, not row data — the scalar-subquery
  *      contract Spark's own runtime filter uses; calling semiJoin runs
  *      that one aggregation job);
  *   2. embed the filter as a plan literal and drop every big-side row
  *      whose key hash cannot be in it ([[graft.functions.BloomMightContain]]
  *      — codegen'd, runs inside the scan's WholeStageCodegen span);
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
    // xxhash64 hashes each TYPE differently (an int 5 and a bigint 5 get
    // different hashes), while the verifying equi join coerces mismatched
    // numeric keys and matches them — so hashing native types across a
    // type-mismatched pair would Bloom-FALSE-NEGATIVE rows the join would
    // have kept, silently breaking the "exact result regardless of m/k"
    // contract. Hash a common type: identical types pass through; integral
    // pairs widen to long (lossless, same values the equality coerces to);
    // anything else must be cast explicitly by the caller.
    val bigType = big.select(bigKey).schema.head.dataType
    val smallType = small.select(smallKey).schema.head.dataType
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    val (bigHashKey, smallHashKey) =
      if (bigType == smallType) (bigKey, smallKey)
      else if (integral(bigType) && integral(smallType))
        (bigKey.cast("long"), smallKey.cast("long"))
      else throw new IllegalArgumentException(
        s"bloom semiJoin key types differ (${bigType.simpleString} vs " +
          s"${smallType.simpleString}) and are not both integral; xxhash64 " +
          "would hash them differently and the pre-filter would silently " +
          "drop matching rows — cast both keys to a common type first")
    // The filter is built EAGERLY (one sketch-sized collect — the same
    // contract as Spark's own runtime filter, whose bloom rides a
    // scalar subquery evaluated before the main query) and embedded as
    // a CONSTANT of the probe expression (codegen addReferenceObj — the
    // same plan-embedded-constant pattern as the k-means centroids and
    // AffineProject matrices). The 1-row-broadcast-crossJoin spelling
    // is a per-row disaster: whole-stage codegen evaluates the joined
    // broadcast column eagerly in the join's consume path, so every
    // probe row re-copies the filter bytes out of the UnsafeRow no
    // matter what the probe expression caches — measured cost LINEAR in
    // filter size (m=2²² over 15M rows: 98 s; as a constant:
    // zero copies). A child Literal would be correct too but prints the
    // whole filter as hex into every plan string/AQE log line.
    val bloomBytes = small
      .select(xxhash64(smallHashKey).as("__h"))
      .agg(BloomAgg(col("__h"), numBits, numHashes).as("__bloom"))
      .collect()(0).getAs[Array[Byte]](0)
    val keys = small.select(smallKey.as("__k")).distinct()
    // PinnedPredicate: spelled as a plain deterministic filter,
    // PushDownLeftSemiAntiJoin sinks the verifying semi join BELOW the
    // bloom filter (join-then-bloom — the exact inverse of a runtime
    // filter). The barrier pins execution to bloom-then-join, so only
    // pruned rows reach the semi join's exchange.
    big
      .filter(graft.functions.PinnedPredicate(
        BloomMightContain(xxhash64(bigHashKey), bloomBytes, numBits, numHashes)))
      .join(keys, bigKey === col("__k"), "left_semi")
  }
}
