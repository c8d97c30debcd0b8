package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band/interval) joins — operators Spark lacks natively.
  *
  * The naive spelling `a.join(b, a("t") >= b("lo") && a("t") <= b("hi"))`
  * has no equi-key, so Catalyst plans a broadcast-nested-loop (or, worse,
  * a cartesian) — O(|A|·|B|) comparisons, the classic job-killer the
  * moment neither side broadcasts. The standard scale shape (used by every
  * warehouse engine's range-join optimization, cf. the published
  * Databricks/Snowflake range-join docs and the interval-join in Flink) is
  * BUCKETIZATION: quantize the value domain into fixed-width buckets,
  * emit each interval once per bucket it overlaps, emit each point into
  * the single bucket containing it, and equi-join on the bucket id — two
  * shuffles on (keys…, bucket), partial predicates re-checked exactly
  * after the join. Work is O(|A| + |B| + matches + interval-spans), fully
  * distributed, AQE-skew-splittable.
  *
  * Both operators take LONG domains (decode timestamps upstream — e.g.
  * `EventTime.epochMicros` for the events table, matching the q54/q58
  * convention). `bucketWidth` trades shuffle fan-out (intervals emit
  * span/width + 1 rows) against join selectivity (points in a bucket meet
  * every interval touching it); set it near the TYPICAL interval length so
  * most intervals emit 1-2 rows. `maxBucketsPerInterval` is the fan-out
  * valve: one degenerate interval spanning the whole domain would
  * otherwise emit the entire bucket range — the valve fails fast (telling
  * you to raise `bucketWidth`) instead of silently exploding the shuffle.
  */
object RangeJoin {

  /** Exact floor division on longs: `pmod` makes the numerator an exact
    * multiple of `w`, so integral DIV's truncation equals floor — no
    * double-precision detour (epoch-micros exceed 2^53-safe division).
    * `private[graft]`: the streaming attribution join buckets the same way. */
  private[graft] def floorDiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  private def requireDisjoint(left: DataFrame, right: DataFrame, keys: Seq[String]): Unit = {
    val clash = left.columns.toSet
      .intersect(right.columns.toSet)
      .diff(keys.toSet + "__bucket")
    require(clash.isEmpty,
      s"column names must be disjoint outside the join keys, both sides have: ${clash.mkString(", ")}")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "'__bucket' is reserved by RangeJoin")
  }

  /** Interval rows exploded to one row per overlapped bucket, with the
    * fan-out valve applied. NULL or inverted (`lo > hi`) intervals drop —
    * they can contain/overlap nothing. */
  private def explodeBuckets(
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long
  ): DataFrame = {
    val bLo = floorDiv(col(loCol), bucketWidth)
    val bHi = floorDiv(col(hiCol), bucketWidth)
    intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .filter(
        when(bHi - bLo >= lit(maxBucketsPerInterval),
          raise_error(concat(
            lit(s"RangeJoin: interval [$loCol, $hiCol] spans "),
            (bHi - bLo + 1).cast("string"),
            lit(s" buckets (> $maxBucketsPerInterval); raise bucketWidth " +
              s"(=$bucketWidth) or cap interval lengths upstream")))
            .cast("boolean"))
          .otherwise(lit(true)))
      .withColumn("__bucket", explode(sequence(bLo, bHi)))
  }

  /** For every point row, the interval rows whose `[loCol, hiCol]` contains
    * `pointCol` (inclusive), optionally also matching on equality `keys`.
    * Output: point columns ++ interval columns (keys merged). Each matching
    * pair appears exactly once — a point lives in ONE bucket, so the
    * bucket equi-join cannot duplicate a pair. NULL points never match.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 4096L
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    requireDisjoint(points, intervals, keys)
    val p = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__bucket", floorDiv(col(pointCol), bucketWidth))
    val iv = explodeBuckets(intervals, loCol, hiCol, bucketWidth, maxBucketsPerInterval)
    p.join(iv, keys :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** All (left, right) interval pairs that OVERLAP: `lo1 <= hi2 AND
    * lo2 <= hi1` (inclusive), optionally also matching on equality `keys`.
    * An overlapping pair shares every bucket in the overlap region; the
    * pair is accepted only in the bucket containing `max(lo1, lo2)` —
    * which both sides provably emit — so each pair appears exactly once
    * with no distinct pass. */
  def intervalOverlap(
      left: DataFrame,
      loL: String,
      hiL: String,
      right: DataFrame,
      loR: String,
      hiR: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 4096L
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    requireDisjoint(left, right, keys)
    val l = explodeBuckets(left, loL, hiL, bucketWidth, maxBucketsPerInterval)
    val r = explodeBuckets(right, loR, hiR, bucketWidth, maxBucketsPerInterval)
    l.join(r, keys :+ "__bucket")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .filter(col("__bucket") ===
        greatest(floorDiv(col(loL), bucketWidth), floorDiv(col(loR), bucketWidth)))
      .drop("__bucket")
  }
}
