package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage (entity resolution): fuzzy-match records by a
  * string field, but only WITHIN equi-join blocks — the standard
  * blocking-key design that turns an O(n²) corpus-wide fuzzy join into
  * per-block quadratic work over bounded blocks (Fellegi-Sunter-style
  * pipelines; the same valve discipline as the dedup candidate joins).
  *
  * Scale shape: one self-equi-join keyed on the block columns (never
  * all-pairs), per-pair `levenshtein` evaluated inside codegen, then one
  * hash aggregation keyed on the left id picking the (distance, id)
  * lexicographic minimum — deterministic nearest match, no window sort.
  * Oversized blocks (a null-ish blocking key matching everything) are
  * dropped by `maxBlockSize` BEFORE the join — the explicit skew valve.
  */
object Linkage {

  /** For every record, its nearest OTHER record in the same block by
    * edit distance on `nameCol` (ties broken by smaller candidate id).
    * Records in dropped (oversized) or singleton blocks produce no row.
    * Returns (id, match_id, distance).
    */
  def nearestInBlock(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      blockCols: Seq[String],
      maxBlockSize: Int = 1000
  ): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    require(maxBlockSize >= 2, s"maxBlockSize must be >= 2, got $maxBlockSize")
    val base = df.select(
      (col(idCol).as("__id") +: col(nameCol).as("__name") +:
        blockCols.map(c => col(c))): _*)
    val sizes = base.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") <= maxBlockSize)
      .drop("__bsz")
    // no broadcast hint: the block-key table is one row per DISTINCT
    // block (can be huge at scale) — let AQE pick the join strategy
    val valved = base.join(sizes, blockCols)
    val a = valved.select(
      (col("__id").as("id") +: col("__name").as("__n1") +:
        blockCols.map(c => col(c))): _*)
    val b = valved.select(
      (col("__id").as("__id2") +: col("__name").as("__n2") +:
        blockCols.map(c => col(c))): _*)
    a.join(b, blockCols)
      .filter(col("id") =!= col("__id2"))
      .select(col("id"),
        struct(
          levenshtein(col("__n1"), col("__n2")).as("distance"),
          col("__id2").as("match_id")).as("__cand"))
      .groupBy("id")
      .agg(min(col("__cand")).as("__best"))
      .select(col("id"), col("__best.match_id").as("match_id"),
        col("__best.distance").as("distance"))
  }
}
