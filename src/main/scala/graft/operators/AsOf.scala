package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) joins — an operator Spark lacks natively.
  *
  * Built by composition (SURVEY §7.3 preference (a)): union the two
  * inputs, sort within each key partition by event time, and carry the
  * right side's latest values forward with `last(..., ignoreNulls)` over
  * an unbounded-preceding window. One shuffle on the key, one sort —
  * the same cost shape as a sort-merge join, and the window is partitioned
  * by key so it parallelizes in the number of keys (no global sort).
  */
object AsOf {

  /** For every left row, attach the most recent right-side `valueCols`
    * with `right.ts <= left.ts` (per key). Ties: the right row sorts
    * before the left row at equal ts (matches "as of now, inclusive").
    *
    * Output: left rows + `<valueCol>_asof` columns (null when no prior
    * right row exists).
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      tieBreakCol: Option[String] = None
  ): DataFrame = {
    val lCols = left.columns
    // the implementation reserves scratch names and appends `_asof` output
    // columns; reject inputs that would silently collide
    val reserved = Set("__ts", "__side", "__tb") ++ valueCols.map(c => s"__r_$c")
    val lClash = lCols.filter(reserved)
    require(lClash.isEmpty,
      s"left columns collide with joinAsOf's reserved names: ${lClash.mkString(", ")}")
    require(valueCols.distinct.length == valueCols.length,
      s"valueCols contains duplicates: ${valueCols.mkString(", ")}")
    val outClash = valueCols.map(c => s"${c}_asof").filter(lCols.contains)
    require(outClash.isEmpty,
      s"output columns would duplicate left columns: ${outClash.mkString(", ")}")
    valueCols.foreach(c => require(right.columns.contains(c),
      s"valueCol '$c' not found in right"))
    val tb: DataFrame => Column =
      df => tieBreakCol.map(df.apply).getOrElse(lit(0L)).cast("long")
    // tag: right rows (0) sort before left rows (1) at the same timestamp
    val l = left.select(
      Seq(col(keyCol), col(tsCol).as("__ts"), lit(1).as("__side"), tb(left).as("__tb")) ++
        lCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.select(
      Seq(col(keyCol), col(tsCol).as("__ts"), lit(0).as("__side"), tb(right).as("__tb")) ++
        lCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (col(keyCol) +: col("__ts") +: col("__side") +:
          lCols.toIndexedSeq.filterNot(c => c == keyCol || c == tsCol).map(col)) ++
          valueCols.map(c =>
            last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"${c}_asof")): _*)
    carried
      .filter(col("__side") === 1)
      .withColumnRenamed("__ts", tsCol)
      .drop("__side")
  }
}
