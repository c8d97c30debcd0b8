package graft.reg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation operators — the measurement end of the in-engine
  * train → score → calibrate loop (Glm → predictResponse → calibration
  * q101): rank-based AUC and per-bin calibration error, both as
  * aggregation plans (no row-level collect).
  *
  * AUC uses the Mann-Whitney identity with half-credit for ties:
  * U = Σ_s pos_s · (cumNeg(<s) + ½·neg_s), AUC = U / (P·N), computed over
  * the DISTINCT-SCORE aggregate. The corpus-sized work is ONE partial+
  * final hash aggregate keyed by score; the window cumsum then runs over
  * distinct scores only. With a continuous score, pass `quantize` to round
  * to d digits first (the standard binned-AUC estimate) so the
  * distinct-score table — and the single-partition window over it — stays
  * bounded no matter the corpus size.
  */
object Eval {

  /** Area under the ROC curve of `score` predicting boolean/0-1 `label`.
    * One scan; ties get half credit (the exact Mann-Whitney convention). */
  def auc(
      df: DataFrame,
      score: Column,
      label: Column,
      quantize: Option[Int] = None
  ): Double = aucDF(df, score, label, quantize).collect()(0).getDouble(0)

  /** [[auc]] as a 1-row DataFrame (column `auc`), for plan composition. */
  def aucDF(
      df: DataFrame,
      score: Column,
      label: Column,
      quantize: Option[Int] = None
  ): DataFrame = {
    val s = quantize.fold(score.cast("double"))(d => round(score.cast("double"), d))
    val y = label.cast("double")
    val g = df
      .filter(score.isNotNull && label.isNotNull)
      .select(s.as("__s"), y.as("__y"))
      .groupBy("__s")
      .agg(sum(col("__y")).as("__pos"), sum(lit(1.0) - col("__y")).as("__neg"))
    // window over DISTINCT scores only (bounded after the aggregate)
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val u = g
      .withColumn("__cumneg", coalesce(sum(col("__neg")).over(w), lit(0.0)))
      .agg(
        sum(col("__pos") * (col("__cumneg") + lit(0.5) * col("__neg"))).as("__u"),
        sum(col("__pos")).as("__p"),
        sum(col("__neg")).as("__n"))
    u.select((col("__u") / (col("__p") * col("__n"))).as("auc"))
  }
}
