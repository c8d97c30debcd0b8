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

  /** Two-sample Kolmogorov–Smirnov statistic D = sup_x |F_ref(x) − F_cur(x)|
    * — the nonparametric companion to [[psi]]: no binning choice, sensitive
    * to any distributional difference.
    *
    * Scale shape: the AUC pattern — corpus-sized work is ONE keyed
    * aggregate per distinct value (both samples union into it with a side
    * flag); the cumulative-sum window then runs over DISTINCT values only.
    * As with [[aucDF]], pass `quantize` (round to d digits) for continuous
    * values so the distinct-value table — and the single-partition window
    * over it — stays bounded no matter the corpus size. Returns one row
    * (d, n_ref, n_cur). */
  def ksTest(
      ref: DataFrame,
      cur: DataFrame,
      value: Column,
      quantize: Option[Int] = None
  ): DataFrame = {
    val v = quantize.fold(value.cast("double"))(d => round(value.cast("double"), d))
    def side(df: DataFrame, flag: Int) = df
      .filter(value.isNotNull)
      .select(v.as("__v"), lit(flag).as("__side"))
    val g = side(ref, 0).unionAll(side(cur, 1))
      .groupBy("__v")
      .agg(
        sum(when(col("__side") === 0, 1.0).otherwise(0.0)).as("__r"),
        sum(when(col("__side") === 1, 1.0).otherwise(0.0)).as("__c"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g
      .withColumn("__cr", sum(col("__r")).over(w))
      .withColumn("__cc", sum(col("__c")).over(w))
      .withColumn("__tr", sum(col("__r")).over(wAll))
      .withColumn("__tc", sum(col("__c")).over(wAll))
      .agg(
        max(abs(col("__cr") / col("__tr") - col("__cc") / col("__tc"))).as("d"),
        max(col("__tr")).cast("long").as("n_ref"),
        max(col("__tc")).cast("long").as("n_cur"))
  }

  /** Population stability index between a reference and a current sample of
    * `value` — the standard drift monitor for a scored/curated corpus
    * (credit-scoring origin; PSI < 0.1 stable, > 0.25 shifted).
    *
    * `bins` equal-width bins span the REFERENCE min/max; current-sample
    * outliers clamp into the edge bins (the convention that keeps the bin
    * map fixed while the data moves). Counts get Laplace smoothing
    * (+0.5 per bin) so an empty bin contributes a finite term:
    * PSI = Σ (p_i − q_i)·ln(p_i/q_i).
    *
    * Scale shape: one 2-value aggregate on the reference (broadcast
    * crossJoin), one keyed count per side, a `bins`-row outer join, and a
    * final `bins`-row sum — both corpora stream through exactly once.
    * Returns (bin, n_ref, n_cur, contrib) ordered by bin; `sum(contrib)`
    * is the PSI. */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      value: Column,
      bins: Int = 10
  ): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val spark = ref.sparkSession
    val r = ref.filter(value.isNotNull).select(value.cast("double").as("__v"))
    val c = cur.filter(value.isNotNull).select(value.cast("double").as("__v"))
    val edges = r.agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    def binned(side: DataFrame) = side
      .crossJoin(broadcast(edges))
      .select(
        when(col("__mx") > col("__mn"),
          least(greatest(
            floor((col("__v") - col("__mn")) / (col("__mx") - col("__mn")) * bins),
            lit(0.0)), lit((bins - 1).toDouble)))
          .otherwise(lit(0.0)).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val all = spark.range(bins).select(col("id").as("bin"))
      .join(binned(r).withColumnRenamed("n", "n_ref"), Seq("bin"), "left")
      .join(binned(c).withColumnRenamed("n", "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = all.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    all.crossJoin(broadcast(tot))
      .withColumn("__p",
        (col("n_ref").cast("double") + 0.5) / (col("t_ref").cast("double") + lit(0.5 * bins)))
      .withColumn("__q",
        (col("n_cur").cast("double") + 0.5) / (col("t_cur").cast("double") + lit(0.5 * bins)))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        ((col("__p") - col("__q")) * log(col("__p") / col("__q"))).as("contrib"))
      .orderBy("bin")
  }
}
