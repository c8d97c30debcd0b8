package graft.reg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed decision-stump training: the exhaustive best-binary-split
  * search over equal-width feature bins that sits at the bottom of every
  * histogram-based tree learner (the per-feature/per-bin candidate-split
  * scan of LightGBM/XGBoost's `hist` mode, here as relational algebra).
  *
  * A depth-1 tree is itself a useful curation model (one interpretable
  * threshold per feature), and the per-feature gain table doubles as a
  * supervised feature-importance screen next to the model-free
  * [[Eval.mutualInfo]].
  */
object Trees {

  /** Best binary split per feature for a binary label, by Gini gain over
    * `bins` equal-width candidate thresholds.
    *
    * For every feature the candidate split "x ≤ t_b" (t_b = the upper
    * edge of bin b) partitions rows into left/right; the chosen split
    * maximizes
    *
    *   gain = gini(all) − (n_L·gini(L) + n_R·gini(R)) / n
    *
    * with gini(S) = 2·p·(1−p), p the label mean in S. Ties break toward
    * the smaller bin. Rows with a NULL label are dropped; a row with a
    * NULL feature value is excluded from THAT feature's scan only (each
    * feature sees its complete cases — stump semantics, not
    * complete-case across all features). A constant feature (min = max)
    * yields no candidate split and is reported with NULL bin/threshold/
    * gain, as is a feature whose every candidate leaves an empty side.
    *
    * Scale shape: one 1-row bounds aggregation (min/max per feature,
    * broadcast back), then ONE corpus scan whose per-row work is a
    * width-bin projection exploded to (feature, bin) pairs that collapse
    * through a hash aggregation of at most features·bins cells —
    * map-side combine absorbs the explode fan-out, so the shuffle
    * carries cells, not rows. The split scan (cumulative sums, gain,
    * argmax) runs entirely over that tiny cell table with
    * feature-partitioned windows. Nothing global, nothing driver-side.
    * Returns (feature, split_bin, threshold, n_left, n_right, gain),
    * one row per feature.
    */
  def bestStumpSplits(
      df: DataFrame,
      label: Column,
      features: Seq[(String, Column)],
      bins: Int
  ): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    require(features.map(_._1).distinct.size == features.size,
      "duplicate feature names")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val y = label.cast("double")
    val base = df.filter(y.isNotNull)
      .select((y.as("__y") +: features.zipWithIndex.map {
        case ((_, c), i) => c.cast("double").as(s"__x$i")
      }): _*)
    val boundAggs = features.indices.flatMap(i => Seq(
      min(col(s"__x$i")).as(s"__mn$i"), max(col(s"__x$i")).as(s"__mx$i")))
    val bounds = base.agg(boundAggs.head, boundAggs.tail: _*)
    val entries = features.zipWithIndex.map { case ((name, _), i) =>
      val x = col(s"__x$i")
      val mn = col(s"__mn$i")
      val w = (col(s"__mx$i") - mn) / bins
      val bin = least(lit(bins - 1),
        greatest(lit(0), floor((x - mn) / w).cast("int")))
      when(x.isNotNull && w > 0.0,
        struct(lit(name).as("feature"), bin.as("bin"),
          (mn + (bin + 1) * w).as("thr")))
    }
    val cells = base.crossJoin(broadcast(bounds))
      .select(col("__y"), explode(array(entries: _*)).as("__e"))
      .filter(col("__e").isNotNull)
      .groupBy(col("__e.feature").as("feature"), col("__e.bin").as("bin"))
      .agg(max(col("__e.thr")).as("thr"),
        count(lit(1)).cast("double").as("__n"),
        sum(col("__y")).as("__pos"))
    val byFeat = Window.partitionBy(col("feature")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("feature"))
    def gini(n: Column, pos: Column): Column = {
      val p = pos / n
      lit(2.0) * p * (lit(1.0) - p)
    }
    val scan = cells
      .withColumn("__nl", sum(col("__n")).over(byFeat))
      .withColumn("__pl", sum(col("__pos")).over(byFeat))
      .withColumn("__nt", sum(col("__n")).over(whole))
      .withColumn("__pt", sum(col("__pos")).over(whole))
      .withColumn("__nr", col("__nt") - col("__nl"))
      .withColumn("__pr", col("__pt") - col("__pl"))
      .filter(col("__nl") > 0.0 && col("__nr") > 0.0)
      .withColumn("gain",
        gini(col("__nt"), col("__pt")) -
          (col("__nl") * gini(col("__nl"), col("__pl")) +
            col("__nr") * gini(col("__nr"), col("__pr"))) / col("__nt"))
    val pick = Window.partitionBy(col("feature"))
      .orderBy(col("gain").desc, col("bin").asc)
    val best = scan
      .withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") === 1)
      .select(col("feature"), col("bin").as("split_bin"),
        col("thr").as("threshold"),
        col("__nl").cast("long").as("n_left"),
        col("__nr").cast("long").as("n_right"), col("gain"))
    // constant/all-null features produced no cells — report them with a
    // NULL split so the output always has one row per requested feature
    val spine = df.sparkSession
      .createDataFrame(features.map(f => Tuple1(f._1)))
      .toDF("feature")
    spine.join(best, Seq("feature"), "left")
  }
}
