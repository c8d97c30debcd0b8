package graft.reg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isotonic (monotone) calibration via pool-adjacent-violators — the
  * standard upgrade from the binned reliability diagram (q101): fit the
  * best non-decreasing map score → P(label) in weighted least squares.
  *
  * Scale shape: the corpus pays ONE score-keyed partial+final hash
  * aggregate (pass `quantize` to round continuous scores first, bounding
  * the distinct-score table like Eval.auc); PAV then runs on the driver
  * over the ≤ `maxBins` (score, n, Σy) rows — O(m) stack pooling — and the
  * result is a small (score → calibrated) map applied back as a BROADCAST
  * equi-join on the identically-quantized score. Nothing row-level reaches
  * the driver.
  *
  * The fitted values satisfy the minimax characterization
  * ŷ(s) = max_{j≤s} min_{k≥s} weightedAvg(y over scores j..k) — which is
  * what the q112 oracle evaluates directly in SQL over the distinct-score
  * table, independently of the PAV implementation.
  */
object Isotonic {

  /** Fit: returns the calibration map as a DataFrame
    * (score double, n bigint, calibrated double), one row per distinct
    * (quantized) score, ascending-monotone in `calibrated`. */
  def fit(
      df: DataFrame,
      score: Column,
      label: Column,
      quantize: Option[Int] = None,
      maxBins: Int = 100000
  ): DataFrame = {
    val s = quantize.fold(score.cast("double"))(d => round(score.cast("double"), d))
    val y = label.cast("double")
    val g = df
      .filter(score.isNotNull && label.isNotNull)
      .select(s.as("__s"), y.as("__y"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__sy"))
      .orderBy("__s")
    val rows = g.limit(maxBins + 1).collect()
    require(rows.length <= maxBins,
      s"more than $maxBins distinct scores; pass quantize= to bin them")
    require(rows.nonEmpty, "no rows survived the null filter")

    // PAV: pool adjacent violators, left to right (weighted)
    final case class Pool(var w: Double, var sum: Double, var count: Int) {
      def avg: Double = sum / w
    }
    val stack = scala.collection.mutable.ArrayBuffer[Pool]()
    rows.foreach { r =>
      val n = r.getAs[Long]("__n").toDouble
      val sy = r.getAs[Double]("__sy")
      stack += Pool(n, sy, 1)
      while (stack.length > 1 &&
        stack(stack.length - 2).avg >= stack.last.avg) {
        val top = stack.remove(stack.length - 1)
        val prev = stack.last
        prev.w += top.w; prev.sum += top.sum; prev.count += top.count
      }
    }
    val fitted = stack.flatMap(p => Seq.fill(p.count)(p.avg))
    val spark = df.sparkSession
    import spark.implicits._
    rows.zip(fitted).map { case (r, v) =>
      (r.getAs[Double]("__s"), r.getAs[Long]("__n"), v)
    }.toSeq.toDF("score", "n", "calibrated")
  }

  /** Apply a [[fit]] map: broadcast equi-join on the identically-quantized
    * score. Scores unseen at fit time come back null (quantize the same
    * way on both sides to avoid misses). */
  def calibrate(
      df: DataFrame,
      score: Column,
      model: DataFrame,
      quantize: Option[Int] = None,
      outCol: String = "calibrated"
  ): DataFrame = {
    val s = quantize.fold(score.cast("double"))(d => round(score.cast("double"), d))
    df.withColumn("__iso_s", s)
      .join(
        broadcast(model.select(col("score").as("__iso_s"),
          col("calibrated").as(outCol))),
        Seq("__iso_s"), "left")
      .drop("__iso_s")
  }
}
