package graft.reg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.formula.Formula

/** Split-conformal prediction intervals (Vovk et al., "Algorithmic Learning
  * in a Random World"; Lei et al. 2018 JASA, "Distribution-Free Predictive
  * Inference for Regression").
  *
  * Procedure: hash-split the frame into a train and a calibration part
  * (deterministic md5 deal — reproducible across engines, partitions and
  * reruns, as [[graft.sources.ScaleOps.hashSplit]]); fit the regression on
  * train; let qhat be the k-th smallest absolute calibration residual with
  * k = ceil((1−α)(n_cal+1)). Intervals ŷ ± qhat on exchangeable new data
  * then cover the truth with probability ≥ 1−α, with NO distributional
  * assumptions on the errors — the finite-sample guarantee the reference's
  * normal-theory prediction intervals (stats-methods.R:94-236) lack under
  * misspecification.
  *
  * Scale shape: the fit is the usual one-pass moments aggregation; the
  * calibration residual is a pure projection over the calibration split
  * (one scan, no shuffle). The order statistic has two modes, mirroring the
  * quantile-binning precedent (W1/K12: exact NTILE for parity, approx at
  * scale): `exact=true` takes the m-th LARGEST residual (m = n_cal+1−k ≈
  * α·n_cal, the small tail) via a TakeOrdered heap — right for bounded
  * calibration sets; `exact=false` uses distributed Greenwald-Khanna
  * (`approxQuantile`, `approxErr` rank error) and never funnels rows
  * anywhere — the 100 TB default.
  */
final case class ConformalModel(
    fit: DbregResult,
    alpha: Double,
    qhat: Double,
    nCal: Long,
    k: Long
) {
  /** Distributed (fit, lo, hi) columns on `newdata`: ŷ ± qhat. */
  def intervals(newdata: DataFrame): DataFrame =
    fit
      .predict(newdata)
      .withColumn("lo", col("fit") - lit(qhat))
      .withColumn("hi", col("fit") + lit(qhat))
}

object Conformal {

  /** Fit + calibrate. `keyCol` drives the deterministic train/calibration
    * deal; `trainFrac` of rows train, the rest calibrate. */
  def fit(
      formula: String,
      df: DataFrame,
      keyCol: String,
      alpha: Double = 0.1,
      salt: String = "",
      trainFrac: Double = 0.5,
      strategy: String = "auto",
      exact: Boolean = true,
      approxErr: Double = 1e-4
  ): ConformalModel = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    require(trainFrac > 0.0 && trainFrac < 1.0,
      s"trainFrac must be in (0,1), got $trainFrac")
    val f = Formula.parse(formula)
    val splitCol = "__conformal_split"
    require(!df.columns.contains(splitCol), s"reserved column: $splitCol")
    val dealt = graft.sources.ScaleOps.hashSplit(df, keyCol,
      Seq("train" -> trainFrac, "cal" -> (1.0 - trainFrac)),
      salt = salt, splitCol = splitCol)
    val train = dealt.filter(col(splitCol) === "train").drop(splitCol)
    val cal = dealt.filter(col(splitCol) === "cal").drop(splitCol)

    val m = Dbreg.fit(formula, train, strategy = strategy)
    val resid = m
      .predict(cal)
      .select(abs(col(f.y).cast("double") - col("fit")).as("__r"))
      .filter(col("__r").isNotNull)
    val nCal = resid.count()
    val k = math.ceil((1.0 - alpha) * (nCal + 1.0)).toLong
    require(k >= 1L && k <= nCal,
      s"calibration set too small for alpha=$alpha: n_cal=$nCal needs " +
        s"k=ceil((1-alpha)(n+1))=$k <= n_cal")
    val qhat =
      if (exact) {
        val tail = nCal + 1L - k // m-th largest = k-th smallest
        require(tail <= Int.MaxValue,
          s"exact tail of $tail rows exceeds the TakeOrdered limit; " +
            "use exact=false (distributed approxQuantile) at this scale")
        resid
          .orderBy(col("__r").desc)
          .limit(tail.toInt)
          .agg(min(col("__r")))
          .head.getDouble(0)
      } else {
        resid.stat.approxQuantile("__r", Array(k.toDouble / nCal), approxErr).head
      }
    ConformalModel(m, alpha, qhat, nCal, k)
  }
}
