package graft.reg

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.linalg.LinAlg

/** Distributed prediction for a fitted model (reference
  * stats-methods.R:94-236). Everything is Column arithmetic over the new
  * DataFrame — ŷ is a dot product with literal β, interval half-widths come
  * from the Cholesky factor of V so se² = ‖Lᵀw‖² costs p² codegen'd
  * multiply-adds per row, no UDFs, no collect.
  */
trait Predictor {
  /** interval: "none" | "confidence" | "prediction". */
  def predict(newdata: DataFrame, interval: String = "none", level: Double = 0.95): DataFrame
}

private[graft] final class LinearPredictor(
    terms: Seq[String],                 // kept terms, result order
    termCols: Map[String, Column],      // term -> design expression over newdata cols
    beta: DenseVector[Double],
    vcov: DenseMatrix[Double],
    sigma2: Double,
    dfRes: Double,
    preJoin: DataFrame => DataFrame,    // e.g. attach group-mean columns (mundlak)
    offsetCol: Option[Column],          // e.g. FE effects re-added (demean)
    intervalsSupported: Boolean
) extends Predictor {

  override def predict(newdata: DataFrame, interval: String, level: Double): DataFrame = {
    val d = preJoin(newdata)
    val ws: Seq[Column] = terms.map(t => termCols(t).cast("double"))
    val fit0 = ws.zipWithIndex.map { case (w, i) => w * lit(beta(i)) }.reduce(_ + _)
    val fit = offsetCol.map(fit0 + _).getOrElse(fit0)
    val out = d.withColumn("fit", fit)
    interval match {
      case "none" => out
      case "confidence" | "prediction" =>
        if (!intervalsSupported)
          // reference parity: demean predictions are point-only
          // (stats-methods.R:104-111 messages & downgrades)
          out
        else {
          val p = terms.length
          val lchol = breeze.linalg.cholesky(vcov)
          // z_i = (Lᵀ w)_i ; se_fit² = Σ z_i²
          val zs = (0 until p).map { i =>
            (i until p).map(j => lit(lchol(j, i)) * ws(j)).reduce(_ + _)
          }
          val seFit2 = zs.map(z => z * z).reduce(_ + _)
          val se2 =
            if (interval == "prediction") seFit2 + lit(sigma2) else seFit2
          val crit = LinAlg.tCrit(level, dfRes)
          out
            .withColumn("se", sqrt(se2))
            .withColumn("lwr", col("fit") - lit(crit) * col("se"))
            .withColumn("upr", col("fit") + lit(crit) * col("se"))
        }
      case other =>
        throw new IllegalArgumentException(
          s"interval must be none|confidence|prediction, got $other")
    }
  }
}
