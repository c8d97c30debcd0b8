package graft.binsreg

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.formula.Formula
import graft.linalg.LinAlg
import graft.reg.{Dbreg, DbregResult}

/** Binscatter (binned regression) on Spark DataFrames — the Spark-native
  * analogue of the reference's `dbbinsreg()` (reference R/dbbinsreg.R).
  *
  * `y ~ x + w1 + w2 | fe` bins the FIRST regressor into `nbins` bins
  * (quantile `"qs"` or equal-spaced `"es"`), fits a piecewise polynomial of
  * `degree` with `smoothness` continuity constraints (0 = unconstrained per
  * bin, ≥1 = regression spline with truncated-power basis at interior bin
  * edges), and evaluates fit ± CI at per-bin x-means and on a line grid.
  *
  * Scale design: bin edges come from `approxQuantile` (no global NTILE sort
  * — the reference's own large-n mitigation, dbbinsreg.R:449-573, made the
  * default); bin assignment is a literal CASE chain; the inner regression is
  * a recursive `Dbreg` call on the binned DataFrame, so the whole pipeline
  * is plan composition with no row-level collect.
  */
object Dbbinsreg {

  final case class BinInfo(bin: Int, left: Double, right: Double, xMean: Double, n: Long)
  final case class BinPoint(bin: Int, x: Double, fit: Double, se: Double, lwr: Double, upr: Double)
  final case class LinePoint(bin: Int, x: Double, fit: Double)
  final case class BinsregResult(
      points: Seq[BinPoint],
      line: Seq[LinePoint],
      bins: Seq[BinInfo],
      knots: Seq[Double],
      model: DbregResult,
      nbins: Int,
      nobs: Long
  ) {
    def pointsDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      points.toDF("bin", "x", "fit", "se", "lwr", "upr")
    }
    def lineDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      line.toDF("bin", "x", "fit")
    }
  }

  def fit(
      formula: String,
      df: DataFrame,
      nbins: Int = 10,
      binspos: String = "qs",
      degree: Int = 0,
      smoothness: Int = 0,
      vcov: String = "iid",
      level: Double = 0.95,
      lineGrid: Int = 20
  ): BinsregResult = {
    require(degree >= 0 && smoothness >= 0 && smoothness <= degree + 1,
      s"invalid (degree, smoothness) = ($degree, $smoothness)")
    val f = Formula.parse(formula)
    val xvar = f.terms.head.parts match {
      case List(v) => v
      case other => throw new IllegalArgumentException(
        s"first regressor must be the plain binning variable, got ${other.mkString(":")}")
    }
    val controls = f.terms.tail
    val clusterCol = if (vcov.startsWith("~")) Seq(vcov.drop(1).trim) else Nil
    val needed = (f.allInputCols ++ clusterCol).distinct
    val base = df
      .select(needed.map(col): _*)
      .filter(needed.map(col(_).isNotNull).reduce(_ && _))

    val x = col(xvar).cast("double")

    // ---- bin edges (K12 / W1-W2 equivalents) ----
    val breaks: Array[Double] = binspos match {
      case "qs" =>
        val probs = (0 to nbins).map(_.toDouble / nbins).toArray
        base.stat.approxQuantile(xvar, probs, 1e-4).distinct.sorted
      case "es" =>
        val r = base.agg(min(x).as("mn"), max(x).as("mx")).collect()(0)
        val (mn, mx) = (r.getDouble(0), r.getDouble(1))
        (0 to nbins).map(i => mn + (mx - mn) * i / nbins).toArray
      case other => throw new IllegalArgumentException(s"binspos must be qs|es, got $other")
    }
    val b = breaks.length - 1
    require(b >= 1, "need at least one bin after deduplicating edges")

    // bin id: number of interior edges strictly below x (CASE-chain, no sort)
    val binCol: Column =
      (1 until b).map(k => when(x > breaks(k), 1).otherwise(0))
        .foldLeft(lit(0))(_ + _)

    val binned = base.withColumn("__bin", binCol)

    // ---- bin geometry (A14) ----
    val geo = binned
      .groupBy("__bin")
      .agg(min(x).as("left"), max(x).as("right"), avg(x).as("xmean"),
        count(lit(1)).as("n"))
      .orderBy("__bin")
      .collect()
      .map(r => BinInfo(r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toSeq
    val nobs = geo.map(_.n).sum
    val interiorKnots = (1 until b).map(breaks(_))

    // control means for evaluation (binsreg evaluates at covariate means)
    val controlVars = controls.flatMap(_.parts).distinct
    val controlMeans: Map[String, Double] =
      if (controlVars.isEmpty) Map.empty
      else {
        val aggs = controlVars.map(v => avg(col(v).cast("double")).as(v))
        val row = base.agg(aggs.head, aggs.tail: _*).collect()(0)
        controlVars.map(v => v -> row.getAs[Double](v)).toMap
      }

    if (smoothness == 0) fitUnconstrained(f, binned, geo, degree, vcov, level, lineGrid,
      controls.map(_.label), controlMeans, interiorKnots, nobs)
    else fitConstrained(f, binned, geo, degree, smoothness, interiorKnots, vcov, level,
      lineGrid, controls.map(_.label), controlMeans, nobs, xvar)
  }

  /** s = 0: per-bin polynomial in u = (x − left)/h, all bins independent
    * (reference execute_unconstrained_binsreg — but fully distributed:
    * the binned rows never reach the driver). */
  private def fitUnconstrained(
      f: Formula,
      binned: DataFrame,
      geo: Seq[BinInfo],
      degree: Int,
      vcov: String,
      level: Double,
      lineGrid: Int,
      controlTerms: Seq[String],
      controlMeans: Map[String, Double],
      knots: Seq[Double],
      nobs: Long
  ): BinsregResult = {
    val x = col(f.terms.head.parts.head).cast("double")
    val width = math.max(2, geo.map(_.bin).max.toString.length)
    // zero-padded factor labels keep lexicographic == numeric bin order
    val binf = concat(lit("b"), lpad(col("__bin").cast("string"), width, "0"))
    // u lookup via literal CASE over the (small) geometry
    def uCol: Column = geo.map { g =>
      val h = if (g.right > g.left) g.right - g.left else 1.0
      (g.bin, (x - lit(g.left)) / lit(h))
    }.foldLeft(lit(0.0)) { case (acc, (bin, expr)) =>
      when(col("__bin") === bin, expr).otherwise(acc)
    }

    var dfb = binned.withColumn("__binf", binf)
    (1 to degree).foreach(j => dfb = dfb.withColumn(s"__u$j", pow(uCol, j)))

    val fml = (s"${f.y} ~ 0 + __binf" +:
      (1 to degree).map(j => s"__binf:__u$j")) ++ controlTerms
    val fmlStr = fml.mkString(" + ") +
      (if (f.fe.nonEmpty) " | " + f.fe.mkString(" + ") else "")
    val strategy =
      if (degree == 0) "compress"
      else if (f.fe.isEmpty) "moments"
      else if (f.fe.length <= 2) "demean" else "compress"
    val model = Dbreg.fit(fmlStr, dfb, vcov = vcov, strategy = strategy)
    // demean absorbs the level into the FEs: re-add the grand mean so points
    // plot on the outcome scale (standard absorbed-FE binscatter practice)
    val offset =
      if (model.strategy == "demean")
        dfb.agg(avg(col(f.y).cast("double"))).collect()(0).getDouble(0)
      else 0.0

    def label(bin: Int) = "b" + bin.toString.reverse.padTo(width, '0').reverse
    // weight vector for evaluation at (bin, x)
    def wRow(bin: Int, xv: Double): DenseVector[Double] = {
      val g = geo.find(_.bin == bin).get
      val h = if (g.right > g.left) g.right - g.left else 1.0
      val u = (xv - g.left) / h
      DenseVector(model.terms.map { t =>
        if (t == s"__binf${label(bin)}") 1.0
        else if (t.startsWith("__binf") && t.contains(":__u")) {
          val Array(bpart, upart) = t.split(":")
          if (bpart == s"__binf${label(bin)}") math.pow(u, upart.drop(3).toInt) else 0.0
        } else controlMeans.getOrElse(t, 0.0)
      }.toArray)
    }
    evalResult(model, geo, knots, wRow, level, lineGrid, nobs, offset)
  }

  /** s ≥ 1: global truncated-power spline basis (reference
    * execute_constrained_binsreg / P6). */
  private def fitConstrained(
      f: Formula,
      binned: DataFrame,
      geo: Seq[BinInfo],
      degree: Int,
      smoothness: Int,
      knots: Seq[Double],
      vcov: String,
      level: Double,
      lineGrid: Int,
      controlTerms: Seq[String],
      controlMeans: Map[String, Double],
      nobs: Long,
      xvar: String
  ): BinsregResult = {
    val x = col(xvar).cast("double")
    var dfb = binned
    val basisNames = scala.collection.mutable.ArrayBuffer.empty[String]
    (1 to degree).foreach { j =>
      val nm = s"__p$j"; basisNames += nm
      dfb = dfb.withColumn(nm, pow(x, j))
    }
    knots.zipWithIndex.foreach { case (k, ki) =>
      (math.max(smoothness, 1) to degree).foreach { r =>
        val nm = s"__tp${ki}_$r"; basisNames += nm
        dfb = dfb.withColumn(nm, when(x > k, pow(x - k, r)).otherwise(0.0))
      }
    }
    val fmlStr = (s"${f.y} ~ " + (basisNames ++ controlTerms).mkString(" + ")) +
      (if (f.fe.nonEmpty) " | " + f.fe.mkString(" + ") else "")
    val strategy =
      if (f.fe.isEmpty) "moments" else if (f.fe.length <= 2) "demean" else "compress"
    val model = Dbreg.fit(fmlStr, dfb, vcov = vcov, strategy = strategy)
    val offset =
      if (model.strategy == "demean")
        dfb.agg(avg(col(f.y).cast("double"))).collect()(0).getDouble(0)
      else 0.0

    def wRow(bin: Int, xv: Double): DenseVector[Double] =
      DenseVector(model.terms.map { t =>
        if (t == "(Intercept)") 1.0
        else if (t.startsWith("__p")) math.pow(xv, t.drop(3).toInt)
        else if (t.startsWith("__tp")) {
          val Array(ki, r) = t.drop(4).split("_").map(_.toInt)
          if (xv > knots(ki)) math.pow(xv - knots(ki), r) else 0.0
        } else controlMeans.getOrElse(t, 0.0)
      }.toArray)
    evalResult(model, geo, knots, wRow, level, lineGrid, nobs, offset)
  }

  /** fit/SE/CI at bin means + line grid (K10): se = √(wᵀVw). */
  private def evalResult(
      model: DbregResult,
      geo: Seq[BinInfo],
      knots: Seq[Double],
      wRow: (Int, Double) => DenseVector[Double],
      level: Double,
      lineGrid: Int,
      nobs: Long,
      offset: Double
  ): BinsregResult = {
    val beta = DenseVector(model.coeftable.map(_.estimate).toArray)
    val v = model.vcov
    val crit = LinAlg.tCrit(level, model.dfResidual)
    val points = geo.map { g =>
      val w = wRow(g.bin, g.xMean)
      val fit = offset + w.dot(beta)
      val se = math.sqrt(math.max(w.dot(v * w), 0.0))
      BinPoint(g.bin, g.xMean, fit, se, fit - crit * se, fit + crit * se)
    }
    val line = geo.flatMap { g =>
      (0 until lineGrid).map { i =>
        val xv = g.left + (g.right - g.left) * i / math.max(lineGrid - 1, 1)
        LinePoint(g.bin, xv, offset + wRow(g.bin, xv).dot(beta))
      }
    }
    BinsregResult(points, line, geo, knots, model, geo.length, nobs)
  }
}
