package graft.reg

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Result of a one-pass moment aggregation: everything needed to solve the
  * normal equations. `xtx`/`xty` include the intercept row when requested.
  */
private[graft] final case class MomentsResult(
    names: Array[String],
    xtx: DenseMatrix[Double],
    xty: DenseVector[Double],
    nRows: Long,
    n: Double, // Σw (== nRows unweighted)
    sumY: Double,
    sumYSq: Double,
    extra: Map[String, Double],
    plan: String = "" // formatted physical plan of the aggregation (sql_only analogue)
)

/** Single-pass sufficient-statistics aggregation (reference dbreg.R:724-757).
  *
  * Emits the full upper triangle of [1, X, y]ᵀW[1, X, y] as p(p+1)/2 + 2p + 3
  * `sum` columns in ONE `df.agg` — Catalyst executes it as a partial+final
  * hash aggregate with whole-stage codegen, so the cost is one scan
  * regardless of p (fine for p ≲ 100; a fused TypedImperativeAggregate is a
  * possible later optimization, SURVEY.md §4.3). All inputs are cast to
  * double before multiplying (mirrors the reference's CAST AS FLOAT,
  * dbreg.R:958-962).
  */
private[graft] object MomentsKernel {

  /** Above this many regressors the p(p+1)/2 `sum` columns strain codegen;
    * switch to the fused TypedImperativeAggregate (graft.functions.MomentsAgg)
    * which carries the whole triangle in one buffer per partition. */
  val FusedThreshold = 24

  def compute(
      df: DataFrame,
      yName: String,
      xNames: Seq[String],
      intercept: Boolean,
      weightName: Option[String] = None,
      extraAggs: Seq[(String, Column)] = Nil,
      forceFused: Option[Boolean] = None
  ): MomentsResult = {
    if (forceFused.getOrElse(xNames.length > FusedThreshold))
      return computeFused(df, yName, xNames, intercept, weightName, extraAggs)
    val p = xNames.length
    val y = col(yName).cast("double")
    val w = weightName.map(c => col(c).cast("double"))
    def ww(c: Column): Column = w.map(c * _).getOrElse(c)
    def x(i: Int): Column = col(xNames(i)).cast("double")

    val aggs = scala.collection.mutable.ArrayBuffer[Column]()
    aggs += count(lit(1)).as("_nrows")
    aggs += (w match {
      case Some(wc) => sum(wc)
      case None => count(lit(1)).cast("double")
    }).as("_n")
    aggs += sum(ww(y)).as("_sy")
    aggs += sum(ww(y * y)).as("_syy")
    for (i <- 0 until p) {
      aggs += sum(ww(x(i))).as(s"_sx$i")
      aggs += sum(ww(x(i) * y)).as(s"_sxy$i")
    }
    for (i <- 0 until p; j <- i until p)
      aggs += sum(ww(x(i) * x(j))).as(s"_sxx_${i}_$j")
    extraAggs.foreach { case (nm, c) => aggs += c.as(nm) }

    val aggDf = df.agg(aggs.head, aggs.tail.toSeq: _*)
    val planStr = aggDf.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val row = aggDf.collect()(0)
    def d(name: String): Double = row.getAs[Any](name) match {
      case null => 0.0
      case v: Double => v
      case v: Number => v.doubleValue
    }

    val nRows = row.getAs[Long]("_nrows")
    val n = d("_n")
    val sumY = d("_sy")
    val sumYSq = d("_syy")

    val dim = if (intercept) p + 1 else p
    val off = if (intercept) 1 else 0
    val xtx = DenseMatrix.zeros[Double](dim, dim)
    val xty = DenseVector.zeros[Double](dim)
    if (intercept) {
      xtx(0, 0) = n
      xty(0) = sumY
      for (i <- 0 until p) {
        val s = d(s"_sx$i")
        xtx(0, i + off) = s; xtx(i + off, 0) = s
      }
    }
    for (i <- 0 until p) {
      xty(i + off) = d(s"_sxy$i")
      for (j <- i until p) {
        val s = d(s"_sxx_${i}_$j")
        xtx(i + off, j + off) = s; xtx(j + off, i + off) = s
      }
    }
    val names =
      (if (intercept) Array("(Intercept)") else Array.empty[String]) ++ xNames
    val extras = extraAggs.map { case (nm, _) => nm -> d(nm) }.toMap
    MomentsResult(names, xtx, xty, nRows, n, sumY, sumYSq, extras, planStr)
  }

  /** Fused one-buffer variant (wide p): single custom aggregate instead of
    * p(p+1)/2 sum columns. Same semantics, same partial+final execution. */
  private def computeFused(
      df: DataFrame,
      yName: String,
      xNames: Seq[String],
      intercept: Boolean,
      weightName: Option[String],
      extraAggs: Seq[(String, Column)]
  ): MomentsResult = {
    val p = xNames.length
    val w = weightName.map(col(_).cast("double")).getOrElse(lit(1.0))
    val mcol = graft.functions.MomentsAgg(w, col(yName), xNames.map(col)).as("_m")
    val aggs = Seq(mcol, count(lit(1)).as("_nrows")) ++
      extraAggs.map { case (nm, c) => c.as(nm) }
    val aggDf = df.agg(aggs.head, aggs.tail: _*)
    val planStr = aggDf.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val row = aggDf.collect()(0)
    val arr = row.getAs[scala.collection.Seq[Double]]("_m")
    val nRows = row.getAs[Long]("_nrows")
    def d(name: String): Double = row.getAs[Any](name) match {
      case null => 0.0
      case v: Double => v
      case v: Number => v.doubleValue
    }

    val n = arr(0); val sumY = arr(1); val sumYSq = arr(2)
    val dim = if (intercept) p + 1 else p
    val off = if (intercept) 1 else 0
    val xtx = DenseMatrix.zeros[Double](dim, dim)
    val xty = DenseVector.zeros[Double](dim)
    if (intercept) {
      xtx(0, 0) = n; xty(0) = sumY
      for (i <- 0 until p) { val s = arr(3 + i); xtx(0, i + off) = s; xtx(i + off, 0) = s }
    }
    var k = 3 + 2 * p
    for (i <- 0 until p) {
      xty(i + off) = arr(3 + p + i)
      for (j <- i until p) {
        val s = arr(k); k += 1
        xtx(i + off, j + off) = s; xtx(j + off, i + off) = s
      }
    }
    val names =
      (if (intercept) Array("(Intercept)") else Array.empty[String]) ++ xNames
    val extras = extraAggs.map { case (nm, _) => nm -> d(nm) }.toMap
    MomentsResult(names, xtx, xty, nRows, n, sumY, sumYSq, extras, planStr)
  }

  /** Meat triangle Σ s²·xᵢxⱼ over `df` given a per-row scale column
    * (e² for HC1, rss_g for compress-HC1). Intercept treated as x ≡ 1.
    * One scan, same codegen'd shape as `compute`. */
  def meatTriangle(
      df: DataFrame,
      scale: Column,
      xNames: Seq[String],
      intercept: Boolean
  ): DenseMatrix[Double] = {
    val p = xNames.length
    def x(i: Int): Column = col(xNames(i)).cast("double")
    val aggs = scala.collection.mutable.ArrayBuffer[Column]()
    if (intercept) {
      aggs += sum(scale).as("_m_c_c")
      for (i <- 0 until p) aggs += sum(scale * x(i)).as(s"_m_c_$i")
    }
    for (i <- 0 until p; j <- i until p)
      aggs += sum(scale * x(i) * x(j)).as(s"_m_${i}_$j")
    val row = df.agg(aggs.head, aggs.tail.toSeq: _*).collect()(0)
    def d(name: String): Double = row.getAs[Any](name) match {
      case null => 0.0
      case v: Double => v
      case v: Number => v.doubleValue
    }
    val dim = if (intercept) p + 1 else p
    val off = if (intercept) 1 else 0
    val m = DenseMatrix.zeros[Double](dim, dim)
    if (intercept) {
      m(0, 0) = d("_m_c_c")
      for (i <- 0 until p) { val v = d(s"_m_c_$i"); m(0, i + off) = v; m(i + off, 0) = v }
    }
    for (i <- 0 until p; j <- i until p) {
      val v = d(s"_m_${i}_$j")
      m(i + off, j + off) = v; m(j + off, i + off) = v
    }
    m
  }
}
