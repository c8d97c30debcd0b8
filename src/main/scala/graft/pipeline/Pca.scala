package graft.pipeline

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs
import graft.reg.MomentsKernel

/** Principal component analysis over embedding columns — the dimension
  * reducer in front of the ANN / SemDeDup / clustering operators (a 768-d
  * corpus projected to 64 components cuts every downstream distance
  * computation ~12× at >90% retained variance on typical embedding
  * spectra).
  *
  * Scale shape: `fit` is ONE moments pass (the same [1,X]ᵀ[1,X] partial+
  * final hash aggregate as the regression kernel — the fused one-buffer
  * aggregate takes over past 24 dims, so a 768-dim fit is one scan with a
  * ~2.4 MB buffer per task, never d(d+1)/2 codegen'd columns), then an
  * O(d³) driver eigendecomposition of the d×d covariance — d is the
  * embedding width, never the corpus size. `transform` is a narrow
  * per-row codegen'd projection ([[graft.functions.AffineProject]], plan
  * size O(1) in k·d); nothing shuffles.
  *
  * Sign convention: each component's largest-|loading| element (lowest
  * index on ties) is made positive, so results are deterministic across
  * LAPACK builds and match the closed-form oracles.
  */
object Pca {

  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]], // k rows × d cols, variance-descending
      eigenvalues: Array[Double], // ALL d, descending (sample covariance, n−1)
      n: Long
  ) {
    def k: Int = components.length
    def d: Int = mean.length
    def explainedVariance: Array[Double] = {
      val tot = eigenvalues.sum
      eigenvalues.take(k).map(_ / tot)
    }

    /** Project `vecCol` (array<float|double> of length d) to the top-k
      * component scores as `array<double>`. */
    def transform(df: DataFrame, vecCol: String, outCol: String): DataFrame =
      df.withColumn(outCol, VectorExprs.affineProject(col(vecCol), mean, components))
  }

  /** Fit on an array embedding column: one covariance pass + driver eigen.
    * Rows with a null array or any null element are dropped (the filter
    * rides in the same scan). */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    val clean = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim &&
        !exists(col(vecCol), _.isNull))
    val elems = (0 until dim).map(i =>
      element_at(col(vecCol), i + 1).cast("double").as(s"_e$i"))
    fitSelected(clean.select(elems: _*), (0 until dim).map(i => s"_e$i"), k)
  }

  /** Fit on scalar numeric columns (each row is the vector (cols…)). */
  def fitCols(df: DataFrame, cols: Seq[String], k: Int): PcaModel = {
    require(k >= 1 && k <= cols.length, s"need 1 <= k <= ${cols.length}, got $k")
    val clean = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .na.drop(cols)
    fitSelected(clean, cols, k)
  }

  /** Project scalar columns to top-k scores (array<double> `outCol`). */
  def transformCols(
      df: DataFrame, cols: Seq[String], model: PcaModel, outCol: String
  ): DataFrame = {
    require(cols.length == model.d, s"expected ${model.d} columns, got ${cols.length}")
    df.withColumn(outCol,
      VectorExprs.affineProject(
        array(cols.map(c => col(c).cast("double")): _*), model.mean, model.components))
  }

  private def fitSelected(selected: DataFrame, names: Seq[String], k: Int): PcaModel = {
    val d = names.length
    // reuse the regression moments kernel with a zero response: row 0 of the
    // intercept triangle carries n and the column sums, the rest is XᵀX
    val withY = selected.withColumn("_pca_y", lit(0.0))
    val mom = MomentsKernel.compute(withY, "_pca_y", names, intercept = true)
    val n = mom.n
    require(mom.nRows > 1, s"need > 1 rows to fit PCA, got ${mom.nRows}")
    val mean = Array.tabulate(d)(i => mom.xtx(0, i + 1) / n)
    val cov = DenseMatrix.tabulate(d, d)((i, j) =>
      (mom.xtx(i + 1, j + 1) - n * mean(i) * mean(j)) / (n - 1.0))
    val es = eigSym(cov)
    // breeze returns ascending eigenvalues; flip to variance-descending
    val order = (0 until d).sortBy(i => -es.eigenvalues(i))
    val eigenvalues = order.map(es.eigenvalues(_)).toArray
    val components = Array.tabulate(k) { r =>
      val c = order(r)
      val v = Array.tabulate(d)(i => es.eigenvectors(i, c))
      // deterministic sign: largest-|loading| element positive
      var best = 0
      for (i <- 1 until d) if (math.abs(v(i)) > math.abs(v(best))) best = i
      if (v(best) < 0) v.map(-_) else v
    }
    PcaModel(mean, components, eigenvalues, mom.nRows)
  }
}
