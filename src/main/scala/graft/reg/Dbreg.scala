package graft.reg

import graft.Staging.StagedFrame
import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel


import graft.formula.{Formula, Vcov}
import graft.linalg.LinAlg
import graft.model.ModelMatrix
import graft.model.ModelMatrix.MMCol

/** OLS / fixed-effects regression on Spark DataFrames.
  *
  * Spark-native re-implementation of the reference engine's capabilities
  * (reference R/dbreg.R): a formula `y ~ x1 + x2 | fe1 + fe2` is compiled
  * into one-to-three DataFrame aggregation plans (Catalyst handles pushdown,
  * partial aggregation and codegen), a tiny sufficient-statistics result is
  * collected, and the estimates are finished with dense linear algebra on
  * the driver. Four acceleration strategies (reference dbreg.R:302-380):
  *
  *  - `moments`  — one global aggregation of the [1,X,y] moment triangle
  *  - `compress` — group-by compression (Wong et al. 2021); WLS on cells
  *  - `demean`   — within transform for 1-2 FE (FWL)
  *  - `mundlak`  — group-mean regressors for K FE (Mundlak 1978)
  *  - `hdfe`     — K-way / high-cardinality FE via alternating projections
  *                 (Guimarães & Portugal 2010; fixest-style demeaning as
  *                 iterated group-mean joins — BEYOND-REFERENCE: the
  *                 reference refuses >2 FE, dbreg.R:640-660)
  *  - `auto`     — cost-based chooser using cheap probe aggregations
  *
  * Scale notes: no step ever collects row-level data; every collect is a
  * 1-row moment vector, a ≤`compressNmax`-cell table, or a per-cluster score
  * table. Group-mean tables are cached (they are reused by the vcov second
  * pass) and broadcast when small, so the big-table joins are broadcast hash
  * joins with no shuffle of the fact table.
  */
object Dbreg {

  val MaxDesignCols = 120 // guard: p(p+1)/2 agg columns must stay codegen-friendly

  /** fitHdfe: projection-path steps between lineage stagings (inline-tier
    * FEs are pure literal-lookup projections — cheap to re-derive from
    * the scan, expensive to checkpoint at corpus size). */
  private val HdfeStageEvery = 8

  def fit(
      formula: String,
      df: DataFrame,
      vcov: String = "iid",
      strategy: String = "auto",
      compressRatio: Option[Double] = None,
      compressNmax: Long = 1000000L,
      ssc: String = "full",
      verbose: Boolean = false,
      weights: Option[String] = None,
      probeMode: String = "exact",
      hdfeTol: Double = 1e-8,
      hdfeMaxSweeps: Int = 60
  ): DbregResult = {
    val f = Formula.parse(formula)
    val v = Vcov.parse(vcov)
    fitParsed(f, df, v, strategy, compressRatio, compressNmax, ssc, verbose, weights,
      probeMode, hdfeTol, hdfeMaxSweeps)
  }

  def fitParsed(
      f: Formula,
      df: DataFrame,
      v: Vcov,
      strategy: String = "auto",
      compressRatio: Option[Double] = None,
      compressNmax: Long = 1000000L,
      ssc: String = "full",
      verbose: Boolean = false,
      weights: Option[String] = None,
      probeMode: String = "exact",
      hdfeTol: Double = 1e-8,
      hdfeMaxSweeps: Int = 60
  ): DbregResult = {
    val clusterCol = v match { case Vcov.Cluster(c) => Some(c); case _ => None }
    // P1/P2: prune to the columns the model touches, drop missings
    val needed = (f.allInputCols ++ clusterCol ++ weights).distinct
    needed.foreach { c =>
      require(df.columns.contains(c), s"column '$c' not found in DataFrame")
    }
    val filterCols = needed
    val base0 = df
      .select(needed.map(col): _*)
      .filter(filterCols.map(col(_).isNotNull).reduce(_ && _))
    // analytic weights (beyond-reference extension): rows with w <= 0 are
    // dropped, mirroring fixest's handling of non-positive weights
    val base = weights.fold(base0)(w => base0.filter(col(w) > 0.0))

    weights.foreach { _ =>
      require(f.fe.isEmpty && (strategy == "auto" || strategy == "moments"),
        "weights are supported for the moments strategy without fixed effects")
    }
    val chosen =
      if (weights.isDefined) "moments"
      else chooseStrategy(strategy, f, base, compressRatio, compressNmax, verbose,
        probeMode)
    if (verbose) println(s"[dbreg] strategy: $chosen")
    chosen match {
      case "moments" => fitMoments(f, base, v, ssc, weights)
      case "demean" => fitDemean(f, base, v, ssc)
      case "mundlak" => fitMundlak(f, base, v, ssc)
      case "compress" => fitCompress(f, base, v, ssc, compressNmax)
      case "hdfe" => fitHdfe(f, base, v, ssc, hdfeTol, hdfeMaxSweeps)
      case other => throw new IllegalArgumentException(s"unknown strategy: $other")
    }
  }

  /** Grouped regression: one OLS fit PER GROUP from a single keyed
    * aggregation pass — the "millions of small models" shape. The shuffle
    * carries one moment row per (group × task) thanks to map-side partials;
    * each group's normal equations then solve EXECUTOR-SIDE (a narrow
    * flatMap over the aggregated moment rows), so the result is a real
    * distributed DataFrame — nothing is ever resident on the driver, and
    * G scales to millions of groups.
    *
    * One fixed effect per group is supported (`y ~ x | fe`): the within
    * transform demeans y and every regressor by their (group, fe) means —
    * one extra keyed aggregation and one composite-key equi-join, both
    * shuffling on (group, fe) — the intercept is absorbed, `r2` becomes
    * the within-R², and the residual df subtracts the group's own FE
    * level count (dfRes = n_g − p_kept − L_g, the per-group analogue of
    * the demean strategy's bookkeeping above). More than one FE → refuse
    * (run the engine's 2-FE strategies per group instead).
    *
    * `maxGroups` is an optional sanity guard (one cheap count over the
    * cached moment table when set below Long.MaxValue); pass
    * `Long.MaxValue` to disable the extra job entirely.
    *
    * Returns a DataFrame (group, term, estimate, std_error, n, r2).
    * iid standard errors.
    */
  def fitGrouped(
      formula: String,
      df: DataFrame,
      groupCol: String,
      maxGroups: Long = 10000000L
  ): DataFrame = {
    val f = Formula.parse(formula)
    require(f.fe.size <= 1,
      s"fitGrouped supports at most one fixed effect, got ${f.fe.size}")
    val feOpt = f.fe.headOption
    val needed = (f.allInputCols :+ groupCol).distinct
    needed.foreach(c => require(df.columns.contains(c), s"column '$c' not found"))
    val base = df.select(needed.map(col): _*)
      .filter(needed.map(col(_).isNotNull).reduce(_ && _))
    val d = buildDesign(base, f, groupCol +: f.fe,
      intercept = f.intercept && feOpt.isEmpty)
    val p = d.xNames.length
    val y = col(Y)
    def x(i: Int) = col(d.xNames(i))
    val grouped = feOpt match {
      case None =>
        val aggs = scala.collection.mutable.ArrayBuffer[Column]()
        aggs += count(lit(1)).as("_n")
        aggs += sum(y).as("_sy")
        aggs += sum(y * y).as("_syy")
        for (i <- 0 until p) {
          aggs += sum(x(i)).as(s"_sx$i")
          aggs += sum(x(i) * y).as(s"_sxy$i")
        }
        for (i <- 0 until p; j <- i until p)
          aggs += sum(x(i) * x(j)).as(s"_sxx_${i}_$j")
        d.df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail.toSeq: _*)
      case Some(fe) =>
        // NO demean join: the within (demeaned) moments follow from
        // per-cell RAW moments via the centering identity
        //   Σ (a − ā_c)(b − b̄_c) = Σ_cells (S_ab,c − S_a,c·S_b,c / n_c)
        // — the compress strategy's trick applied per group. One
        // partial+final hash aggregate keyed (group, fe) over the corpus,
        // then a tiny per-group aggregate over the G×L cell rows. The
        // join-based spelling costs a second corpus pass plus a per-row
        // hash probe (broadcast) or a corpus sort (merge join) — measured
        // 17-20 s at 180M rows where this is ~2 s.
        val cellAggs = scala.collection.mutable.ArrayBuffer[Column]()
        cellAggs += count(lit(1)).as("_cn")
        cellAggs += sum(y).as("_csy")
        cellAggs += sum(y * y).as("_csyy")
        for (i <- 0 until p) {
          cellAggs += sum(x(i)).as(s"_csx$i")
          cellAggs += sum(x(i) * y).as(s"_csxy$i")
        }
        for (i <- 0 until p; j <- i until p)
          cellAggs += sum(x(i) * x(j)).as(s"_csxx_${i}_$j")
        val cells = d.df.groupBy(col(groupCol), col(fe))
          .agg(cellAggs.head, cellAggs.tail.toSeq: _*)
        val cn = col("_cn").cast("double")
        val gAggs = scala.collection.mutable.ArrayBuffer[Column]()
        gAggs += sum(col("_cn")).as("_n")
        gAggs += sum(lit(0.0)).as("_sy") // demeaned y sums to zero per cell
        gAggs += sum(col("_csyy") - col("_csy") * col("_csy") / cn).as("_syy")
        gAggs += count(lit(1)).as("_L") // one row per (group, fe) cell
        for (i <- 0 until p)
          gAggs += sum(col(s"_csxy$i") - col(s"_csx$i") * col("_csy") / cn).as(s"_sxy$i")
        for (i <- 0 until p; j <- i until p)
          gAggs += sum(col(s"_csxx_${i}_$j") - col(s"_csx$i") * col(s"_csx$j") / cn)
            .as(s"_sxx_${i}_$j")
        cells.groupBy(col(groupCol)).agg(gAggs.head, gAggs.tail.toSeq: _*)
    }
    require(maxGroups >= 1L, s"maxGroups must be >= 1, got $maxGroups")

    val spark = df.sparkSession
    import spark.implicits._
    // optional guard: one cheap count over the cached moment table (G small
    // rows) — the base scan/agg runs once; the solve below reuses the cache
    val moments =
      if (maxGroups < Long.MaxValue) {
        // lazy staged truncation (Staging.stage), not persist: the guard count materializes
        // the moment table once and the solve below reuses the blocks; a
        // persist could never be unpersisted (the result is lazy) and
        // would leak a CacheManager entry per call
        val m = grouped.staged
        val g = m.count()
        require(g <= maxGroups,
          s"$g groups exceeds maxGroups=$maxGroups; raise the guard or pre-filter")
        m
      } else grouped

    // executor-side per-group solve: a narrow flatMap over the moment rows.
    // Each row is one group's sufficient statistics (O(p²) doubles); the
    // Cholesky/QR solve is local to it, so the output is a distributed
    // DataFrame and G scales to millions without driver memory growth.
    val displayNames = d.displayNames
    val xNames = d.xNames
    val hasFe = feOpt.isDefined
    val out = moments.flatMap { r =>
      def dd(name: String): Double = r.getAs[Any](name) match {
        case null => 0.0
        case v: Number => v.doubleValue
      }
      val pN = xNames.length
      val g = String.valueOf(r.getAs[Any](groupCol))
      val n = r.getAs[Long]("_n").toDouble
      val xtx = breeze.linalg.DenseMatrix.tabulate(pN, pN)((i, j) =>
        if (i <= j) dd(s"_sxx_${i}_$j") else dd(s"_sxx_${j}_$i"))
      val xty = breeze.linalg.DenseVector.tabulate(pN)(i => dd(s"_sxy$i"))
      val solved = LinAlg.solveDetecting(xtx, xty)
      val beta = solved.beta
      val keep = solved.keepIdx
      val syy = dd("_syy"); val sy = dd("_sy")
      val rss = {
        val xtyK = breeze.linalg.DenseVector(keep.map(xty(_)).toArray)
        val xtxK = breeze.linalg.DenseMatrix.tabulate(keep.length, keep.length)(
          (i, j) => xtx(keep(i), keep(j)))
        syy - 2.0 * beta.dot(xtyK) + beta.dot(xtxK * beta)
      }
      // FE path: moments are demeaned, so syy IS the within TSS and the
      // absorbed FE levels spend df (mirrors fitDemean's dfResOf)
      val dfFe = if (hasFe) dd("_L") else 0.0
      val tss = if (hasFe) syy else syy - sy * sy / n
      val dfRes = math.max(n - keep.length - dfFe, 1.0)
      val xtxInv = solved.xtxInv
      keep.zipWithIndex.map { case (origIdx, ki) =>
        val se = math.sqrt(xtxInv(ki, ki) * rss / dfRes)
        (g, displayNames(origIdx), beta(ki), se, n.round,
          if (tss > 0) 1.0 - rss / tss else 0.0)
      }
    }
    out.toDF("group", "term", "estimate", "std_error", "n", "r2")
  }

  /** The generated ANSI SQL for a strategy's aggregation — the analogue of
    * the reference's `sql_only = TRUE` (reference dbreg.R:760-762): returns
    * a runnable SQL string (DuckDB dialect-compatible) over a table named
    * `table`, starting with `WITH`, factors expanded as CASE WHEN. The
    * engine executes Catalyst plans, not this text; see [[SqlGen]]. */
  def sqlOnly(
      formula: String,
      df: DataFrame,
      table: String,
      strategy: String = "compress"
  ): String = SqlGen.sqlOnly(formula, df, table, strategy)

  /** The compressed cell table for a formula, without fitting — the
    * analogue of the reference's `data_only = TRUE` (dbreg.R:57-61):
    * GROUP BY (x…, fe…) with n / Σy / Σy² / ȳ / √n weights. */
  def compressedData(formula: String, df: DataFrame): DataFrame = {
    val f = Formula.parse(formula)
    val needed = f.allInputCols.distinct
    val base = df
      .select(needed.map(col): _*)
      .filter(needed.map(col(_).isNotNull).reduce(_ && _))
    val cellKeys = (f.xvars ++ f.fe).distinct
    base
      .groupBy(cellKeys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(f.y).cast("double")).as("sum_y"),
        sum(col(f.y).cast("double") * col(f.y).cast("double")).as("sum_y_sq"))
      .withColumn("mean_y", col("sum_y") / col("n"))
      .withColumn("wts", sqrt(col("n")))
  }

  // ---------------------------------------------------------------- chooser

  /** Auto decision tree (reference dbreg.R:494-701). Probes: COUNT(*),
    * COUNT(DISTINCT x+fe tuple), continuous-x heuristic
    * (approx_count_distinct > min(50, 0.2n), dbreg.R:421-440), and a 2-FE
    * balance check. All probes are single aggregate jobs.
    */
  private def chooseStrategy(
      strategy: String,
      f: Formula,
      base: DataFrame,
      compressRatio: Option[Double],
      compressNmax: Long,
      verbose: Boolean,
      probeMode: String = "exact"
  ): String = {
    val nFe = f.fe.length
    var chosen = strategy
    if (strategy == "auto") {
      val ratioThreshold = compressRatio.getOrElse(if (nFe == 1 || nFe == 2) 0.6 else 0.01)
      val keyCols = (f.xvars ++ f.fe).distinct
      // one probe job: COUNT(*) + COUNT(DISTINCT key-tuple) together.
      // probeMode="exact" matches the reference's probes (A8); "approx"
      // swaps in approx_count_distinct (HLL, ~5% rsd at the Spark
      // default) — the probe
      // then needs no distinct shuffle, which is the right trade at data
      // sizes where the probe would rival the fit itself. A ~5% error is
      // irrelevant to a 0.6-vs-0.01 threshold decision.
      val cellsAgg = probeMode match {
        case "exact" => countDistinct(col(keyCols.head), keyCols.tail.map(col): _*)
        case "approx" => approx_count_distinct(struct(keyCols.map(col): _*))
        case other => throw new IllegalArgumentException(
          s"probeMode must be exact|approx, got $other")
      }
      val probe = base
        .agg(count(lit(1)).as("__n"), cellsAgg.as("__cells"))
        .collect()(0)
      val nTotal = probe.getAs[Long]("__n")
      val nCells = probe.getAs[Long]("__cells")
      val ratio = nCells.toDouble / math.max(nTotal, 1L).toDouble
      val failRatio = ratio > ratioThreshold
      val failNmax = nCells > compressNmax
      if (verbose)
        println(f"[dbreg] auto: n=$nTotal%,d cells=$nCells%,d ratio=$ratio%.4f (threshold $ratioThreshold)")

      if (nFe == 0) {
        val anyContinuous = hasContinuousX(f, base, nTotal)
        chosen =
          if (anyContinuous || failRatio || failNmax) "moments" else "compress"
      } else if (nFe == 1 || nFe == 2) {
        if (failRatio || failNmax) {
          if (nFe == 2) {
            // balanced panels take the one-pass GROUPING SETS within
            // transform; unbalanced ones (where the additive two-way
            // demean identity fails) take the exact alternating-
            // projection path instead of the pre-round-7 refusal
            if (isBalanced(base, f.fe)) chosen = "demean" else chosen = "hdfe"
          } else chosen = "demean"
        } else chosen = "compress"
      } else {
        // K ≥ 3 FE: compress while the cell table stays small (exact and
        // one aggregation); alternating projections once it does not —
        // the reference refuses this case outright (dbreg.R:640-660)
        chosen = if (failRatio || failNmax) "hdfe" else "compress"
      }
    }
    // guards (reference dbreg.R:676-699)
    if (chosen == "moments" && nFe > 0) chosen = "compress"
    if (chosen == "demean" && !(nFe == 1 || nFe == 2)) chosen = "compress"
    if (chosen == "hdfe" && nFe == 0) chosen = "moments"
    chosen
  }

  private def hasContinuousX(f: Formula, base: DataFrame, nTotal: Long): Boolean = {
    val numericXs = f.xvars.filterNot(ModelMatrix.isFactor(base, _))
    if (numericXs.isEmpty) false
    else {
      val aggs = numericXs.map(x => approx_count_distinct(col(x)).as(s"_acd_$x"))
      val row = base.agg(aggs.head, aggs.tail: _*).collect()(0)
      val cut = math.min(50.0, 0.2 * nTotal)
      numericXs.exists(x => row.getAs[Long](s"_acd_$x").toDouble > cut)
    }
  }

  /** Balanced panel ⟺ all fe1×fe2 cell counts identical (A9). */
  private def isBalanced(base: DataFrame, fe: Seq[String]): Boolean =
    base
      .groupBy(fe.map(col): _*)
      .count()
      .agg(countDistinct(col("count")).as("k"))
      .collect()(0)
      .getAs[Long]("k") == 1L

  // ------------------------------------------------------------- strategies

  /** Internal design bundle: `df` holds `__g_y` plus design columns with
    * safe internal names; display names run parallel. The intercept is an
    * explicit constant column so that collinearity dropping and the meat
    * passes treat it uniformly. */
  private[reg] final case class Design(
      df: DataFrame,
      xNames: IndexedSeq[String],
      displayNames: IndexedSeq[String],
      cols: List[MMCol]
  )

  private[reg] val Y = "__g_y"

  private[reg] def buildDesign(
      base: DataFrame,
      f: Formula,
      carry: Seq[String],
      intercept: Boolean
  ): Design = {
    // drop-ref behavior follows the FORMULA's intercept (user's `0 +`), while
    // `intercept` only controls the explicit constant column (strategies like
    // demean absorb it and pass false here).
    val mm = ModelMatrix.expand(base, f.terms, f.fe, intercept = f.intercept)
    val all: List[MMCol] =
      (if (intercept && f.intercept) List(MMCol("(Intercept)", lit(1.0))) else Nil) ++ mm.cols
    val xNames = all.indices.map(i => s"__g_x$i")
    val cols = carry.map(col) ++
      Seq(col(f.y).cast("double").as(Y)) ++
      all.zipWithIndex.map { case (c, i) => c.col.cast("double").as(xNames(i)) }
    Design(base.select(cols: _*), xNames,
      all.map(c => ModelMatrix.displayName(c.name)).toIndexedSeq, all)
  }

  /** Attach a plain linear predictor (moments/compress/mundlak shape):
    * termCols maps kept display names to expressions over new data. */
  private def withLinearPredictor(
      res: DbregResult,
      termCols: Map[String, Column],
      preJoin: DataFrame => DataFrame = identity,
      offsetCol: Option[Column] = None,
      intervalsSupported: Boolean = true
  ): DbregResult = {
    val beta = breeze.linalg.DenseVector(res.coeftable.map(_.estimate).toArray)
    res.copy(predictor = Some(new LinearPredictor(
      res.terms, termCols, beta, res.vcov,
      res.rss / res.dfResidual, res.dfResidual,
      preJoin, offsetCol, intervalsSupported)))
  }

  /** Moments strategy (reference dbreg.R:703-872): one pass, no FE.
    * With `weights` the same pass computes the weighted triangle
    * [1,X,y]ᵀW[1,X,y] — exact WLS from one aggregation. */
  private def fitMoments(
      f: Formula,
      base: DataFrame,
      v: Vcov,
      ssc: String,
      weights: Option[String] = None
  ): DbregResult = {
    val cluster = v match { case Vcov.Cluster(c) => Seq(c); case _ => Nil }
    val d = buildDesign(base, f, cluster ++ weights, f.intercept)
    val mom = MomentsKernel.compute(d.df, Y, d.xNames, intercept = false,
      weightName = weights)
    val res = finish(f, d, mom, v, ssc,
      strategy = "moments",
      nobs = mom.nRows, nobsOrig = mom.nRows,
      dfFe = 0.0, tss = mom.sumYSq - mom.sumY * mom.sumY / mom.n,
      dfResOf = (n, pKept) => math.max(n - pKept, 1.0),
      clusterK = (pKept, _) => pKept,
      weightCol = weights)
    withLinearPredictor(res,
      d.cols.map(c => ModelMatrix.displayName(c.name) -> c.col).toMap)
  }

  /** Demean / within strategy, 1-2 FE (reference dbreg.R:874-1235). */
  private def fitDemean(f: Formula, base: DataFrame, v: Vcov, ssc: String): DbregResult = {
    val cluster = v match { case Vcov.Cluster(c) => Seq(c); case _ => Nil }
    val d0 = buildDesign(base, f, f.fe ++ cluster, intercept = false)
    val valueCols = Y +: d0.xNames

    def meansOver(keys: Seq[String], suffix: String): DataFrame =
      d0.df
        .groupBy(keys.map(col): _*)
        .agg(
          avg(valueCols.head).as(valueCols.head + suffix),
          valueCols.tail.map(c => avg(c).as(c + suffix)): _*)

    val dispToInt = d0.displayNames.zip(d0.xNames).toMap

    // FE intercepts for prediction: α_g = ȳ_g − x̄_g'β̂ over kept terms
    def alphaAdj(res: DbregResult, suffix: String): Column =
      res.coeftable
        .map(r => lit(r.estimate) * col(dispToInt(r.term) + suffix))
        .reduceOption(_ + _)
        .getOrElse(lit(0.0))

    val (demeaned, nFe1, nFe2, cleanup, alphaBuilder) = f.fe match {
      case Seq(fe1) =>
        val gm = meansOver(Seq(fe1), "_m").persist(StorageLevel.MEMORY_AND_DISK)
        val n1 = gm.count()
        val joined = withMeanColumns(d0.df, fe1, gm, n1, valueCols.map(_ + "_m"))
        val tilde = cluster.map(col) ++
          valueCols.map(c => (col(c) - col(c + "_m")).as(c))
        val builder = (res: DbregResult) => {
          val alpha = gm.select(col(fe1), (col(Y + "_m") - alphaAdj(res, "_m")).as("__g_alpha"))
          // left join: unseen FE levels yield a visible null fit, not a
          // silently dropped row
          ((nd: DataFrame) => nd.join(broadcast(alpha), Seq(fe1), "left"), col("__g_alpha"))
        }
        (joined.select(tilde: _*), n1, 1L, () => { gm.unpersist(); () }, builder)
      case Seq(fe1, fe2) =>
        // unit means, time means AND overall means from ONE pass over the
        // base via GROUPING SETS ((fe1),(fe2),()) — at cluster scale this
        // replaces three scans of the fact table with one
        val gsets = d0.df
          .groupingSets(Seq(Seq(col(fe1)), Seq(col(fe2)), Seq.empty), col(fe1), col(fe2))
          .agg(
            avg(valueCols.head).as(valueCols.head + "_gs"),
            valueCols.tail.map(c => avg(c).as(c + "_gs")) :+ grouping_id().as("__gid"): _*)
          .persist(StorageLevel.MEMORY_AND_DISK)
        // grouping_id bit = 1 when the column is aggregated away:
        // {fe1} → 0b01, {fe2} → 0b10, {} → 0b11
        def slice(gid: Int, keep: Seq[String], suffix: String): DataFrame =
          gsets.filter(col("__gid") === gid)
            .select(keep.map(col) ++
              valueCols.map(c => col(c + "_gs").as(c + suffix)): _*)
        val um = slice(1, Seq(fe1), "_u")
        val tm = slice(2, Seq(fe2), "_t")
        val om = slice(3, Nil, "_o")
        val n1 = um.count(); val n2 = tm.count()
        // overall means: exactly one row — always inline as literals
        val omRow = om.collect()(0)
        val withU = withMeanColumns(d0.df, fe1, um, n1, valueCols.map(_ + "_u"))
        val withT = withMeanColumns(withU, fe2, tm, n2, valueCols.map(_ + "_t"))
        val joined = withT.select(withT.columns.toIndexedSeq.map(col) ++
          valueCols.map(c => lit(omRow.getAs[Double](c + "_o")).as(c + "_o")): _*)
        val tilde = cluster.map(col) ++
          valueCols.map(c => (col(c) - col(c + "_u") - col(c + "_t") + col(c + "_o")).as(c))
        val builder = (res: DbregResult) => {
          val au = um.select(col(fe1), (col(Y + "_u") - alphaAdj(res, "_u")).as("__g_au"))
          val at = tm.select(col(fe2), (col(Y + "_t") - alphaAdj(res, "_t")).as("__g_at"))
          val ag = om.select((col(Y + "_o") - alphaAdj(res, "_o")).as("__g_ag"))
          val pre = (nd: DataFrame) =>
            nd.join(broadcast(au), Seq(fe1), "left")
              .join(broadcast(at), Seq(fe2), "left")
              .crossJoin(broadcast(ag))
          (pre, col("__g_au") + col("__g_at") - col("__g_ag"))
        }
        (joined.select(tilde: _*), n1, n2,
          () => { gsets.unpersist(); () }, builder)
      case other =>
        throw new IllegalArgumentException(s"demean supports 1-2 FE, got ${other.length}")
    }

    val mom = MomentsKernel.compute(demeaned, Y, d0.xNames, intercept = false)
    val dfFe = nFe1.toDouble + nFe2.toDouble - 1.0
    val res = finish(f, d0.copy(df = demeaned), mom, v, ssc,
      strategy = "demean",
      nobs = mom.nRows, nobsOrig = mom.nRows,
      dfFe = dfFe, tss = mom.sumYSq, // within TSS (reference dbreg.R:1214)
      dfResOf = (n, pKept) => math.max(n - pKept - dfFe, 1.0),
      clusterK = (pKept, nested) => pKept + dfFe - nested,
      nestedBase = Some(base))
    cleanup()
    val (preJoin, offset) = alphaBuilder(res)
    withLinearPredictor(res,
      d0.cols.map(c => ModelMatrix.displayName(c.name) -> c.col).toMap,
      preJoin = preJoin, offsetCol = Some(offset),
      intervalsSupported = false)
  }

  /** K-way / high-cardinality fixed effects via ALTERNATING PROJECTIONS
    * (Guimarães & Portugal 2010; the fixest/reghdfe demeaning loop
    * re-expressed as Spark group-mean joins). BEYOND-REFERENCE: the
    * reference refuses >2 FE outright (dbreg.R:640-660) and this engine
    * previously routed such fits to compress, whose FE-dummy design dies
    * past MaxDesignCols — high-cardinality FE (user/item) had no exact
    * distributed path.
    *
    * Algorithm: sweep over the FEs, each step subtracting per-group means
    * of (y, X) for one FE — the projection onto that FE's orthogonal
    * complement; iterate sweeps until every FE's residual group means are
    * ~0 (the von Neumann alternating-projection limit = the joint within
    * transform). One FE converges in exactly one sweep; K ≥ 2 typically
    * needs a handful.
    *
    * Scale shape: each sweep is K keyed mean aggregates + K mean-attach
    * steps over the (cluster?, fe*, y, X) projection — the group-mean
    * machinery J1 already uses. The attach tier decides the sweep cost:
    *  - ≤64 levels (the InlineMeansMaxLevels tier): the means COLLECT
    *    (one job — the convergence statistic folds out of the same rows
    *    driver-side) and attach as a literal lookup PROJECTION — no join,
    *    no shuffle, and crucially NO lineage checkpoint: re-deriving a
    *    chain of codegen'd projections from the scan is far cheaper than
    *    writing the corpus to checkpoint blocks each step (measured at
    *    180M rows: per-step localCheckpoint = 14-21 GB of disk traffic,
    *    which turned a ~1 min fit into 20+ min). A periodic stage every
    *    `HdfeStageEvery` steps bounds plan depth.
    *  - 64 < levels ≤ 2M (the maybeBroadcast tier): the means table is
    *    CACHED and attached by broadcast hash join — re-probing a cached
    *    build side per downstream aggregate is a hash lookup per row,
    *    far cheaper than writing the corpus to checkpoint blocks
    *    (measured at 180M rows × 1000-level FE: per-step staging 250 s →
    *    broadcast-tier 80 s); the cached mean tables (≤ steps × levels ×
    *    (p+2) doubles) release after the final moments pass.
    *  - >2M levels: the means table must shuffle-join, and the result IS
    *    staged per step — re-running a shuffle join per downstream
    *    aggregate would cost more than the checkpoint write.
    * Convergence: a sweep whose largest pre-subtraction |group mean|
    * falls below `tol`·max(1, scale of sweep 1) ends the loop; `tol = 0`
    * forces exactly `maxSweeps` sweeps (the fixed-sweep mode the q200
    * DuckDB oracle unrolls).
    *
    * Degrees of freedom: dfFe = Σ levels(fe_k) − (K − 1) — exact for one
    * connected component (the fixest default; exact connected-component
    * counting for K ≥ 3 is itself open).
    *
    * Prediction: the per-step mean tables contain everything FE-intercept
    * recovery needs, so it is FREE — zero extra corpus passes. Every
    * projection the loop applies to (y, X) accumulates per FE into
    * A_k^y(level) and A_k^{x_i}(level); by FWL linearity the LSDV fitted
    * value decomposes as ŷ = Xβ̂ + Σ_k α_k(level_k) with
    * α_k = A_k^y − Σ_i β̂_i · A_k^{x_i} over KEPT terms. New data joins
    * (or literal-looks-up, inline tier) the level-sized α_k tables; an
    * unseen level yields a visible null fit (the fitDemean contract).
    * α components are identified only up to cross-component constants —
    * predictions are exact for level combinations connected to the
    * training components (the same caveat fixest's fixef() carries).
    */
  private def fitHdfe(
      f: Formula,
      base: DataFrame,
      v: Vcov,
      ssc: String,
      tol: Double,
      maxSweeps: Int
  ): DbregResult = {
    require(f.fe.nonEmpty, "hdfe requires at least one fixed effect")
    require(maxSweeps >= 1, s"maxSweeps must be >= 1, got $maxSweeps")
    require(tol >= 0.0, s"tol must be >= 0, got $tol")
    val cluster = v match { case Vcov.Cluster(c) => Seq(c); case _ => Nil }
    val d0 = buildDesign(base, f, (f.fe ++ cluster).distinct, intercept = false)
    val valueCols = Y +: d0.xNames
    val carry = (f.fe ++ cluster).distinct

    // one probe: level count per FE (df bookkeeping)
    val levAggs = f.fe.map(fe => countDistinct(col(fe)).as(s"__l_$fe"))
    val levRow = d0.df.agg(levAggs.head, levAggs.tail: _*).collect()(0)
    val levels = f.fe.indices.map(levRow.getLong)
    val dfFe = levels.map(_.toDouble).sum - (f.fe.length - 1).toDouble

    val meanCols = valueCols.map(_ + "_m")
    var cur = d0.df
    // shuffle-tier gm released one step later (its reference is cut by the
    // step's stage); broadcast-tier gms stay cached only until the NEXT
    // stage of cur materializes — staging cuts cur's lineage past them,
    // so holding every sweep's mean tables to fit end (up to
    // maxSweeps·K × ≤2M rows) would be pure spill pressure. `held` are
    // the post-last-stage tables cur still probes; on stage they move to
    // `pending`, whose release() runs only after the next action
    // materializes the checkpoint.
    var pending: List[DataFrame] = Nil
    var held: List[DataFrame] = Nil
    def release(): Unit = { pending.foreach(_.unpersist()); pending = Nil }
    // per-FE accumulated mean tables (FE-intercept recovery — see the
    // Prediction paragraph above): inline tier accumulates driver-side
    // (≤64 entries), join tiers as a level-sized running full-outer sum,
    // eagerly staged so it never re-derives a released mean table
    val accMaps = Array.fill(f.fe.length)(
      scala.collection.mutable.LinkedHashMap.empty[Any, Array[Double]])
    val accDfs = Array.fill[Option[DataFrame]](f.fe.length)(None)
    val accCols = valueCols.indices.map(i => s"__acc$i")
    var sweep = 0
    var stepsSinceStage = 0
    var lastSweepMax = Double.PositiveInfinity
    var scale0 = -1.0
    while (sweep < maxSweeps &&
        (sweep == 0 || lastSweepMax >= tol * math.max(1.0, scale0))) {
      var sweepMax = 0.0
      f.fe.zipWithIndex.foreach { case (fe, fi) =>
        val gm = cur.groupBy(col(fe))
          .agg(
            avg(valueCols.head).as(valueCols.head + "_m"),
            valueCols.tail.map(c => avg(c).as(c + "_m")): _*)
        val shuffleTier = levels(fi) > BroadcastMeansMaxLevels
        val subtracted =
          if (levels(fi) <= InlineMeansMaxLevels) {
            // inline tier: ONE job (collect), statistic from the same rows
            val rows = gm.collect()
            release()
            rows.foreach { r =>
              val acc = accMaps(fi).getOrElseUpdate(r.getAs[Any](fe),
                Array.fill(valueCols.length)(0.0))
              meanCols.zipWithIndex.foreach { case (c, i) =>
                val v = r.getAs[Double](c)
                if (!v.isNaN) {
                  sweepMax = math.max(sweepMax, math.abs(v))
                  acc(i) += v
                }
              }
            }
            inlineMeanLookup(cur, fe, rows, meanCols)
          } else {
            val p = gm.persist(StorageLevel.MEMORY_AND_DISK)
            val nLev = p.count() // materializes any pending stage
            release()
            val mxRow = p
              .agg(greatest(meanCols.map(c => max(abs(col(c)))) :+ lit(0.0): _*))
              .collect()(0)
            if (!mxRow.isNullAt(0)) sweepMax = math.max(sweepMax, mxRow.getDouble(0))
            val stepAcc = p.select(
              col(fe) +: valueCols.indices.map(i => col(meanCols(i)).as(accCols(i))): _*)
            val merged = accDfs(fi) match {
              case None => graft.Staging.stage(stepAcc)
              case Some(a) =>
                graft.Staging.stage(a
                  .join(p.select(
                    col(fe) +: valueCols.indices.map(i =>
                      col(meanCols(i)).as(s"__st$i")): _*), Seq(fe), "full_outer")
                  .select(col(fe) +: valueCols.indices.map(i =>
                    (coalesce(col(accCols(i)), lit(0.0)) +
                      coalesce(col(s"__st$i"), lit(0.0))).as(accCols(i))): _*))
            }
            // eager: materialize the running sum while this step's mean
            // table is still cached (a later shuffle-tier release must
            // not force a gm recompute through the accumulator's lineage)
            merged.count()
            accDfs(fi) = Some(merged)
            if (shuffleTier) pending ::= p else held ::= p
            withMeanColumns(cur, fe, p, nLev, meanCols)
          }
        val next = subtracted.select(
          carry.map(col) ++
            valueCols.map(c => (col(c) - col(c + "_m")).as(c)): _*)
        // stage after every SHUFFLE-join step (re-running the shuffle
        // would cost more than the checkpoint, and staging cuts the
        // reference so the shuffled mean table can release) and
        // periodically on the projection/broadcast paths (bounds plan
        // depth without per-step corpus writes)
        stepsSinceStage += 1
        cur =
          if (shuffleTier || stepsSinceStage >= HdfeStageEvery) {
            stepsSinceStage = 0
            // this stage cuts cur's lineage past every broadcast-tier
            // mean table held so far — queue them behind the checkpoint's
            // materialization instead of holding all sweeps to fit end
            pending = pending ++ held
            held = Nil
            graft.Staging.stage(next)
          } else next
      }
      if (scale0 < 0.0) scale0 = sweepMax
      lastSweepMax = sweepMax
      sweep += 1
      // a single FE is one exact projection — no second sweep needed
      if (f.fe.length == 1) sweep = maxSweeps
    }
    // converged = the loop stopped on tolerance, not on the sweep cap.
    // Exact cases (single FE: one projection; tol = 0: the fixed-sweep
    // oracle contract) report true. A cap-exhausted multi-FE fit is a
    // TRUNCATED projection — poorly-connected panels (worker×firm-style
    // correlated FEs) can need hundreds of sweeps — so warn loudly, the
    // way fixest/reghdfe surface non-convergence, and record the state
    // on the result for programmatic callers.
    val sweepsRun = if (f.fe.length == 1) 1 else sweep
    val converged = f.fe.length == 1 || tol == 0.0 ||
      lastSweepMax < tol * math.max(1.0, scale0)
    if (!converged)
      Console.err.println(
        f"[dbreg] WARNING: hdfe did not converge in $maxSweeps sweeps " +
          f"(last sweep max |mean| = $lastSweepMax%.3e, tol threshold = " +
          f"${tol * math.max(1.0, scale0)}%.3e); estimates are a truncated " +
          "projection — raise hdfeMaxSweeps")

    val mom = MomentsKernel.compute(cur, Y, d0.xNames, intercept = false)
    val res = finish(f, d0.copy(df = cur), mom, v, ssc,
      strategy = "hdfe",
      nobs = mom.nRows, nobsOrig = mom.nRows,
      dfFe = dfFe, tss = mom.sumYSq, // within TSS, as in fitDemean
      dfResOf = (n, pKept) => math.max(n - pKept - dfFe, 1.0),
      clusterK = (pKept, nested) => pKept + dfFe - nested,
      nestedBase = Some(base))
    // FE-intercept recovery from the accumulated mean tables (see the
    // Prediction scaladoc): α_k = A_k^y − Σ_{kept i} β̂_i · A_k^{x_i}
    val dispToInt = d0.displayNames.zip(d0.xNames).toMap
    val betaByIdx: Map[Int, Double] = res.coeftable
      .map(r => valueCols.indexOf(dispToInt(r.term)) -> r.estimate).toMap
    def alpha(accs: Int => Double): Double =
      accs(0) - betaByIdx.map { case (i, b) => b * accs(i) }.sum
    val alphaParts: Seq[(DataFrame => DataFrame, Column)] =
      f.fe.toSeq.zipWithIndex.map { case (fe, fi) =>
        if (levels(fi) <= InlineMeansMaxLevels) {
          // literal lookup — unseen level falls through to null (the
          // fitDemean visible-null-fit contract)
          val chain = accMaps(fi).foldLeft(lit(null).cast("double")) {
            case (acc, (level, arr)) =>
              when(col(fe) === lit(level), lit(alpha(arr(_)))).otherwise(acc)
          }
          (identity[DataFrame] _, chain)
        } else {
          val alphaCol = s"__g_ha_$fi"
          val beta = betaByIdx.map { case (i, b) => lit(b) * col(accCols(i)) }
            .reduceOption(_ + _).getOrElse(lit(0.0))
          val tbl = accDfs(fi).get
            .select(col(fe), (col(accCols(0)) - beta).as(alphaCol))
            .persist(StorageLevel.MEMORY_AND_DISK)
          tbl.count() // pin the level-sized table for the predictor's life
          ((nd: DataFrame) => nd.join(maybeBroadcast(tbl, levels(fi)), Seq(fe), "left"),
            col(alphaCol))
        }
      }
    release()
    held.foreach(_.unpersist())
    val preJoin = (nd: DataFrame) =>
      alphaParts.foldLeft(nd) { case (d, (pj, _)) => pj(d) }
    val offset = alphaParts.map(_._2).reduce(_ + _)
    withLinearPredictor(
      res.copy(hdfeSweeps = Some(sweepsRun), hdfeConverged = Some(converged)),
      d0.cols.map(c => ModelMatrix.displayName(c.name) -> c.col).toMap,
      preJoin = preJoin, offsetCol = Some(offset),
      intervalsSupported = false)
  }

  /** Mundlak / correlated-random-effects strategy (reference dbreg.R:1237-1502). */
  private def fitMundlak(f: Formula, base: DataFrame, v: Vcov, ssc: String): DbregResult = {
    require(f.fe.nonEmpty, "mundlak requires at least one fixed effect")
    val cluster = v match { case Vcov.Cluster(c) => Seq(c); case _ => Nil }
    val d0 = buildDesign(base, f, f.fe ++ cluster, intercept = false)

    var aug = d0.df
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val meansByFe = scala.collection.mutable.ArrayBuffer.empty[(String, DataFrame)]
    val barNames = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    f.fe.foreach { fe =>
      val ms = d0.df
        .groupBy(col(fe))
        .agg(
          avg(d0.xNames.head).as(s"${d0.xNames.head}_bar_$fe"),
          d0.xNames.tail.map(c => avg(c).as(s"${c}_bar_$fe")): _*)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nLev = ms.count()
      caches += ms
      meansByFe += ((fe, ms))
      aug = withMeanColumns(aug, fe, ms, nLev, d0.xNames.map(c => s"${c}_bar_$fe"))
      d0.xNames.zip(d0.displayNames).foreach { case (xn, dn) =>
        barNames += ((s"${xn}_bar_$fe", s"${dn}_bar_$fe"))
      }
    }
    val interceptName = "__g_const"
    val augWithConst = aug.withColumn(interceptName, lit(1.0))
    val xAll = (interceptName +: d0.xNames) ++ barNames.map(_._1)
    val dispAll = ("(Intercept)" +: d0.displayNames) ++ barNames.map(_._2)
    val d = Design(augWithConst, xAll.toIndexedSeq, dispAll.toIndexedSeq, Nil)

    val mom = MomentsKernel.compute(d.df, Y, d.xNames, intercept = false)
    val res = finish(f, d, mom, v, ssc,
      strategy = "mundlak",
      nobs = mom.nRows, nobsOrig = mom.nRows,
      dfFe = 0.0, tss = mom.sumYSq - mom.sumY * mom.sumY / mom.n,
      dfResOf = (n, pKept) => math.max(n - pKept, 1.0),
      clusterK = (pKept, _) => pKept,
      nestedBase = Some(base))
    caches.foreach(_.unpersist())
    // prediction: original x expressions + group-mean columns re-joined
    val termCols =
      ((("(Intercept)", lit(1.0))) +:
        d0.cols.map(c => (ModelMatrix.displayName(c.name), c.col))) ++
        barNames.toList.map { case (internal, display) => (display, col(internal)) }
    val meansList = meansByFe.toList
    val preJoin = (nd: DataFrame) =>
      meansList.foldLeft(nd) { case (acc, (fe, ms)) =>
        acc.join(broadcast(ms), Seq(fe), "left")
      }
    withLinearPredictor(res, termCols.toMap, preJoin = preJoin)
  }

  /** Compress strategy (reference dbreg.R:1504-1716; Wong et al. 2021).
    * Cells = GROUP BY (x…, fe…); exact WLS on cells with weight n. The
    * normal equations are re-aggregated distributively over the compressed
    * DF (cells never need to reach the driver), which avoids the reference's
    * sparse-dummy-matrix memory blow-up (benchmark.R:93-109).
    */
  private def fitCompress(
      f: Formula,
      base: DataFrame,
      v: Vcov,
      ssc: String,
      compressNmax: Long
  ): DbregResult = {
    val cellKeys = (f.xvars ++ f.fe).distinct
    val comp = base
      .groupBy(cellKeys.map(col): _*)
      .agg(
        count(lit(1)).cast("double").as("__g_n"),
        sum(col(f.y).cast("double")).as("__g_sy"),
        sum(col(f.y).cast("double") * col(f.y).cast("double")).as("__g_syy"))
      .withColumn(Y, col("__g_sy") / col("__g_n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // cell count comes free from the moments pass (mom.nRows) — the first
    // action below materializes the cache; no separate count job

    // design columns over the cells: x expansion + FE dummies
    val mm = ModelMatrix.expand(comp, f.terms, f.fe, intercept = f.intercept)
    // ALL FE levels (no 100k cap: dummies must cover every group), fetched
    // for every FE in ONE aggregation job via collect_set over the cells
    val feLevels: Map[String, Seq[String]] =
      if (f.fe.isEmpty) Map.empty
      else {
        val aggs = f.fe.map(fe => collect_set(col(fe).cast("string")).as(fe))
        val row = comp.agg(aggs.head, aggs.tail: _*).collect()(0)
        f.fe.map(fe =>
          fe -> row.getAs[scala.collection.Seq[String]](fe).sorted.toSeq).toMap
      }
    val feDummies: List[MMCol] = f.fe.flatMap { fe =>
      val lvls = feLevels(fe)
      if (lvls.length < 2) Nil
      else
        lvls.tail.map { lvl =>
          MMCol(s"$fe$lvl", when(col(fe).cast("string") === lit(lvl), 1.0).otherwise(0.0))
        }
    }.toList
    val all: List[MMCol] =
      (if (f.intercept) List(MMCol("(Intercept)", lit(1.0))) else Nil) ++ mm.cols ++ feDummies
    if (all.size > MaxDesignCols) {
      // high-cardinality FE: p(p+1)/2 agg columns would swamp codegen —
      // switch to the driver-side sparse WLS over collected cells (the
      // reference's own client-side path, bounded by compressNmax)
      val res = CompressDriver.fit(f, base, comp, cellKeys, v, ssc, compressNmax)
      comp.unpersist()
      return res
    }
    val xNames = all.indices.map(i => s"__g_x$i")
    val designed = comp.select(
      (cellKeys.map(col) ++ Seq(col("__g_n"), col("__g_sy"), col("__g_syy"), col(Y)) ++
        all.zipWithIndex.map { case (c, i) => c.col.cast("double").as(xNames(i)) }): _*)
    val d = Design(designed, xNames,
      all.map(c => ModelMatrix.displayName(c.name)).toIndexedSeq, all)

    val mom = MomentsKernel.compute(
      d.df, Y, d.xNames, intercept = false, weightName = Some("__g_n"),
      extraAggs = Seq("_true_syy" -> sum(col("__g_syy"))))
    val trueSyy = mom.extra("_true_syy")
    val nOrig = mom.n.round
    val nCells = mom.nRows
    // weighted Xᵀy with ȳ equals the true Xᵀy (x constant within cell), but
    // Σw·ȳ² ≠ Σy² — substitute the true Σy² for RSS/TSS.
    val momTrue = mom.copy(sumYSq = trueSyy)

    val res = finish(f, d, momTrue, v, ssc,
      strategy = "compress",
      nobs = nCells, nobsOrig = nOrig,
      dfFe = 0.0, tss = trueSyy - mom.sumY * mom.sumY / mom.n,
      dfResOf = (_, _) => math.max(nOrig.toDouble - all.size, 1.0),
      clusterK = (_, nested) => all.size - nested,
      nestedBase = Some(base),
      compressCells = Some(CompressCells(base, cellKeys, all)))
    comp.unpersist()
    withLinearPredictor(
      res.copy(
        compressionRatio = Some(nCells.toDouble / math.max(nOrig, 1L)),
        feTerms = feDummies.map(c => ModelMatrix.displayName(c.name))),
      all.map(c => ModelMatrix.displayName(c.name) -> c.col).toMap)
  }

  private final case class CompressCells(
      base: DataFrame,
      cellKeys: Seq[String],
      designCols: List[MMCol]
  )

  // ------------------------------------------------------------- finishing

  /** Solve, collinearity-drop, RSS/TSS, then the requested vcov including
    * the second-pass meat aggregations. */
  private def finish(
      f: Formula,
      d: Design,
      mom: MomentsResult,
      v: Vcov,
      ssc: String,
      strategy: String,
      nobs: Long,
      nobsOrig: Long,
      dfFe: Double,
      tss: Double,
      dfResOf: (Double, Double) => Double,
      clusterK: (Double, Double) => Double,
      nestedBase: Option[DataFrame] = None,
      compressCells: Option[CompressCells] = None,
      weightCol: Option[String] = None
  ): DbregResult = {
    require(nobsOrig > 0,
      "no rows after missing-value filtering (empty input?)")
    val solved = LinAlg.solveDetecting(mom.xtx, mom.xty)
    val keptIdx = solved.keepIdx
    val keptX = keptIdx.map(d.xNames)
    val keptDisp = keptIdx.map(d.displayNames)
    val dropped = solved.dropIdx.map(d.displayNames)
    val beta = solved.beta
    val xtxInv = solved.xtxInv

    val rss = {
      val xtyK = breeze.linalg.DenseVector(keptIdx.map(mom.xty(_)).toArray)
      val xtxK = breeze.linalg.DenseMatrix.tabulate(keptIdx.length, keptIdx.length)(
        (i, j) => mom.xtx(keptIdx(i), keptIdx(j)))
      mom.sumYSq - 2.0 * beta.dot(xtyK) + beta.dot(xtxK * beta)
    }
    val pKept = keptX.length.toDouble
    val dfRes = dfResOf(nobsOrig.toDouble, pKept)

    def resid(df: DataFrame): Column =
      keptX.zipWithIndex.foldLeft(col(Y).cast("double")) { case (acc, (nm, i)) =>
        acc - lit(beta(i)) * col(nm).cast("double")
      }

    val (vmat, vtype, nClusters) = v match {
      case Vcov.Iid =>
        (LinAlg.vcovIid(xtxInv, rss, dfRes), "iid", None)

      case Vcov.Hc1 =>
        val meat = compressCells match {
          case Some(_) =>
            // per-cell grouped residuals: rss_g = Σy²_g − 2ŷ_g Σy_g + n_g ŷ_g²
            val yhat = keptX.zipWithIndex
              .map { case (nm, i) => lit(beta(i)) * col(nm).cast("double") }
              .reduce(_ + _)
            val cells = d.df
              .withColumn("__g_yhat", yhat)
              .withColumn(
                "__g_rssg",
                col("__g_syy") - lit(2.0) * col("__g_yhat") * col("__g_sy") +
                  col("__g_n") * col("__g_yhat") * col("__g_yhat"))
            MomentsKernel.meatTriangle(cells, col("__g_rssg"), keptX, intercept = false)
          case None =>
            val e = resid(d.df)
            // WLS score = w·e·x ⇒ HC1 meat scale = (w·e)²
            val s = weightCol.map(wc => e * col(wc).cast("double")).getOrElse(e)
            MomentsKernel.meatTriangle(d.df, s * s, keptX, intercept = false)
        }
        (LinAlg.vcovHc1(xtxInv, meat, nobsOrig.toDouble, dfRes), "hc1", None)

      case Vcov.Cluster(cl) =>
        val scores = compressCells match {
          case Some(cc) =>
            // cluster×cell stats, ŷ from the cell's x values (A12)
            val gc = cc.base
              .groupBy((cl +: cc.cellKeys).distinct.map(col): _*)
              .agg(
                count(lit(1)).cast("double").as("__g_n"),
                sum(col(f.y).cast("double")).as("__g_sy"))
            val withDesign = cc.designCols.zipWithIndex.foldLeft(gc) {
              case (acc, (c, i)) => acc.withColumn(s"__g_x$i", c.col.cast("double"))
            }
            val yhat = keptX.zipWithIndex
              .map { case (nm, i) => lit(beta(i)) * col(nm).cast("double") }
              .reduce(_ + _)
            val withResid = withDesign
              .withColumn("__g_rsum", col("__g_sy") - col("__g_n") * yhat)
            withResid
              .groupBy(col(cl))
              .agg(
                sum(col("__g_rsum") * col(keptX.head)).as(s"__s0"),
                keptX.tail.zipWithIndex.map { case (nm, i) =>
                  sum(col("__g_rsum") * col(nm)).as(s"__s${i + 1}")
                }: _*)
          case None =>
            val e0 = resid(d.df)
            // WLS cluster score = Σ_g w·e·x
            val e = weightCol.map(wc => e0 * col(wc).cast("double")).getOrElse(e0)
            d.df
              .groupBy(col(cl))
              .agg(
                sum(e * col(keptX.head)).as("__s0"),
                keptX.tail.zipWithIndex.map { case (nm, i) =>
                  sum(e * col(nm)).as(s"__s${i + 1}")
                }: _*)
        }
        val sNames = keptX.indices.map(i => s"__s$i")
        val cached = scores.persist(StorageLevel.MEMORY_AND_DISK)
        val g = cached.count()
        val meat = MomentsKernel.meatTriangle(cached, lit(1.0), sNames, intercept = false)
        cached.unpersist()
        val nested =
          if (ssc == "nested") nestedBase.map(countNestedFeLevels(_, f.fe, cl)).getOrElse(0.0)
          else 0.0
        val k = clusterK(pKept, nested)
        (LinAlg.vcovCr1(xtxInv, meat, nobsOrig.toDouble, g.toDouble, k), "cluster", Some(g))
    }

    val coeftable = keptDisp.zipWithIndex.map { case (nm, i) =>
      val se = math.sqrt(vmat(i, i))
      val t = beta(i) / se
      CoefRow(nm, beta(i), se, t, LinAlg.pValue(t, dfRes))
    }
    DbregResult(
      coeftable = coeftable,
      vcov = vmat,
      vcovType = vtype,
      strategy = strategy,
      nobs = nobs,
      nobsOrig = nobsOrig,
      dfResidual = dfRes,
      rss = rss,
      tss = tss,
      fe = f.fe,
      collinDropped = dropped,
      nClusters = nClusters,
      queryPlan = mom.plan
    )
  }

  /** ssc="nested": total levels of FE vars nested within the cluster var
    * (reference dbreg.R:1718-1752). */
  private def countNestedFeLevels(base: DataFrame, fe: Seq[String], cluster: String): Double =
    NestedFe.count(base, fe, cluster)

  /** Broadcast aggregate tables when plausibly small; group-mean tables
    * with more rows flow through a shuffle join instead. */
  /** Mean tables at or below this many rows broadcast; above it they
    * shuffle-join (and fitHdfe stages per step to cut the reference). */
  private val BroadcastMeansMaxLevels = 2000000L

  private def maybeBroadcast(df: DataFrame, nRows: Long): DataFrame =
    if (nRows <= BroadcastMeansMaxLevels) broadcast(df) else df

  /** Above this many levels a mean table joins; at or below it the means
    * are collected (L×(p+1) doubles — trivially driver-safe) and inlined
    * as a literal lookup expression. Measured at 60M rows: the
    * BroadcastHashJoin PROBE costs ~5 s against a 3-row build side where
    * the equivalent literal CASE chain costs ~0.6 s — a hash probe +
    * output-row copy per fact row loses badly to L codegen'd comparisons
    * when L is tiny. Typical FE dimensions (month, region, flag) are. */
  private val InlineMeansMaxLevels = 64L

  /** Attach `meanCols` from a per-`keyCol` means table to `df` — flat
    * output columns either way. Small tables inline as one staged literal
    * when-chain producing a struct (staged: the multi-use struct attribute
    * blocks CollapseProject, so the chain evaluates once per row); larger
    * tables broadcast- or shuffle-join. */
  private def withMeanColumns(
      df: DataFrame,
      keyCol: String,
      means: DataFrame,
      nLev: Long,
      meanCols: Seq[String]
  ): DataFrame =
    if (nLev <= InlineMeansMaxLevels)
      inlineMeanLookup(df, keyCol, means.collect(), meanCols)
    else df.join(maybeBroadcast(means, nLev), Seq(keyCol))

  /** The inline tier of [[withMeanColumns]] from PRE-COLLECTED mean rows —
    * callers that already hold the rows (fitHdfe folds its convergence
    * statistic out of the same collect) skip the second aggregate job. */
  private def inlineMeanLookup(
      df: DataFrame,
      keyCol: String,
      rows: Array[org.apache.spark.sql.Row],
      meanCols: Seq[String]
  ): DataFrame = {
    val nullStruct = struct(meanCols.map(f => lit(null).cast("double").as(f)): _*)
    val lookup = rows.foldLeft(nullStruct) { (acc, r) =>
      when(col(keyCol) === lit(r.getAs[Any](keyCol)),
        struct(meanCols.map(f => lit(r.getAs[Double](f)).as(f)): _*))
        .otherwise(acc)
    }
    df.withColumn("__lk", lookup)
      .select(df.columns.toIndexedSeq.map(col) ++ meanCols.map(f => col("__lk")(f).as(f)): _*)
  }
}
