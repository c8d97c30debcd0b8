package graft.reg

import graft.Staging.StagedFrame
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
  * distinct scores only. The whole rank/CDF family (AUC, KS, Spearman,
  * Mann–Whitney) guards that window's cardinality through [[boundedCuts]]:
  * bounded-cardinality columns keep the bit-exact algebra, continuous ones
  * auto-route to `buckets` equal-frequency bins (histogram-CDF cuts — no
  * sort anywhere), and `exact`/`quantize` remain the explicit overrides.
  */
object Eval {

  /** A probed-once regime decision for the rank/CDF metric family:
    * `cuts = None` → exact (group by raw value), `cuts = Some(c)` →
    * bucketed on the interior cut points `c`. Build one with
    * [[probeRegime]] and pass it to [[aucDF]]/[[ksTest]]/[[spearman]]/
    * [[mannWhitney]] to score k metrics on the same column for ONE
    * probe + cut computation instead of k — and to keep those calls
    * free of plan-build-time driver jobs (see the regime note on
    * [[aucDF]]). */
  final case class ScoreRegime(cuts: Option[Array[Double]])

  /** Run the [[boundedCuts]] probe ONCE for a column and freeze the
    * decision as a [[ScoreRegime]]: exact when the approx distinct count
    * is under `maxExactDistinct` (or `exact = Some(true)`), otherwise
    * `buckets` equal-frequency histogram-CDF cuts. Cuts reflect the
    * data at probe time — re-probe if the underlying data changes. */
  def probeRegime(
      df: DataFrame,
      value: Column,
      exact: Option[Boolean] = None,
      buckets: Int = 256,
      maxExactDistinct: Int = 1 << 17,
      relErr: Double = 1e-3
  ): ScoreRegime = {
    val base = df.filter(value.isNotNull)
      .select(value.cast("double").as("__v"))
    ScoreRegime(boundedCuts(base, "__v", exact, buckets, maxExactDistinct, relErr))
  }

  /** Decide the exact-vs-bucketed regime for a rank/CDF metric whose
    * cumulative window runs over the DISTINCT-value table (AUC, KS,
    * Spearman, Mann–Whitney) — the scale guard for the metric family.
    *
    * The exact path is only safe when that distinct table is bounded: on a
    * continuous column at corpus scale it IS row-scale, and the
    * single-partition `Window.orderBy` over it is the solved NTILE cliff in
    * new clothes (measured 1118 s vs 2.7 s at 180M for the equivalent
    * binning). So, mirroring `liftCurve`'s bucketed default:
    *
    *  - `exact = Some(true)`: caller vouches for bounded cardinality
    *    (categorical scores, pre-quantized columns, oracle parity) — no
    *    probe, no cuts, today's bit-exact algebra.
    *  - `exact = Some(false)`: always bucket into `buckets` equal-frequency
    *    bins via the histogram-CDF cuts (`Dbbinsreg.quantileCutBins` — two
    *    narrow scans, ≤ 2^20-row driver state, no sort anywhere).
    *  - `exact = None` (default): ONE cheap `approx_count_distinct` probe
    *    picks the regime — exact when the distinct table is under
    *    `maxExactDistinct` rows (a window that size is trivial), bucketed
    *    past it. Deterministic for fixed data (HLL++ is order-insensitive),
    *    and small/categorical inputs keep bit-exact results with no caller
    *    change.
    *
    * Returns None → run exact (group by raw value); Some(cuts) → group by
    * `caseChainBin(v, cuts)` (≤ 64 cuts: literal chain; above: codegen'd
    * binary search — O(log B) per row, O(1) plan size). Within-bin value
    * differences then count as ties, which is the standard binned estimate
    * for every metric in the family (error ≤ one bin of probability mass).
    */
  private def boundedCuts(
      base: DataFrame,
      valueCol: String,
      exact: Option[Boolean],
      buckets: Int,
      maxExactDistinct: Int,
      relErr: Double
  ): Option[Array[Double]] = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val wantExact = exact.getOrElse {
      base.agg(approx_count_distinct(col(valueCol)).as("__d"))
        .collect()(0).getLong(0) <= maxExactDistinct
    }
    if (wantExact) None
    else graft.binsreg.Dbbinsreg.quantileCutBins(base, valueCol, buckets, relErr)
  }

  /** Per-query ranking-quality metrics over an already-ranked candidate
    * list — the retrieval-eval half of a RAG pipeline (NDCG@k, MRR@k,
    * recall@k). Input rows are (query, rank starting at 1, binary
    * relevance); output is one row per query:
    * (query, n_rel, ndcg, mrr, recall), where
    *
    *   - ndcg = Σ_{rank≤k} rel/log₂(rank+1), normalized by the ideal DCG
    *     of min(k, n_rel) relevant items (null when n_rel = 0);
    *   - mrr  = 1 / (first relevant rank ≤ k), 0 when none;
    *   - recall = (relevant in top k) / n_rel over the SUPPLIED list
    *     (pool-based recall — n_rel counts the list, not the corpus;
    *     null when n_rel = 0).
    *
    * Scale shape: ONE partial+final hash aggregate keyed by the query —
    * no windows, no joins, nothing driver-sized anywhere. The log₂
    * discounts and ideal-DCG partial sums are k-sized literal CASE
    * tables folded on the driver (k is a parameter, not data), so the
    * whole metric is a codegen'd projection over the aggregate — and the
    * identical literals can be embedded in an oracle's SQL for bit
    * parity (libm log differences never enter the plan). */
  def rankingMetrics(
      ranked: DataFrame,
      queryCol: String,
      rankCol: String,
      relCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val (w, ideal) = ndcgTables(k) // ideal(m-1) = IDCG for m relevant items
    val r = col(rankCol).cast("int")
    val rel = col(relCol).cast("double")
    val discount = (2 to k).foldLeft(when(r === 1, w(0))) {
      case (acc, i) => acc.when(r === i, w(i - 1))
    }.otherwise(lit(0.0))
    val agg = ranked.groupBy(col(queryCol).as("query"))
      .agg(
        sum(rel * discount).as("__dcg"),
        sum(rel).as("n_rel"),
        sum(when(r <= k, rel).otherwise(lit(0.0))).as("__rk"),
        min(when(rel > 0 && r <= k, r)).as("__fr"))
    val idcg = (1 until k).foldLeft(when(col("n_rel") >= k, ideal(k - 1))) {
      case (acc, m) => acc.when(col("n_rel") === m, ideal(m - 1))
    }
    agg.select(
      col("query"), col("n_rel").cast("long").as("n_rel"),
      when(col("n_rel") > 0, col("__dcg") / idcg).as("ndcg"),
      coalesce(lit(1.0) / col("__fr"), lit(0.0)).as("mrr"),
      when(col("n_rel") > 0, col("__rk") / col("n_rel")).as("recall"))
  }

  /** The literal discount/ideal tables [[rankingMetrics]] folds — exposed
    * so an oracle can embed the SAME doubles (bit parity by construction). */
  private[graft] def ndcgTables(k: Int): (Seq[Double], Seq[Double]) = {
    val w = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    (w, w.scanLeft(0.0)(_ + _).tail)
  }

  /** Area under the ROC curve of `score` predicting boolean/0-1 `label`.
    * One scan; ties get half credit (the exact Mann-Whitney convention).
    * Regime selection (exact vs `buckets` quantile bins) per
    * [[boundedCuts]] — the default auto-probe keeps bounded-cardinality
    * scores bit-exact and caps a continuous score's distinct-value window
    * at `buckets` rows (binned AUC, bias ≤ ~1/(2·buckets)). */
  def auc(
      df: DataFrame,
      score: Column,
      label: Column,
      quantize: Option[Int] = None,
      exact: Option[Boolean] = None,
      buckets: Int = 256,
      maxExactDistinct: Int = 1 << 17,
      relErr: Double = 1e-3,
      regime: Option[ScoreRegime] = None
  ): Double =
    aucDF(df, score, label, quantize, exact, buckets, maxExactDistinct,
      relErr, regime)
      .collect()(0).getDouble(0)

  /** [[auc]] as a 1-row DataFrame (column `auc`), for plan composition.
    *
    * Regime note: in the default auto mode (`exact = None`,
    * `regime = None`) the [[boundedCuts]] guard runs EAGER driver jobs at
    * plan-BUILD time — the `approx_count_distinct` probe plus, on the
    * bucketed route, two narrow cut scans — and the cut points are frozen
    * then, so a DataFrame built once and acted on after the underlying
    * data changes reads stale bins. For pure lazy composition, or to
    * score several metrics on one column with a single probe, pass
    * `exact = Some(...)` or a probed-once [[ScoreRegime]] (which this
    * method then uses verbatim, running no jobs of its own). */
  def aucDF(
      df: DataFrame,
      score: Column,
      label: Column,
      quantize: Option[Int] = None,
      exact: Option[Boolean] = None,
      buckets: Int = 256,
      maxExactDistinct: Int = 1 << 17,
      relErr: Double = 1e-3,
      regime: Option[ScoreRegime] = None
  ): DataFrame = {
    val s = quantize.fold(score.cast("double"))(d => round(score.cast("double"), d))
    val y = label.cast("double")
    val base = df
      .filter(score.isNotNull && label.isNotNull)
      .select(s.as("__s"), y.as("__y"))
    val key = regime.map(_.cuts)
      .getOrElse(boundedCuts(base, "__s", exact, buckets, maxExactDistinct, relErr))
      .fold(col("__s"))(cuts =>
        graft.binsreg.Dbbinsreg.caseChainBin(col("__s"), cuts).cast("double"))
    val g = base
      .select(key.as("__k"), col("__y"))
      .groupBy("__k")
      .agg(sum(col("__y")).as("__pos"), sum(lit(1.0) - col("__y")).as("__neg"))
    // window over DISTINCT keys only (bounded after the aggregate: distinct
    // scores in the exact regime, ≤ buckets + 1 bins in the bucketed one)
    val w = Window.orderBy(col("__k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val u = g
      .withColumn("__cumneg", coalesce(sum(col("__neg")).over(w), lit(0.0)))
      .agg(
        sum(col("__pos") * (col("__cumneg") + lit(0.5) * col("__neg"))).as("__u"),
        sum(col("__pos")).as("__p"),
        sum(col("__neg")).as("__n"))
    u.select((col("__u") / (col("__p") * col("__n"))).as("auc"))
  }

  /** Welch two-sample comparison (the A/B-test readout): difference in
    * means with the unequal-variance standard error and
    * Welch–Satterthwaite degrees of freedom — ONE conditional-sum
    * aggregate over one scan (no split, no join; the p-value is the
    * caller's t-CDF lookup on (t, df)).
    * Returns one row (n_a, n_b, mean_a, mean_b, diff, se, t, df). */
  def abTest(
      df: DataFrame,
      treated: Column,
      value: Column
  ): DataFrame = {
    val y = value.cast("double")
    val t = treated.cast("boolean")
    def side(flag: Boolean, nm: String) = Seq(
      sum(when(t === flag, 1.0).otherwise(0.0)).as(s"n_$nm"),
      sum(when(t === flag, y).otherwise(0.0)).as(s"s_$nm"),
      sum(when(t === flag, y * y).otherwise(0.0)).as(s"ss_$nm"))
    val aggs = side(false, "a") ++ side(true, "b")
    df.filter(t.isNotNull && y.isNotNull)
      .agg(aggs.head, aggs.tail: _*)
      .select(
        col("n_a"), col("n_b"),
        (col("s_a") / col("n_a")).as("mean_a"),
        (col("s_b") / col("n_b")).as("mean_b"),
        ((col("ss_a") - col("s_a") * col("s_a") / col("n_a")) / (col("n_a") - 1.0)).as("v_a"),
        ((col("ss_b") - col("s_b") * col("s_b") / col("n_b")) / (col("n_b") - 1.0)).as("v_b"))
      .select(
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        col("mean_a"), col("mean_b"),
        (col("mean_b") - col("mean_a")).as("diff"),
        sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")).as("se"),
        ((col("mean_b") - col("mean_a")) /
          sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b"))).as("t"),
        (((col("v_a") / col("n_a") + col("v_b") / col("n_b")) *
          (col("v_a") / col("n_a") + col("v_b") / col("n_b"))) /
          ((col("v_a") / col("n_a")) * (col("v_a") / col("n_a")) / (col("n_a") - 1.0) +
            (col("v_b") / col("n_b")) * (col("v_b") / col("n_b")) / (col("n_b") - 1.0)))
          .as("df"))
  }

  /** Spearman rank correlation between two numeric columns — the robust,
    * monotone-invariant dependence measure (average ranks for ties, the
    * textbook convention).
    *
    * Scale shape, both-bucketed regime (the at-scale default once both
    * columns probe continuous): the corpus streams through ONE
    * (bin_x, bin_y) contingency aggregate (≤ (buckets+1)² cells);
    * average ranks derive from the cell table's own margins (rank of a
    * bin = rows below it + (rows in it + 1)/2 — the identical tie
    * convention) and broadcast back onto the cells; the final
    * Pearson-on-ranks is a cell-weighted 1-row moments aggregate. No
    * corpus-sized join anywhere (measured at 180M: 30.2 s with the old
    * rank join-backs → 4-6 s class). Exact/mixed regimes keep the
    * join-back shape: per-variable rank tables from the distinct-value
    * aggregate, joined to the rows on the value key (broadcast when
    * small), because their cross-product cell count is unbounded.
    * Returns one row (rho, n). */
  def spearman(
      df: DataFrame,
      x: Column,
      y: Column,
      exact: Option[Boolean] = None,
      buckets: Int = 256,
      maxExactDistinct: Int = 1 << 17,
      relErr: Double = 1e-3,
      regimeX: Option[ScoreRegime] = None,
      regimeY: Option[ScoreRegime] = None
  ): DataFrame = {
    val base0 = df
      .filter(x.isNotNull && y.isNotNull)
      .select(x.cast("double").as("__x"), y.cast("double").as("__y"))
    // per-variable regime: only an unbounded column pays the binning (its
    // within-bin values become rank ties — the standard binned estimate);
    // one fused probe job decides both in auto mode (eager at build time —
    // the aucDF regime note; probed-once regimes skip it per column)
    val (exactX, exactY) = exact match {
      case Some(e) => (Some(e), Some(e))
      case None => (regimeX, regimeY) match {
        case (Some(_), Some(_)) => (None, None)
        case (Some(_), None) => // probe ONLY the un-regimed column
          val d = base0.agg(approx_count_distinct(col("__y")))
            .collect()(0).getLong(0)
          (None, Some(d <= maxExactDistinct))
        case (None, Some(_)) =>
          val d = base0.agg(approx_count_distinct(col("__x")))
            .collect()(0).getLong(0)
          (Some(d <= maxExactDistinct), None)
        case (None, None) =>
          val r = base0.agg(
            approx_count_distinct(col("__x")).as("__dx"),
            approx_count_distinct(col("__y")).as("__dy")).collect()(0)
          (Some(r.getLong(0) <= maxExactDistinct),
            Some(r.getLong(1) <= maxExactDistinct))
      }
    }
    def cutsOf(c: String, e: Option[Boolean], pre: Option[ScoreRegime]) =
      pre.map(_.cuts)
        .getOrElse(boundedCuts(base0, c, e, buckets, maxExactDistinct, relErr))
    val cutsX = cutsOf("__x", exactX, regimeX)
    val cutsY = cutsOf("__y", exactY, regimeY)
    def keyOf(c: String, cuts: Option[Array[Double]]) =
      cuts.fold(col(c))(cs =>
        graft.binsreg.Dbbinsreg.caseChainBin(col(c), cs).cast("double"))
    val base = base0.select(
      keyOf("__x", cutsX).as("__x"), keyOf("__y", cutsY).as("__y"))
    val rhoOf = (n: Column, sx: Column, sy: Column, sxx: Column,
        syy: Column, sxy: Column) =>
      (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    if (cutsX.isDefined && cutsY.isDefined) {
      // both bucketed: one contingency pass, margin-derived ranks
      val cells = base.groupBy(col("__x"), col("__y"))
        .agg(count(lit(1)).cast("double").as("__n"))
        .staged
      def marginRanks(c: String) = {
        val w = Window.orderBy(col(c))
          .rowsBetween(Window.unboundedPreceding, -1)
        cells.groupBy(col(c)).agg(sum(col("__n")).as("__m"))
          .withColumn("__below", coalesce(sum(col("__m")).over(w), lit(0.0)))
          .select(col(c), (col("__below") + (col("__m") + 1.0) / 2.0).as(s"__r$c"))
      }
      cells
        .join(broadcast(marginRanks("__x")), "__x")
        .join(broadcast(marginRanks("__y")), "__y")
        .agg(
          sum(col("__n")).as("n"),
          sum(col("__n") * col("__r__x")).as("sx"),
          sum(col("__n") * col("__r__y")).as("sy"),
          sum(col("__n") * col("__r__x") * col("__r__x")).as("sxx"),
          sum(col("__n") * col("__r__y") * col("__r__y")).as("syy"),
          sum(col("__n") * col("__r__x") * col("__r__y")).as("sxy"))
        .select(
          rhoOf(col("n"), col("sx"), col("sy"), col("sxx"), col("syy"),
            col("sxy")).as("rho"),
          col("n").cast("long").as("n"))
    } else {
      def ranks(c: String) = {
        val w = Window.orderBy(col(c)).rowsBetween(Window.unboundedPreceding, -1)
        base
          .groupBy(col(c)).agg(count(lit(1)).cast("double").as("__n"))
          .withColumn("__below", coalesce(sum(col("__n")).over(w), lit(0.0)))
          .select(col(c), (col("__below") + (col("__n") + 1.0) / 2.0).as(s"__r$c"))
      }
      base
        .join(ranks("__x"), "__x")
        .join(ranks("__y"), "__y")
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("__r__x")).as("sx"), sum(col("__r__y")).as("sy"),
          sum(col("__r__x") * col("__r__x")).as("sxx"),
          sum(col("__r__y") * col("__r__y")).as("syy"),
          sum(col("__r__x") * col("__r__y")).as("sxy"))
        .select(
          rhoOf(col("n"), col("sx"), col("sy"), col("sxx"), col("syy"),
            col("sxy")).as("rho"),
          col("n").cast("long").as("n"))
    }
  }

  /** Association measures between two categorical columns from ONE
    * contingency aggregation: Pearson chi-squared, Cramér's V
    * (χ²/(n·(min(R,C)−1)) under a square root — the [0,1]-normalized
    * effect size), and mutual information Σ p·ln(p/(p_row·p_col)) in nats.
    *
    * Scale shape: cells = one keyed (a,b) count; margins re-aggregate the
    * CELL table (not the corpus) and broadcast-join back; the corpus
    * streams once. Returns one row (chi2, cramers_v, mi, n). */
  def categoricalAssociation(
      df: DataFrame,
      a: Column,
      b: Column
  ): DataFrame = {
    val cells = df
      .filter(a.isNotNull && b.isNotNull)
      .select(a.cast("string").as("__a"), b.cast("string").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).cast("double").as("__n"))
    val rowM = cells.groupBy("__a").agg(sum(col("__n")).as("__ra"))
    val colM = cells.groupBy("__b").agg(sum(col("__n")).as("__cb"))
    val tot = rowM.agg(sum(col("__ra")).as("__t"), count(lit(1)).as("__nr"))
      .crossJoin(colM.agg(count(lit(1)).as("__nc")))
    cells
      .join(broadcast(rowM), "__a")
      .join(broadcast(colM), "__b")
      .crossJoin(broadcast(tot))
      .select(
        (col("__n") - col("__ra") * col("__cb") / col("__t")).as("__d"),
        (col("__ra") * col("__cb") / col("__t")).as("__e"),
        (col("__n") / col("__t") *
          log(col("__n") * col("__t") / (col("__ra") * col("__cb")))).as("__mi"),
        col("__t"), col("__nr"), col("__nc"))
      .agg(
        sum(col("__d") * col("__d") / col("__e")).as("chi2_obs"),
        sum(col("__e")).as("se"),
        sum(col("__mi")).as("mi"),
        max(col("__t")).as("t"),
        max(col("__nr")).as("nr"), max(col("__nc")).as("nc"))
      // unobserved (zero) cells each contribute (0−e)²/e = e to χ², and all
      // R×C expected counts sum to n — so their total is n − Σ_observed e
      // (they add nothing to MI: p·ln(p/…) → 0)
      .withColumn("chi2", col("chi2_obs") + (col("t") - col("se")))
      .select(
        col("chi2"),
        sqrt(col("chi2") / (col("t") *
          (least(col("nr"), col("nc")).cast("double") - 1.0))).as("cramers_v"),
        col("mi"),
        col("t").cast("long").as("n"))
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
      quantize: Option[Int] = None,
      exact: Option[Boolean] = None,
      buckets: Int = 256,
      maxExactDistinct: Int = 1 << 17,
      relErr: Double = 1e-3,
      regime: Option[ScoreRegime] = None
  ): DataFrame = {
    val v = quantize.fold(value.cast("double"))(d => round(value.cast("double"), d))
    def side(df: DataFrame, flag: Int) = df
      .filter(value.isNotNull)
      .select(v.as("__v"), lit(flag).as("__side"))
    val both = side(ref, 0).unionAll(side(cur, 1))
    // cuts come from the POOLED sample so both CDFs are read on one grid
    // (a supplied regime should be probed on the pooled data too); binned
    // D underestimates by at most one bin of pooled mass. Auto mode runs
    // eager probe/cut jobs at build time — the aucDF regime note; note
    // the probe here rescans BOTH inputs, so a shared regime saves most.
    val key = regime.map(_.cuts)
      .getOrElse(boundedCuts(both, "__v", exact, buckets, maxExactDistinct, relErr))
      .fold(col("__v"))(cuts =>
        graft.binsreg.Dbbinsreg.caseChainBin(col("__v"), cuts).cast("double"))
    val g = both
      .select(key.as("__v"), col("__side"))
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

  /** Mann–Whitney U (Wilcoxon rank-sum) test: does `value` stochastically
    * dominate between the two arms of `flag`? U computed from
    * average-rank sums over the DISTINCT-VALUE aggregate (the [[aucDF]]
    * shape — the corpus-sized work is one keyed count; the rank window
    * runs over distinct values only), with the normal approximation and
    * the standard tie-corrected variance
    * σ² = n₁n₂/12·((n+1) − Σ(t³−t)/(n(n−1))). Two-sided p via the shared
    * A&S erfc tail ([[erfcApprox]]). z/p are NULL for an empty arm or a
    * single shared value (σ = 0). Returns one row
    * (n_a, n_b, u, z, p) where u counts pairs won by arm A (+½ per tie).
    */
  def mannWhitney(
      df: DataFrame,
      flag: Column,
      value: Column,
      exact: Option[Boolean] = None,
      buckets: Int = 256,
      maxExactDistinct: Int = 1 << 17,
      relErr: Double = 1e-3,
      regime: Option[ScoreRegime] = None
  ): DataFrame = {
    val base = df
      .filter(flag.isNotNull && value.isNotNull)
      .select(flag.cast("boolean").as("__f"), value.cast("double").as("__v"))
    // auto mode runs eager probe/cut jobs at build time (aucDF regime
    // note); pass a probed-once ScoreRegime to skip them
    val key = regime.map(_.cuts)
      .getOrElse(boundedCuts(base, "__v", exact, buckets, maxExactDistinct, relErr))
      .fold(col("__v"))(cuts =>
        graft.binsreg.Dbbinsreg.caseChainBin(col("__v"), cuts).cast("double"))
    val g = base
      .select(col("__f"), key.as("__v"))
      .groupBy("__v")
      .agg(sum(when(col("__f"), 1L).otherwise(0L)).cast("double").as("__a"),
        sum(when(!col("__f"), 1L).otherwise(0L)).cast("double").as("__b"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = col("__a") + col("__b")
    val stats = g
      .withColumn("__cumb", coalesce(sum(col("__b")).over(w), lit(0.0)))
      .agg(
        sum(col("__a")).as("__na"), sum(col("__b")).as("__nb"),
        sum(col("__a") * (col("__cumb") + lit(0.5) * col("__b"))).as("__u"),
        sum(t * t * t - t).as("__ties"))
    val n = col("__na") + col("__nb")
    val mu = col("__na") * col("__nb") / 2.0
    val sig2 = col("__na") * col("__nb") / lit(12.0) *
      ((n + 1.0) - col("__ties") / (n * (n - 1.0)))
    stats.select(
        col("__na").cast("long").as("n_a"), col("__nb").cast("long").as("n_b"),
        col("__u").as("u"),
        when(col("__na") > 0 && col("__nb") > 0 && sig2 > 0.0,
          (col("__u") - mu) / sqrt(sig2)).as("z"))
      .withColumn("p", when(col("z").isNotNull, normalTwoSidedP(col("z"))))
  }

  /** Chi-square goodness-of-fit of a categorical column against declared
    * expected shares: χ² = Σ (obs_c − share_c·N)²/(share_c·N) over the
    * DECLARED categories (N = their observed total; undeclared
    * categories are reported via `n_other`, not silently mixed into the
    * test). One conditional-count aggregation; the p-value uses the
    * Wilson–Hilferty cube-root normal approximation with the shared
    * erfc tail — cross-engine replicable like every other tail in the
    * engine. Returns one row (n, n_other, chi2, df, p).
    */
  def chiSquareGof(
      df: DataFrame,
      category: Column,
      expected: Seq[(String, Double)]
  ): DataFrame = {
    require(expected.size >= 2, "need at least 2 categories")
    require(expected.map(_._1).distinct.size == expected.size,
      "duplicate categories")
    require(expected.forall(_._2 > 0), "expected shares must be positive")
    val total = expected.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"shares must sum to 1, got $total")
    val c = category.cast("string")
    val aggs =
      sum(when(c.isin(expected.map(_._1): _*), 0L).otherwise(1L)).as("__other") +:
        expected.zipWithIndex.map { case ((name, _), i) =>
          sum(when(c === name, 1L).otherwise(0L)).cast("double").as(s"__o$i")
        }
    val one = df.filter(c.isNotNull).agg(aggs.head, aggs.tail: _*)
    val nDecl = expected.indices.map(i => col(s"__o$i")).reduce(_ + _)
    val chi2 = expected.zipWithIndex.map { case ((_, share), i) =>
      val e = lit(share) * nDecl
      (col(s"__o$i") - e) * (col(s"__o$i") - e) / e
    }.reduce(_ + _)
    val k = expected.size
    val dfree = lit((k - 1).toDouble)
    val wh = (pow(chi2 / dfree, lit(1.0 / 3.0)) -
      (lit(1.0) - lit(2.0) / (lit(9.0) * dfree))) /
      sqrt(lit(2.0) / (lit(9.0) * dfree))
    // upper-tail P(Z > wh); the A&S polynomial is valid for x ≥ 0 only,
    // so the negative branch goes through symmetry
    val s2 = lit(math.sqrt(2.0))
    val pUpper = when(wh >= 0.0, erfcApprox(wh / s2) / 2.0)
      .otherwise(lit(1.0) - erfcApprox(-wh / s2) / 2.0)
    one.select(
      nDecl.cast("long").as("n"),
      coalesce(col("__other"), lit(0L)).as("n_other"),
      when(nDecl > 0, chi2).as("chi2"),
      lit(k - 1).as("df"),
      when(nDecl > 0, pUpper).as("p"))
  }

  /** Pairwise Pearson correlation matrix over `cols`, from ONE scan:
    * a single aggregation computes n, the k sums and the k(k+1)/2
    * cross-products, and the pair table is an inline struct-array
    * explode — no per-pair pass, no driver math. Rows with a null in
    * ANY column are dropped (complete-case, the standard matrix
    * contract, so every pair shares one n). corr is NULL for a
    * zero-variance column. Returns (col1, col2, n, corr) for i ≤ j.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    val k = cols.size
    val x = cols.map(c => col(c).cast("double"))
    val complete = df.filter(x.map(_.isNotNull).reduce(_ && _))
    val aggs = count(lit(1)).cast("double").as("__n") +:
      (x.zipWithIndex.map { case (c, i) => sum(c).as(s"__s$i") } ++
        (for (i <- 0 until k; j <- i until k)
          yield sum(x(i) * x(j)).as(s"__p${i}_$j")))
    val one = complete.agg(aggs.head, aggs.tail: _*)
    val entries = for (i <- 0 until k; j <- i until k) yield {
      val n = col("__n")
      val num = n * col(s"__p${i}_$j") - col(s"__s$i") * col(s"__s$j")
      val di = n * col(s"__p${i}_$i") - col(s"__s$i") * col(s"__s$i")
      val dj = n * col(s"__p${j}_$j") - col(s"__s$j") * col(s"__s$j")
      struct(lit(cols(i)).as("col1"), lit(cols(j)).as("col2"),
        n.cast("long").as("n"),
        when(di > 0.0 && dj > 0.0, num / sqrt(di * dj)).as("corr"))
    }
    one.select(explode(array(entries: _*)).as("__e"))
      .select(col("__e.col1"), col("__e.col2"), col("__e.n"), col("__e.corr"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * raters over the same label space: κ = (p_o − p_e) / (1 − p_e) with
    * p_o the diagonal mass and p_e = Σ_c rowMarg_c · colMarg_c / n².
    * The standard annotation-quality gate before labeled data enters a
    * training set.
    *
    * Scale shape: ONE (a, b) contingency aggregation (the
    * [[categoricalAssociation]] pattern); margins re-aggregate the
    * label-space-sized cell table. Returns one row
    * (n, po, pe, kappa); kappa is NULL when p_e = 1 (a single shared
    * category — agreement is undefined, not perfect).
    */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df
      .filter(a.isNotNull && b.isNotNull)
      .select(a.cast("string").as("__a"), b.cast("string").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).cast("double").as("__n"))
    val rowM = cells.groupBy("__a").agg(sum(col("__n")).as("__ra"))
    val colM = cells.groupBy("__b").agg(sum(col("__n")).as("__cb"))
    val tot = cells.agg(sum(col("__n")).as("__t"))
    val po = cells.filter(col("__a") === col("__b"))
      .agg(coalesce(sum(col("__n")), lit(0.0)).as("__agree"))
    val pe = rowM
      .join(colM, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ra") * col("__cb")), lit(0.0)).as("__pesum"))
    broadcast(tot).crossJoin(broadcast(po)).crossJoin(broadcast(pe))
      .select(
        col("__t").cast("long").as("n"),
        (col("__agree") / col("__t")).as("po"),
        (col("__pesum") / (col("__t") * col("__t"))).as("pe"))
      .select(col("n"), col("po"), col("pe"),
        when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe"))).as("kappa"))
  }

  /** Abramowitz–Stegun 7.1.26 complementary-error-function polynomial
    * (|ε| < 1.5e-7) as a Column — the cross-engine-replicable normal
    * tail used by [[propZTestGrouped]] (the oracle renders the identical
    * Horner chain, so single-precision pins survive). Computed DIRECTLY
    * as poly·e^{−x²} — never as 1 − erf, whose 1−(1−y) cancellation
    * loses ~4 decimal digits of the tail for large x. Valid for x ≥ 0.
    */
  private[graft] def erfcApprox(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) +
        t * lit(1.061405429)))))
    poly * exp(-(x * x))
  }

  /** Two-sided normal p-value for a z statistic: p = erfc(|z|/√2). */
  private[graft] def normalTwoSidedP(z: Column): Column =
    erfcApprox(abs(z) / lit(math.sqrt(2.0)))

  /** Grouped two-proportion z-test: per group, compare the success rate
    * between arms (`flag` true = arm A) with the pooled-variance z
    * statistic and a two-sided normal p-value — the many-cells A/B
    * readout that feeds [[bhAdjust]].
    *
    * Scale shape: ONE conditional-sum aggregation keyed on the group
    * (the [[abTest]] pattern, distributed across groups); z/p are
    * projections over the group-count-sized table. z is NULL when an
    * arm is empty or the pooled rate is degenerate (0 or 1).
    */
  def propZTestGrouped(
      df: DataFrame,
      groupCols: Seq[String],
      flag: Column,
      success: Column
  ): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val s = success.cast("boolean").cast("int")
    val g = df
      .filter(flag.isNotNull && success.isNotNull)
      .withColumn("__f", flag.cast("boolean"))
      .withColumn("__s", s)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col("__f"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__f"), col("__s")).otherwise(0)).cast("long").as("s_a"),
        sum(when(!col("__f"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("__f"), col("__s")).otherwise(0)).cast("long").as("s_b"))
    val pa = col("s_a").cast("double") / col("n_a")
    val pb = col("s_b").cast("double") / col("n_b")
    val pool = (col("s_a") + col("s_b")).cast("double") / (col("n_a") + col("n_b"))
    val z = (pa - pb) /
      sqrt(pool * (lit(1.0) - pool) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    g.select((groupCols.map(col) ++ Seq(
        col("n_a"), col("s_a"), col("n_b"), col("s_b"),
        when(col("n_a") > 0, pa).as("p_a"),
        when(col("n_b") > 0, pb).as("p_b"),
        when(col("n_a") > 0 && col("n_b") > 0 &&
          pool > 0.0 && pool < 1.0, z).as("z"))): _*)
      .withColumn("p", when(col("z").isNotNull, normalTwoSidedP(col("z"))))
  }

  /** Benjamini–Hochberg step-up FDR adjustment over a table of test
    * p-values: rank ascending (ties by `id` for determinism), adjusted
    * p_(i) = min_{j ≥ i} p_(j)·m/j capped at 1 — the suffix minimum via
    * a reverse-ordered running min. Null p-values are dropped.
    *
    * Scale shape: one global sort over the TEST table (one row per
    * hypothesis — bounded by the testing design, not the data volume;
    * the m-count rides a 1-row broadcast).
    */
  def bhAdjust(df: DataFrame, idCol: String, pCol: String): DataFrame = {
    val t = df.filter(col(pCol).isNotNull)
      .select(col(idCol).as("id"), col(pCol).cast("double").as("p"))
    val m = t.agg(count(lit(1)).as("__m"))
    val ranked = t.crossJoin(broadcast(m))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("p").asc, col("id").asc)))
      .withColumn("__raw", col("p") * col("__m") / col("rank"))
    val suffix = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("p_adj", least(min(col("__raw")).over(suffix), lit(1.0)))
      .select(col("id"), col("p"), col("rank"), col("p_adj"))
  }

  /** Cumulative gains / lift table: rank rows by `score` descending, cut
    * into `buckets` quantile slices, and report per slice the positives
    * captured, the cumulative capture rate (gain) and lift = gain /
    * population share — the standard "top decile captures X% of
    * positives" targeting view.
    *
    * Two modes (the W1/K12 binsreg precedent):
    *  - default (`exact = false`): bucket boundaries come from the
    *    histogram-CDF quantile cuts (`Dbbinsreg.quantileCutBins`,
    *    error ≤ one bucket of width (max−min)·relErr) and assignment is
    *    a literal CASE chain — two narrow codegen'd scans plus one keyed
    *    aggregate, NO total-order sort anywhere, so the plan is flat at
    *    any corpus size. Ties share a bucket (`tie` is unused); a bucket
    *    left empty by heavy ties still appears (dense spine, n = 0).
    *    Descending rank: bucket = buckets − |{j : s > c_j}|.
    *  - `exact = true`: the NTILE contract (equal-count slices, ties
    *    broken by `tie`) — a global single-partition sort; the small-n /
    *    oracle mode (q179), not the 100 TB path.
    * Everything after the bucket id runs on the `buckets`-row aggregate
    * with 1-row broadcast totals in both modes.
    *
    * BEHAVIORAL DEFAULT (changed in round 7): `exact` defaults to FALSE —
    * buckets are approximate-equal-count and `tie` is IGNORED. Callers
    * that relied on the original equal-count/tie contract must now pass
    * `exact = true` (q179 does). An all-tied score column places the
    * whole mass in bucket 1 (top slice) under the default; exact NTILE
    * spreads the same ties evenly across buckets.
    */
  def liftCurve(
      df: DataFrame,
      score: Column,
      label: Column,
      tie: Column,
      buckets: Int = 10,
      exact: Boolean = false,
      relErr: Double = 1e-3
  ): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    // filter AFTER the cast: a score that casts to null (non-numeric
    // string) or NaN would pass a pre-cast isNotNull, then poison the
    // histogram cuts (driver NPE) or land in the top bucket via Spark's
    // NaN-greatest comparisons
    val base = df
      .select(score.cast("double").as("__s"),
        label.cast("boolean").cast("int").as("__y"), tie.as("__t"))
      .filter(col("__s").isNotNull && !isnan(col("__s")) &&
        col("__y").isNotNull)
    // bucketed mode resolves the cut points eagerly (two narrow scans,
    // ≤1024-row driver state); None = zero usable rows, Some(empty) = a
    // single-valued score column
    val cutsOpt =
      if (exact) None
      else graft.binsreg.Dbbinsreg.quantileCutBins(base, "__s", buckets, relErr)
    val ranked =
      if (exact)
        base.withColumn("bucket",
          ntile(buckets).over(Window.orderBy(col("__s").desc, col("__t"))))
      else
        base.withColumn("bucket", cutsOpt match {
          case Some(cuts) if cuts.nonEmpty =>
            (lit(buckets + 1) - graft.binsreg.Dbbinsreg.caseChainBin(col("__s"), cuts))
              .cast("int")
          // all-tied score column: no interior cuts exist — the whole mass
          // IS the top slice (bucket 1, "captures everything"), matching
          // the descending-rank reading rather than an arbitrary bottom
          // placement (exact NTILE spreads such ties evenly instead —
          // the two modes are documented to differ on ties)
          case _ => lit(1)
        })
    val per0 = ranked.groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("__y")).cast("long").as("n_pos"))
    // dense spine in bucketed mode: duplicated cuts (and the all-tied
    // collapse) can empty a bucket and a lift table with silent holes
    // misreads as a shorter curve (empty INPUT stays empty — no spine
    // over zero data, hence the None gate)
    val per =
      if (exact || cutsOpt.isEmpty) per0
      else df.sparkSession.range(1, buckets + 1)
        .select(col("id").cast("int").as("bucket"))
        .join(per0, Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("n_pos"), lit(0L)).as("n_pos"))
    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum(col("n")).as("__tn"), sum(col("n_pos")).as("__tp"))
    per
      .withColumn("cum_n", sum(col("n")).over(cum).cast("long"))
      .withColumn("cum_pos", sum(col("n_pos")).over(cum).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"), col("n_pos"), col("cum_n"), col("cum_pos"),
        when(col("__tp") > 0,
          col("cum_pos").cast("double") / col("__tp")).as("gain"),
        when(col("__tp") > 0 && col("cum_n") > 0,
          (col("cum_pos").cast("double") / col("__tp")) /
            (col("cum_n").cast("double") / col("__tn"))).as("lift"))
  }

  /** One-way ANOVA: does the mean of `value` differ across the levels of
    * `group`? F = (SSB/(k−1)) / (SSW/(n−k)) from the per-group
    * (n, Σx, Σx²) triples; the p-value uses the Paulson–Takeuchi
    * normal approximation of the F tail (each χ² through its
    * Wilson–Hilferty cube root, combined into one z) with the shared
    * A&S erfc — cross-engine replicable like every other tail here.
    *
    * Scale shape: ONE hash aggregation keyed on the group (map-side
    * combined), then a single aggregation over the k-row group table —
    * no window, no second scan of the data. Returns one row
    * (k, n, ss_between, ss_within, f, df1, df2, p); f/p are NULL when
    * any degrees of freedom are ≤ 0 or SSW = 0 (no within variance).
    */
  def anovaOneWay(df: DataFrame, group: Column, value: Column): DataFrame = {
    val v = value.cast("double")
    val per = df.filter(group.isNotNull && v.isNotNull)
      .select(group.cast("string").as("__g"), v.as("__v"))
      .groupBy("__g")
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__ss"))
    val one = per.agg(
      count(lit(1)).as("__k"),
      sum(col("__n")).as("__tn"),
      sum(col("__s")).as("__tsum"),
      sum(col("__s") * col("__s") / col("__n")).as("__bsum"),
      sum(col("__ss") - col("__s") * col("__s") / col("__n")).as("__wsum"))
    val ssb = col("__bsum") - col("__tsum") * col("__tsum") / col("__tn")
    val df1 = (col("__k") - 1).cast("double")
    val df2 = col("__tn") - col("__k").cast("double")
    val fStat = (ssb / df1) / (col("__wsum") / df2)
    // Paulson (1942): z ≈ ((1−2/(9·df2))·F^{1/3} − (1−2/(9·df1)))
    //                 / sqrt(F^{2/3}·2/(9·df2) + 2/(9·df1))
    val f13 = pow(fStat, lit(1.0 / 3.0))
    val a1 = lit(2.0) / (lit(9.0) * df1)
    val a2 = lit(2.0) / (lit(9.0) * df2)
    val z = ((lit(1.0) - a2) * f13 - (lit(1.0) - a1)) /
      sqrt(f13 * f13 * a2 + a1)
    val s2 = lit(math.sqrt(2.0))
    val pUpper = when(z >= 0.0, erfcApprox(z / s2) / 2.0)
      .otherwise(lit(1.0) - erfcApprox(-z / s2) / 2.0)
    val valid = col("__k") > 1 && df2 > 0.0 && col("__wsum") > 0.0
    one.select(
      col("__k").as("k"),
      coalesce(col("__tn"), lit(0.0)).cast("long").as("n"),
      ssb.as("ss_between"),
      col("__wsum").as("ss_within"),
      when(valid, fStat).as("f"),
      when(col("__k") > 0, df1.cast("long")).as("df1"),
      when(col("__k") > 0, df2.cast("long")).as("df2"),
      when(valid, pUpper).as("p"))
  }

  /** Mutual information between two categorical columns, in nats:
    * I(X;Y) = Σ_{x,y} p(x,y)·ln(p(x,y)/(p(x)p(y))) over the observed
    * contingency cells, plus the entropies and the normalized
    * NMI = I/√(H(X)·H(Y)) — the model-free dependence screen used to
    * rank candidate features against a label (callers bin continuous
    * columns first; [[graft.binsreg.Dbbinsreg.caseChainBin]] or a plain
    * width bin both work). Zero cells contribute zero by convention.
    *
    * Scale shape: ONE (x, y) contingency aggregation; margins and the
    * MI sum re-aggregate the label-space-sized cell table (the
    * [[cohenKappa]] pattern). Returns one row (n, hx, hy, mi, nmi);
    * nmi is NULL when either marginal entropy is 0 (a constant column
    * carries no information to normalize by).
    */
  def mutualInfo(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df
      .filter(x.isNotNull && y.isNotNull)
      .select(x.cast("string").as("__x"), y.cast("string").as("__y"))
      .groupBy("__x", "__y").agg(count(lit(1)).cast("double").as("__n"))
    val xm = cells.groupBy("__x").agg(sum(col("__n")).as("__nx"))
    val ym = cells.groupBy("__y").agg(sum(col("__n")).as("__ny"))
    val tot = cells.agg(sum(col("__n")).as("__t"))
    val joint = cells
      .join(xm, "__x").join(ym, "__y")
      .crossJoin(broadcast(tot))
      .agg(
        sum(col("__n") / col("__t") *
          log(col("__n") * col("__t") / (col("__nx") * col("__ny"))))
          .as("__mi"))
    val hx = xm.crossJoin(broadcast(tot))
      .agg((-sum(col("__nx") / col("__t") * log(col("__nx") / col("__t"))))
        .as("__hx"))
    val hy = ym.crossJoin(broadcast(tot))
      .agg((-sum(col("__ny") / col("__t") * log(col("__ny") / col("__t"))))
        .as("__hy"))
    broadcast(tot).crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .crossJoin(broadcast(joint))
      .select(
        coalesce(col("__t"), lit(0.0)).cast("long").as("n"),
        col("__hx").as("hx"),
        col("__hy").as("hy"),
        when(col("__t").isNotNull, coalesce(col("__mi"), lit(0.0))).as("mi"),
        when(col("__hx") > 0.0 && col("__hy") > 0.0,
          col("__mi") / sqrt(col("__hx") * col("__hy"))).as("nmi"))
  }
}
