package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular feature-engineering operators: smoothed target encoding and
  * robust (median/MAD) outlier statistics — the feature/data-quality steps
  * between profiling ([[graft.sources.ScaleOps.profile]]) and model fitting.
  */
object Features {

  /** Smoothed target (mean) encoding of a categorical column:
    * enc(c) = (Σ_c y + m·prior) / (n_c + m) — the empirical-Bayes shrinkage
    * toward the global mean (Micci-Barreca 2001): rare categories pull to
    * the prior, frequent ones to their own mean.
    *
    * Statistics use rows where BOTH category and target are non-null; the
    * prior is the global target mean over those rows. Rows re-attach their
    * encoding via a category-keyed equi-join — deliberately NOT
    * broadcast-hinted (a user-id-sized category table must shuffle; AQE
    * broadcasts when genuinely small). Rows whose category was all-null in
    * stats (or null here) get a null encoding. One corpus scan for stats,
    * one for the attach. */
  def targetEncode(
      df: DataFrame,
      catCol: String,
      target: Column,
      m: Double = 10.0,
      outCol: String = "te"
  ): DataFrame = {
    require(m >= 0.0, s"smoothing m must be >= 0, got $m")
    require(df.columns.contains(catCol), s"column '$catCol' not found")
    require(!df.columns.contains(outCol), s"output column '$outCol' exists")
    require(!df.columns.contains("__c"),
      "reserved column '__c' present (drop after the join would eat it)")
    val y = target.cast("double")
    val base = df.filter(col(catCol).isNotNull && y.isNotNull)
      .select(col(catCol).as("__c"), y.as("__y"))
    val prior = base.agg((sum(col("__y")) / count(lit(1))).as("__prior"))
    val enc = base
      .groupBy("__c")
      .agg(count(lit(1)).cast("double").as("__n"), sum(col("__y")).as("__sy"))
      .crossJoin(broadcast(prior))
      .select(col("__c"),
        ((col("__sy") + lit(m) * col("__prior")) / (col("__n") + lit(m)))
          .as(outCol))
    df.join(enc, df(catCol) === enc("__c"), "left").drop("__c")
  }

  /** Winsorize: clip `value` into its [pLo, pHi] percentile band — the
    * standard heavy-tail tamer before means/regressions. Bounds come from
    * one 1-row aggregate broadcast back via a crossJoin; the clip is a
    * pure projection. Adds `outCol` (null stays null).
    *
    * Two modes (the A8 probeMode precedent): `exact = true` (default)
    * uses the exact `percentile` aggregate — the q60 quantile_cont
    * parity, but it buffers every value per partition; `exact = false`
    * swaps in `approx_percentile` (bounded GK sketch state,
    * `accuracy`-controlled error) — the unbounded-scale path, since a
    * clip bound off by a quantile hair is immaterial to tail-taming. */
  def winsorize(
      df: DataFrame,
      value: Column,
      pLo: Double = 0.01,
      pHi: Double = 0.99,
      outCol: String = "w",
      exact: Boolean = true,
      accuracy: Int = 10000
  ): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    require(!df.columns.contains(outCol), s"output column '$outCol' exists")
    require(!df.columns.contains("__lo") && !df.columns.contains("__hi"),
      "reserved columns '__lo'/'__hi' present (drop after the bounds join would eat them)")
    require(accuracy >= 1, s"accuracy must be >= 1, got $accuracy")
    val v = value.cast("double")
    def pct(p: Double): Column =
      if (exact) expr(s"percentile(__v, $p)")
      else expr(s"approx_percentile(__v, $p, $accuracy)")
    val bounds = df.filter(v.isNotNull).select(v.as("__v"))
      .agg(pct(pLo).as("__lo"), pct(pHi).as("__hi"))
    df.crossJoin(broadcast(bounds))
      // explicit null guard: Spark's least/greatest SKIP nulls, which would
      // silently clip a null value to the lower bound
      .withColumn(outCol,
        when(v.isNull, lit(null).cast("double"))
          .otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Robust outlier statistics via median/MAD: med = median(v),
    * mad = median(|v − med|), a point is an outlier when
    * |v − med| > k·1.4826·mad (1.4826 makes MAD estimate σ under
    * normality). Immune to the outliers it hunts, unlike mean/sd z-scores.
    *
    * Built as one lazy plan: percentile aggregates with 1-row broadcast
    * crossJoins between the three stages — three scans, driver never sees
    * a row. Two modes (the A8 probeMode precedent): `exact = true`
    * (default) uses the exact `percentile` aggregate — the q60-pinned
    * parity with DuckDB `quantile_cont`, but it buffers every value per
    * partition; `exact = false` swaps in `approx_percentile` (bounded
    * sketch state) — the unbounded-scale path; a median off by a quantile
    * hair barely moves the MAD fence. Returns one row
    * (median, mad, n_outliers, n). */
  def robustOutlierStats(
      df: DataFrame,
      value: Column,
      k: Double = 3.0,
      exact: Boolean = true,
      accuracy: Int = 10000
  ): DataFrame = {
    require(k > 0.0, s"k must be positive, got $k")
    require(accuracy >= 1, s"accuracy must be >= 1, got $accuracy")
    def med50(c: String): Column =
      if (exact) expr(s"percentile($c, 0.5)")
      else expr(s"approx_percentile($c, 0.5, $accuracy)")
    val base = df.filter(value.isNotNull).select(value.cast("double").as("__v"))
    val med = base.agg(med50("__v").as("__med"))
    val withMed = base.crossJoin(broadcast(med))
    // MAD: percentile over the absolute deviations
    val madDf = withMed
      .select(abs(col("__v") - col("__med")).as("__d"))
      .agg(med50("__d").as("__mad"))
    withMed
      .crossJoin(broadcast(madDf))
      .agg(
        max(col("__med")).as("median"),
        max(col("__mad")).as("mad"),
        sum(when(abs(col("__v") - col("__med")) >
          lit(k) * lit(1.4826) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        count(lit(1)).as("n"))
  }

  /** Exponential time-decay activity features per key — the standard
    * recency-weighted engagement score of a feature store:
    *
    *   score(key) = Σ_i exp(−(t_ref − t_i) / τ)
    *
    * (τ = half-life / ln 2; an event `half-life` ago contributes 0.5, now
    * contributes 1.0). `t_ref` defaults to the corpus max so scores are
    * reproducible from the data alone; pass an explicit reference to pin
    * a scoring instant.
    *
    * Scale shape: ONE keyed sum aggregate over the raw events with
    * map-side combine (the decay weight is a per-row projection); the
    * default reference rides a 1-row broadcast crossJoin. Returns
    * (key, n_events, score, last_seen).
    */
  def decayScores(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      halfLifeUs: Long,
      tRefUs: Option[Long] = None
  ): DataFrame = {
    require(halfLifeUs > 0, s"halfLifeUs must be positive, got $halfLifeUs")
    val base = df.select(col(keyCol).as("__k"), col(tsCol).cast("long").as("__t"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)
    val withRef = tRefUs match {
      case Some(r) => base.withColumn("__ref", lit(r))
      case None => base.crossJoin(broadcast(base.agg(max(col("__t")).as("__ref"))))
    }
    // decay = exp(−Δt·(ln 2 / halfLife)); the rate constant is computed
    // the same way the SQL mirror writes it so the double is identical
    val rate = math.log(2.0) / halfLifeUs.toDouble
    withRef
      .groupBy(col("__k").as(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(exp((col("__t") - col("__ref")).cast("double") * lit(rate)))
          .as("score"),
        max(col("__t")).as("last_seen"))
  }

  /** Weighted quantiles WITHOUT a global sort: the q-quantile of `v`
    * under weights `w` — the smallest value whose cumulative weight
    * reaches q·W (the standard left-continuous weighted quantile;
    * weighted median = q 0.5). Row weights are counts, importance
    * weights, or token counts — "the median document length weighted by
    * tokens" style questions.
    *
    * Same shape as [[percentileRank]]: one keyed (value → Σw) aggregate,
    * one ordered cumulative window over the DISTINCT-VALUE table only,
    * then a threshold pick per requested q — the relation is never
    * sorted. Discrete-measure contract (quantize continuous upstream).
    * Exact integer/decimal weight sums ⇒ deterministic. Returns
    * (q, value) for each requested quantile; null weights/values drop.
    */
  def weightedQuantiles(
      df: DataFrame,
      valueCol: String,
      weight: Column,
      qs: Seq[Double]
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0,1]: $qs")
    val vals = graft.Staging.stage(df
      .select(col(valueCol).as("__v"), weight.as("__w"))
      .filter(col("__v").isNotNull && col("__w").isNotNull && col("__w") > 0)
      .groupBy("__v").agg(sum(col("__w")).as("__sw")))
    val total = vals.agg(coalesce(sum(col("__sw")), lit(0.0)).as("__tw"))
    val upTo = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cdf = vals
      .withColumn("__cum", sum(col("__sw")).over(upTo))
      .crossJoin(broadcast(total))
    val qDf = df.sparkSession.createDataFrame(
      qs.map(Tuple1.apply)).toDF("q")
    // per q: the least value whose cumulative weight reaches q·W — a
    // broadcast of the tiny q list against the distinct-value CDF
    cdf.join(broadcast(qDf), col("__cum") >= col("q") * col("__tw"))
      .groupBy("q")
      .agg(min(col("__v")).as("value"))
  }

  /** Percentile-rank transform WITHOUT a global sort: SQL
    * `percent_rank() OVER (ORDER BY v)` — (count of strictly smaller
    * values) / (n − 1) — computed from a broadcast distinct-value CDF
    * instead of totally ordering the relation.
    *
    * The window form sorts the WHOLE table through one partition — the
    * classic scale cliff. Here: one keyed count per distinct value, one
    * ordered cumulative window over the DISTINCT-VALUE table only, then a
    * broadcast join back — a narrow projection per row. The trade: the
    * distinct-value table must be broadcastable, which is exactly the
    * discrete-measure regime (quantities, ratings, token counts);
    * continuous columns should be quantized upstream (the same
    * contract as [[graft.functions.QuantileSketchAgg]]'s exact regime).
    *
    * Ties share a rank (count of STRICTLY smaller); null values get a
    * null rank and pass through; a 1-row relation ranks 0.
    */
  def percentileRank(
      df: DataFrame,
      valueCol: String,
      outCol: String = "pr"
  ): DataFrame = {
    // staged so the CDF window and the total derive from ONE narrow scan
    // (the total is Σ of the distinct-value counts, not a second count
    // over the relation)
    val vals = graft.Staging.stage(df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c")))
    val total = vals.agg(coalesce(sum(col("__c")), lit(0L)).as("__n"))
    val upToPrev = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cdf = vals
      .withColumn("__lt", coalesce(sum(col("__c")).over(upToPrev), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("__v"), when(col("__n") > 1L,
        col("__lt").cast("double") / (col("__n") - lit(1L)))
        .otherwise(lit(0.0)).as(outCol))
    df.join(broadcast(cdf), df(valueCol) === cdf("__v"), "left")
      .drop("__v")
  }

  /** Equal-width histogram with a dense spine: `bins` buckets over the
    * observed [min, max], EVERY bin present (empty bins report 0 — a
    * histogram with silent holes misreads as continuous mass), the max
    * clamped into the top bin, degenerate min = max collapsing to bin 0.
    *
    * Scale shape: ONE 1-row min/max aggregate fetched eagerly (two
    * doubles of driver state) and bound as literals in both the binning
    * projection and the edge projection — the broadcast-crossJoin
    * spelling consumed the aggregate in two separate subtrees, scanning
    * the input twice unless exchange reuse happened to kick in. Then one
    * hash count keyed on the bin and a `spark.range(bins)` spine
    * left-join — never a sort.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 1, s"need at least 1 bin, got $bins")
    val spark = df.sparkSession
    val v = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
    val r = v.agg(min(col("__v")), max(col("__v"))).collect()(0)
    val (mn, mx) =
      if (r.isNullAt(0)) // empty input: zero counts, null edges
        (lit(null).cast("double"), lit(null).cast("double"))
      else (lit(r.getDouble(0)), lit(r.getDouble(1)))
    val counts = v
      .select(
        when(mx > mn,
          least(greatest(
            floor((col("__v") - mn) / (mx - mn) * bins), lit(0.0)),
            lit((bins - 1).toDouble)))
          .otherwise(lit(0.0)).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("__c"))
    spark.range(bins).select(col("id").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (mn + (mx - mn) / bins * col("bin")).as("lo"),
        (mn + (mx - mn) / bins * (col("bin") + 1)).as("hi"),
        coalesce(col("__c"), lit(0L)).as("n"))
  }

  /** Weight-of-evidence binning: cut a score into `bins` quantile slices
    * and report per bin the event/non-event split, the smoothed
    * WoE = ln((pos_i/pos)/(neg_i/neg)) and its information-value
    * contribution — the credit-scoring encoding that doubles as a
    * monotonicity diagnostic for any score against any binary outcome.
    * 0.5 is added to each cell (Yates-style) so empty cells stay finite
    * and the pin survives cross-engine.
    *
    * Two modes (the W1/K12 binsreg precedent):
    *  - default (`exact = false`): bin edges from the histogram-CDF
    *    quantile cuts (`Dbbinsreg.quantileCutBins`) and a literal
    *    CASE-chain assignment (bin = 1 + |{j : s > c_j}|, ties share a
    *    bin, `tie` unused) — two narrow scans + one keyed aggregate, no
    *    total-order sort, flat at any corpus size. A dense bin spine
    *    keeps tie-emptied bins visible (n = 0; the 0.5 smoothing keeps
    *    their WoE finite by design).
    *  - `exact = true`: the NTILE contract (equal counts, ties broken by
    *    `tie` — the q16 total-order contract) — a single-partition
    *    global sort; the small-n / oracle mode (q185), not the 100 TB
    *    path.
    * Everything after the bin id runs on the `bins`-row aggregate with
    * 1-row broadcast totals in both modes.
    *
    * BEHAVIORAL DEFAULT (changed in round 7): `exact` defaults to FALSE —
    * bins are approximate-equal-count and `tie` is IGNORED. Callers that
    * relied on the original equal-count/tie contract must now pass
    * `exact = true` (q185 does). An all-tied score column places the
    * whole mass in bin 1 under the default.
    */
  def woeBins(
      df: DataFrame,
      score: Column,
      label: Column,
      tie: Column,
      bins: Int = 10,
      exact: Boolean = false,
      relErr: Double = 1e-3
  ): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    // filter AFTER the cast: a score that casts to null (non-numeric
    // string) or NaN would pass a pre-cast isNotNull, then poison the
    // histogram cuts (driver NPE) or land in the top bin via Spark's
    // NaN-greatest comparisons
    val base = df
      .select(score.cast("double").as("__s"),
        label.cast("boolean").cast("int").as("__y"), tie.as("__t"))
      .filter(col("__s").isNotNull && !isnan(col("__s")) &&
        col("__y").isNotNull)
    // bucketed mode resolves the cut points eagerly (two narrow scans,
    // ≤1024-row driver state); None = zero usable rows, Some(empty) = a
    // single-valued score column (all-tied mass sits in bin 1 — the
    // ascending convention's bottom bin — with the spine keeping bins
    // 2..bins visible at n = 0)
    val cutsOpt =
      if (exact) None
      else graft.binsreg.Dbbinsreg.quantileCutBins(base, "__s", bins, relErr)
    val binned =
      if (exact) {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("__s").asc, col("__t").asc)
        base.withColumn("bin", ntile(bins).over(w))
      } else
        base.withColumn("bin",
          graft.binsreg.Dbbinsreg.caseChainBin(col("__s"),
            cutsOpt.getOrElse(Array.empty)).cast("int"))
    val per0 = binned
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__y")).cast("long").as("n_pos"))
    // dense spine in bucketed mode (empty input stays empty — no spine
    // over zero data, hence the None gate)
    val per = (if (exact || cutsOpt.isEmpty) per0
      else df.sparkSession.range(1, bins + 1)
        .select(col("id").cast("int").as("bin"))
        .join(per0, Seq("bin"), "left")
        .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("n_pos"), lit(0L)).as("n_pos")))
      .withColumn("n_neg", col("n") - col("n_pos"))
    val tot = per.agg(sum(col("n_pos")).cast("double").as("__tp"),
      sum(col("n_neg")).cast("double").as("__tn"))
    per.crossJoin(broadcast(tot))
      .withColumn("__pr",
        (col("n_pos") + lit(0.5)) / (col("__tp") + lit(0.5) * bins))
      .withColumn("__nr",
        (col("n_neg") + lit(0.5)) / (col("__tn") + lit(0.5) * bins))
      .select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
        log(col("__pr") / col("__nr")).as("woe"),
        ((col("__pr") - col("__nr")) * log(col("__pr") / col("__nr")))
          .as("iv_contrib"))
  }
}
