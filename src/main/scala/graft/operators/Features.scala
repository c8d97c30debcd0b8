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

  /** Winsorize: clip `value` into its [pLo, pHi] exact-percentile band —
    * the standard heavy-tail tamer before means/regressions. Bounds come
    * from one exact `percentile` aggregate (q60 quantile_cont parity;
    * swap approx_percentile at unbounded scale) broadcast back via a 1-row
    * crossJoin; the clip is a pure projection. Adds `outCol` (null stays
    * null). */
  def winsorize(
      df: DataFrame,
      value: Column,
      pLo: Double = 0.01,
      pHi: Double = 0.99,
      outCol: String = "w"
  ): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    require(!df.columns.contains(outCol), s"output column '$outCol' exists")
    require(!df.columns.contains("__lo") && !df.columns.contains("__hi"),
      "reserved columns '__lo'/'__hi' present (drop after the bounds join would eat them)")
    val v = value.cast("double")
    val bounds = df.filter(v.isNotNull).select(v.as("__v"))
      .agg(expr(s"percentile(__v, $pLo)").as("__lo"),
        expr(s"percentile(__v, $pHi)").as("__hi"))
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
    * Built as one lazy plan: exact `percentile` aggregates (the q60-pinned
    * parity with DuckDB `quantile_cont`) with 1-row broadcast crossJoins
    * between the three stages — three scans, driver never sees a row.
    * At unbounded scale swap the exact percentile for `approx_percentile`
    * (the W1/K12 two-mode precedent). Returns one row
    * (median, mad, n_outliers, n). */
  def robustOutlierStats(
      df: DataFrame,
      value: Column,
      k: Double = 3.0
  ): DataFrame = {
    require(k > 0.0, s"k must be positive, got $k")
    val base = df.filter(value.isNotNull).select(value.cast("double").as("__v"))
    val med = base.agg(expr("percentile(__v, 0.5)").as("__med"))
    val withMed = base.crossJoin(broadcast(med))
    // exact MAD: percentile over the absolute deviations
    val madDf = withMed
      .select(abs(col("__v") - col("__med")).as("__d"))
      .agg(expr("percentile(__d, 0.5)").as("__mad"))
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
}
