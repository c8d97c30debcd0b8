package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event analytics over a decoded event log: funnel conversion and
  * retention cohorts — the two standard questions a product/events table
  * answers after sessionization. Both operate on an epoch-µs BIGINT time
  * column (decode upstream with [[graft.sources.EventTime]]).
  *
  * Scale shapes:
  *   - [[funnel]]: step k is one conditional-min aggregation keyed on the
  *     user joined to the step-(k−1) reach times — every shuffle is keyed
  *     on the user column, so AQE/exchange-reuse co-locates the cascade;
  *     per-step state is one row per reached user (monotonically
  *     shrinking). No per-user event arrays are ever collected.
  *   - [[retentionCohorts]]: one distinct over (user, period), one min-agg
  *     for cohorts, one join keyed on user, one count keyed on
  *     (cohort, offset). All hash aggregations with map-side combine.
  */
object Events {

  /** Funnel conversion: for ordered steps s1 → s2 → … → sk, a user reaches
    * step k if they have an sk event at-or-after their earliest
    * order-respecting match of step k−1 (the standard "unbounded window"
    * funnel; earliest-match semantics make the cascade deterministic).
    * With `maxGapUs` set, each step must additionally land within that
    * many µs of the previous step's match — the "conversion window"
    * variant every product-analytics funnel offers (a purchase a year
    * after the click is not attribution).
    *
    * Returns one row per step: (step_idx 1-based, step, n_users,
    * conversion = n_users / step-1 users, as double).
    */
  def funnel(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGapUs: Option[Long] = None
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    require(maxGapUs.forall(_ > 0), s"maxGapUs must be positive: $maxGapUs")
    val spark = df.sparkSession
    import spark.implicits._

    val ev = df.select(col(userCol).as("__u"), col(tsCol).as("__ts"),
      col(typeCol).as("__e"))
    // reach(k): (user, __t = earliest order-respecting time of step k).
    // Each reach is persisted so step k's count doesn't re-run the whole
    // cascade below it, and unpersisted once the counts (the only output)
    // are materialized — this is NOT a lazily-returned frame.
    val persisted = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def mat(d: DataFrame): DataFrame = {
      val p = d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      persisted += p; p
    }
    var reach = mat(ev.filter(col("__e") === steps.head)
      .groupBy("__u").agg(min(col("__ts")).as("__t")))
    val counts = scala.collection.mutable.ArrayBuffer[Long](reach.count())
    for (k <- 1 until steps.length) {
      val gapOk = maxGapUs match {
        case Some(g) => col("__ts") >= col("__prev") &&
          col("__ts") <= col("__prev") + lit(g)
        case None => col("__ts") >= col("__prev")
      }
      reach = mat(ev.filter(col("__e") === steps(k))
        .join(reach.select(col("__u"), col("__t").as("__prev")), Seq("__u"))
        .filter(gapOk)
        .groupBy("__u").agg(min(col("__ts")).as("__t")))
      counts += reach.count()
    }
    persisted.foreach(_.unpersist(false))
    steps.indices.map { i =>
      val conv = if (i == 0) 1.0
      else if (counts(i - 1) == 0L) 0.0
      else counts(i).toDouble / counts(i - 1)
      (i + 1, steps(i), counts(i), conv)
    }.toDF("step_idx", "step", "n_users", "conversion")
  }

  /** Each user's entry segment: the type of their FIRST event (total
    * order via the tiebreak) — the behavioral entry cohort for
    * [[funnelBySegment]]-style breakdowns. One user-keyed min-struct
    * aggregate; returns (userCol, segment). */
  def entrySegments(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tiebreakCol: String
  ): DataFrame =
    df.groupBy(col(userCol))
      .agg(min(struct(col(tsCol), col(tiebreakCol), col(typeCol)))
        .getField(typeCol).as("segment"))

  /** Funnel conversion broken down by a user segment (entry channel,
    * plan tier, cohort): the same earliest-order-respecting cascade as
    * [[funnel]], with per-step counts keyed on the segment instead of
    * collected on the driver — the result is a DISTRIBUTED frame, so
    * segment cardinality can be large.
    *
    * `segments` maps userCol → segment (e.g. [[entrySegments]]); users
    * without a segment row are excluded (inner join). The step-1 cohort
    * defines each segment's denominator spine; later steps zero-fill, so
    * conversions are well-defined even when a segment dies out.
    *
    * Scale shape: cascade joins keyed on the user (reaches staged — they
    * feed the next step AND their count); per-step counts are
    * segment-keyed hash aggregates; the final conversion join runs on
    * the tiny (segment × steps) frame. Returns
    * (segment, step_idx, step, n_users, conversion).
    */
  def funnelBySegment(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      segments: DataFrame,
      maxGapUs: Option[Long] = None
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    require(maxGapUs.forall(_ > 0), s"maxGapUs must be positive: $maxGapUs")
    val ev = df.select(col(userCol).as("__u"), col(tsCol).as("__ts"),
      col(typeCol).as("__e"))
    val seg = segments.select(col(userCol).as("__u"), col("segment"))
    var reach = graft.Staging.stage(
      ev.filter(col("__e") === steps.head)
        .join(seg, Seq("__u"))
        .groupBy(col("__u"), col("segment"))
        .agg(min(col("__ts")).as("__t")))
    def stepCount(r: DataFrame, idx: Int): DataFrame = r
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("step_idx", lit(idx + 1))
    var counts = stepCount(reach, 0)
    for (k <- 1 until steps.length) {
      val gapOk = maxGapUs match {
        case Some(g) => col("__ts") >= col("__prev") &&
          col("__ts") <= col("__prev") + lit(g)
        case None => col("__ts") >= col("__prev")
      }
      reach = graft.Staging.stage(
        ev.filter(col("__e") === steps(k))
          .join(reach.select(col("__u"), col("segment"),
            col("__t").as("__prev")), Seq("__u"))
          .filter(gapOk)
          .groupBy(col("__u"), col("segment"))
          .agg(min(col("__ts")).as("__t")))
      counts = counts.unionAll(stepCount(reach, k))
    }
    // spine = step-1 segments × all steps, zero-filled; conversion from
    // the lagged count over the tiny (segment × steps) frame
    val spine = counts.filter(col("step_idx") === 1).select(col("segment"))
      .crossJoin(broadcast(df.sparkSession.createDataFrame(
        steps.zipWithIndex.map { case (s, i) => (i + 1, s) })
        .toDF("step_idx", "step")))
    val lagW = Window.partitionBy(col("segment")).orderBy(col("step_idx"))
    spine
      .join(counts, Seq("segment", "step_idx"), "left")
      .withColumn("n_users", coalesce(col("__n"), lit(0L)))
      .withColumn("__prevn", lag(col("n_users"), 1).over(lagW))
      .select(col("segment"), col("step_idx"), col("step"), col("n_users"),
        when(col("__prevn").isNull, lit(1.0))
          .when(col("__prevn") === 0L, lit(0.0))
          .otherwise(col("n_users").cast("double") / col("__prevn"))
          .as("conversion"))
  }

  /** Retention cohorts: cohort = the period (floor of epoch-µs time over
    * `periodUs`) of a user's FIRST event; for each cohort × offset k ≥ 0,
    * count the users with any activity in period cohort+k. Offset 0 is the
    * cohort size by construction.
    *
    * Returns (cohort_period, period_offset, n_users) — `period_offset`
    * because bare OFFSET is an SQL keyword.
    */
  def retentionCohorts(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      periodUs: Long
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val active = df
      .select(col(userCol).as("__u"), col(tsCol).cast("long").as("__ts0"))
      // integer DIV, not double division: exact for the full 2^63 µs range
      .select(col("__u"), expr(s"__ts0 DIV ${periodUs}L").as("__p"))
      .distinct()
    val cohorts = active.groupBy("__u").agg(min(col("__p")).as("__c"))
    active.join(cohorts, Seq("__u"))
      .groupBy(col("__c").as("cohort_period"),
        (col("__p") - col("__c")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for each user, order events by (time, tiebreak) and count consecutive
    * (from → to) event-type pairs; `prob` is the row-normalized transition
    * probability P(to | from).
    *
    * Scale shape: the only per-row work is one `lag` window PARTITIONED BY
    * the user — per-partition state is a single previous row, no event
    * arrays; the pair counts are a hash aggregate with map-side combine,
    * and the normalizing row-sum window runs over the aggregated
    * |types|² frame, never the raw events. Determinism: `tiebreakCol`
    * (e.g. the event id) makes the ordering total, so counts — and the
    * exact integer-ratio probabilities — are partition-layout-independent.
    */
  def transitions(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tiebreakCol: String
  ): DataFrame = {
    val seq = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val counts = df
      .select(col(userCol), col(tsCol), col(tiebreakCol),
        col(typeCol).as("to_event"))
      .withColumn("from_event", lag(col("to_event"), 1).over(seq))
      .filter(col("from_event").isNotNull)
      .groupBy("from_event", "to_event")
      .agg(count(lit(1)).as("n"))
    val rowSum = Window.partitionBy(col("from_event"))
    counts
      .withColumn("prob",
        col("n").cast("double") / sum(col("n")).over(rowSum))
      .select("from_event", "to_event", "n", "prob")
  }

  /** Rate anomalies: bucket events into `periodUs` periods, then flag
    * periods whose count deviates from the series median by more than
    * `k` × MAD (median absolute deviation) — the standard robust
    * outlier rule (median/MAD don't move when the anomaly itself is
    * extreme, unlike mean/stddev). With MAD = 0 (over half the periods
    * share one count) any deviation from the median flags.
    *
    * Scale shape: the raw events stream through ONE keyed count
    * aggregate (map-side combine, ≤ #periods rows out); both medians
    * and the flagging run on the tiny per-period series, with the 1-row
    * stats attached via broadcast cross-joins. Returns
    * (period, n, med, mad, is_anomaly) — med/mad as double (both
    * engines interpolate the even-count median identically).
    */
  def anomalousPeriods(
      df: DataFrame,
      tsCol: String,
      periodUs: Long,
      k: Double = 3.0
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val perPeriod = df
      .select(expr(s"`$tsCol` DIV ${periodUs}L").as("period"))
      .groupBy("period")
      .agg(count(lit(1)).as("n"))
    val med = perPeriod.agg(expr("percentile(n, 0.5d)").as("med"))
    val withMed = perPeriod.crossJoin(broadcast(med))
    val mad = withMed
      .agg(expr("percentile(abs(n - med), 0.5d)").as("mad"))
    withMed.crossJoin(broadcast(mad))
      .select(col("period"), col("n"), col("med"), col("mad"),
        (abs(col("n") - col("med")) > lit(k) * col("mad")).as("is_anomaly"))
  }

  /** Rolling active users (DAU/WAU/MAU family): for every period and
    * every requested trailing window length w, the count of DISTINCT
    * users active at least once in the w periods ending there.
    *
    * Rolling DISTINCT counts can't ride an ordinary window aggregate (a
    * user active twice in the window must count once), so each distinct
    * (user, period) row EXPANDS to the ≤ w report periods it contributes
    * to — a bounded fan-out of Σw rows per active row, clipped at the
    * corpus max period — followed by a distinct and a keyed count. No
    * per-period user sets are ever collected; shuffles are keyed on
    * (user, win, period) then (win, period). Returns
    * (win, period, n_active) for periods within the observed span
    * (`win` not `window`: WINDOW is reserved in SQL engines).
    */
  def rollingActiveUsers(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      periodUs: Long,
      windows: Seq[Int]
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(windows.nonEmpty && windows.forall(_ >= 1),
      s"windows must be >= 1: $windows")
    require(windows.distinct.size == windows.size, s"duplicate windows: $windows")
    val active = df
      .select(col(userCol).as("__u"),
        expr(s"`$tsCol` DIV ${periodUs}L").as("__p"))
      .distinct()
    val maxP = active.agg(max(col("__p")).as("__mp"))
    val winDf = df.sparkSession.createDataFrame(
      windows.map(Tuple1.apply)).toDF("win")
    active
      .crossJoin(broadcast(winDf))
      .crossJoin(broadcast(maxP))
      // the activity at period p is visible to reports p … p+w−1 (clip
      // at the corpus max so we never report beyond observed data)
      .select(col("__u"), col("win"),
        explode(sequence(col("__p"),
          least(col("__p") + col("win") - 1, col("__mp")))).as("period"))
      .distinct()
      .groupBy("win", "period")
      .agg(count(lit(1)).as("n_active"))
  }

  /** Kaplan-Meier survival curve for conversion latency: time from a
    * user's first `startEvent` to their first subsequent `endEvent`,
    * right-censored at the end of observation (the corpus max time) for
    * users who never convert — the estimator that answers "how long does
    * conversion take" WITHOUT the survivorship bias of averaging only
    * completed conversions.
    *
    *   S(t_i) = Π_{j ≤ i} (1 − d_j / n_j)
    *
    * (d = conversions at t, n = at-risk = subjects with duration ≥ t.)
    *
    * Durations are quantized to `quantizeUs` buckets — the discrete-
    * measure contract: the curve table is bounded by the time span over
    * the quantum, not by users. Scale shape: two user-keyed min-aggs
    * (start, conditional end — the funnel join shape), one keyed
    * duration count, then two ordered windows over the QUANTIZED
    * duration table (at-risk via a descending cumulative sum; the
    * product via exp∘Σlog — sequential, deterministic). Returns
    * (t, n_risk, n_events, survival), one row per bucket with ≥ 1
    * conversion, ordered by t.
    */
  def survivalCurve(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      startEvent: String,
      endEvent: String,
      quantizeUs: Long
  ): DataFrame = {
    require(quantizeUs > 0, s"quantizeUs must be positive, got $quantizeUs")
    val ev = df.select(col(userCol).as("__u"), col(tsCol).as("__ts"),
      col(typeCol).as("__e"))
    val starts = ev.filter(col("__e") === startEvent)
      .groupBy("__u").agg(min(col("__ts")).as("__t0"))
    val ends = ev.filter(col("__e") === endEvent)
      .join(starts, Seq("__u"))
      .filter(col("__ts") >= col("__t0"))
      .groupBy("__u").agg(min(col("__ts")).as("__t1"))
    val obsEnd = ev.agg(max(col("__ts")).as("__tmax"))
    val durations = starts
      .join(ends, Seq("__u"), "left")
      .crossJoin(broadcast(obsEnd))
      .select(
        when(col("__t1").isNotNull, col("__t1") - col("__t0"))
          .otherwise(col("__tmax") - col("__t0")).as("__dur"),
        col("__t1").isNotNull.as("__conv"))
      .select(expr(s"__dur DIV ${quantizeUs}L").as("t"), col("__conv"))
    val counts = durations.groupBy("t").agg(
      count(lit(1)).as("__n_all"),
      sum(when(col("__conv"), 1L).otherwise(0L)).as("n_events"))
    val fromAbove = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("n_risk", sum(col("__n_all")).over(fromAbove))
      .filter(col("n_events") > 0)
      .withColumn("__factor",
        lit(1.0) - col("n_events").cast("double") / col("n_risk"))
      // a bucket where EVERYONE at risk converts zeroes the curve from
      // there on — flag it instead of feeding ln(0) (Spark log(0) is
      // null and would silently DROP the factor from the sum)
      .withColumn("__zero",
        max(when(col("__factor") <= 0.0, 1).otherwise(0)).over(asc))
      .withColumn("survival",
        when(col("__zero") === 1, lit(0.0))
          .otherwise(exp(sum(log(col("__factor"))).over(asc))))
      .select(col("t"), col("n_risk"), col("n_events"), col("survival"))
  }

  /** Sequential pattern counts: the corpus-wide frequency of every
    * length-`n` consecutive event-type sequence within a user's ordered
    * stream ("view > view > purchase") — the flat-pattern core of
    * sequence mining, enough for next-event models and UX-path audits.
    *
    * Scale shape: one window per user carrying n−1 lagged values (bounded
    * per-partition state), then a keyed count with map-side combine and a
    * TakeOrdered top-k (per-partition heaps, no global sort). Ordering is
    * total via `tiebreakCol`, so counts are layout-independent.
    */
  def sequencePatterns(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tiebreakCol: String,
      n: Int,
      topK: Int
  ): DataFrame = {
    require(n >= 2, s"pattern length must be >= 2, got $n")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val seq = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    // lag(n−1) is the oldest element; render oldest → newest
    val parts = (n - 1).to(1, -1)
      .map(j => lag(col(typeCol), j).over(seq)) :+ col(typeCol)
    df.select(col(userCol), col(tsCol), col(tiebreakCol), col(typeCol))
      .withColumn("pattern", concat_ws(" > ", parts: _*))
      // lag null (stream head) drops the row: concat_ws skips nulls, so
      // guard on the oldest lag explicitly
      .withColumn("__oldest", lag(col(typeCol), n - 1).over(seq))
      .filter(col("__oldest").isNotNull)
      .groupBy("pattern")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pattern").asc)
      .limit(topK)
  }

  /** CUSUM changepoint detection over the event-rate series: bucket
    * events into periods, then run the one-sided CUSUM statistic
    *
    *   S_i = max(0, S_{i−1} + (x_i − μ − k·σ))
    *
    * and flag periods where S exceeds h·σ — the standard sequential
    * drift detector (Page 1954): a sustained LEVEL SHIFT accumulates
    * where the 3×MAD rule ([[anomalousPeriods]]) only catches isolated
    * spikes. The recurrence is computed WITHOUT a scan-with-reset via the
    * prefix-sum identity S_i = P_i − min_{j≤i} P_j (P = cumulative sum of
    * the centered series), so it's two ordered windows, not an iterative
    * loop.
    *
    * Scale shape: raw events stream through ONE keyed count; μ and σ are
    * written as explicit exact-integer-sum formulas (NOT stddev_samp,
    * whose Welford merge is partition-order-dependent) and ride a 1-row
    * broadcast; the two cumulative windows run over the tiny period
    * series in period order — sequential, hence deterministic.
    * Returns (period, n, cusum, is_shift).
    */
  def cusumShifts(
      df: DataFrame,
      tsCol: String,
      periodUs: Long,
      k: Double = 0.5,
      h: Double = 5.0
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(h > 0.0, s"h must be positive, got $h")
    val perPeriod = df
      .select(expr(s"`$tsCol` DIV ${periodUs}L").as("period"))
      .groupBy("period")
      .agg(count(lit(1)).as("n"))
    // μ, σ from exact integer sums: deterministic under any layout
    val stats = perPeriod.agg(
      count(lit(1)).as("__m"),
      sum(col("n")).as("__s1"),
      sum(col("n") * col("n")).as("__s2"))
      .select(
        (col("__s1").cast("double") / col("__m")).as("mu"),
        sqrt((col("__s2").cast("double") -
          col("__s1").cast("double") * col("__s1") / col("__m")) /
          (col("__m") - lit(1))).as("sigma"))
    val ordered = Window.orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perPeriod.crossJoin(broadcast(stats))
      .withColumn("__dev",
        col("n").cast("double") - col("mu") - lit(k) * col("sigma"))
      .withColumn("__p", sum(col("__dev")).over(ordered))
      // the empty prefix P_0 = 0 belongs in the min — without it S_1
      // would be P_1 even when d_1 < 0
      .withColumn("__pmin", least(min(col("__p")).over(ordered), lit(0.0)))
      .select(col("period"), col("n"),
        (col("__p") - col("__pmin")).as("cusum"),
        ((col("__p") - col("__pmin")) > lit(h) * col("sigma")).as("is_shift"))
  }

  /** Rolling activity: per (event type, period) counts with a trailing
    * `w`-period moving average and the current-over-average ratio — the
    * standard "is this type trending" view. The ROWS frame runs over the
    * periods that EXIST for the type (sparse gaps are absent, not zero);
    * callers wanting gap-filled frames should densify upstream.
    *
    * Scale shape: raw events pass through one (type, period) hash count;
    * the moving-average window is partitioned by type over the tiny
    * aggregated series (#periods rows per type, bounded by the time
    * span regardless of data volume). The window average is an exact
    * integer sum divided by an exact count — deterministic.
    */
  def rollingActivity(
      df: DataFrame,
      typeCol: String,
      tsCol: String,
      periodUs: Long,
      w: Int
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(w >= 1, s"window must be >= 1 period, got $w")
    val counts = df
      .select(col(typeCol).as("event_type"),
        expr(s"`$tsCol` DIV ${periodUs}L").as("period"))
      .groupBy("event_type", "period")
      .agg(count(lit(1)).as("n"))
    val trail = Window.partitionBy(col("event_type")).orderBy(col("period"))
      .rowsBetween(-(w - 1).toLong, Window.currentRow)
    counts
      .withColumn("ma",
        sum(col("n")).over(trail).cast("double") /
          count(lit(1)).over(trail))
      .withColumn("ratio", col("n").cast("double") / col("ma"))
  }

  /** Activity streaks (gaps-and-islands): per user, the length of the
    * longest run of CONSECUTIVE active periods, the number of distinct
    * runs, and the total active-period count. The island key is the
    * classic `period − row_number()` difference — constant within a
    * consecutive run, strictly decreasing across a gap.
    *
    * Scale shape: events collapse to distinct (user, period) first (one
    * hash distinct, map-side combined), so the window sort runs over
    * ≤ span-many rows per user, partitioned by user — no global sort,
    * no per-user arrays. Output is one row per user.
    */
  def activityStreaks(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      periodUs: Long
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val active = df
      .select(col(userCol).as("user_id"),
        expr(s"`$tsCol` DIV ${periodUs}L").as("period"))
      .distinct()
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("period"))
    active
      .withColumn("island", col("period") - row_number().over(byUser))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("n_active_periods"))
  }

  /** Seasonal-profile residuals: per (event type, period) counts scored
    * against the type's SEASONAL profile — the mean/std of counts at the
    * same phase (e.g. hour-of-day for hourly periods with season 24).
    * Returns per period the count, the seasonal mean, and the residual
    * z-score (NULL when the phase has fewer than 2 observations or zero
    * variance) — the standard "unusual for 3am, not unusual overall"
    * anomaly view that a global-threshold detector ([[anomalousPeriods]])
    * misses.
    *
    * Scale shape: one (type, period) count; the profile re-aggregates
    * the series table keyed on (type, phase); one keyed join back.
    * Sample std from exact sums — deterministic given float pinning.
    */
  def seasonalResiduals(
      df: DataFrame,
      typeCol: String,
      tsCol: String,
      periodUs: Long,
      season: Int
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(season >= 2, s"season must be >= 2 periods, got $season")
    val series = df
      .select(col(typeCol).as("event_type"),
        expr(s"`$tsCol` DIV ${periodUs}L").as("period"))
      .groupBy("event_type", "period")
      .agg(count(lit(1)).as("n"))
      .withColumn("phase", pmod(col("period"), lit(season.toLong)))
    // products in DOUBLE: long n·n / Σn·Σn would overflow at corpus
    // scale (the sums themselves stay exact longs)
    val prof = series.groupBy("event_type", "phase")
      .agg(count(lit(1)).as("__m"), sum(col("n")).as("__s"),
        sum(col("n").cast("double") * col("n")).as("__ss"))
      .select(col("event_type"), col("phase"),
        col("__m"),
        (col("__s").cast("double") / col("__m")).as("phase_mean"),
        when(col("__m") >= 2,
          (col("__ss") -
            col("__s").cast("double") * col("__s") / col("__m")) /
            (col("__m") - lit(1L))).as("__var"))
    series.join(prof, Seq("event_type", "phase"))
      .select(col("event_type"), col("period"), col("phase"), col("n"),
        col("phase_mean"),
        when(col("__var") > 0.0,
          (col("n") - col("phase_mean")) / sqrt(col("__var"))).as("z"))
  }

  /** Burst debouncing: keep only events that start a burst — an event
    * survives iff it is its key's first, or more than `gapUs` after the
    * RAW previous event (kept or not). A dense burst therefore collapses
    * to its opening event (the telemetry/click-debounce semantics; note
    * this is the raw-predecessor rule, not last-KEPT-event debouncing —
    * an event inside a long chain of sub-gap steps stays dropped even if
    * the chain's opener is far away. It is exactly the q54 session-start
    * rule: debounce(df) ≡ the session-head events).
    *
    * Scale shape: one lag window partitioned by key (no global sort),
    * then a filter — the input's columns pass through unchanged.
    */
  def debounce(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      idCol: String,
      gapUs: Long
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(idCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNull || col(tsCol) - col("__prev") > gapUs)
      .drop("__prev")
  }

  /** Forward-fill resampling: project a sparse event stream onto a
    * REGULAR per-key period grid, carrying the last observed value
    * across gaps — the standard "as-of state at every tick" view
    * (sensor panels, balances, feature snapshots for training).
    *
    * Per key the grid spans that key's own [first, last] active period
    * (no global spine — a key appearing for a day doesn't get years of
    * rows). Within a period the observation is the latest (ts, id)
    * event ([[latestPerKey]] semantics); gaps take the most recent prior
    * value (`is_observed` = false).
    *
    * Scale shape: one (key, period) max_by agg; one per-key min/max agg
    * whose `sequence()` explode generates the grid — output rows =
    * Σ_key span-periods, the caller's periodUs choice bounds it; the
    * fill is a last-ignoring-nulls window partitioned by key over grid
    * rows only. No global sort anywhere.
    */
  def resampleFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      periodUs: Long
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val base = df.select(col(keyCol).as("key"),
      expr(s"`$tsCol` DIV ${periodUs}L").as("period"),
      col(tsCol), col(idCol), col(valueCol).cast("double").as("__v"))
    val obs = base
      .groupBy("key", "period")
      .agg(max_by(col("__v"), struct(col(tsCol), col(idCol))).as("__obs"))
    val grid = base.groupBy("key")
      .agg(min(col("period")).as("__p0"), max(col("period")).as("__p1"))
      .select(col("key"),
        explode(sequence(col("__p0"), col("__p1"))).as("period"))
    val w = Window.partitionBy(col("key")).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "period"), "left")
      .select(col("key"), col("period"),
        last(col("__obs"), ignoreNulls = true).over(w).as("value"),
        col("__obs").isNotNull.as("is_observed"))
  }

  /** Latest-record compaction (the CDC/upsert "current snapshot" view):
    * per key, the value carried by the most recent (ts, id) event, plus
    * the version count and last timestamp. ONE hash aggregation with
    * `max_by` over a (ts, id) struct — no window sort, no shuffle beyond
    * the keyed agg; the id tiebreak makes simultaneous versions
    * deterministic. This is the read-side compaction every event-sourced
    * table needs (latest profile per user, current price per part).
    */
  def latestPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      idCol: String,
      valueCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val ord = struct(col(tsCol), col(idCol))
    df.groupBy(keyCols.map(col): _*)
      .agg(
        max_by(col(valueCol), ord).as("last_value"),
        max_by(col(idCol), ord).as("last_id"),
        max(col(tsCol)).as("last_ts"),
        count(lit(1)).as("n_versions"))
  }

  /** Per-user session statistics over gap-based sessionization (same
    * session rule as the q54 battery query: a new session starts after
    * `gapUs` of inactivity; ties broken by event id): session count,
    * bounce count (1-event sessions), bounce rate, events per session,
    * and mean session duration. All ratios are exact-integer sums
    * divided once — deterministic under any partitioning.
    *
    * Scale shape: the lag/cumsum windows are partitioned by user (no
    * global sort); everything after is two hash aggregations keyed on
    * (user, session) then user.
    */
  def sessionStats(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapUs: Long
  ): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val sessions = df
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("__sess",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol).as("user_id"), col("__sess"))
      .agg(count(lit(1)).as("__n"),
        (max(col(tsCol)) - min(col(tsCol))).as("__dur"))
    sessions
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("__n") === 1, 1L).otherwise(0L)).as("n_bounces"),
        sum(col("__n")).as("n_events"),
        sum(col("__dur")).as("__dursum"))
      .select(col("user_id"), col("n_sessions"), col("n_bounces"),
        (col("n_bounces").cast("double") / col("n_sessions")).as("bounce_rate"),
        col("n_events"),
        (col("n_events").cast("double") / col("n_sessions")).as("events_per_session"),
        (col("__dursum").cast("double") / col("n_sessions")).as("avg_dur_us"))
  }

  /** Rolling trend: per (event type, period) value sums, with the OLS
    * slope of that per-period series over a trailing `w`-period ROWS
    * window — "is this metric rising, and how fast", the windowed twin
    * of the engine's moments-kernel fit (same closed-form slope from the
    * same four sums, here carried by window aggregates instead of a
    * global one).
    *
    * Returns (event_type, period, y, slope) where y is the period's
    * value sum and slope is NULL until the window holds ≥ 2 points (or
    * when all window periods coincide). As with [[rollingActivity]], the
    * window runs over periods that EXIST for the type.
    *
    * Scale shape: raw events collapse through one (type, period) hash
    * agg; the four window sums (Σx, Σy, Σxy, Σxx) run over the tiny
    * aggregated series, partitioned by type — never over raw events.
    */
  def rollingTrend(
      df: DataFrame,
      typeCol: String,
      tsCol: String,
      valueCol: String,
      periodUs: Long,
      w: Int
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(w >= 2, s"window must be >= 2 periods, got $w")
    val series = df
      .select(col(typeCol).as("event_type"),
        expr(s"`$tsCol` DIV ${periodUs}L").as("period"),
        col(valueCol).cast("double").as("__y"))
      .groupBy("event_type", "period")
      .agg(sum(col("__y")).as("y"))
    val trail = Window.partitionBy(col("event_type")).orderBy(col("period"))
      .rowsBetween(-(w - 1).toLong, Window.currentRow)
    val x = col("period").cast("double")
    val n = count(lit(1)).over(trail).cast("double")
    val sx = sum(x).over(trail)
    val sy = sum(col("y")).over(trail)
    val sxy = sum(x * col("y")).over(trail)
    val sxx = sum(x * x).over(trail)
    val den = n * sxx - sx * sx
    series.withColumn("slope",
      when(n >= 2 && den =!= 0.0, (n * sxy - sx * sy) / den))
  }

  /** OHLC downsampling: per (event type, period) the open/high/low/close
    * of a value column plus the event count and value sum — the standard
    * resample of a raw event stream to a regular bar series. Open/close
    * take the value at the min/max (ts, id) within the bar — the id
    * tiebreak makes simultaneous events deterministic.
    *
    * Scale shape: ONE hash aggregation keyed on (type, period) with
    * map-side combine; `min_by`/`max_by` over a (ts, id) struct carry the
    * open/close without any window sort or per-bar array.
    */
  def ohlcDownsample(
      df: DataFrame,
      typeCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      periodUs: Long
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val v = col(valueCol).cast("double")
    val ord = struct(col(tsCol), col(idCol))
    df.select(col(typeCol).as("event_type"),
        expr(s"`$tsCol` DIV ${periodUs}L").as("period"),
        col(tsCol), col(idCol), v.as("__v"))
      .groupBy("event_type", "period")
      .agg(
        min_by(col("__v"), ord).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max_by(col("__v"), ord).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("__v")).as("value_sum"))
  }

  /** Simple exponential smoothing per series: the per-(type, period)
    * value sums are smoothed with s₁ = x₁, s_t = α·x_t + (1−α)·s_{t−1},
    * and the one-step-ahead forecast is the final level s_T. The
    * recurrence is evaluated in CLOSED FORM as a weighted sum —
    * s_T = Σ_{t≥2} α(1−α)^{T−t}·x_t + (1−α)^{T−1}·x₁ — so no
    * sequential pass over the series exists anywhere: one keyed window
    * ranks each period, a geometric weight is a pure projection, and
    * one keyed aggregation sums the series. Weights on old points
    * underflow to exact 0 identically in any engine (deterministic).
    *
    * Periods are the OBSERVED ones (gaps carry no mass — callers wanting
    * calendar gaps as zeros resample first; [[resampleFill]]).
    *
    * Scale shape: raw events collapse through one (type, period) hash
    * agg; the rank window and the final agg run per type over the tiny
    * period series — nothing global. Returns one row per type:
    * (event_type, n_periods, last_y, level) with level = the forecast.
    */
  def sesForecast(
      df: DataFrame,
      typeCol: String,
      tsCol: String,
      valueCol: String,
      periodUs: Long,
      alpha: Double
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val series = df
      .select(col(typeCol).as("event_type"),
        expr(s"`$tsCol` DIV ${periodUs}L").as("period"),
        col(valueCol).cast("double").as("__y"))
      .groupBy("event_type", "period")
      .agg(sum(col("__y")).as("y"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("period"))
    val ranked = series
      .withColumn("__rn", row_number().over(byType))
      .withColumn("__t", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    val beta = lit(1.0 - alpha)
    val w = when(col("__rn") === 1, pow(beta, col("__t") - 1))
      .otherwise(lit(alpha) * pow(beta, col("__t") - col("__rn")))
    ranked
      .withColumn("__w", w)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_periods"),
        max_by(col("y"), col("period")).as("last_y"),
        sum(col("__w") * col("y")).as("level"))
  }

  /** Sample autocorrelation of a per-period count series at lags
    * 1..`maxLag`, per event type, over the DENSE calendar spine between
    * each type's first and last observed period (missing periods count
    * 0 — an absent hour is real information for autocorrelation, unlike
    * [[sesForecast]]'s observed-period smoothing):
    *
    *   r_k = Σ_{t>k} (x_t−x̄)(x_{t−k}−x̄) / Σ_t (x_t−x̄)²
    *
    * (the standard biased estimator; both sums over the full spine).
    *
    * Scale shape: raw events collapse through one (type, period) hash
    * agg; the dense spine is a per-type `sequence` explode (bounded by
    * the calendar range, not by rows); all `maxLag` lag columns ride ONE
    * keyed window sort; one keyed aggregation emits every lag via an
    * inline struct-array explode. Returns (event_type, lag, n, acf);
    * acf is NULL for a constant series (zero denominator) and lags ≥ the
    * series length produce no pairs (sum 0 ⇒ acf 0e0 by convention,
    * matching the zero-padded estimator).
    */
  def acf(
      df: DataFrame,
      typeCol: String,
      tsCol: String,
      periodUs: Long,
      maxLag: Int
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val counts = df
      .select(col(typeCol).as("event_type"),
        expr(s"`$tsCol` DIV ${periodUs}L").as("period"))
      .groupBy("event_type", "period")
      .agg(count(lit(1)).cast("double").as("__c"))
    val spine = counts
      .groupBy("event_type")
      .agg(min(col("period")).as("__p0"), max(col("period")).as("__p1"))
      .select(col("event_type"),
        explode(sequence(col("__p0"), col("__p1"))).as("period"))
    val dense = spine
      .join(counts, Seq("event_type", "period"), "left")
      .select(col("event_type"), col("period"),
        coalesce(col("__c"), lit(0.0)).as("__x"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("period"))
    val lagged = (1 to maxLag).foldLeft(dense) { (d, k) =>
      d.withColumn(s"__l$k", lag(col("__x"), k).over(byType))
    }
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast("double").as("__n"),
        sum(col("__x")).as("__s"),
        sum(col("__x") * col("__x")).as("__ss")) ++
        (1 to maxLag).map(k =>
          sum(col("__x") * col(s"__l$k")).as(s"__sxy$k")) ++
        (1 to maxLag).flatMap(k => Seq(
          sum(when(col(s"__l$k").isNotNull, col("__x"))).as(s"__sa$k"),
          sum(when(col(s"__l$k").isNotNull, col(s"__l$k"))).as(s"__sb$k"),
          count(col(s"__l$k")).cast("double").as(s"__np$k")))
    val per = lagged
      .groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*)
    // r_k with both mean-centerings against the FULL-series mean x̄:
    // Σ(x_t−x̄)(x_{t−k}−x̄) = Σx_t·x_{t−k} − x̄(Σ_pairs x_t + Σ_pairs x_{t−k})
    //                        + n_pairs·x̄²
    val mean = col("__s") / col("__n")
    val den = col("__ss") - col("__s") * col("__s") / col("__n")
    val entries = (1 to maxLag).map { k =>
      val num = coalesce(col(s"__sxy$k"), lit(0.0)) -
        mean * (coalesce(col(s"__sa$k"), lit(0.0)) +
          coalesce(col(s"__sb$k"), lit(0.0))) +
        col(s"__np$k") * mean * mean
      struct(lit(k).as("lag"), col("__n").cast("long").as("n"),
        when(den > 0.0, num / den).as("acf"))
    }
    per.select(col("event_type"), explode(array(entries: _*)).as("__e"))
      .select(col("event_type"), col("__e.lag"), col("__e.n"), col("__e.acf"))
  }
}
