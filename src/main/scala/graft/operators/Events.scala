package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    *
    * Returns one row per step: (step_idx 1-based, step, n_users,
    * conversion = n_users / step-1 users, as double).
    */
  def funnel(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
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
      reach = mat(ev.filter(col("__e") === steps(k))
        .join(reach.select(col("__u"), col("__t").as("__prev")), Seq("__u"))
        .filter(col("__ts") >= col("__prev"))
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
}
