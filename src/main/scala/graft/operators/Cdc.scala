package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture table maintenance: the two standard shapes a
  * lakehouse pipeline applies to an event-sourced change stream —
  * MERGE-style snapshot upsert (SCD type 1) and validity-interval
  * history build (SCD type 2).
  *
  * Scale shapes: [[merge]] is one (ts, id)-latest aggregation over the
  * change stream ([[Events.latestPerKey]] semantics) + ONE key-keyed
  * full outer join against the base snapshot; [[scd2]] is one lead()
  * window partitioned by key. No driver-side state, no iteration.
  */
object Cdc {

  /** Apply a change stream to a base snapshot (SCD1 MERGE). `changes`
    * carries (key, op, value, ts, id) with op ∈ {"I", "U", "D"} (insert
    * and update are synonymous upserts — the usual CDC relaxation);
    * only each key's LATEST change by (ts, id) applies. Returns the new
    * snapshot (key, value): base keys without changes pass through,
    * upserts replace/insert, deletes drop the key. Unknown (or null) ops
    * are rejected at runtime inside the plan (fail-fast beats silently
    * dropping a malformed change) — validated on the RAW change stream
    * before the latest-change aggregation, so a malformed op fails the
    * job even when a newer change for the same key would have shadowed
    * it.
    */
  def merge(
      base: DataFrame,
      keyCol: String,
      valueCol: String,
      changes: DataFrame,
      opCol: String,
      tsCol: String,
      idCol: String
  ): DataFrame = {
    val latest = changes
      .select(col(keyCol).as("__k"),
        struct(col(tsCol), col(idCol)).as("__ord"),
        // fail-fast on malformed ops (raise_error is codegen-compatible);
        // a null op coalesces into the message (concat of a null would
        // raise with a null message)
        when(col(opCol).isin("I", "U", "D"), col(opCol))
          .otherwise(raise_error(concat(lit("cdc merge: unknown op "),
            coalesce(col(opCol).cast("string"), lit("NULL"))))).as("__op"),
        col(valueCol).as("__cv"))
      .groupBy("__k")
      .agg(max_by(struct(col("__op"), col("__cv")), col("__ord")).as("__c"))
      .select(col("__k"), col("__c.__op").as("__op"), col("__c.__cv").as("__cv"))
    base.select(col(keyCol).as("__k"), col(valueCol).as("__bv"))
      .join(latest, Seq("__k"), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col("__k").as(keyCol),
        when(col("__op").isNotNull, col("__cv")).otherwise(col("__bv"))
          .as(valueCol))
  }

  /** Build SCD2 validity intervals from a version stream: per key,
    * versions ordered by (ts, id) get `valid_from` = their own ts,
    * `valid_to` = the next version's ts (NULL for the current version,
    * which also carries `is_current`). Half-open intervals
    * [valid_from, valid_to) — adjacent versions never overlap and gaps
    * never appear, the warehouse-standard contract.
    */
  def scd2(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.select(col(keyCol), col(tsCol), col(idCol), col(valueCol))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(valueCol), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }
}
