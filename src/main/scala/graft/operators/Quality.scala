package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the "expectation suite" gate a
  * production table passes before it is published: a set of named row
  * predicates, evaluated in ONE pass, reported as per-rule violation
  * counts and rates.
  *
  * Violation semantics: a row violates a rule when the predicate is
  * FALSE **or NULL** — an expectation must be provably satisfied, so an
  * unevaluable predicate (null operand) counts against it. That makes
  * `expect("price_positive", col("price") > 0)` catch null prices
  * without a separate not-null rule.
  *
  * Scale shape: every rule compiles to one conditional-sum aggregate
  * over a single scan (no per-rule pass, no shuffle beyond the global
  * 1-row agg); the long-format report is an inline explode of the
  * rule-count struct array — driver never sees row data.
  */
object Quality {

  /** Evaluate `rules` (name → predicate) over `df`. Returns one row per
    * rule: (rule, n_rows, n_violations, violation_rate), in rule order.
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 0L).otherwise(1L)).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("__n").as("n_rows"),
        coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
    }
    one.select(explode(array(entries: _*)).as("__e"))
      .select(col("__e.rule"), col("__e.n_rows"), col("__e.n_violations"),
        when(col("__e.n_rows") > 0,
          col("__e.n_violations").cast("double") / col("__e.n_rows"))
          .otherwise(lit(0.0)).as("violation_rate"))
  }
}
