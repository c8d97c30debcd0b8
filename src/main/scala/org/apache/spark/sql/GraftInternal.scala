package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * needed to expose custom Catalyst aggregates (graft.functions.MomentsAgg)
  * as user-facing Columns on Spark 4.x, where `new Column(expr)` is gone. */
object GraftInternal {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** True when the session's CacheManager holds no cached plans — the
    * leak probe for lazily-returned operators, which must not register
    * CacheManager entries they can never unpersist. */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
