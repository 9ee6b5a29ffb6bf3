/*
 * Bridge into Spark's private[sql] Column↔Expression converters — the
 * standard pattern third-party Spark extension libraries use to attach
 * native Catalyst expressions to the public Column API.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Drain the async SparkListener bus — lets tests make deterministic
    * negative assertions ("no job ran") without sleeping. */
  def waitForListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** True when the session's SQL cache manager holds no cached plans —
    * lets tests assert that operators release every `Dataset.cache()` they
    * take (localCheckpoint persists RDD-level only and doesn't register
    * here, so scoped-cache leaks are isolated from checkpoint storage). */
  def noCachedPlans(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
