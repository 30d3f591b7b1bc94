package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access shim for two `private[sql]` Spark internals the
  * row-level SQL bridge needs (the package-placement trick every
  * Spark extension with a SQL surface uses — Delta's
  * `org.apache.spark.sql.delta` lineage): wrapping a resolved
  * Catalyst expression back into a public [[Column]], and turning a
  * resolved source [[LogicalPlan]] back into a [[DataFrame]]. Nothing
  * else from the internal surface is exposed. */
object SqlInternals {

  /** `classic.ExpressionUtils.column` — a Column over a (possibly
    * unresolved) Catalyst expression, re-resolved by whatever plan it
    * lands in. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** `classic.Dataset.ofRows` — the DataFrame face of an analyzed
    * logical plan (the MERGE source, replayed into the operator's own
    * query). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
