package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge for graft's injected optimizer rules.
  *
  * A `Rule[LogicalPlan]` that wants to REUSE a DataFrame-level
  * operator (graft's tested `RangeJoin.intervalOverlap`) needs two
  * conversions Spark keeps `private[sql]`: LogicalPlan → DataFrame
  * (`Dataset.ofRows`) and Expression → Column
  * (`ExpressionUtils.column`). Both are the canonical idioms every
  * Spark extension library uses from a nested `org.apache.spark.sql`
  * package — qualified-private access, no reflection, no copied
  * implementation. This object is the ONLY code graft places inside
  * Spark's namespace, and it contains no logic of its own.
  */
object GraftBridge {

  /** Wrap an analyzed logical plan as a DataFrame of the session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap an already-resolved catalyst expression as a Column. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Mark a batch DataFrame as a STREAMING batch — what a V1
    * streaming `Source.getBatch` must return (the engine asserts
    * isStreaming). The same `internalCreateDataFrame(isStreaming =
    * true)` call Spark's own FileStreamSource makes; the plan becomes
    * an opaque RDD leaf, which is the accepted V1-source trade. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val classic = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
