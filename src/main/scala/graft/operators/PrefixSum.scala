package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL running total — `SUM(v) OVER (ORDER BY …)` with
  * no partition key.
  *
  * The reference computes exactly this to batch ingestion work under
  * a row budget (retrieve_dune_transfer_data.py:205: running total of
  * per-coin transfer counts ordered ascending, prefix kept under a
  * batch cap). Spark CAN express it as
  * `Window.orderBy(...)` with no partitionBy — but that plan moves
  * the ENTIRE table through one task (Spark even warns), which is the
  * single worst scale anti-pattern in the window family.
  *
  * The scale-correct form is the classic two-pass parallel prefix
  * sum, here in pure DataFrame algebra:
  *
  *   1. range-repartition on the order key → partition i holds keys
  *      strictly below partition i+1 (one shuffle, same volume a
  *      global sort would pay),
  *   2. per-partition running sum via an ordinary keyed window
  *      (PARTITION BY spark_partition_id — fully parallel),
  *   3. per-partition TOTALS (numPartitions rows) go through an
  *      exclusive scan — the only single-task window left, over
  *      ≤ numPartitions rows instead of the table,
  *   4. broadcast-join the offsets back and add.
  *
  * Cost at 100 TB: one range exchange + one ~KB broadcast — the same
  * shape `SORT BY` + file concatenation would give, with no driver
  * materialization of data rows.
  *
  * The order must be TOTAL (include a unique tiebreaker column):
  * with equal keys split across a partition boundary the running
  * total is still correct for distinct rows, but which of two EQUAL
  * rows precedes the other would be partition-placement-dependent —
  * a unique tiebreaker removes the ambiguity, matching the
  * deterministic ORDER BY the SQL oracle evaluates. Order columns
  * must be non-null (Spark sorts NULLS FIRST, most SQL engines
  * NULLS LAST — don't put the semantics question in the data).
  */
object PrefixSum {

  /** Append `outCol` = running sum of `valueCol` over the global
    * order given by `orderCols` (ascending, inclusive of the current
    * row). */
  def globalRunningSum(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      outCol: String,
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "global running sum needs an order")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions

    val ranged = df
      .repartitionByRange(n, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val within = Window.partitionBy("__pid")
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRun = ranged.withColumn("__run", sum(col(valueCol)).over(within))

    // exclusive scan over the ≤ n per-partition totals — the single
    // remaining unpartitioned window runs on numPartitions rows, not
    // the table
    val partTotals = ranged.groupBy("__pid").agg(sum(col(valueCol)).as("__psum"))
    val zero = lit(0).cast(partTotals.schema("__psum").dataType)
    val offsets = partTotals
      .withColumn("__offset",
        coalesce(
          sum("__psum").over(Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)),
          zero))
      .select("__pid", "__offset")

    withRun.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__run") + col("__offset"))
      .drop("__pid", "__run", "__offset")
  }
}
