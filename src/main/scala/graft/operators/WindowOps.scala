package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window-function building blocks shared by the pipeline operators.
  *
  * These are the Spark-native forms of the reference's recurring
  * BigQuery/pandas idioms:
  *   - row_number dedupe       (core_coin_market_data.py:54-58)
  *   - running sum / sequence  (core_coin_wallet_transfers.py:178-191)
  *   - stable dense-ID assign  (core_coin_wallet_transfers.py:410-480)
  *
  * All of them shuffle exactly once, on the partition keys; on a real
  * cluster the shuffle is the hash-exchange Catalyst inserts for the
  * Window node, and co-partitioned downstream windows reuse it.
  */
object WindowOps {

  /** Keep the first row per key group under `order`; drops duplicate
    * rows the way the reference dedupes streaming-insert artifacts. */
  def dedupeFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Running sum of `valueCol` plus a 1-based sequence counter per key. */
  def runningSum(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      valueCol: String,
      sumName: String = "balance",
      seqName: String = "transfer_sequence"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
    df.withColumn(sumName, sum(valueCol).over(w))
      .withColumn(seqName, count(valueCol).over(w))
  }

  /** Deterministic dense integer IDs for the distinct values of `key`,
    * ordered by the key itself.
    *
    * NOT a global `row_number()` window — that funnels every distinct
    * key through one partition. A range-partitioned sort followed by
    * zipWithIndex assigns the identical ids distributively: the sort
    * is the only shuffle, and the index is computed from per-partition
    * offsets. At scale prefer assigning IDs once and appending only
    * new keys (the reference preserves previously-issued IDs the same
    * way).
    */
  def stableIds(df: DataFrame, key: String, idName: String): DataFrame = {
    val spark = df.sparkSession
    val distinctSorted = df.select(key).distinct().orderBy(key)
    val schema = org.apache.spark.sql.types.StructType(
      distinctSorted.schema.fields :+
        org.apache.spark.sql.types.StructField(idName, org.apache.spark.sql.types.LongType, nullable = false))
    val withIds = distinctSorted.rdd
      .zipWithIndex()
      .map { case (row, idx) => org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L)) }
    spark.createDataFrame(withIds, schema)
  }
}
