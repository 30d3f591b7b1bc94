package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Sinks

/** S17: incremental maintenance of q86's per-day HLL sketch table —
  * the streaming path that makes windowed distinct counts never
  * rescan history.
  *
  * Each micro-batch is collapsed to per-day sketch PARTIALS and
  * merged into the stored table with `hll_union` (read-merge-rewrite
  * of only the touched day partitions — the [[UpsertSink]] /
  * `Ingest.incrementalRefresh` pruned-refresh idiom, with the
  * keep-newest rule replaced by register union). The read side
  * ([[rollingEstimate]]) is exactly q86's aggregated-table range
  * merge, so a dashboard query touches |days| sketch rows, never the
  * fact stream.
  *
  * The exactly-once story is ALGEBRAIC here, even stronger than S7's
  * keep-newest idempotency: HLL union is register-wise max, so
  * merging a batch's partial into a table that already contains it is
  * a no-op — at-least-once delivery composes with an idempotent,
  * commutative merge into exactly-once ESTIMATES, with no transaction
  * log consulted. And because register max is order-insensitive, the
  * maintained table reaches the same REGISTER STATE as a batch build
  * over the same rows regardless of how the stream was chopped into
  * batches (serialized sketch bytes may differ by representation
  * mode; the registers, and with them every post-union estimate, do
  * not) — `StreamingSpec` asserts estimate EQUALITY, not tolerance.
  * The reference's always-on pullers
  * (coingecko_market_data.py:317-380) land raw rows and re-aggregate;
  * this sink lands the aggregate itself, which is what survives an
  * unbounded stream.
  */
object SketchTableSink {

  /** Per-day HLL partials for a (ts, user_id) batch — shared by the
    * sink's merge and by batch rebuilds, so "streaming ≡ batch" is a
    * statement about ONE aggregation, chopped differently. */
  def dailySketches(events: DataFrame): DataFrame =
    events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))

  /** Merge one batch's partials into the sketch table. Public and
    * directly callable: foreachBatch delegates here, and the replay /
    * idempotency tests exercise it without streaming machinery. */
  def mergeBatch(batch: DataFrame, tablePath: String, stagingPath: String): Unit = {
    val spark = batch.sparkSession
    val partial = dailySketches(batch)
    val tableRoot = new java.io.File(tablePath)
    val hasData = tableRoot.isDirectory &&
      Option(tableRoot.listFiles()).exists(_.exists(f =>
        f.getName.endsWith(".parquet") || f.getName.contains("=")))
    if (!hasData) {
      Sinks.writePartitioned(partial, tablePath, Seq("day"))
      return
    }
    val existing = spark.read.parquet(tablePath)
    // pruned refresh: only the days this batch touches are read back
    // (broadcast semi-join reaches the scan as a partition filter)
    val touched = partial.select("day").distinct()
    val existingTouched =
      existing.join(broadcast(touched), Seq("day"), "left_semi")
    val merged = existingTouched.as("e")
      .join(partial.as("p"), Seq("day"), "full_outer")
      .select(col("day"),
        when(col("e.sk").isNull, col("p.sk"))
          .when(col("p.sk").isNull, col("e.sk"))
          .otherwise(hll_union(col("e.sk"), col("p.sk"))).as("sk"))
    // stage before the dynamic overwrite: the merge READS the
    // partitions the write replaces
    merged.write.mode("overwrite").parquet(stagingPath)
    Sinks.writePartitioned(
      spark.read.parquet(stagingPath), tablePath, Seq("day"))
  }

  /** Start maintaining the sketch table from a streaming (ts,
    * user_id) source. Same checkpoint contract as [[UpsertSink]]. */
  def start(
      events: DataFrame,
      tablePath: String,
      stagingPath: String,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, tablePath, stagingPath)
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** q86's read side over the maintained table: trailing-`windowDays`
    * distinct-user estimates per stored day. Runs entirely on the
    * aggregated table (|days| rows). */
  def rollingEstimate(
      spark: SparkSession, tablePath: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"window must be at least one day, got $windowDays")
    val daily = spark.read.parquet(tablePath)
    daily.as("d").join(daily.as("s"),
        col("s.day").between(date_sub(col("d.day"), windowDays - 1), col("d.day")))
      .groupBy(col("d.day").as("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("s.sk")))
        .as("users_7d_est"))
  }
}
