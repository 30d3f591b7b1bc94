package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Publish

/** S17: incremental maintenance of q86's per-day HLL sketch table —
  * the streaming path that makes windowed distinct counts never
  * rescan history.
  *
  * Each micro-batch is collapsed to per-day sketch PARTIALS, merged
  * with the live table (`hll_union` on touched days, pass-through on
  * the rest), and the result is committed through
  * [[graft.sources.Publish]]: a fresh immutable version directory and
  * one atomic pointer flip. An earlier revision rewrote only the
  * touched `day=` partitions in place (the [[UpsertSink]]
  * pruned-refresh idiom) — O(touched days) of write instead of
  * O(|days|) — but a dynamic-partition overwrite is not
  * crash-atomic: die between "old partition files removed" and "new
  * ones landed" and the day's accumulated registers are simply gone,
  * after which a replayed batch re-seeds the day with only its own
  * partial — a silent undercount the register-max idempotency
  * argument cannot repair, because the damage happened OUTSIDE the
  * merge algebra. The sketch table is the aggregate itself (|days|
  * rows, KB-scale sketches — at 100 TB of facts it is still only
  * |days| rows), so full-version publication costs nothing
  * measurable and buys a real commit point: readers see the old
  * version or the new one, never a torn day.
  *
  * On top of that crash-atomic commit, the exactly-once story stays
  * ALGEBRAIC, stronger than S7's keep-newest idempotency: HLL union
  * is register-wise max, so merging a batch's partial into a table
  * that already contains it is a no-op — at-least-once delivery
  * composes with an idempotent, commutative merge into exactly-once
  * ESTIMATES, with no transaction log consulted. And because register
  * max is order-insensitive, the maintained table reaches the same
  * REGISTER STATE as a batch build over the same rows regardless of
  * how the stream was chopped into batches (serialized sketch bytes
  * may differ by representation mode; the registers, and with them
  * every post-union estimate, do not) — `StreamingSpec` asserts
  * estimate EQUALITY, not tolerance. The reference's always-on
  * pullers (coingecko_market_data.py:317-380) land raw rows and
  * re-aggregate; this sink lands the aggregate itself, which is what
  * survives an unbounded stream.
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

  /** Merge one batch's partials into the published sketch table and
    * atomically promote the result. Public and directly callable:
    * foreachBatch delegates here, and the replay / idempotency tests
    * exercise it without streaming machinery. */
  def mergeBatch(batch: DataFrame, tableRoot: String): Unit = {
    val spark = batch.sparkSession
    val partial = dailySketches(batch)
    Publish.currentVersion(tableRoot) match {
      case None =>
        Publish.publish(partial, tableRoot): Unit
      case Some(_) =>
        val existing = Publish.read(spark, tableRoot)
        val merged = existing.as("e")
          .join(partial.as("p"), Seq("day"), "full_outer")
          .select(col("day"),
            when(col("e.sk").isNull, col("p.sk"))
              .when(col("p.sk").isNull, col("e.sk"))
              .otherwise(hll_union(col("e.sk"), col("p.sk"))).as("sk"))
        Publish.publish(merged, tableRoot)
        // retention: live + one superseded version (the in-flight
        // reader window); unbounded version growth is the one cost a
        // per-batch publish could otherwise accumulate
        Publish.vacuum(tableRoot, keep = 1): Unit
    }
  }

  /** Start maintaining the sketch table from a streaming (ts,
    * user_id) source. Same checkpoint contract as [[UpsertSink]]. */
  def start(
      events: DataFrame,
      tableRoot: String,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, tableRoot)
      }
    checkpointLocation.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** q86's read side over the maintained table: trailing-`windowDays`
    * distinct-user estimates per stored day. Runs entirely on the
    * aggregated table (|days| rows). Accepts either a [[Publish]]
    * root (resolved through the live pointer) or a plain parquet
    * table — the batch twin in the spec is the latter. */
  def rollingEstimate(
      spark: SparkSession, tablePath: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"window must be at least one day, got $windowDays")
    val daily = Publish.currentVersion(tablePath)
      .map(_ => Publish.read(spark, tablePath))
      .getOrElse(spark.read.parquet(tablePath))
    daily.as("d").join(daily.as("s"),
        col("s.day").between(date_sub(col("d.day"), windowDays - 1), col("d.day")))
      .groupBy(col("d.day").as("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("s.sk")))
        .as("users_7d_est"))
  }
}
