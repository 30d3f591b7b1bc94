package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S1: watermarked tumbling-window event rollup.
  *
  * Structured-Streaming form of the reference's daily market-data
  * grains (macro_trends / core_coin_market_data daily rollups): the
  * same plan runs over `spark.readStream` (incremental, stateful,
  * late data bounded by the watermark) and over a batch DataFrame —
  * the batch twin is `SparkEntry.q15DailyRollup`, which the DuckDB
  * oracle checks; `StreamingSpec` checks stream ≡ batch.
  *
  * Scale: state is one row per (event_type, day) window — bounded by
  * key-cardinality × retention, not event volume; the watermark lets
  * Spark drop window state once no late data can arrive.
  */
object EventRollup {

  /** Daily tumbling windows keyed by event_type, emitting the same
    * schema as the batch daily rollup. */
  def daily(events: DataFrame, watermark: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), "1 day").as("__w"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 6).as("sum_value"),
        round(min("value"), 6).as("min_value"),
        round(max("value"), 6).as("max_value"))
      .select(
        col("event_type"),
        to_date(col("__w.start")).as("date"),
        col("n_events"), col("sum_value"), col("min_value"), col("max_value"))
}
