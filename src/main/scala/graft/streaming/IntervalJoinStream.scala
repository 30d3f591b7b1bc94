package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S9: stream-stream event-time interval join — each purchase joined
  * to EVERY signup of the same user inside a bounded lookback window
  * (one output row per qualifying (purchase, signup) pair — the raw
  * interval-join relation; a consumer wanting exactly one attribution
  * per purchase applies `max_by(s_ts)` per purchase_id downstream,
  * where it can pick its own tie policy).
  *
  * This is the streaming twin of the batch attribution join (q39's
  * funnel edge / q51's as-of lookup shape) expressed through Spark's
  * native stream-stream join machinery: BOTH sides are unbounded
  * streams, and the event-time range condition plus watermarks is
  * what makes the join's state FINITE — Spark derives from
  * `s.ts BETWEEN p.ts - lookback AND p.ts` that a buffered signup
  * older than (watermark − lookback) can never match a future
  * purchase and evicts it. Without the range condition the state
  * grows without bound and the query is rejected for append mode.
  *
  * Scale: state per key is O(events within the lookback window), the
  * same bound a 1000-executor cluster needs — the join shuffles both
  * streams on user_id once, and eviction is driven by event time,
  * not memory pressure.
  */
object IntervalJoinStream {

  /** Inner interval join: purchases × signups on user_id with
    * `signup.ts ∈ [purchase.ts − lookback, purchase.ts]`.
    *
    * @param events    streaming (or batch, for the twin check)
    *                  DataFrame with event_id/ts/user_id/event_type/value
    * @param lookback  SQL interval string, e.g. "7 days"
    * @param watermark max lateness bound on both sides
    */
  def purchaseAttribution(
      events: DataFrame,
      lookback: String = "7 days",
      watermark: String = "1 day"): DataFrame = {
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"),
        col("user_id"), col("value"))
      .withWatermark("p_ts", watermark)
    val signups = events
      .where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("s_ts"),
        col("user_id"))
      .withWatermark("s_ts", watermark)
    purchases.join(
      signups,
      purchases("user_id") === signups("user_id") &&
        col("s_ts") >= col("p_ts") - expr(s"INTERVAL $lookback") &&
        col("s_ts") <= col("p_ts"))
      .select(col("purchase_id"), purchases("user_id").as("user_id"),
        col("p_ts"), col("signup_id"), col("s_ts"), col("value"))
  }
}
