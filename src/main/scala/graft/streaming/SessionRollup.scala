package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S4: gap-based sessionization as a native Structured Streaming
  * `session_window` aggregation — the streaming twin of the batch
  * `operators.Sessionize` (SparkEntry q34, oracle-checked), with the
  * same 30-minute-gap semantics: a session's window ends `gap` after
  * its last event, so `window.end − gap` equals the batch twin's
  * `session_end` exactly (microsecond timestamps, no float math).
  *
  * Scale: state is one open session per active user — merged and
  * evicted by the engine as the watermark passes; no per-event state.
  * `StreamingSpec` asserts stream ≡ batch on the same data.
  */
object SessionRollup {

  /** Per-user session aggregates over a `gap`-separated session
    * window. Emits (user_id, session_start, session_end, n_events) —
    * `session_end` is the last event's timestamp (window end minus
    * the gap), matching the batch sessionizer's column. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("__w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("__w.start").as("session_start"),
        (col("__w.end") - expr(s"INTERVAL $gap")).as("session_end"),
        col("n_events"))
}
