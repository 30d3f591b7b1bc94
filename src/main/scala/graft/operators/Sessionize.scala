package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization of an event stream.
  *
  * Classic two-window pattern: a boundary flag (gap to previous event
  * exceeds the timeout) cumulative-summed into a per-user session id
  * — both windows share one (user) shuffle, Catalyst stacks them on a
  * single sort. Session stats are then an ordinary aggregation. The
  * streaming twin of this shape is `session_window` in Structured
  * Streaming; this is the batch/backfill form.
  */
object Sessionize {

  /** @param events     input with userCol + tsCol (+ tiebreak cols)
    * @param gap         max silence inside one session
    * @param order       total order within a user (ts first, then a
    *                    unique tiebreaker for deterministic ids)
    * @return per (user, session_id): n_events, session_start/end,
    *         duration_us
    */
  def sessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      order: Seq[Column],
      gap: Column = expr("INTERVAL 30 MINUTES")): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn(
        "__new_session",
        when(col("__prev_ts").isNull || col(tsCol) > col("__prev_ts") + gap, 1).otherwise(0))
      .withColumn("session_id", sum("__new_session").over(w))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(tsCol).as("session_start"),
        max(tsCol).as("session_end"))
      .withColumn(
        "duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
  }
}
