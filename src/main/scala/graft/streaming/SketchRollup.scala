package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S10: streaming approximate distinct-user rollup — the streaming
  * twin of q56's sketch aggregation.
  *
  * Exact streaming COUNT(DISTINCT) needs the full distinct-key set
  * as state (that is literally what [[DedupStream]]'s exact variant
  * keeps, deliberately); the HLL++ sketch inside
  * `approx_count_distinct` is the bounded-state alternative: per
  * (group) the state is a fixed few-KB register array that merges
  * micro-batch partials associatively — state size is independent of
  * stream length, which is the only distinct-count form an unbounded
  * stream can run forever. Because sketch union is commutative and
  * idempotent on register level, the streaming estimate equals the
  * batch estimate over the same rows EXACTLY (StreamingSpec asserts
  * equality, not tolerance).
  */
object SketchRollup {

  /** Complete-mode per-type approximate distinct users + row counts. */
  def distinctUsers(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct("user_id").as("approx_users"))
}
