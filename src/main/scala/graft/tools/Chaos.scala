package graft.tools

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.util.LongAccumulator

/** Failure injection for task-retry determinism testing.
  *
  * Every operator in this library claims deterministic output under
  * task re-execution — the cluster reality behind speculative
  * execution, executor loss, and preemption, where one task of a
  * stage reruns while its siblings' results stand. That claim is only
  * testable by actually killing tasks: [[failFirstAttempt]] wraps a
  * DataFrame with a pass-through barrier that throws on the FIRST
  * attempt of each task and lets every retry through, so a query built
  * on the wrapped input exercises Spark's retry path end-to-end
  * (lineage recompute, shuffle-file reuse, exactly-one-result
  * commit). ChaosSpec asserts the output equals the clean run
  * row-for-row.
  *
  * Needs a scheduler that retries at all: plain `local[N]` runs with
  * maxFailures=1 and fails the JOB on the first throw — use the
  * `local[N,F]` master form (F ≥ 2). On a real cluster
  * spark.task.maxFailures (default 4) already covers it.
  *
  * The barrier is a narrow mapPartitions: it adds no exchange and
  * rides inside whatever stage evaluates the wrapped frame, so the
  * failure lands in that stage's own task. If the wrapped frame feeds
  * several jobs (e.g. an operator that first collects partition
  * totals, then folds), EACH evaluation trips the injection once —
  * retries are counted, not assumed.
  *
  * Reference behavior protected: the always-on ingestion loops
  * (dune_transfers_updates, core_coin_wallet_profits_orchestrator)
  * rerun failed work wholesale; a Spark port must survive PARTIAL
  * rerun, which is the stricter contract.
  */
object Chaos {

  /** Wrap `df` so EVERY task evaluating it throws on attempt 0 and
    * passes rows through untouched on every retry. Failing all tasks
    * (not one numbered partition) keeps the injection immune to stage
    * partition renumbering — a union branch's tasks don't own stage
    * partition 0, so a single-partition trigger can silently never
    * fire.
    *
    * @return the wrapped frame plus an accumulator counting SUCCESSFUL
    *   re-attempts (user accumulators from failed attempts are dropped
    *   by the scheduler, so counting retries — not failures — is what
    *   a successful job can observe). Assert it is ≥ 1 after the
    *   action, or the spec proved nothing. */
  def failFirstAttempt(df: DataFrame): (DataFrame, LongAccumulator) = {
    val acc = df.sparkSession.sparkContext.longAccumulator("graft.chaos.retries")
    val out = df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null) {
        if (tc.attemptNumber() == 0)
          throw new ChaosException(
            s"injected first-attempt failure (partition ${tc.partitionId()}, stage ${tc.stageId()})")
        acc.add(1L)
      }
      it
    }(Encoders.row(df.schema))
    (out, acc)
  }
}

/** Marker type so a spec (or log reader) can tell an injected failure
  * from a real one. */
class ChaosException(msg: String) extends RuntimeException(msg)
