package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence instance matching — MATCH_RECOGNIZE-lite.
  *
  * q39 answers the funnel at USER grain (does a user ever convert?);
  * the reference's analytics layer also wants the INSTANCE grain a
  * SQL MATCH_RECOGNIZE would give: every anchor event starts its own
  * potential instance, each later step binds to the FIRST qualifying
  * event strictly after the previous step, and a per-step gap cap
  * fails the instance when the first candidate arrives too late (no
  * backtracking — the greedy `A B* C` subset that covers funnel
  * timing, attribution windows, and session chains).
  *
  * Spark-first shape: one [[AsOfJoin.asOfForward]] per step — each a
  * single hash shuffle on the sequence keys, the union+running-window
  * plan — so an n-step chain is n keyed shuffles over the (smaller)
  * step-event streams, never a per-key cross product. "Strictly
  * after" rides the probe axis as +1 microsecond (timestamps are
  * microsecond-grained, so at-or-after t+1µs ≡ after t exactly), and
  * the gap cap is exact integer microsecond arithmetic — both
  * re-derivable verbatim by a SQL oracle (q102).
  *
  * Instances whose previous step already failed are CARRIED AROUND
  * each join (union of the null-step rows with the joined survivors),
  * so the output keeps one row per anchor with nulls from the first
  * failed step onward — the LEFT-join semantics MATCH_RECOGNIZE's
  * `ONE ROW PER MATCH WITH UNMATCHED ROWS` would give.
  *
  * Determinism: ties (two step events at the same microsecond) bind
  * to the same minimal timestamp, so emitted step TIMES are unique
  * per instance even when the tying event rows are not — the output
  * never depends on partition order.
  */
object Sequence {

  /** One step of the chain: events satisfying `predicate`, bound to
    * the first occurrence strictly after the previous step, failing
    * the instance when later than `maxGapMicros` after it.
    * `outCol` names the emitted step-time column. */
  final case class Step(outCol: String, predicate: Column, maxGapMicros: Long)

  /** Match `steps` forward from every `anchorPredicate` event.
    *
    * @param events   the event stream; `keys` + `timeCol` + whatever
    *                 the predicates read
    * @param keys     sequence identity (per-user chains: user_id)
    * @param timeCol  microsecond-precision timestamp column
    * @param anchorCols columns of the anchor event to carry through
    *                 (besides `keys` and the anchor time)
    * @return one row per anchor event: `keys`, `anchorCols`,
    *         `t0` (anchor time), one timestamp column per step
    */
  def funnelInstances(
      events: DataFrame,
      keys: Seq[String],
      timeCol: String,
      anchorPredicate: Column,
      anchorCols: Seq[String],
      steps: Seq[Step]): DataFrame = {
    require(steps.nonEmpty, "a sequence needs at least one step")
    val stepCols = steps.map(_.outCol)
    require(stepCols.distinct == stepCols, "step output columns must be distinct")

    val anchors = events.where(anchorPredicate)
      .select((keys ++ anchorCols).map(col) :+ col(timeCol).as("t0"): _*)

    steps.foldLeft((anchors, "t0")) { case ((acc, prevT), step) =>
      // only live instances probe; failed ones ride the union back
      val live = acc.where(col(prevT).isNotNull)
        .withColumn("__probe_t", col(prevT) + expr("INTERVAL 1 MICROSECOND"))
      val dead = acc.where(col(prevT).isNull)
        .withColumn(step.outCol, lit(null).cast("timestamp"))
      val quotes = events.where(step.predicate)
        .select(keys.map(col) :+ col(timeCol).as(step.outCol): _*)
      val joined = AsOfJoin.asOfForward(
          live, quotes, keys, "__probe_t", step.outCol, payload = Nil)
        .withColumn(step.outCol,
          when(unix_micros(col(step.outCol)) - unix_micros(col(prevT))
            <= step.maxGapMicros, col(step.outCol)))
        .drop("__probe_t")
      (joined.unionByName(dead.drop("__probe_t"), allowMissingColumns = false),
        step.outCol)
    }._1
  }

  /** LONGEST-match variant: each step binds the LAST qualifying
    * event inside its window `(prev, prev + maxGap]` — the greedy
    * tail MATCH_RECOGNIZE's `B*` reluctant/greedy distinction is
    * about. Semantics differ from [[funnelInstances]] in two ways:
    * the bound time is the window's last qualifier (not its first),
    * and an out-of-gap qualifier can never fail-fast an instance
    * that has an in-window qualifier (there is no "first candidate
    * arrived too late" — only "no candidate in the window"). Same
    * plan shape: one BACKWARD as-of join per step, probing at the
    * window's deadline — a single keyed shuffle each. */
  def funnelInstancesLongest(
      events: DataFrame,
      keys: Seq[String],
      timeCol: String,
      anchorPredicate: Column,
      anchorCols: Seq[String],
      steps: Seq[Step]): DataFrame = {
    require(steps.nonEmpty, "a sequence needs at least one step")
    val stepCols = steps.map(_.outCol)
    require(stepCols.distinct == stepCols, "step output columns must be distinct")

    val anchors = events.where(anchorPredicate)
      .select((keys ++ anchorCols).map(col) :+ col(timeCol).as("t0"): _*)

    steps.foldLeft((anchors, "t0")) { case ((acc, prevT), step) =>
      val live = acc.where(col(prevT).isNotNull)
        .withColumn("__probe_t",
          timestamp_micros(unix_micros(col(prevT)) + step.maxGapMicros))
      val dead = acc.where(col(prevT).isNull)
        .withColumn(step.outCol, lit(null).cast("timestamp"))
      val quotes = events.where(step.predicate)
        .select(keys.map(col) :+ col(timeCol).as(step.outCol): _*)
      // backward-inclusive as-of at the deadline = the LAST qualifier
      // ≤ prev + gap; strictly-after enforced by nulling ≤ prev
      val joined = AsOfJoin.asOf(
          live, quotes, keys, "__probe_t", step.outCol, payload = Nil)
        .withColumn(step.outCol,
          when(col(step.outCol) > col(prevT), col(step.outCol)))
        .drop("__probe_t")
      (joined.unionByName(dead.drop("__probe_t"), allowMissingColumns = false),
        step.outCol)
    }._1
  }
}
