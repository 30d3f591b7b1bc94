package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for additive aggregates — the exact
  * counterpart of the sketch-table maintenance family
  * ([[graft.streaming.SketchTableSink]] merges HLL registers;
  * this merges counts and sums). Given a maintained group-level
  * aggregate and a change feed in [[Scd.snapshotDiff]]'s shape, the
  * new aggregate is the old one plus bounded delta contributions:
  * each changed row retracts its old measures from its old group and
  * asserts its new measures into its new group (group-dimension
  * migration falls out of treating the group columns as feed values —
  * a row moving groups is one retraction plus one assertion).
  *
  * Exactness: with DECIMAL measures the retract/assert algebra is
  * exact and commutative, so the maintained table equals a full
  * re-aggregation of the new snapshot BIT-FOR-BIT — which is what
  * makes the incremental path hash-oracle-able against the full
  * re-scan it exists to avoid (IvmSpec asserts the identity; q97
  * hash-checks it against DuckDB). Double measures would drift by
  * summation order and could only be compared under a tolerance.
  *
  * Scale: the merge plan is one union of the |groups|-row base with
  * two narrow projections of the |changes|-row feed, then ONE hash
  * aggregation on the group key — the fact table is never re-scanned,
  * which at 100 TB is the difference between a maintenance tick
  * bounded by the delta and a daily full-table pass.
  */
object Ivm {

  /** Apply a [[Scd.snapshotDiff]] change feed to a maintained
    * aggregate.
    *
    * `base` must carry exactly `groupCols`, a `countCol` row count,
    * and one summed column per `sumCols` entry (same names as the
    * snapshot measures). `diff` must carry `change_type` plus
    * `old_`/`new_`-prefixed columns for every name in
    * `groupCols ++ sumCols` — i.e. the snapshot's group dimensions
    * were passed to snapshotDiff as value columns. Groups whose
    * maintained count reaches zero are dropped (a re-aggregation
    * would not produce them); `unchanged` feed rows (if the feed was
    * built with `keepUnchanged = true`) are ignored.
    */
  def applyDiff(
      base: DataFrame,
      diff: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String],
      countCol: String): DataFrame = {
    val outCols = groupCols ++ (countCol +: sumCols)
    // negate() keeps the measure's exact type (decimal scale included)
    // where `* -1` would re-derive a wider precision
    def contrib(prefix: String, types: Seq[String], retract: Boolean) =
      diff.where(col("change_type").isin(types: _*))
        .select(
          groupCols.map(g => col(s"${prefix}_$g").as(g)) ++
            (lit(if (retract) -1L else 1L).as(countCol) +:
              sumCols.map { s =>
                val c = col(s"${prefix}_$s")
                (if (retract) negate(c) else c).as(s)
              }): _*)
    base.select(outCols.map(col): _*)
      .unionByName(contrib("old", Seq("update", "delete"), retract = true))
      .unionByName(contrib("new", Seq("update", "insert"), retract = false))
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(countCol).as(countCol),
        sumCols.map(s => sum(s).as(s)): _*)
      .where(col(countCol) =!= 0)
  }

  /** A [[Scd.snapshotDiff]] feed as SIGNED rows: deletes and the old
    * halves of updates carry `__sign` −1, inserts and new halves +1 —
    * the multiset-delta form join maintenance algebra works in. */
  def signedDelta(diff: DataFrame, cols: Seq[String]): DataFrame = {
    // snapshotDiff leaves its KEY columns unprefixed (coalesced across
    // sides); only value columns carry old_/new_ halves
    val prefixed = diff.columns.toSet
    def side(prefix: String, types: Seq[String], sign: Long) =
      diff.where(col("change_type").isin(types: _*))
        .select(cols.map { c =>
          if (prefixed(s"${prefix}_$c")) col(s"${prefix}_$c").as(c) else col(c)
        } :+ lit(sign).as("__sign"): _*)
    side("old", Seq("update", "delete"), -1L)
      .unionByName(side("new", Seq("update", "insert"), 1L))
  }

  /** Incrementally maintain an aggregate over an INNER EQUI-JOIN when
    * BOTH inputs change — the join extension of [[applyDiff]], the
    * textbook delta-join identity:
    *
    *   L₁⋈R₁ − L₀⋈R₀  =  ΔL⋈R₀ + L₁⋈ΔR
    *
    * (expand L₁ = L₀+ΔL, R₁ = R₀+ΔR and the ΔL⋈ΔR cross term lands in
    * the second join exactly once). Each delta-joined row contributes
    * its sign (product of sides — the non-delta side is +1) to the
    * maintained count and sign-adjusted measures to the sums; one
    * union + hash aggregation merges them into the base, `applyDiff`'s
    * plan shape.
    *
    * Exactness: DECIMAL measures make retract/assert commutative and
    * exact, so the maintained table equals a full re-aggregation of
    * L₁⋈R₁ bit-for-bit — IvmSpec asserts the identity, q129
    * hash-checks it against DuckDB running the recompute. Group
    * columns may come from EITHER side (a dimension attribute
    * changing migrates every joined fact row between groups — the
    * feed's update rows carry both halves, so migration is one
    * retraction plus one assertion per affected pair).
    *
    * Scale: the two delta joins shuffle |ΔL|+|ΔR| rows against ONE
    * pass over the other side's snapshot each — at 100 TB the fact
    * table is re-joined only against the (broadcastable) dimension
    * delta, never re-scanned for the unchanged mass, and the final
    * merge touches |groups| + |delta-joined| rows.
    *
    * `leftDiff` must carry old_/new_ values for `leftKey` and every
    * group/measure column owned by the left side; `rightDiff`
    * likewise for the right. Column names across the two sides must
    * be disjoint (the join output would otherwise be ambiguous).
    */
  def applyJoinDiff(
      base: DataFrame,
      leftDiff: DataFrame,
      leftNew: DataFrame,
      rightDiff: DataFrame,
      rightOld: DataFrame,
      leftKey: String,
      rightKey: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      countCol: String): DataFrame = {
    val leftSide = leftNew.columns.toSet
    val rightSide = rightOld.columns.toSet
    val joinedCols = groupCols ++ sumCols
    val lCols = leftKey +: joinedCols.filter(leftSide)
    val rCols = rightKey +: joinedCols.filter(rightSide)
    require(joinedCols.forall(c => leftSide(c) ^ rightSide(c)),
      "every group/measure column must live on exactly one side")

    val dLxR = signedDelta(leftDiff, lCols)
      .join(rightOld.select(rCols.map(col): _*), col(leftKey) === col(rightKey))
    val LxdR = leftNew.select(lCols.map(col): _*)
      .join(signedDelta(rightDiff, rCols), col(leftKey) === col(rightKey))
    val contribs = dLxR.unionByName(LxdR)
      .select(
        groupCols.map(col) ++
          (col("__sign").as(countCol) +:
            sumCols.map { s =>
              // negate() keeps exact decimal scale (applyDiff's rule)
              when(col("__sign") < 0, negate(col(s))).otherwise(col(s)).as(s)
            }): _*)

    base.select((groupCols ++ (countCol +: sumCols)).map(col): _*)
      .unionByName(contribs)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(countCol).as(countCol),
        sumCols.map(s => sum(s).as(s)): _*)
      .where(col(countCol) =!= 0)
  }
}
