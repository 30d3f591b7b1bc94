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
}
