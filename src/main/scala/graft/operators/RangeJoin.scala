package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join via bin bucketing.
  *
  * The naive plan for `points JOIN intervals ON p BETWEEN lo AND hi`
  * has no equi key, so Spark executes it as BroadcastNestedLoop (or a
  * cartesian product when neither side broadcasts) — O(|points| ×
  * |intervals|) comparisons and a single task when the broadcast side
  * is big. The bucketed form manufactures the equi key the optimizer
  * is missing: quantize the axis into fixed-width bins, route every
  * point to ITS bin and every interval to EACH bin it overlaps, join
  * on (extraKeys, bin), then apply the exact containment filter.
  *
  * - Shuffle volume: |points| + |intervals|·(span/width + 1) rows —
  *   replication is bounded by interval span over bin width, so pick
  *   `binWidth` near the TYPICAL interval length (replication ~2×).
  * - No duplicate pairs by construction: a point lives in exactly one
  *   bin, so each (point, interval) pair meets in exactly one task —
  *   no post-join dedupe pass.
  * - Parallelism: bins spread the axis across tasks even with no equi
  *   key at all; a hot bin (many points × many long intervals) is
  *   ordinary aggregate skew that AQE splits, not a single-task BNLJ.
  *
  * This is the same technique Databricks exposes as the range-join
  * bin hint and Flink/Trino implement for temporal joins; here it is
  * a plain DataFrame rewrite, so Catalyst sees a standard equi-join
  * (sort-merge or AQE-elected broadcast) plus a filter.
  *
  * Bounds are INCLUSIVE on both ends. Columns must be integral
  * (already-quantized axis: epoch days, epoch seconds, block heights);
  * callers with dates convert via `datediff` first — see q52.
  */
object RangeJoin {

  /** Join each point row to every interval row whose [lo, hi] contains
    * it (inclusive), matching `extraKeys` equal when given. Output =
    * point columns + interval columns (bin plumbing dropped).
    *
    * @param points    point side; `pointCol` integral
    * @param intervals interval side; `loCol`/`hiCol` integral; rows
    *                  with lo > hi are empty intervals and drop out
    * @param binWidth  bin size on the shared axis — set near the
    *                  typical interval length
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- extraKeys
    require(overlap.isEmpty,
      s"non-key columns present on both sides would collide: ${overlap.mkString(", ")}")

    def bin(c: org.apache.spark.sql.Column) = floor(c / binWidth)

    val pts = points.withColumn("__bin", bin(col(pointCol)))
    val itv = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))

    pts.join(itv, extraKeys :+ "__bin")
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }
}
