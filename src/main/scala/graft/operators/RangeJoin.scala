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
  * callers with dates convert via `datediff`/`unix_date` first — see
  * q52. Binning is exact integer arithmetic (decimal floor-division,
  * never double `/`, whose 2^53 mantissa would silently mis-bin
  * nanosecond-epoch or block-height axes), and every interval is
  * guarded against exploding the bin fan-out: an open-ended sentinel
  * (hi = Long.MaxValue) or a binWidth far below the interval span
  * fails fast with a clear error instead of OOMing an executor inside
  * `sequence()`.
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
    * @param maxBinsPerInterval fail-fast ceiling on per-interval bin
    *                  replication; an interval spanning more bins
    *                  (sentinel hi, mis-sized binWidth) raises a
    *                  descriptive error on the executor instead of
    *                  materializing an unbounded `sequence()`
    */
  // true floor(c / binWidth) in EXACT integer arithmetic: integral
  // `div` truncates toward zero, so subtract 1 when a negative c
  // leaves a remainder (binWidth > 0 ⇒ remainder sign follows c).
  // No double division (rounds past 2^53) and no decimal division
  // (Spark adjusts decimal quotients to scale 6 with HALF_UP — a
  // value just below a bin boundary would round UP across it for
  // binWidth > 2e6). Pure long ops: exact and overflow-free for
  // every (c, binWidth ≥ 1) pair.
  private def bin(c: org.apache.spark.sql.Column, binWidth: Long) = {
    val cl = c.cast("long")
    call_function("div", cl, lit(binWidth)) -
      when(cl % binWidth < 0, lit(1L)).otherwise(lit(0L))
  }

  // interval side exploded to one row per overlapped bin, with the
  // fan-out guard folded INSIDE __bhi (not a dropped side column
  // Catalyst would prune away): sequence() only ever sees a bounded
  // upper bin
  private def explodeBins(
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      maxBinsPerInterval: Long): DataFrame =
    intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__blo", bin(col(loCol), binWidth))
      .withColumn("__bhi",
        // span compare in decimal: a long subtraction would WRAP for
        // a full-range interval at binWidth=1 (span ≈ 2^64 → negative
        // → guard silently passes), the exact case the guard exists for
        when(bin(col(hiCol), binWidth).cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(38, 0)) - col("__blo") < lit(maxBinsPerInterval),
          bin(col(hiCol), binWidth))
          .otherwise(raise_error(concat(
            lit(s"RangeJoin: interval [$loCol="), col(loCol).cast("string"),
            lit(s", $hiCol="), col(hiCol).cast("string"),
            lit(s"] spans more than $maxBinsPerInterval bins at binWidth=$binWidth — "
              + "open-ended sentinel bound or binWidth too small; widen binWidth, "
              + "cap hi, or raise maxBinsPerInterval"))).cast("long")))
      .withColumn("__bin", explode(sequence(col("__blo"), col("__bhi"))))
      .drop("__blo", "__bhi")

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      extraKeys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 1 << 16): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- extraKeys
    require(overlap.isEmpty,
      s"non-key columns present on both sides would collide: ${overlap.mkString(", ")}")

    val pts = points.withColumn("__bin", bin(col(pointCol), binWidth))
    val itv = explodeBins(intervals, loCol, hiCol, binWidth, maxBinsPerInterval)
    pts.join(itv, extraKeys :+ "__bin")
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join via the same bin rewrite: each
    * left row joined to every right row whose [rLo, rHi] intersects
    * its [lLo, lHi] (inclusive bounds, integral axis), matching
    * `extraKeys` equal when given. Output = left columns + right
    * columns.
    *
    * Both sides replicate to their overlapped bins; a candidate pair
    * then meets in EVERY bin the two bin ranges share, so the rewrite
    * dedupes structurally instead of with a distinct: the pair is
    * kept only in the bin containing `greatest(lLo, rLo)` — the
    * overlap's start, which for a true overlap lies in both sides'
    * bin ranges, so exactly one surviving copy exists and no
    * post-join dedupe shuffle is needed. Shuffle volume is both
    * sides' bin replication (span/binWidth + 1 each); pick binWidth
    * near the typical interval length of the DENSER side.
    *
    * Empty intervals (`lo > hi`) match NOTHING — the
    * [[pointInInterval]] convention; a bare theta condition would
    * still pair an empty interval whose bounds straddle the other
    * side's, so a naive-form oracle must filter them explicitly. */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lLoCol: String,
      lHiCol: String,
      rLoCol: String,
      rHiCol: String,
      binWidth: Long,
      extraKeys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 1 << 16): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val overlap = left.columns.toSet
      .intersect(right.columns.toSet) -- extraKeys
    require(overlap.isEmpty,
      s"non-key columns present on both sides would collide: ${overlap.mkString(", ")}")

    val l = explodeBins(left, lLoCol, lHiCol, binWidth, maxBinsPerInterval)
    val r = explodeBins(right, rLoCol, rHiCol, binWidth, maxBinsPerInterval)
    l.join(r, extraKeys :+ "__bin")
      .where(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
        col("__bin") === bin(greatest(col(lLoCol), col(rLoCol)), binWidth))
      .drop("__bin")
  }
}
