package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval merging (gaps-and-islands) — the coverage
  * primitive behind exact sliding-window distinct counts (q85) and
  * the same shape as the reference's date-gap invariant
  * (dbt test_cCoinMarketData_no_date_gaps.sql asks whether a
  * coin's date intervals tile the calendar; merging is the
  * constructive form of that question).
  *
  * Shape at scale: one hash shuffle on the keys + per-partition sort,
  * two window passes over the SAME (keys)-partitioned spec, then the
  * island rollup — whose map-side partial collapses each island to
  * one row BEFORE its exchange, so the second shuffle moves islands,
  * not rows. No joins, no driver state. Island detection is the classic
  * running-max trick: a row starts a new island iff its start lies
  * beyond everything seen so far (prev rows' max end, +1 for
  * adjacency on integer/date axes). At 100 TB the only scaling axis
  * is per-key interval count, and the frame is rowsBetween — Spark
  * streams it without materializing the partition.
  */
object Intervals {

  /** Merge overlapping-or-adjacent `[startCol, endCol]` intervals per
    * key. Date or integral axes; closed intervals; `adjacency` is the
    * gap that still fuses two intervals (1 fuses [1,3] with [4,5];
    * 0 only fuses true overlap).
    *
    * @return one row per merged island: keys, startCol (min), endCol
    *   (max) — column names preserved */
  def merge(
      df: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      adjacency: Int = 1): DataFrame = {
    require(keys.nonEmpty, "interval merge needs at least one key")
    require(adjacency >= 0, s"adjacency must be non-negative, got $adjacency")
    val isDate = df.schema(startCol).dataType ==
      org.apache.spark.sql.types.DateType
    // a total order within key: ties on start are harmless (either
    // row may open the island; min/max below are order-insensitive)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(startCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val fuseHorizon =
      if (isDate) date_add(prevMax, adjacency)
      else prevMax + lit(adjacency.toLong)
    val flagged = df.withColumn("__new_island",
      when(col(startCol) > fuseHorizon || prevMax.isNull, 1L).otherwise(0L))
    val islands = flagged.withColumn("__island",
      sum(col("__new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    islands
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol))
      .drop("__island")
  }
}
