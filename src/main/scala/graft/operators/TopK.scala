package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Heavy hitters: who dominates each group.
  *
  * The reference's whale analytics answer this exactly (whale-bucket
  * counts, top wallets per coin — dreambot_whale_chart.py); at
  * 100 TB the same question splits into two shapes:
  *
  *   - [[exact]]: one hash shuffle to count (key, group) pairs, then
  *     a rank kept ≤ k by the WindowGroupLimit pushdown — no global
  *     sort, no driver materialization. This is the right default
  *     whenever the DISTINCT KEY universe per group fits a shuffle,
  *     which at 100 TB it usually still does (counts compress the
  *     fact table by orders of magnitude before the window runs).
  *   - [[countMinEstimates]]: the sketch form for when even the
  *     distinct-key counts are too wide — a count_min_sketch
  *     aggregate builds fixed-width (eps, confidence) summaries with
  *     map-side partial merge (the same mergeability that makes HLL
  *     the only COUNT(DISTINCT) that survives 100 TB, q56), probed
  *     for a bounded candidate set. Estimates overcount by at most
  *     eps·N with the configured confidence, never undercount.
  *
  * The sketches and the candidate set are both tiny by construction
  * (one sketch per group, k rows per group), so the driver-side probe
  * is a bounded dim-probe like Ann's limit(1) dimension reads — the
  * counting and sketch building stay distributed.
  */
object TopK {

  /** Exact top-k keys per group by count; ties broken by key for
    * engine-reproducible output. Emits (groupCols*, keyCol, cnt, rk). */
  def exact(df: DataFrame, groupCols: Seq[String], keyCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val counted = df.groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("cnt").desc, col(keyCol).asc)
    counted
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
  }

  /** Count-min estimates for the exact top-k candidates: emits
    * (groupCol, keyCol, cnt, rk, est_cnt). `est_cnt ≥ cnt` always;
    * `est_cnt ≤ cnt + eps·N(group)` with the configured confidence.
    * The key column must be integral (the sketch hashes longs). */
  def countMinEstimates(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    val candidates = exact(df, Seq(groupCol), keyCol, k)
    // one fixed-width sketch per group — bounded by the group
    // universe, collected as a dim probe
    val sketches: Map[Any, CountMinSketch] =
      df.groupBy(groupCol)
        .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed))
          .as("cms"))
        .collect()
        .map(r => r.get(0) -> CountMinSketch.readFrom(r.getAs[Array[Byte]](1)))
        .toMap
    // candidate set is ≤ k per group — probe driver-side, rebuild
    val probed = candidates.collect().map { r =>
      val est = sketches(r.getAs[Any](groupCol))
        .estimateCount(r.getAs[Long](keyCol))
      Row.fromSeq(r.toSeq :+ est)
    }
    val schema = org.apache.spark.sql.types.StructType(
      candidates.schema.fields :+
        org.apache.spark.sql.types.StructField(
          "est_cnt", org.apache.spark.sql.types.LongType, nullable = false))
    spark.createDataFrame(
      spark.sparkContext.parallelize(probed.toIndexedSeq, 1), schema)
  }
}
