package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series outlier removal.
  *
  * Spark form of remove_single_day_dips
  * (core_coin_market_data.py:141-194): drop rows where the price
  * crashes ≥ dipThreshold vs the previous day and recovers to
  * ≥ recoveryThreshold of it the next day, plus isolated zero prices
  * flanked by positive ones. lag/lead over one per-key window — a
  * single shuffle, no self-joins.
  */
object Outliers {

  def removeSingleDayDips(
      df: DataFrame,
      keys: Seq[String],
      dateCol: String,
      priceCol: String,
      dipThreshold: Double = 0.8,
      recoveryThreshold: Double = 0.9): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(dateCol)
    val p    = col(priceCol)
    val prev = lag(p, 1).over(w)
    val next = lead(p, 1).over(w)

    // nullif guards prev == 0: ANSI mode would raise DIVIDE_BY_ZERO,
    // while the reference's pandas inf/NaN comparisons land on "keep
    // the row" — null comparisons below coalesce to the same outcome
    val prevNz = nullif(prev, lit(0))
    val pctDip = (p / prevNz < dipThreshold) && (next / prevNz > recoveryThreshold)
    val zeroDip = (p === 0) && (prev > 0) && (next > 0) && (next / prevNz > recoveryThreshold)

    // null lag/lead (series edges) make the comparisons null ⇒ kept,
    // matching the pandas NaN-comparison-is-False behavior under ~mask
    df.withColumn("__dip", coalesce(pctDip || zeroDip, lit(false)))
      .where(!col("__dip"))
      .drop("__dip")
  }
}
