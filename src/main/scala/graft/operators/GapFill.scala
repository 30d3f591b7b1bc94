package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Calendar gap-filling with imputation lineage.
  *
  * Re-expresses the reference's fill_market_data_gaps
  * (core_coin_market_data.py:196-280), which loops per coin in Python,
  * as ONE distributed plan: per-key `sequence()` of dates + explode +
  * left join + `last(_, ignoreNulls)` forward-fill window. The explode
  * is bounded by calendar span (not data volume) and stays inside
  * whole-stage codegen; the only shuffle is the per-key window.
  */
object GapFill {

  /** Fill every key to a daily calendar ending at the global max date.
    *
    * @param df        input at (keys..., dateCol) grain, dateCol DateType
    * @param keys      partition keys (e.g. asset)
    * @param dateCol   date column name
    * @param ffillCols columns to forward-fill (price, market_cap, ...)
    * @param zeroCols  columns to fill with 0 (volume)
    * @return          df with all dates present, a `days_imputed` streak
    *                  counter (null on observed rows), filled metrics
    */
  def fillDaily(
      df: DataFrame,
      keys: Seq[String],
      dateCol: String,
      ffillCols: Seq[String],
      zeroCols: Seq[String]): DataFrame =
    fillAtGrain(df, keys, dateCol, ffillCols, zeroCols,
      step = "interval 1 day", streakCol = "days_imputed")

  /** Grain-generalized calendar fill — the reference hardcodes daily,
    * but the same plan serves any fixed step: weekly series fill with
    * `grain = "week"` (7-day steps from each key's first period),
    * hourly with `"hour"` over timestamp columns. Input must already
    * be AT the grain (e.g. date_trunc'd) — the step arithmetic
    * extends the observed lattice, it does not re-bucket. The streak
    * column is `periods_imputed`. */
  def fill(
      df: DataFrame,
      keys: Seq[String],
      dateCol: String,
      ffillCols: Seq[String],
      zeroCols: Seq[String],
      grain: String): DataFrame = {
    val steps = Map("day" -> "interval 1 day", "week" -> "interval 7 day",
      "hour" -> "interval 1 hour")
    val step = steps.getOrElse(grain.toLowerCase,
      throw new IllegalArgumentException(
        s"unsupported grain '$grain' (supported: ${steps.keys.mkString(", ")})"))
    fillAtGrain(df, keys, dateCol, ffillCols, zeroCols, step, "periods_imputed")
  }

  private def fillAtGrain(
      df: DataFrame,
      keys: Seq[String],
      dateCol: String,
      ffillCols: Seq[String],
      zeroCols: Seq[String],
      step: String,
      streakCol: String): DataFrame = {
    require(ffillCols.nonEmpty,
      "fillDaily needs >= 1 ffill column: its nulls mark which calendar rows are imputed")
    val keyCols = keys.map(col)

    // per-key first date; global last date (all keys filled through it)
    val bounds = df.groupBy(keyCols: _*).agg(min(dateCol).as("__d0"))
    val maxDate = df.agg(max(dateCol).as("__d1"))

    val calendar = bounds
      .crossJoin(broadcast(maxDate))
      .select(keyCols :+ explode(sequence(col("__d0"), col("__d1"), expr(step))).as(dateCol): _*)

    val joined = calendar.join(df, keys :+ dateCol, "left")

    val wOrd = Window.partitionBy(keyCols: _*).orderBy(dateCol)
    val marker = ffillCols.head // column whose nulls define the gaps
    // streak grouping: a new group starts on every observed row and on
    // the first missing row after an observed row (mirrors the pandas
    // cumsum(notnull | (isnull & shift.notnull)) trick)
    val grouped = joined.withColumn(
      "__grp",
      sum(
        when(col(marker).isNotNull || lag(col(marker), 1).over(wOrd).isNotNull, 1)
          .otherwise(0)).over(wOrd))

    val wGrp = Window.partitionBy(keyCols :+ col("__grp"): _*).orderBy(dateCol)
    val withStreak = grouped.withColumn(
      streakCol,
      when(col(marker).isNull, row_number().over(wGrp)).otherwise(lit(null)))

    val wFill = Window
      .partitionBy(keyCols: _*)
      .orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = ffillCols.foldLeft(withStreak) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(wFill))
    }
    val zeroed = zeroCols.foldLeft(filled) { (acc, c) =>
      acc.withColumn(c, coalesce(col(c), lit(0L)))
    }
    zeroed.drop("__grp")
  }
}
