package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) APPORTIONMENT — split an integer
  * budget across keys proportionally to integer weights, exactly:
  * every key gets floor(budget · w / W), and the seats the floors
  * left unfilled go one each to the largest remainders (ties on
  * remainder break by key ASC — deterministic, so the result is
  * oracle-checkable). The targets sum to the budget EXACTLY by
  * construction — the property float rounding cannot give and the
  * reason mixture budgeting needs apportionment, not multiplication.
  *
  * The input is a BOUNDED key-grain relation (languages, domains,
  * sources — the caller aggregates the corpus first), so the rank
  * and total windows run over k rows — the documented k-row
  * exception to the no-global-window rule; the corpus never passes
  * through this operator. */
object Apportion {

  /** @param weightCol non-negative integral weights (a zero-weight
    *   key receives only remainder seats, i.e. normally 0). The
    *   exact-sum property requires at least one POSITIVE weight —
    *   with every weight zero there is no proportion to follow and
    *   each key receives at most one remainder seat.
    * @return input columns + `outCol` (the key's integer share;
    *   Σ outCol = budget exactly when Σ weights > 0) */
  def largestRemainder(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      budget: Long,
      outCol: String = "target"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    // NB: Spark resolves column names case-INSENSITIVELY — the weight
    // and its total need names that differ beyond case
    val withTotals = df
      .withColumn("__w", col(weightCol).cast("long"))
      .withColumn("__wtot", greatest(
        sum(col("__w")).over(Window.partitionBy()), lit(1L)))
      .withColumn("__num", col("__w") * lit(budget))
      .withColumn("__base", expr("__num div __wtot"))
      .withColumn("__rem", expr("__num % __wtot"))
    val ranked = withTotals
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(keyCol).asc)).cast("long"))
      .withColumn("__left",
        lit(budget) - sum(col("__base")).over(Window.partitionBy()))
    ranked
      .withColumn(outCol,
        col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      .drop("__w", "__wtot", "__num", "__base", "__rem", "__rk", "__left")
  }
}
