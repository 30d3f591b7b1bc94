package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Balance-quality cohort filters and whale-size classification.
  *
  * Spark forms of the reference's data-quality gates on
  * core.coin_wallet_transfers (core_coin_wallet_transfers.py:306-390)
  * and the whale-chart size bucketing (dreambot_whale_chart.py:370-436).
  */
object Balances {

  /** Drop (key, wallet) pairs whose balance ever dips below -tolerance,
    * and drop EVERY wallet of a key when more than `maxNegativeShare`
    * of its wallets are negative (data-quality signal that the key's
    * source feed is broken). Two aggregations over the same
    * (key, wallet) grain — Catalyst reuses the exchange; the per-key
    * rollup is a map-side-combined second agg.
    */
  def negativeBalanceCohortFilter(
      df: DataFrame,
      keyCol: String,
      walletCol: String,
      balanceCol: String,
      tolerance: Double = 0.1,
      maxNegativeShare: Double = 0.5): DataFrame = {
    val pairStats = df
      .groupBy(keyCol, walletCol)
      .agg(min(balanceCol).as("__lowest"))

    val keyStats = pairStats
      .groupBy(keyCol)
      .agg(
        count(walletCol).as("__wallets"),
        count(when(col("__lowest") < -tolerance, 1)).as("__neg_wallets"))

    df.join(pairStats, Seq(keyCol, walletCol))
      .join(keyStats, Seq(keyCol))
      .where(col("__lowest") > -tolerance &&
        col("__neg_wallets") < col("__wallets") * maxNegativeShare)
      .drop("__lowest", "__wallets", "__neg_wallets")
  }

  /** Drop (key, wallet) pairs whose balance ever exceeded the key's
    * total supply, and every wallet of a key with ≥ maxOverageWallets
    * such wallets (bad-supply-metadata signal;
    * core_coin_wallet_transfers.py:334-385). supply is a per-key dim
    * (broadcast-size) joined once; both exclusion sets are anti-joins
    * on the fact's natural keys. */
  def supplyOverageFilter(
      df: DataFrame,
      supply: DataFrame,
      keyCol: String,
      walletCol: String,
      balanceCol: String,
      supplyCol: String,
      maxOverageWallets: Int = 5): DataFrame = {
    // threshold on the ROUNDED balance: the raw window sum's last bits
    // are accumulation-order-dependent, so a balance lying exactly on
    // the supply cutoff could classify differently across engines
    val overagePairs = df
      .join(broadcast(supply), Seq(keyCol))
      .where(round(col(balanceCol), 6) > col(supplyCol))
      .select(keyCol, walletCol)
      .distinct()
    val overageKeys = overagePairs
      .groupBy(keyCol)
      .agg(count(lit(1)).as("__overage_wallets"))
      .where(col("__overage_wallets") >= maxOverageWallets)
      .select(keyCol)
    df.join(overagePairs, Seq(keyCol, walletCol), "left_anti")
      .join(overageKeys, Seq(keyCol), "left_anti")
  }

  /** Classify a balance into small/medium/whale buckets with
    * pd.cut-compatible right-closed bins: (-inf, small] / (small,
    * whale] / (whale, inf). */
  def sizeBucket(balanceCol: String, smallMax: Double, whaleMin: Double) =
    // null balance → null bucket (counted nowhere); without the guard
    // the otherwise-branch would count every missing balance as a whale
    when(col(balanceCol).isNull, lit(null))
      .when(col(balanceCol) <= smallMax, "small_wallets")
      .when(col(balanceCol) <= whaleMin, "medium_wallets")
      .otherwise("whale_wallets")

  /** Daily counts of small/medium/whale wallets per key.
    *
    * Expects a dense daily (key, wallet, date, balance) input (use
    * GapFill.fillDaily upstream to forward-fill balances — the Spark
    * equivalent of the reference's pivot+ffill, which materializes a
    * wallet×date matrix in pandas and cannot scale; this stays at the
    * (key, wallet, date) grain and aggregates distributively).
    */
  def whaleCounts(
      dense: DataFrame,
      keyCol: String,
      dateCol: String,
      balanceCol: String,
      smallMax: Double,
      whaleMin: Double): DataFrame = {
    dense
      .withColumn("__bucket", sizeBucket(balanceCol, smallMax, whaleMin))
      .groupBy(col(keyCol), col(dateCol))
      .agg(
        count(when(col("__bucket") === "small_wallets", 1)).as("small_wallets"),
        count(when(col("__bucket") === "medium_wallets", 1)).as("medium_wallets"),
        count(when(col("__bucket") === "whale_wallets", 1)).as("whale_wallets"))
  }
}
