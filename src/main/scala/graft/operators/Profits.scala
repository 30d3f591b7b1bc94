package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Flagship operator: wallet-level profitability.
  *
  * Re-expresses the reference's core_coin_wallet_profits pipeline
  * (core_coin_wallet_profits.py:235-634) — which runs per-batch in
  * pandas with manual memory management — as one declarative Spark
  * plan over the full dataset:
  *
  *   1. left-join daily transfers × daily prices        (merge_prices_and_transfers)
  *   2. attach each asset's first price date/value      (add_first_price_info)
  *   3. impute a synthetic transfer-in on the first
  *      price date for wallets whose history predates
  *      price coverage                                  (create_imputed_records)
  *   4. rewrite each pair's earliest record to a full
  *      balance transfer-in, drop pre-price rows        (append_imputed_records)
  *   5. drop rows before the first positive inflow      (filter_pre_inflow_records)
  *   6. lag/cumsum profit math                          (calculate_wallet_profitability)
  *
  * Scale notes: every step is either a broadcast join against per-asset
  * aggregates (tiny) or a window over (asset, wallet) — the same
  * hash-partitioning reused across steps 3-6, so the whole pipeline is
  * ONE big shuffle on (asset, wallet) plus a broadcast. No driver-side
  * batching; AQE handles skewed assets.
  */
object Profits {

  /** @param transfers (asset, wallet, date, net_transfers, balance)
    * @param prices    (asset, date, price)
    * @return per (asset, wallet, date): profits_change,
    *         profits_cumulative, usd_balance, usd_net_transfers,
    *         usd_inflows, usd_inflows_cumulative
    */
  def walletProfits(transfers: DataFrame, prices: DataFrame): DataFrame = {
    // ---- step 2 first: first price info per asset — ONE aggregation
    //      (min_by), no self-join, broadcast-size result
    val firstPrices = prices
      .groupBy("asset")
      .agg(
        min("date").as("first_price_date"),
        min_by(col("price"), col("date")).as("first_price"))

    // ---- step 1: merge; the single shared intermediate every later
    //      step reads. Persisted because two branches (priced rows,
    //      imputation extraction) consume it — without this, each
    //      branch re-derives the full transfers subtree from the raw
    //      events, which at 100 TB means re-scanning the fact table
    //      per branch. MEMORY_AND_DISK ≈ a pipeline temp table.
    //      Lifecycle: the operator cannot know when its result is
    //      consumed, so it registers with CacheScope instead of
    //      unpersisting; callers release via CacheScope.releaseAll
    //      between pipeline runs (Bench and Verify do).
    val withFirst = transfers
      .join(prices, Seq("asset", "date"), "left")
      .join(broadcast(firstPrices), Seq("asset"), "left")
      .transform(graft.CacheScope.persisted(_))

    // ---- step 3: imputed records for pre-price wallets, extracted
    //      with windows over the SAME (asset, wallet) partitioning as
    //      every later step (one shuffle, reused):
    //      a pair needs imputation iff it has pre-price rows and no
    //      row exactly on the first price date; its last pre-price
    //      balance becomes a synthetic transfer-in at that date.
    val wPair = Window.partitionBy("asset", "wallet")
    val wDesc = Window.partitionBy("asset", "wallet").orderBy(col("date").desc)
    val imputed = withFirst
      .withColumn(
        "__active_fpd",
        max(when(col("date") === col("first_price_date"), 1).otherwise(0)).over(wPair))
      .where(col("date") < col("first_price_date") && col("__active_fpd") === 0)
      .withColumn("__rn", row_number().over(wDesc))
      .where(col("__rn") === 1)
      .select(
        col("asset"),
        col("wallet"),
        col("first_price_date").as("date"),
        col("balance").as("net_transfers"),
        col("balance"),
        col("first_price").as("price"))

    // ---- step 4: keep priced rows + imputed; earliest row per pair
    //      becomes a full-balance transfer-in
    val priced = withFirst
      .where(col("price").isNotNull)
      .select("asset", "wallet", "date", "net_transfers", "balance", "price")
    val combined = priced.unionByName(imputed)

    val wAsc = Window.partitionBy("asset", "wallet").orderBy("date")
    val rebased = combined
      .withColumn("__rn", row_number().over(wAsc))
      .withColumn(
        "net_transfers",
        when(col("__rn") === 1, col("balance")).otherwise(col("net_transfers")))
      .drop("__rn")

    // ---- step 5: drop rows before the first positive inflow
    val preInflowFiltered = rebased
      .withColumn(
        "__inflows_cum",
        sum(greatest(col("net_transfers"), lit(0.0))).over(wAsc))
      .where(col("__inflows_cum") > 0)
      .drop("__inflows_cum")

    // ---- step 6: profit math (lag + cumsum over the same window)
    val prevPrice   = coalesce(lag("price", 1).over(wAsc), col("price"))
    val prevBalance = coalesce(lag("balance", 1).over(wAsc), lit(0.0))

    preInflowFiltered
      .withColumn("profits_change", (col("price") - prevPrice) * prevBalance)
      .withColumn("profits_cumulative", sum("profits_change").over(wAsc))
      .withColumn("usd_balance", col("balance") * col("price"))
      .withColumn("usd_net_transfers", col("net_transfers") * col("price"))
      .withColumn(
        "usd_inflows",
        when(col("usd_net_transfers") > 0, col("usd_net_transfers")).otherwise(lit(0.0)))
      .withColumn("usd_inflows_cumulative", sum("usd_inflows").over(wAsc))
      .select(
        col("asset"),
        col("wallet"),
        col("date"),
        round(col("profits_change"), 6).as("profits_change"),
        round(col("profits_cumulative"), 6).as("profits_cumulative"),
        round(col("usd_balance"), 6).as("usd_balance"),
        round(col("usd_net_transfers"), 6).as("usd_net_transfers"),
        round(col("usd_inflows"), 6).as("usd_inflows"),
        round(col("usd_inflows_cumulative"), 6).as("usd_inflows_cumulative"))
  }
}
