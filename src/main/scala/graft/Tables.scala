package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Typed loaders for the driver-generated star schema plus the
  * derived "transfers"/"prices" views that map the reference's data
  * model (coin_wallet_transfers / coin_market_data — see
  * /root/reference/cloud_functions/core_coin_wallet_transfers and
  * core_coin_market_data) onto the synthetic `events` table.
  *
  * Mapping: event_type → asset (coin), user_id → wallet, day(ts) →
  * date, value → transfer amount with a deterministic sign flip
  * (event_id % 3 == 0 ⇒ outflow) so running balances can go negative
  * the way real transfer data does.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize the generator's event-time column to a session-zone
    * TIMESTAMP whatever physical form the parquet carries:
    *  - TIMESTAMP(NANOS) (Spark has no nanos type; with
    *    spark.sql.legacy.parquet.nanosAsLong=true it arrives as
    *    epoch-nanos int64) → microsecond timestamp, ordering- and
    *    day-truncation-preserving;
    *  - µs timestamp WITHOUT isAdjustedToUTC (a regenerated testdata
    *    vintage) → Spark 4 infers TIMESTAMP_NTZ, which type-strict
    *    time functions (unix_micros, session_window) reject — cast to
    *    TIMESTAMP, a pure reinterpretation under the UTC session zone
    *    (GraftSession pins it) and exactly how the DuckDB oracle
    *    reads the same bytes (naive timestamp). */
  private def nanosToTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer div, not `/` (double division): epoch-nanos ~1.7e18
        // exceed double's 2^53 exact range, and a 256ns ulp error could
        // flip a microsecond (ordering ties, midnight day boundaries)
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(c, col(c).cast("timestamp"))
      case _ => df
    }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame =
    nanosToTs(table(spark, dir, "events"), "ts")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Signed transfer amount: deterministic outflow flag on event_id. */
  def signedValue: org.apache.spark.sql.Column =
    when(col("event_id") % 3 === 0, -col("value")).otherwise(col("value"))

  /** Daily net transfers per (asset, wallet, date) — the grain of the
    * reference's etl_pipelines.coin_wallet_net_transfers. */
  def transfers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        col("event_type").as("asset"),
        col("user_id").as("wallet"),
        to_date(col("ts")).as("date"))
      .agg(sum(signedValue).as("net_transfers"))

  /** Transfers with a running balance + transfer sequence, as built by
    * the reference's core.coin_wallet_transfers rebuild
    * (core_coin_wallet_transfers.py:178-191). */
  def transfersWithBalance(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("asset", "wallet").orderBy("date")
    transfers(spark, dir)
      .withColumn("balance", sum("net_transfers").over(w))
      .withColumn("transfer_sequence", count("net_transfers").over(w))
  }

  /** Daily price series per asset (order-independent `max` so Spark and
    * the DuckDB oracle agree bit-for-bit). Prices begin 7 days after
    * the first event so that pre-price transfer history exists — the
    * situation the reference's imputation logic
    * (core_coin_wallet_profits.py:349-478) handles. */
  def prices(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type").as("asset"), to_date(col("ts")).as("date"))
      .agg(round(max("value"), 6).as("price"))
    // min daily date == date of min ts (monotone), so the cutoff is
    // derived from the aggregate — no second scan of the fact table
    val cutoff = daily.agg(date_add(min(col("date")), 7).as("price_start"))
    daily
      .crossJoin(broadcast(cutoff))
      .where(col("date") >= col("price_start"))
      .drop("price_start")
  }
}
