package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Declarative data-quality checks — the engine-side mirror of the
  * reference's dbt test suite (the .sql files under
  * dbt_dreamsdata/tests). Each check
  * returns a DataFrame of VIOLATION rows (empty = pass), so a check is
  * itself a lazily-planned query: compose it, sample it, count it, or
  * gate a pipeline on it with [[Checks.assertAll]].
  *
  * Scale notes: every check is a single shuffle on its key columns
  * (groupBy or window) or a key-partitioned anti-join — no driver
  * materialization anywhere; [[Checks.summarize]] reduces each rule to
  * one count row. A suite whose rules share a derived input (e.g.
  * three rules over one running-balance view) should persist that
  * input (graft.CacheScope) — Spark's runtime exchange reuse does NOT
  * dedupe union branches whose operator trees differ above the shared
  * scan (measured on the q71 suite: zero ReusedQueryStage without the
  * persist), so without it the suite re-scans the fact table per rule.
  */
object Checks {

  /** Rows violating an arbitrary row-level predicate `cond` —
    * the general form of the reference's single-table tests
    * (test_cCoinMarketData_volume_is_negative.sql,
    * test_eCoinMarketDataCoingecko_no_partial_day_records.sql). */
  def expectNone(df: DataFrame, cond: Column): DataFrame = df.where(cond)

  /** Rows where `valueCol` is below `-tolerance`
    * (test_cCoinWalletTransfers_balance_is_negative.sql uses 0.1,
    * test_cCoinWalletProfits_usd_balance_is_negative.sql uses 0.01). */
  def nonNegative(df: DataFrame, valueCol: String, tolerance: Double = 0.0): DataFrame =
    df.where(col(valueCol) < -tolerance)

  /** Key groups whose date span (max−min+1 days) disagrees with their
    * distinct-date count — i.e. the series has holes or duplicate
    * dates (test_cCoinMarketData_no_date_gaps.sql; that test may
    * assume key-date uniqueness and count rows, but counting DISTINCT
    * dates keeps this check self-contained). */
  def noDateGaps(df: DataFrame, keys: Seq[String], dateCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        (datediff(max(dateCol), min(dateCol)) + 1).as("expected_days"),
        countDistinct(col(dateCol)).as("actual_days"))
      .where(col("expected_days") =!= col("actual_days"))

  /** Rows where `valueCol` moved BACKWARD along `orderCol` within a
    * key group (test_cCoinWalletProfits_usd_inflows_increasing.sql —
    * cumulative columns must never decrease). Emits the offending row
    * plus `prev_<valueCol>` for triage. */
  def nonDecreasing(df: DataFrame, keys: Seq[String], orderCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
    df.withColumn(s"prev_$valueCol", lag(valueCol, 1).over(w))
      .where(col(s"prev_$valueCol").isNotNull &&
        col(valueCol) < col(s"prev_$valueCol"))
  }

  /** Rows where `valueCol` failed to STRICTLY increase along
    * `orderCol` (test_cCoinWalletTransfers_transfer_sequence.sql —
    * sequence numbers must advance on every row). */
  def strictlyIncreasing(df: DataFrame, keys: Seq[String], orderCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
    df.withColumn(s"prev_$valueCol", lag(valueCol, 1).over(w))
      .where(col(s"prev_$valueCol").isNotNull &&
        col(valueCol) <= col(s"prev_$valueCol"))
  }

  /** Key combinations appearing more than once — the runtime form of
    * dbt's unique_combination_of_columns schema test. */
  def uniqueKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)

  /** Child rows whose key has no match in `parent` — referential
    * integrity (test_cCoinMarketData_coin_ids.sql). Anti-join on the
    * key columns; a dimension-sized parent broadcasts under AQE. */
  def orphans(child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String]): DataFrame = {
    require(childKeys.length == parentKeys.length, "key arity mismatch")
    val cond = childKeys.zip(parentKeys)
      .map { case (c, p) => child(c) === parent(p) }
      .reduce(_ && _)
    child.join(parent, cond, "left_anti")
  }

  /** Newest row per key along `orderCol` (ties broken by the remaining
    * sort of `orderCol` only — supply a composite ordering via multiple
    * windows upstream if needed). The rank-1 filter is pushed into the
    * shuffle by Spark's WindowGroupLimit, so no full-group sort
    * materializes. Building block for latest-state checks
    * (test_cCoinWalletTransfers_balance_over_total_supply.sql). */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Fact rows whose `valueCol` exceeds the dimension's `boundCol`
    * after an equi-join on `joinKey`
    * (test_cCoinWalletTransfers_balance_over_total_supply.sql joins
    * latest balances to coins and flags balance > total_supply). */
  def boundedByDim(fact: DataFrame, joinKey: String, valueCol: String,
      dim: DataFrame, dimKey: String, boundCol: String): DataFrame =
    fact.join(dim, fact(joinKey) === dim(dimKey))
      .where(fact(valueCol) > dim(boundCol))

  /** Rows lying more than `z` sample standard deviations from their
    * group mean — the statistical sibling of the hard-predicate
    * checks, covering the reference's warn-severity review tests
    * (test_cCoinWalletProfits_balance_over_market_cap flags
    * "usually bad data, could use review" populations rather than
    * invariant breaches). One aggregation producing a
    * dimension-sized stats table joined back onto the fact scan
    * (broadcasts under AQE); constant and singleton groups (stddev
    * 0 or null) yield no violations by construction. Emits the
    * offending row plus `group_mean`/`group_stddev` for triage. */
  def outliersZScore(df: DataFrame, keys: Seq[String], valueCol: String,
      z: Double = 3.0): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val stats = df.groupBy(keys.map(col): _*)
      .agg(avg(valueCol).as("group_mean"), stddev_samp(valueCol).as("group_stddev"))
    df.join(stats, keys)
      .where(col("group_stddev").isNotNull && col("group_stddev") > 0 &&
        abs(col(valueCol) - col("group_mean")) > lit(z) * col("group_stddev"))
  }

  /** Tukey-fence outliers: rows outside [q1 − k·iqr, q3 + k·iqr] of
    * their group's exact interpolated quartiles. Exact `percentile`
    * holds every group value in memory — fine for dimension-grouped
    * checks; at 100 TB swap `approx_percentile` in (the q45
    * precedent) and accept sketch-grade fences. Same stats-join
    * shape as [[outliersZScore]]. */
  def outliersIqr(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Double = 1.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val stats = df.groupBy(keys.map(col): _*)
      .agg(
        expr(s"percentile($valueCol, 0.25)").as("group_q1"),
        expr(s"percentile($valueCol, 0.75)").as("group_q3"))
    df.join(stats, keys)
      .where(
        col(valueCol) < col("group_q1") - lit(k) * (col("group_q3") - col("group_q1")) ||
          col(valueCol) > col("group_q3") + lit(k) * (col("group_q3") - col("group_q1")))
  }

  /** Rows where `actualCol` disagrees with the `expected` expression
    * beyond BOTH an absolute and a relative tolerance — the
    * reference's transfers_and_profits_math pattern (flag only
    * differences > $1 AND > 1%: absolute-only over-fires on huge
    * magnitudes, relative-only on tiny ones). The expected value is
    * materialized as `expected_value` on the emitted rows for triage.
    * Rows where `expected` evaluates to null (e.g. a LAG at a
    * partition head) are not checkable and never flag. */
  def reconciles(df: DataFrame, actualCol: String, expected: Column,
      tolAbs: Double, tolPct: Double): DataFrame = {
    require(tolAbs >= 0 && tolPct >= 0, "tolerances must be non-negative")
    val flagged = df.withColumn("expected_value", expected)
    val diff = abs(col(actualCol) - col("expected_value"))
    flagged.where(diff > tolAbs && diff > lit(tolPct) * abs(col("expected_value")))
  }

  /** One summary row per rule: (rule, n_violations). The suite-level
    * artifact a scheduler records per run — each rule collapses to a
    * single count, so the result is rules-many rows regardless of
    * input size. */
  def summarize(rules: Seq[(String, DataFrame)]): DataFrame = {
    require(rules.nonEmpty, "empty check suite")
    rules.map { case (name, v) =>
      v.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_violations"))
    }.reduce(_ union _)
  }

  /** Runtime gate: throws if any rule has violations, naming every
    * failing rule with up to `sample` example rows. Each rule costs
    * one bounded action (`take(sample)` — never a full collect). */
  def assertAll(rules: Seq[(String, DataFrame)], sample: Int = 5): Unit = {
    val failures = rules.flatMap { case (name, v) =>
      val ex = v.take(sample)
      if (ex.isEmpty) None
      else Some(s"$name (${ex.length}${if (ex.length == sample) "+" else ""} rows, e.g. ${ex.head})")
    }
    if (failures.nonEmpty)
      throw new IllegalStateException(
        s"data-quality checks failed: ${failures.mkString("; ")}")
  }
}
