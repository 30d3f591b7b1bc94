package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history and snapshot differencing — the
  * two halves of change tracking the reference's upsert stack stops
  * short of. `Ingest.keepLatest` (the reference's DELETE+INSERT,
  * dune_transfers_updates) keeps only the newest row per key; these
  * operators keep and compare LINEAGE:
  *
  *   - [[scd2History]] turns a change stream into the full Type-2
  *     dimension history (version, valid_from, valid_to, is_current),
  *     suppressing no-op updates so a version boundary means the
  *     tracked attributes actually changed — the warehouse-standard
  *     form of the reference's "latest state" tables
  *     (core_coins.py keeps only the final coalesced row; SCD2 is
  *     what you keep when you need the row as-of any date).
  *   - [[snapshotDiff]] computes the change feed BETWEEN two full
  *     snapshots (insert/update/delete classification) — the CDC
  *     extract for consumers of [[graft.sources.Publish]] versions,
  *     which are immutable full snapshots by design: diffing v=N
  *     against v=N+1 recovers the incremental feed that produced it.
  *
  * Scale: scd2History is two window passes over ONE hash exchange on
  * the entity key (Catalyst reuses the sort — same partition AND sort
  * key for both passes); snapshotDiff is one full-outer shuffle join
  * on the key, and every comparison is a null-safe column equality
  * that stays inside whole-stage codegen. Nothing touches the driver.
  */
object Scd {

  /** Collapse a deduplicated change stream (one row per key per
    * `effectiveCol` instant) into SCD Type-2 history rows.
    *
    * A change row survives iff it is the key's first observation or
    * any of `attrCols` differs (null-safely) from the previous
    * observation — consecutive identical states merge into one
    * validity interval. `valid_to` is the next version's
    * `valid_from` (exclusive upper bound, the half-open convention);
    * the live version has `valid_to` NULL and `is_current` true.
    */
  def scd2History(
      changes: DataFrame,
      keys: Seq[String],
      effectiveCol: String,
      attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(effectiveCol))
    // window results must land in columns before the filter — Spark
    // (correctly) refuses window functions inside WHERE
    val prev = attrCols.foldLeft(
      changes.withColumn("__first", lag(col(effectiveCol), 1).over(w).isNull)) {
      (df, a) => df.withColumn(s"__prev_$a", lag(col(a), 1).over(w))
    }
    val differs = attrCols
      .map(a => !(col(a) <=> col(s"__prev_$a")))
      .reduce(_ || _)
    prev
      .where(col("__first") || differs)
      .drop("__first")
      .drop(attrCols.map(a => s"__prev_$a"): _*)
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(effectiveCol))
      .withColumn("valid_to", lead(col(effectiveCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Classify every key across two snapshots as insert / update /
    * delete (rows present in both with all `valueCols` null-safely
    * equal are dropped — emit them with `keepUnchanged = true`).
    * Output carries the coalesced key plus `old_`/`new_` prefixed
    * value columns, so an update shows both sides.
    *
    * `keys` must be non-null in both inputs (they are join keys); the
    * value comparison is null-safe, so a value going NULL or arriving
    * NULL is an update, not a match.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String],
      keepUnchanged: Boolean = false): DataFrame = {
    def side(df: DataFrame, prefix: String): DataFrame =
      df.select(
        keys.map(col) ++
          valueCols.map(v => col(v).as(s"${prefix}_$v")) :+
          lit(true).as(s"__in_$prefix"): _*)
    val joined = side(oldDf, "old")
      .join(side(newDf, "new"), keys, "full_outer")
    val differs = valueCols
      .map(v => !(col(s"old_$v") <=> col(s"new_$v")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    val classified = joined.withColumn("change_type",
      when(col("__in_old").isNull, lit("insert"))
        .when(col("__in_new").isNull, lit("delete"))
        .when(differs, lit("update"))
        .otherwise(lit("unchanged")))
    val kept =
      if (keepUnchanged) classified
      else classified.where(col("change_type") =!= "unchanged")
    kept.select(
      keys.map(col) :+ col("change_type") :++
        valueCols.flatMap(v => Seq(col(s"old_$v"), col(s"new_$v"))): _*)
  }
}
