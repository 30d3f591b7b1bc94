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

  /** The CHANGE DATA FEED across a published table's version history
    * — the consumer API for everything the write path produces
    * (Publish versions, MERGE commits, deletion-vector versions,
    * streaming CDC applies): one DataFrame of insert/update/delete
    * rows for every commit step in (fromVersion, toVersion], each row
    * carrying its `from_version`/`to_version` lineage. This is the
    * Delta `table_changes` / Iceberg changelog-scan shape recovered
    * from the immutable snapshot layout alone — no delta log needed,
    * because consecutive full snapshots determine the feed (and
    * DV-carrying versions are read through their sidecar, so a
    * DV-deleted row surfaces as the `delete` it semantically is).
    *
    * Each consecutive pair costs one full-outer key join
    * ([[snapshotDiff]]); a k-step feed is k independent joins
    * unioned — at 100 TB you read it incrementally (one step per
    * downstream tick), which is exactly what the lineage columns make
    * resumable. Requires every version in the range to still be on
    * disk ([[graft.sources.Publish.expireVersions]]' keepWithin is
    * the feed's retention contract — the same horizon trade Delta's
    * CDF has). */
  def changeFeedBetween(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      fromVersion: Long,
      toVersion: Long,
      keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(fromVersion < toVersion,
      s"empty feed range: $fromVersion ≥ $toVersion")
    val dirOf = (vv: Long) => {
      val d = java.nio.file.Paths.get(root).resolve(s"v=$vv")
      if (!java.nio.file.Files.exists(d)) throw new IllegalStateException(
        s"version $vv not present at $root — expired past the feed's retention horizon?")
      d.toString
    }
    val steps = (fromVersion until toVersion).map { v =>
      snapshotDiff(
          graft.sources.Deletes.read(spark, dirOf(v)),
          graft.sources.Deletes.read(spark, dirOf(v + 1)),
          keys, valueCols)
        .withColumn("from_version", lit(v))
        .withColumn("to_version", lit(v + 1))
    }
    steps.reduce(_ unionByName _)
  }

  /** Incrementally apply a change batch to an existing SCD Type-2
    * dimension — the APPLY CHANGES / MERGE-into-SCD2 maintenance step
    * that keeps [[scd2History]]'s output current without rebuilding
    * it from the full change log.
    *
    * Untouched keys (no row in the batch) carry their history rows
    * VERBATIM through a left-anti join — zero window work, the whole
    * point of the incremental form. Touched keys are rebuilt
    * per-key: the existing versions ARE a change stream (each
    * version row is the change that opened it, at `valid_from`), so
    * union them with the batch and re-run [[scd2History]]. The
    * rebuild is what gets the boundary cases right that a naive
    * close-out-and-append gets wrong: a batch row restating the
    * key's current attributes must NOT open a version (no-op
    * suppression crosses the boundary), and a late-arriving change
    * older than the current version must splice INTO the history,
    * renumbering and re-closing intervals after it.
    *
    * Correctness contract (and the oracle): for any split of a
    * change stream into base + batch,
    * `scd2Apply(scd2History(base), batch) ≡ scd2History(base ∪ batch)`
    * — the incremental path and the full recompute agree row-for-row.
    *
    * Scale: the batch is small by construction (it is a CDC tick);
    * the anti/semi joins against its distinct keys broadcast, so the
    * carried majority of the dimension never shuffles, and the
    * window rebuild runs on |touched keys'| rows only.
    *
    * Precondition (inherited from [[scd2History]]): one change per
    * key per `effectiveCol` instant across dim ∪ batch — a batch row
    * at an instant the history already holds is the caller's dedupe
    * to resolve, not this operator's.
    *
    * @param dim existing SCD2 output: keys ++ attrCols ++
    *   version/valid_from/valid_to/is_current
    * @param changes new change rows: keys ++ effectiveCol ++ attrCols
    * @return the updated dimension, same shape as `dim` */
  def scd2Apply(
      dim: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      effectiveCol: String,
      attrCols: Seq[String]): DataFrame = {
    val outCols = keys ++ attrCols ++
      Seq("version", "valid_from", "valid_to", "is_current")
    val touched = changes.select(keys.map(col): _*).distinct()
    val carried = dim.join(touched, keys, "left_anti")
      .select(outCols.map(col): _*)
    val existingAsChanges = dim.join(touched, keys, "left_semi")
      .select(keys.map(col) ++ (col("valid_from").as(effectiveCol) +:
        attrCols.map(col)): _*)
    val batch = changes.select(
      keys.map(col) ++ (col(effectiveCol) +: attrCols.map(col)): _*)
    val rebuilt =
      scd2History(existingAsChanges.unionByName(batch), keys, effectiveCol, attrCols)
        .select(outCols.map(col): _*)
    carried.unionByName(rebuilt)
  }
}
