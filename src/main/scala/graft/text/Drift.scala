package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus DISTRIBUTION-DRIFT monitor — the ops counterpart of q170's
  * DSIR selection: instead of scoring documents against a target
  * distribution, score each SOURCE's hashed-gram profile against a
  * curated reference slice and flag the feeds whose content has
  * drifted. This is the check a production ingest pipeline runs
  * continuously (a crawl feed silently switching language, a scraper
  * starting to emit boilerplate, an upstream dump changing format
  * truncation) — distribution-level, so it catches what per-document
  * heuristics (q23/q72) cannot: every document individually fine,
  * the MIX wrong.
  *
  * Statistic: total-variation distance in ppm, INTEGER-EXACT. With
  * o_b = source gram count in bucket b, r_b = reference count,
  * N_s = Σo, N_r = Σr:
  *
  *   D   = Σ_b | o_b·N_r − r_b·N_s |          (exact decimal(38,0))
  *   tv  = D / (2·N_s·N_r)  ∈ [0, 1]
  *   ppm = ⌊10⁶·D / (2·N_s·N_r)⌋              (exact integral divide)
  *
  * TV needs no logarithms (χ² and KL divide or log per bucket — float
  * the moment they're computed, so cross-engine hash parity dies);
  * the common-denominator form keeps the WHOLE statistic in integer
  * arithmetic until one final floor division, the q151/q194
  * exact-decimal discipline. Extremes are exact by construction:
  * identical profiles → 0 ppm; disjoint vocabularies →
  * D = Σo·N_r + Σr·N_s = 2·N_s·N_r → exactly 1,000,000 ppm
  * (DriftSpec pins both).
  *
  * Scale shape (the q170 posture): one narrow gram pass aggregates
  * map-side-combined straight to the (source, ref?, bucket) grain —
  * the wire carries at most |sources|·2·B rows whatever the corpus
  * size, which is the point of feature HASHING; everything after is
  * arithmetic on that bounded grain (broadcast joins over a
  * |sources|·B grid). No per-document state, no full-width shuffle
  * at all. The gram hash is the exact integer char-polynomial
  * (graft_grams — acc·31+ascii mod 1e9+7, bigrams (h₁·131+h₂) mod p)
  * replayed verbatim by the DuckDB oracle.
  */
object Drift {

  /** Per-source hashed-gram profile at the bounded (source, bucket)
    * grain — ONE narrow pass, map-side combined before the exchange.
    * The building block both the batch monitor and the S44 streaming
    * maintainer aggregate (gram counts are per-document additive, so
    * per-batch profiles SUM to the corpus profile exactly). */
  def gramProfile(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      buckets: Int): DataFrame =
    docs
      .select(col(sourceCol).as("source"),
        explode(call_function("graft_grams", col(textCol), lit(buckets)))
          .as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** The TV arithmetic over already-built profiles: `obs` at
    * (source, bucket, n), `ref` at (bucket, n). Shared verbatim by
    * [[sourceDrift]] and the S44 maintained view so the two surfaces
    * cannot drift from each other. */
  def tvFromProfiles(
      obs: DataFrame,
      ref: DataFrame,
      alertPpm: Long): DataFrame = {
    val refB = ref.groupBy("bucket").agg(sum("n").as("r"))
    val obsB = obs.groupBy("source", "bucket").agg(sum("n").as("o"))
    val nS = obsB.groupBy("source").agg(sum("o").as("n_grams"))
    val nR = refB.agg(coalesce(sum("r"), lit(0L)).as("n_ref"))
    // the |sources|·B comparison grid: every reference bucket under
    // every source (a bucket the source never emits still contributes
    // r·N_s), full-outer'd with the observed profile (a bucket the
    // reference lacks contributes o·N_r)
    val grid = nS.select("source").crossJoin(refB)
      .join(obsB, Seq("source", "bucket"), "full_outer")
      .na.fill(0L, Seq("r", "o"))
    grid
      .join(broadcast(nS), Seq("source"))
      .crossJoin(broadcast(nR))
      .groupBy(col("source"), col("n_grams"), col("n_ref"))
      .agg(sum(abs(
        col("o").cast("decimal(38,0)") * col("n_ref") -
        col("r").cast("decimal(38,0)") * col("n_grams"))).as("__d"))
      // ⌊10⁶·D / (2·N_s·N_r)⌋ — both operands non-negative, so the
      // truncating integral divide IS the floor on both engines; the
      // greatest() guards the degenerate empty-reference/empty-source
      // cases (documented: no reference ⇒ every source reports 0)
      .withColumn("tv_ppm", expr(
        """CAST((__d * 1000000) div
          |  greatest(CAST(2 AS DECIMAL(38,0)) * n_grams * n_ref, 1)
          |  AS BIGINT)""".stripMargin))
      .withColumn("drifted",
        when(col("tv_ppm") >= alertPpm, 1).otherwise(0).cast("int"))
      .select("source", "n_grams", "tv_ppm", "drifted")
      .orderBy("source")
  }

  /** Per-source TV drift against the `refPred` slice.
    * Output: (source, n_grams, tv_ppm, drifted) ordered by source.
    * A source's own rows may be part of the reference slice (the
    * reference is a label, not a holdout) — a source that IS the
    * whole reference therefore reports 0 ppm.
    * @param alertPpm drifted = tv_ppm >= alertPpm (as INT 0/1 — the
    *   driver hash gate stringifies booleans differently per engine) */
  def sourceDrift(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      refPred: Column,
      buckets: Int,
      alertPpm: Long): DataFrame = {
    // one corpus pass, combined at the bounded (source, ref?, bucket)
    // grain before the exchange; both profiles slice from it
    val prof = graft.CacheScope.persisted(
      docs
        .select(col(sourceCol).as("source"), refPred.as("__ref"),
          explode(call_function("graft_grams", col(textCol), lit(buckets)))
            .as("bucket"))
        .groupBy(col("source"), col("__ref"), col("bucket"))
        .agg(count(lit(1)).as("n")))
    tvFromProfiles(
      obs = prof.select("source", "bucket", "n"),
      ref = prof.where(col("__ref")).select("bucket", "n"),
      alertPpm = alertPpm)
  }
}
