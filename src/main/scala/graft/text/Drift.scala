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

  /** The TV arithmetic over already-built profiles, generalized to a
    * KEYED reference: `obs` at (obsKeys..., bucket, n), `ref` at
    * (refKeys..., bucket, n) with refKeys ⊆ obsKeys. Each obs grain
    * is compared to the reference profile sharing its refKeys values
    * (refKeys = Nil ⇒ one global reference, the q208 shape;
    * refKeys = Seq("lang") ⇒ each (source, lang) vs its LANGUAGE's
    * corpus profile, the q210 shape). One implementation serves every
    * drift surface so the grains cannot diverge arithmetically. */
  def keyedTv(
      obs: DataFrame,
      ref: DataFrame,
      obsKeys: Seq[String],
      refKeys: Seq[String],
      alertPpm: Long): DataFrame = {
    require(refKeys.forall(obsKeys.contains), "refKeys must be ⊆ obsKeys")
    // join helper: refKeys = Nil degenerates to a 1-row broadcast cross
    def onRef(l: DataFrame, r: DataFrame, how: String = "inner"): DataFrame =
      if (refKeys.isEmpty) l.crossJoin(broadcast(r))
      else l.join(broadcast(r), refKeys, how)
    val refB = ref.groupBy((refKeys :+ "bucket").map(col): _*)
      .agg(sum("n").as("r"))
    val obsB = obs.groupBy((obsKeys :+ "bucket").map(col): _*)
      .agg(sum("n").as("o"))
    val nS = obsB.groupBy(obsKeys.map(col): _*).agg(sum("o").as("n_grams"))
    val nR = refB.groupBy(refKeys.map(col): _*)
      .agg(coalesce(sum("r"), lit(0L)).as("n_ref"))
    // the grain×B comparison grid: every reference bucket under every
    // obs grain (a bucket the grain never emits still contributes
    // r·N_s), full-outer'd with the observed profile (a bucket the
    // reference lacks contributes o·N_r)
    val grid = onRef(nS.select(obsKeys.map(col): _*), refB)
      .join(obsB, obsKeys :+ "bucket", "full_outer")
      .na.fill(0L, Seq("r", "o"))
    onRef(grid.join(broadcast(nS), obsKeys), nR, how = "left")
      // a grain whose refKeys slice has no reference at all (possible
      // only when ref is built independently of obs) reports 0 via the
      // greatest() guard below
      .na.fill(0L, Seq("n_ref"))
      .groupBy((obsKeys.map(col) :+ col("n_grams") :+ col("n_ref")): _*)
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
      .select((obsKeys ++ Seq("n_grams", "tv_ppm", "drifted")).map(col): _*)
      .orderBy(obsKeys.map(col): _*)
  }

  /** The global-reference case: `obs` at (source, bucket, n), `ref`
    * at (bucket, n). Shared verbatim by [[sourceDrift]] and the S44
    * maintained view so the two surfaces cannot drift from each
    * other. */
  def tvFromProfiles(
      obs: DataFrame,
      ref: DataFrame,
      alertPpm: Long): DataFrame =
    keyedTv(obs, ref, obsKeys = Seq("source"), refKeys = Nil,
      alertPpm = alertPpm)

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

  /** WITHIN-GROUP drift: each (source, group) slice scored against
    * its GROUP's whole-corpus profile — e.g. group = language: "is
    * source X's German weird German?", which a global reference
    * cannot ask (against an English reference every non-English grain
    * saturates, measuring the label rather than the rot). The
    * reference for each group is the union of every source's
    * contribution to it, so a source that IS its group's only
    * contributor reports exactly 0 ppm (pinned in spec).
    * Output: (source, group, n_grams, tv_ppm, drifted) ordered.
    * Same bounded shape as [[sourceDrift]]: one narrow gram pass to
    * the (source, group, bucket) grain, then broadcast arithmetic —
    * the wire never carries more than |sources|·|groups|·B rows. */
  def groupedDrift(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      groupCol: String,
      buckets: Int,
      alertPpm: Long): DataFrame = {
    val prof = graft.CacheScope.persisted(
      docs
        .select(col(sourceCol).as("source"), col(groupCol).as("group"),
          explode(call_function("graft_grams", col(textCol), lit(buckets)))
            .as("bucket"))
        .groupBy(col("source"), col("group"), col("bucket"))
        .agg(count(lit(1)).as("n")))
    keyedTv(
      obs = prof,
      ref = prof.select("group", "bucket", "n"),
      obsKeys = Seq("source", "group"),
      refKeys = Seq("group"),
      alertPpm = alertPpm)
  }
}
