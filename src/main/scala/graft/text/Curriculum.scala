package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-CURRICULUM ordering — the training-schedule step between
  * curation and the loader: standard LLM practice anneals on the
  * highest-quality slice at the END of training (the model's final
  * gradient steps see the best data), so the consumption order must
  * place a quality-ranked anneal set after the bulk phase while
  * keeping everything reproducible across engines and retries.
  *
  * Reference semantics (mirrors the data-ordering stages of the
  * reference's training-prep flows, e.g. the ranked-export step in
  * etl-pipelines' dataset builders): rank every document by the
  * integer quality score (q23's exact ppm arithmetic — no float
  * model scores, so the rank is hash-checkable), cut the top
  * `annealPpm` fraction as phase 2, and emit a global epoch position
  * that consumes phase 1 first and phase 2 last, seeded-scrambled
  * WITHIN each phase (q196's epochOrder rationale: fixed order
  * correlates neighboring batches with corpus layout; float rand()
  * is irreproducible).
  *
  * Scale shape: two distributed two-pass global ranks
  * ([[graft.operators.PrefixSum.globalRowNumber]] — range exchange +
  * shared-RDD second pass, never a single-task window) over
  * (id, long) rows; the quality pass itself is one narrow corpus
  * map. The anneal cutoff is one driver scalar from rank pass 1's
  * free total — BigInt math, so corpus sizes near 2^63/1e6 cannot
  * wrap the cutoff.
  *
  * Determinism contract: ranks order by (score DESC, id ASC) — a
  * TOTAL order, so equal-score documents straddle the anneal
  * boundary identically in both engines; the within-phase scramble
  * reduces its inner sum mod 1000000007 before the Knuth multiply
  * (the q196 overflow posture) and reduces the seed first, so ANY
  * Long seed is safe and sign-stable.
  * Output: (id, quality_score_ppm, quality_rank, phase, epoch_pos);
  * epoch_pos is a 1..N permutation, phase ∈ {1, 2}. */
object Curriculum {

  def phaseOrder(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      annealPpm: Long,
      seed: Long = 1L): DataFrame =
    orderFromScores(
      TextOps.qualityScore(docs, idCol, textCol)
        .select(col(idCol), col("quality_score_ppm")),
      idCol, annealPpm, seed)

  /** The ordering half over an ALREADY-SCORED (id, quality_score_ppm)
    * relation — the stored-score production posture (the q178/q198
    * storage pattern): scoring runs once at ingest and is published;
    * every schedule (re)plan ranks the STORED table — a seed change
    * or anneal-fraction sweep re-plans without touching the corpus
    * text. [[phaseOrder]] is this over a fresh scoring pass; both
    * share the oracle hash because the score table IS the scoring
    * pass's output. */
  def orderFromScores(
      scores: DataFrame,
      idCol: String,
      annealPpm: Long,
      seed: Long = 1L): DataFrame = {
    require(annealPpm >= 0L && annealPpm <= 1000000L,
      "annealPpm must be a ppm fraction in [0, 1000000]")
    val M = 1000000007L
    val scored = scores
      .select(col(idCol), col("quality_score_ppm"))
      // rank wants score DESC; globalRowNumber ranks ASC — negate
      // (ppm ≤ 1e6, negation exact)
      .withColumn("__negq", -col("quality_score_ppm"))
    val (ranked, total) = graft.operators.PrefixSum
      .globalRowNumber(scored, Seq("__negq", idCol), "quality_rank")
    val annealCount =
      (BigInt(total) * annealPpm / 1000000L).toLong
    val phased = ranked
      .withColumn("phase",
        when(col("quality_rank") <= lit(annealCount), lit(2L))
          .otherwise(lit(1L)))
      .withColumn("__h", pmod(
        pmod(pmod(col(idCol), lit(1000003L)) * lit(7919L)
          + pmod(lit(seed), lit(M)), lit(M))
          * lit(2654435761L), lit(M)))
    graft.operators.PrefixSum
      .globalRowNumber(phased, Seq("phase", "__h", idCol), "epoch_pos")._1
      .select(col(idCol), col("quality_score_ppm"), col("quality_rank"),
        col("phase"), col("epoch_pos"))
  }

  /** The DuckDB twin of [[phaseOrder]]: q23's quality expression, the
    * (score DESC, id) rank, the BigInt-exact anneal cutoff restated as
    * HUGEINT `//`, and the phase-major seeded re-rank — the full
    * permutation under the hash. */
  def phaseOrderOracleSql(
      table: String, idCol: String, textCol: String,
      annealPpm: Long, seed: Long): String =
    s"""WITH q AS MATERIALIZED (
       |  SELECT $idCol,
       |    (4 * alpha_ppm + 3 * stopword_ppm
       |      + 2 * (1000000 - digit_ppm) + (1000000 - punct_ppm)) // 10
       |      AS quality_score_ppm
       |  FROM (
       |    SELECT $idCol,
       |      (len(regexp_extract_all($textCol, '[A-Za-z]')) * 1000000)
       |        // GREATEST(LENGTH($textCol), 1) AS alpha_ppm,
       |      (len(regexp_extract_all($textCol, '[0-9]')) * 1000000)
       |        // GREATEST(LENGTH($textCol), 1) AS digit_ppm,
       |      (len(regexp_extract_all($textCol, '[^A-Za-z0-9 ]')) * 1000000)
       |        // GREATEST(LENGTH($textCol), 1) AS punct_ppm,
       |      (len(list_filter(string_split($textCol, ' '),
       |          w -> w IN ('the','a','an','and','or','of','to','in','is','it'))) * 1000000)
       |        // GREATEST(len(string_split($textCol, ' ')), 1) AS stopword_ppm
       |    FROM $table
       |  )
       |), r AS MATERIALIZED (
       |  SELECT $idCol, quality_score_ppm,
       |    CAST(ROW_NUMBER() OVER (ORDER BY quality_score_ppm DESC, $idCol)
       |      AS BIGINT) AS quality_rank
       |  FROM q
       |), n AS (
       |  SELECT COUNT(*) AS c FROM r
       |), p AS (
       |  SELECT r.$idCol, r.quality_score_ppm, r.quality_rank,
       |    CASE WHEN r.quality_rank <= (n.c * $annealPpm) // 1000000
       |         THEN 2 ELSE 1 END AS phase,
       |    (((($idCol % 1000003) * 7919
       |        + ($seed % 1000000007 + 1000000007) % 1000000007) % 1000000007)
       |      * 2654435761) % 1000000007 AS h
       |  FROM r, n
       |)
       |SELECT $idCol, quality_score_ppm, quality_rank,
       |  CAST(phase AS BIGINT) AS phase,
       |  CAST(ROW_NUMBER() OVER (ORDER BY phase, h, $idCol) AS BIGINT)
       |    AS epoch_pos
       |FROM p""".stripMargin
}
