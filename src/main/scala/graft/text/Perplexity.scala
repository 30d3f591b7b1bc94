package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality filtering (Wenzek et al.,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data" — public method): train a bigram LM on a REFERENCE
  * slice of the corpus, score every document by cross-entropy under
  * it, and bin into head/middle/tail terciles — the fluency tier of
  * the curation ladder (q23/q72 per-doc heuristics → THIS → q170
  * distribution match → q141 semantic). A doc full of real words in
  * improbable order scores tail here while passing every heuristic.
  *
  * Model: add-1-smoothed bigram conditionals over the reference,
  * P(w|p) = (c(p,w) + 1) / (c(p) + V + 1), with out-of-vocabulary
  * words collapsed to one UNK symbol (V = |reference vocab|, +1 for
  * UNK) and c(p) = Σ_w c(p,w) so the conditional normalizes exactly.
  * Per-doc score = mean negative log-probability in nats over the
  * doc's bigrams; docs with < 2 tokens have no bigram and score null
  * (they bin 'tail' — unlikely to be prose).
  *
  * Determinism (the q151/q170 discipline): counts are exact integers;
  * each bigram's −ln P is ONE float expression rounded to 9 dp at
  * DECIMAL(18,9); the per-doc sum is count-free decimal addition; the
  * mean divides the exactly-cast double sum by the integer bigram
  * count (IEEE-deterministic on both engines); terciles are ntile(3)
  * over the total order (mean, doc id).
  *
  * Scale shape: bigrams form INSIDE the token array (zip_with on
  * shifted slices — no self-join, no per-doc window); UNK mapping and
  * model lookups are joins against model tables bounded
  * by the REFERENCE corpus (AQE broadcasts them while they fit,
  * ordinary hash joins when they do not — no forced hint); the per-doc
  * aggregate is map-side combined on the doc id. Terciles are exact
  * but DISTRIBUTED: ntile(3) is a pure function of (global rank,
  * total count), so the rank comes from [[graft.operators.PrefixSum]]
  * (range exchange + per-partition fold — no single-task window) over
  * |docs| SCORE rows and the tile is long-exact integer arithmetic;
  * the KLL sketch (`graft_kll_agg`, the q87 path) remains the
  * approximate alternative when even one range exchange of the score
  * rows is too much.
  */
object Perplexity {

  private val Unk = ""

  /** (id, p, w) raw bigram pairs per document — empty tokens drop,
    * adjacency survives the drop (the q170 rule). */
  private def bigramPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(col(textCol), " "), w => length(w) > 0)
    docs
      .select(col(idCol),
        when(size(toks) > 1,
          zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
            (a, b) => struct(a.as("p"), b.as("w"))))
        .otherwise(array().cast("array<struct<p:string,w:string>>")).as("bg"))
      .select(col(idCol), explode(col("bg")).as("g"))
      .select(col(idCol), col("g.p").as("p"), col("g.w").as("w"))
  }

  /** The model tables of a bigram LM trained on `refDocs`: exact
    * integer (p, w, cpw) counts and the distinct vocabulary — the
    * publishable form ([[graft.streaming.PerplexityAdmitStream]]
    * publishes exactly these once; c(p) and V re-derive from them). */
  def trainBigramModel(
      refDocs: DataFrame,
      idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val refBigrams = bigramPairs(refDocs, idCol, textCol)
      .groupBy("p", "w").agg(count(lit(1)).as("cpw"))
    val vocab = refDocs
      .select(explode(filter(split(col(textCol), " "), w => length(w) > 0)).as("word"))
      .distinct()
    (refBigrams, vocab)
  }

  /** Score `docs` against an EXPLICIT bigram model (`refBigrams` =
    * (p, w, cpw), `vocab` = (word)): (id, n_bigrams, __ce) with __ce
    * the full-precision mean −ln P (null when the doc has no bigram).
    * The scoring core shared by [[lmScore]]'s train-on-a-slice form
    * and the streaming admission gate's fixed published model. */
  def scoreAgainst(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      refBigrams: DataFrame,
      vocab: DataFrame): DataFrame = {
    val refPrev = refBigrams.groupBy("p").agg(sum("cpw").as("cp"))
    val vCount = vocab.agg(count(lit(1)).as("v"))

    // UNK-map both legs of every scored bigram against the vocab
    val pairs = bigramPairs(docs, idCol, textCol)
      .join(vocab.withColumnRenamed("word", "p").withColumn("__pin", lit(1)),
        Seq("p"), "left")
      .join(vocab.withColumnRenamed("word", "w").withColumn("__win", lit(1)),
        Seq("w"), "left")
      .select(col(idCol),
        when(col("__pin").isNotNull, col("p")).otherwise(lit(Unk)).as("p"),
        when(col("__win").isNotNull, col("w")).otherwise(lit(Unk)).as("w"))

    // one rounded-decimal −ln P per bigram: exact-integer inputs,
    // identical expression tree on the oracle side
    val scored = pairs
      .join(refBigrams, Seq("p", "w"), "left")
      .join(refPrev, Seq("p"), "left")
      .crossJoin(broadcast(vCount))
      .select(col(idCol),
        round(-log(
          (coalesce(col("cpw"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("cp"), lit(0L)) + col("v") + lit(1L)).cast("double")),
          9).cast("decimal(18,9)").as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("__s"))
      .select(col(idCol), col("n_bigrams"),
        (col("__s").cast("double") / col("n_bigrams").cast("double")).as("__ce"))

    // every doc survives — bigram-less docs score null
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("__ce"))
  }

  /** Score every document against a bigram LM trained on the
    * `referencePred` slice; output (id, n_bigrams, ce, bucket). */
  def lmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      referencePred: Column): DataFrame = {
    val (refBigrams0, vocab0) = trainBigramModel(
      docs.where(referencePred), idCol, textCol)
    val refBigrams = graft.CacheScope.persisted(refBigrams0)
    val vocab = graft.CacheScope.persisted(vocab0)
    terciles(scoreAgainst(docs, idCol, textCol, refBigrams, vocab), idCol)
  }

  /** Tercile-cut a score table (the `(id, n_bigrams, __ce)` shape
    * [[scoreAgainst]] emits — live lineage or re-read from storage):
    * (id, n_bigrams, ce, bucket). Public as its own stage because the
    * production posture is score ONCE to storage and rank the stored
    * table — the rank's .rdd passes then read a plain scan instead of
    * re-running the LM pipeline without AQE (see below). */
  def terciles(all: DataFrame, idCol: String): DataFrame = {
    // Terciles WITHOUT a single-task global window: ntile(3) is a
    // pure function of (global row number, total count), so compute
    // the rank with the distributed two-pass PrefixSum (range
    // exchange + per-partition fold — every partition works) and
    // apply SQL-standard ntile arithmetic in long-exact integer
    // division. NULLS LAST with the unique id tiebreaker is encoded
    // as the non-null sort key (__nl, coalesced ce, id) — bit-for-bit
    // the oracle's ORDER BY ce ASC NULLS LAST, id.
    // NOT persisted, deliberately (measured): the rank's passes go
    // through .rdd, which compiles without AQE — and a persist()
    // cache-fill ALSO materializes without AQE, so caching here makes
    // the no-AQE execution of the model joins THE plan (3.0 s at
    // sf0.1) where the unpersisted form pays one no-AQE run whose
    // shuffle files pass 2 then reuses (1.9 s; the AQE-planned
    // Dataset run of the same pipeline is 0.2 s — the delta is
    // broadcast-vs-hash on the reference-bounded model joins, which
    // still distribute fine at scale). A pipeline that scores once
    // and ranks many times should write the score table to storage
    // and rank THAT.
    val keyed = all
      .withColumn("__nl", when(col("__ce").isNull, lit(1)).otherwise(lit(0)))
      .withColumn("__ck", coalesce(col("__ce"), lit(0.0)))
    val (ranked, total) = graft.operators.PrefixSum.globalRowNumber(
      keyed, Seq("__nl", "__ck", idCol), "__rk")
    // SQL ntile(k): the first (total mod k) tiles get ceil(total/k)
    // rows, the rest floor(total/k) — exact long division, no floats
    val tile: Column =
      if (total < 3L) col("__rk")
      else {
        val q = total / 3L
        val r = total % 3L
        when(col("__rk") <= lit(r * (q + 1)),
          expr(s"(__rk - 1) DIV ${q + 1} + 1"))
          .otherwise(expr(s"$r + (__rk - ${r * (q + 1)} - 1) DIV $q + 1"))
      }
    ranked
      .withColumn("bucket",
        when(col("__ce").isNull, lit("tail"))
          .otherwise(element_at(
            array(lit("head"), lit("middle"), lit("tail")), tile.cast("int"))))
      .select(col(idCol), col("n_bigrams"),
        round(col("__ce"), 6).as("ce"), col("bucket"))
  }
}
