package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for LLM-training-data curation: token
  * counting, quality scoring, language ID, and document
  * fingerprinting. All pure column algebra (regexp_count, split,
  * higher-order functions) — codegen'd, shuffle-free (each operator
  * is a narrow per-row map), and oracle-expressible in ANSI SQL.
  */
object TextOps {

  /** BPE-ish pre-tokenizer classes: letter runs, digit runs, single
    * non-alphanumeric marks (same regex semantics in Java and RE2). */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Per-language marker words for the heuristic language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni"))

  private def tokens(textCol: Column): Column = split(textCol, " ")

  /** Whitespace token count + BPE-ish regex token count. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(tokens(col(textCol))).as("ws_tokens"),
      regexp_count(col(textCol), lit(BpeishPattern)).as("bpe_tokens"))

  /** Document quality signals: alpha/digit/punct char ratios and
    * stopword token ratio, combined into one heuristic score.
    *
    * Ratios are exact integer parts-per-million (integer division) —
    * decimal-rounding a float here is engine-dependent at halfway
    * points (Java BigDecimal HALF_UP vs C-library rounding disagree
    * when e.g. n_chars = 128 makes the millionths ratio land exactly
    * on .5), so no floats appear anywhere in this operator. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    docs
      .select(
        (col(idCol) +: carryCols.map(col)) ++ Seq(
          length(t).as("n_chars"),
          size(tokens(t)).as("n_tokens"),
          regexp_count(t, lit("[A-Za-z]")).as("__alpha"),
          regexp_count(t, lit("[0-9]")).as("__digit"),
          regexp_count(t, lit("[^A-Za-z0-9 ]")).as("__punct"),
          size(filter(tokens(t), w => w.isInCollection(Stopwords))).as("__stop")): _*)
      .select(
        (col(idCol) +: carryCols.map(col)) ++ Seq(
          col("n_chars"),
          col("n_tokens"),
          expr("(__alpha * 1000000L) div greatest(n_chars, 1)").as("alpha_ppm"),
          expr("(__digit * 1000000L) div greatest(n_chars, 1)").as("digit_ppm"),
          expr("(__punct * 1000000L) div greatest(n_chars, 1)").as("punct_ppm"),
          expr("(__stop * 1000000L) div greatest(n_tokens, 1)").as("stopword_ppm")): _*)
      .withColumn(
        "quality_score_ppm",
        expr("""(4 * alpha_ppm + 3 * stopword_ppm
               | + 2 * (1000000 - digit_ppm) + (1000000 - punct_ppm)) div 10""".stripMargin))
  }

  /** SOURCE-CALIBRATED quality: each document's quality score mapped
    * to its source-RELATIVE rank in exact integer ppm —
    * ⌊(rank−1)·1e6 / (n_source−1)⌋, ties broken by id. Raw heuristic
    * scores aren't comparable across feeds (a code-heavy source's
    * median punctuation ratio would fail a prose threshold wholesale);
    * calibrating within source is the curation step that lets one
    * global cut line (e.g. "drop the bottom decile") mean the same
    * thing everywhere. A single-document source calibrates to 0.
    *
    * Scale shape: the rank rides [[graft.operators.PrefixSum
    * .globalRowNumber]] over (source, score, id) — the two-pass
    * distributed rank, NO per-source window sort (a
    * `Window.partitionBy(source)` puts each source's whole corpus in
    * one task, and real feeds are orders of magnitude apart in size —
    * the q172/q178 lesson). Per-source offsets and counts come off
    * the ranked frame as one k-row broadcast aggregate: rank_in_src =
    * global_rn − min(global_rn within source). */
  def calibratedQuality(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String): DataFrame = {
    // persisted: the rank's range-partitioner samples its input before
    // the shuffle map runs it again — unpersisted, the regex scoring
    // pass executed twice per plan (r15-opt; narrow no-join upstream,
    // so the q172 persist caveat does not apply)
    val scored = graft.CacheScope.persisted(
      qualityScore(docs, idCol, textCol, carryCols = Seq(sourceCol))
        .select(col(idCol), col(sourceCol), col("quality_score_ppm")))
    val (ranked, _) = graft.operators.PrefixSum.globalRowNumber(
      scored, Seq(sourceCol, "quality_score_ppm", idCol), "__rn")
    val per = ranked.groupBy(sourceCol)
      .agg(count(lit(1)).as("__n"), min("__rn").as("__first"))
    ranked.join(broadcast(per), Seq(sourceCol))
      .withColumn("calibrated_ppm",
        expr("((__rn - __first) * 1000000) div greatest(__n - 1, 1)"))
      .select(col(idCol), col(sourceCol),
        col("quality_score_ppm"), col("calibrated_ppm"))
  }

  /** Per-source corpus DATASHEET — the "data card" summary a
    * training-data release ships with (Gebru et al., "Datasheets for
    * Datasets"): one row per source with document and token counts,
    * language spread, exact-duplicate membership (CORPUS-wide: a
    * text duplicated across sources counts as dup in every source
    * holding a copy — the number a mixture designer needs), the
    * short-document fraction, and the mean quality score. Every
    * column is exact integer arithmetic over the q22/q23/q25
    * primitives (ppm ratios by positive `div` ≡ DuckDB `//`), so
    * the whole card sits under the hash gate — a data card whose
    * numbers can silently drift is worse than none.
    *
    * Plan shape: one narrow pass computes per-doc signals, the dup
    * test is one 8-byte-key aggregate join (never a pair join), and
    * the card is a single \|sources\|-row aggregate — at 100 TB the
    * cost is the corpus scan, everything after is map-side
    * combined. */
  def corpusCard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      langCol: String,
      shortDocTokens: Long = 50L): DataFrame = {
    val q = qualityScore(docs, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("quality_score_ppm"))
    val base = docs.select(col(idCol), col(sourceCol), col(langCol),
      fingerprintCol(col(textCol)).as("__fp"),
      regexp_count(col(textCol), lit(BpeishPattern)).cast("long").as("__bpe"))
    val dup = base.groupBy(col("__fp"))
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1)
      .select(col("__fp"), lit(1L).as("__dup"))
    base.join(q, idCol)
      .join(dup, Seq("__fp"), "left")
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__bpe")).as("sum_tokens"),
        countDistinct(col(langCol)).as("n_langs"),
        sum(coalesce(col("__dup"), lit(0L))).as("n_dup_docs"),
        sum(when(col("__bpe") < shortDocTokens, 1L).otherwise(0L))
          .as("__short"),
        sum(col("quality_score_ppm")).as("__qsum"),
        sum(col("n_tokens").cast("long")).as("__wtok"))
      .select(col(sourceCol), col("n_docs"), col("sum_tokens"),
        col("n_langs"), col("n_dup_docs"),
        expr("(__short * 1000000L) div n_docs").as("short_ppm"),
        expr("__qsum div n_docs").as("avg_quality_ppm"),
        expr("__wtok div n_docs").as("avg_ws_tokens"))
  }

  /** Gopher-style WORD-level quality gates — the published heuristics
    * complementing [[qualityScore]]'s char-level ratios (Rae et al.
    * 2021, appendix A1: word-count bounds, mean word length, fraction
    * of words carrying an alphabetic character, symbol-only word
    * fraction, minimum distinct-stopword presence). Shuffle-free
    * narrow map; all ratios are exact integer math (the same
    * cross-engine halfway-rounding rationale as qualityScore —
    * mean_word_len is hundredths, fractions are ppm). */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    docs
      .select(
        col(idCol),
        size(toks).as("n_words"),
        aggregate(transform(toks, w => length(w).cast("long")),
          lit(0L), (acc, x) => acc + x).as("__chars"),
        size(filter(toks, w => w.rlike("[A-Za-z]"))).as("__alpha_words"),
        size(filter(toks, w => !w.rlike("[A-Za-z0-9]"))).as("__sym_words"),
        size(array_intersect(array_distinct(toks), typedLit(Stopwords))).as("stop_hits"))
      .select(
        col(idCol),
        col("n_words"),
        expr("(__chars * 100L) div greatest(n_words, 1)").as("mean_word_len_x100"),
        expr("(__alpha_words * 1000000L) div greatest(n_words, 1)").as("alpha_word_ppm"),
        expr("(__sym_words * 1000000L) div greatest(n_words, 1)").as("symbol_word_ppm"),
        col("stop_hits"))
      .withColumn("keep",
        col("n_words").between(50, 100000) &&
          col("mean_word_len_x100").between(300, 1000) &&
          col("alpha_word_ppm") >= 800000 &&
          col("stop_hits") >= 2)
  }

  /** Repetition stats over raw (non-distinct) word 2-grams — the
    * Gopher/C4 repetitive-document filters: duplicate-2-gram mass and
    * the most-frequent-2-gram share, both in exact ppm. Two
    * hash-partitioned aggregations ((doc, gram) counts, then per-doc
    * rollup) — the relational form scales where a per-row in-memory
    * frequency map would not (a pathological doc's gram table is
    * still distributed). Docs with fewer than 2 tokens have no
    * 2-grams and are excluded (both engines agree via the same
    * length guard). */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__t) - 1), i -> array_join(slice(__t, i, 2), ' '))"))
        .as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(
        sum("__c").as("total_2grams"),
        count(lit(1)).as("distinct_2grams"),
        max("__c").as("top_2gram_count"))
      .select(col(idCol), col("total_2grams"), col("distinct_2grams"), col("top_2gram_count"),
        expr("((total_2grams - distinct_2grams) * 1000000L) div total_2grams")
          .as("dup_2gram_ppm"),
        expr("(top_2gram_count * 1000000L) div total_2grams").as("top_2gram_ppm"))
      .withColumn("repetitive",
        col("top_2gram_ppm") > 180000 || col("dup_2gram_ppm") > 300000)

  /** Stopword-marker language ID: score each language by its marker
    * word occurrences in the token stream; argmax with a fixed
    * priority order (en > de > fr > es > zh) as tiebreak. */
  def langId(docs: DataFrame, idCol: String, textCol: String, actualLangCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, w => w.isInCollection(markers)))
    }
    val scored = docs.select(
      (col(idCol) +: col(actualLangCol).as("lang") +:
        scores.map { case (l, c) => c.as(s"__s_$l") }): _*)
    val langs = LangMarkers.map(_._1)
    // argmax with fixed-order tiebreak: lang i wins if its score is
    // >= every later language's score
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((l, i), elseCol) =>
        val later = langs.drop(i + 1).map(x => col(s"__s_$x"))
        val laterMax = if (later.sizeIs == 1) later.head else greatest(later: _*)
        when(col(s"__s_$l") >= laterMax, l).otherwise(elseCol)
    }
    scored
      .withColumn("pred_lang", pred)
      .withColumn("is_match", col("pred_lang") === col("lang"))
      .select(col(idCol), col("lang"), col("pred_lang"), col("is_match"))
  }

  /** Top TF-IDF terms per document.
    *
    * tf = raw term count in the doc; idf = ln(N / df) with df = number
    * of docs containing the term. Two hash-partitioned aggregations
    * (doc-term counts, term document-frequencies) and a broadcast-size
    * N — the classic inverted-index build, no cross joins. Ranking is
    * on the ROUNDED score with the term as tiebreak so the SQL oracle
    * agrees.
    */
  def topTfidfTerms(docs: DataFrame, idCol: String, textCol: String, k: Int = 5): DataFrame = {
    val terms = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(col(idCol)).distinct().count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("tfidf").desc, col("term"))
    tf.join(df, Seq("term"))
      .withColumn("tfidf", round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  /** Rolling polynomial fingerprint over the token stream:
    * h ← (h·31 + len(w)·97 + ascii(w[0])) mod 1e9+7.
    * A content fingerprint that is stable under whitespace layout and
    * cheap enough to run per-document at 100 TB (single fold, no
    * shuffle). */
  /** The rolling-hash fingerprint as a column expression — what lets
    * other operators (q156's export round-trip gate) fold the
    * fingerprint into their own projections. */
  def fingerprintCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      transform(
        tokens(text),
        w => (length(w) * lit(97L) +
          when(length(w) > 0, ascii(w)).otherwise(lit(0))).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)

  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprintCol(col(textCol)).as("fingerprint"))

  /** Sliding-window document chunking — the context-window prep step
    * of a training-data pipeline: each document becomes
    * ceil(len/stride) overlapping character chunks of `chunkSize`
    * chars, starts spaced `stride` apart (overlap = chunkSize −
    * stride). Pure narrow column algebra: `sequence` + `explode`
    * fan-out, `substring` slicing — codegen'd, shuffle-free, and the
    * explode multiplies rows ~len/stride per doc, which is the
    * output's intrinsic size (no intermediate blow-up). Empty docs
    * yield one empty chunk (totality: every doc_id survives).
    * Character-grain keeps it oracle-expressible; a token-grain
    * variant is the same plan over `split(text)` + `slice`+
    * `array_join` instead of `substring`. */
  def chunkDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    docs
      .select(col(idCol), col(textCol),
        explode(sequence(lit(1), greatest(length(col(textCol)), lit(1)), lit(stride)))
          .as("chunk_start"))
      .select(
        col(idCol),
        // integral div (starts are 1, 1+stride, … — exactly divisible)
        expr(s"(chunk_start - 1) div $stride").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        substring_index_safe(col(textCol), col("chunk_start"), chunkSize).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
  }

  // substring with a Column start (the functions.substring overload
  // takes only literal positions)
  private def substring_index_safe(text: Column, start: Column, len: Int): Column =
    text.substr(start, lit(len))

  /** Default PII pattern set: email, NANP-style phone, dotted-quad
    * IPv4. Every pattern stays inside the regex subset Java regex and
    * RE2 share (character classes, bounded quantifiers, `\b`, no
    * backreferences/lookaround), so the SAME pattern string runs in
    * Spark's codegen'd `regexp_*` functions and in a DuckDB oracle —
    * which is what makes a redaction pass hash-checkable across
    * engines. Order matters and is part of the contract: email is
    * scrubbed before IPv4 so a host-part like `u@10.2.3.4` can't be
    * double-counted (each later pattern sees the previous pattern's
    * redacted text). */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "[PHONE]"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"))

  /** PII detection + redaction scan — the scrubbing pass of a
    * training-data pipeline: count each pattern's matches and replace
    * them with its placeholder token, applying patterns strictly in
    * sequence over the progressively redacted text. Pure narrow
    * column algebra (`regexp_count` + `regexp_replace`, both
    * codegen'd): one pass over the corpus, no shuffle at any scale,
    * and the counts are computed on exactly the text each pattern
    * actually sees, so `n_<name>` sums are consistent with the final
    * redacted output (a redacted span can never match twice).
    * Output: id, one `n_<name>` count per pattern, `clean_text`, and
    * `has_pii`. */
  def piiScrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[(String, String, String)] = PiiPatterns): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    val names = patterns.map(_._1)
    require(names.distinct == names, s"duplicate pattern names: $names")
    val scrubbed = patterns.foldLeft(docs.select(col(idCol), col(textCol).as("__t"))) {
      case (acc, (name, re, token)) =>
        acc
          .withColumn(s"n_$name", regexp_count(col("__t"), lit(re)))
          .withColumn("__t", regexp_replace(col("__t"), re, token))
    }
    scrubbed
      .withColumn("has_pii",
        names.map(n => col(s"n_$n") > 0).reduce(_ || _))
      .withColumnRenamed("__t", "clean_text")
      .select(col(idCol) +: names.map(n => col(s"n_$n")) :+
        col("clean_text") :+ col("has_pii"): _*)
  }

  /** Script/style/comment blocks removed before tag stripping — a
    * `<script>` body is NOT content, and stripping its tags alone
    * would leak `var x=1;` into the "text". `(?s)` + non-greedy live
    * in the Java-regex ∩ RE2 subset (the piiScrub contract), so an
    * oracle engine re-runs the IDENTICAL strings. Lowercase tags
    * only — the well-formed-corpus contract, documented loudly. */
  val HtmlBlockPatterns: Seq[String] = Seq(
    "(?s)<script[^>]*>.*?</script>",
    "(?s)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->")

  /** Entity unescapes applied AFTER tag stripping, `&amp;` strictly
    * last — earlier would double-unescape `&amp;lt;` into `<`. */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML → text extraction — the boilerplate-strip pass every
    * web-crawl training corpus runs before quality scoring and dedup
    * (tags and scripts would otherwise dominate shingles and token
    * counts). Pipeline, strictly ordered: drop script/style/comment
    * BLOCKS, count + strip remaining tags (replaced by a space so
    * `</p><p>` keeps a token boundary), unescape the six standard
    * entities (`&amp;` last), collapse whitespace, trim. Plain text
    * passes through unchanged (zero tags, whitespace-normalized).
    * Pure narrow column algebra (`regexp_count`/`regexp_replace`,
    * codegen'd) — one pass, no shuffle at any scale; every pattern
    * stays in the Java-regex ∩ RE2 subset so a DuckDB oracle
    * hash-checks the EXTRACTED TEXT itself (q131).
    * Output: id, `n_tags`, `clean_text`, `n_chars`. */
  def stripHtml(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val blocksGone = HtmlBlockPatterns.foldLeft(
      docs.select(col(idCol), col(textCol).as("__t"))) {
      (acc, re) => acc.withColumn("__t", regexp_replace(col("__t"), re, " "))
    }
    val tagsGone = blocksGone
      .withColumn("n_tags", regexp_count(col("__t"), lit("<[^>]+>")))
      .withColumn("__t", regexp_replace(col("__t"), "<[^>]+>", " "))
    val unescaped = HtmlEntities.foldLeft(tagsGone) {
      case (acc, (ent, ch)) =>
        acc.withColumn("__t",
          regexp_replace(col("__t"), ent, java.util.regex.Matcher.quoteReplacement(ch)))
    }
    unescaped
      .withColumn("clean_text",
        trim(regexp_replace(col("__t"), "\\s+", " ")))
      .withColumn("n_chars", length(col("clean_text")))
      .select(col(idCol), col("n_tags"), col("clean_text"), col("n_chars"))
  }

  /** BM25 ranked retrieval — the scoring half of a full-text search
    * engine over the corpus, completing what [[topTfidfTerms]] (q40)
    * starts: TF-IDF summarizes a document's own salient terms; BM25
    * ranks documents against a QUERY, with the two refinements that
    * made it the IR default — term-frequency saturation (k1: the 10th
    * occurrence adds less than the 2nd) and length normalization (b:
    * long documents don't win by volume alone). Lucene's formulation:
    * idf = ln(1 + (N − df + ½)/(df + ½)),
    * tfNorm = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Determinism (the q92 posture, adapted to floats-by-necessity):
    * each per-term contribution is ONE float expression with
    * identical operator association on both engines — k1+1 is an
    * ENGINE-SIDE addition, never a driver-precomputed constant
    * (1.2+1.0 lands exactly on a rounding midpoint; both engines
    * must tie-break it themselves, identically) — rounded to 9
    * places and cast to DECIMAL, so the cross-term SUM is exact and
    * commutative and the top-k cut ranks on decimal compare + doc id,
    * never on float summation order. avgdl is an exact-integer
    * division spelled CAST/CAST on both sides. Plan: one corpus
    * pass to the (doc, term) grain, query terms filter AT THE SCAN
    * (isin pushdown), top-k is a TakeOrdered — no global window, no
    * single-task sort.
    * Output: doc_id, n_terms (query terms matched), score. */
  def bm25Rank(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val terms = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .transform(graft.CacheScope.persisted(_))
    val dl = terms.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
      .transform(graft.CacheScope.persisted(_))
    val totals = dl.agg(sum("dl").as("t"), count(lit(1)).as("n")).collect()(0)
    val n = totals.getLong(1)
    // empty corpus: SUM is NULL — return an empty, correctly-typed frame
    // instead of an NPE at plan-build time
    if (n == 0L)
      return docs.limit(0).select(col(idCol),
        lit(0L).as("n_terms"), lit(0.0d).as("score"))
    val totTok = totals.getLong(0)
    // exact integers divided engine-side: identical double both engines
    val avgdl = lit(totTok).cast("double") / lit(n).cast("double")
    val tf = terms.where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0d) +
      (lit(n).cast("double") - col("df") + lit(0.5d)) / (col("df") + lit(0.5d)))
    val tfNorm = (col("tf") * (lit(1.2d) + lit(1.0d))) /
      (col("tf") + lit(1.2d) * (lit(1.0d) - lit(0.75d) +
        lit(0.75d) * col("dl") / avgdl))
    tf.join(dfreq, "term").join(dl, idCol)
      .withColumn("__c", round(idf * tfNorm, 9).cast("decimal(28,9)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("__c")).as("__s"))
      .orderBy(col("__s").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("n_terms"),
        round(col("__s").cast("double"), 6).as("score"))
  }

  /** The BM25 retrieval INDEX at the (doc, term) grain — the
    * materialization every stored-ranking consumer shares: one row
    * per (doc, term) with the term count (`tf`), the doc's total
    * token length (`dl`, repeated per posting the way Lucene stores
    * per-doc norms), and the doc's rolling-hash [[fingerprintCol]]
    * (`fp`, the duplicate-exclusion key). Everything BM25 needs —
    * df, N, avgdl — is derivable from these rows by aggregation, so
    * the index is SELF-CONTAINED: publish it once and every later
    * ranking run is joins over the stored table, no re-tokenization.
    * Per-doc quantities are corpus-INDEPENDENT, so a crawl batch's
    * index rows can be computed from the batch alone and appended
    * ([[graft.sources.Txn.append]]) — incremental maintenance ≡
    * from-scratch rebuild by construction (Bm25IndexSpec pins it).
    * One corpus pass: tf from the exploded tokens, dl = Σtf per doc
    * (never a second token scan), fp a narrow per-doc column. */
  def bm25Index(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    tf.join(dl, idCol)
      .join(fingerprint(docs, idCol, textCol)
        .select(col(idCol), col("fingerprint").as("fp")), idCol)
      .select(col(idCol), col("term"), col("tf"), col("dl"), col("fp"))
  }

  /** Hard-negative mining — the retrieval-training prep step every
    * embedding/retriever pipeline runs: for each QUERY document, the
    * top-k lexically-similar corpus documents that are NOT the query
    * and NOT its textual duplicates. BM25-similar non-duplicates are
    * exactly the "hard" negatives (lexically close, semantically
    * distinct) contrastive training wants; excluding duplicate text
    * removes FALSE negatives — an exact copy of the query labeled
    * "negative" teaches the model the wrong thing.
    *
    * Ranks a [[bm25Index]] relation (stored or in-memory): the
    * distinct query-term table restricts the postings by a join
    * (never an isin literal — |queries| is data-sized); per-(query,
    * doc) scores are [[bm25Rank]]'s Lucene BM25 arithmetic under the
    * same determinism recipe (engine-side k1+1, round(9) → DECIMAL
    * per contribution, exact commutative decimal sum, ranks on
    * decimal compare + doc id). Exclusions use the index's own `fp`
    * column: self and same-fingerprint candidates drop BEFORE the
    * cut, so rank 1..k is dense over true negatives. Top-k is a
    * per-query keyed window — partitioned by qid, never global.
    * `queryPred` must be expressible over the index's columns
    * (typically the id). Output: (qid, rank, neg_id, n_terms,
    * score). */
  def hardNegativesFromIndex(
      index: DataFrame,
      idCol: String,
      queryPred: org.apache.spark.sql.Column,
      k: Int = 5): DataFrame = {
    val dl = index.select(col(idCol), col("dl")).distinct()
    val totals = dl.agg(sum("dl").as("t"), count(lit(1)).as("n")).collect()(0)
    val n = totals.getLong(1)
    // same empty-corpus guard as bm25Rank: SUM(dl) is NULL when no docs
    if (n == 0L)
      return index.limit(0).select(col(idCol).as("qid"),
        lit(0).as("rank"), col(idCol).as("neg_id"),
        lit(0L).as("n_terms"), lit(0.0d).as("score"))
    val avgdl = lit(totals.getLong(0)).cast("double") /
      lit(n).cast("double")

    // the (doc, term) grain is distinct by construction, so the
    // query-term table needs no dedup pass of its own. NO caching
    // here: the stored path re-reads column-pruned parquet (cheap),
    // the in-line wrapper persists the index INPUT once — restricted
    // postings are query-dependent and would be corpus-sized cache
    // pressure under a dense query set (the per-run-cache critique
    // this stored posture exists to close).
    //
    // Shuffle shape (guide §2.3/§2.4): `dl` and `fp` already sit ON
    // every index row, constant per doc — carrying them through the
    // term join and the (qid, doc) aggregate replaces the three
    // id-/qid-keyed joins the old plan ran against re-derived
    // distinct() tables (dl re-join + two fps joins), each of which
    // exchanged the candidate-pair table once more. The self/same-
    // fingerprint exclusion moves BEFORE the aggregate: fp and __qfp
    // are constant within a (qid, doc) group, so filtering pair rows
    // early drops exactly the groups the old post-agg filter dropped —
    // fewer rows into the exchange, identical survivors.
    val qTerms = index.where(queryPred)
      .select(col(idCol).as("qid"), col("term"), col("fp").as("__qfp"))
    val tf = index.select(col(idCol), col("term"), col("tf"), col("dl"), col("fp"))
      .join(qTerms.select("term").distinct(), "term")
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0d) +
      (lit(n).cast("double") - col("df") + lit(0.5d)) / (col("df") + lit(0.5d)))
    val tfNorm = (col("tf") * (lit(1.2d) + lit(1.0d))) /
      (col("tf") + lit(1.2d) * (lit(1.0d) - lit(0.75d) +
        lit(0.75d) * col("dl") / avgdl))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("__s").desc, col(idCol))
    qTerms
      .join(tf, "term").join(dfreq, "term")
      .where(col(idCol) =!= col("qid") && col("fp") =!= col("__qfp"))
      .withColumn("__c", round(idf * tfNorm, 9).cast("decimal(28,9)"))
      .groupBy(col("qid"), col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("__c")).as("__s"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col(idCol).as("neg_id"),
        col("n_terms"), round(col("__s").cast("double"), 6).as("score"))
  }

  /** [[hardNegativesFromIndex]] over an index built in-line from the
    * documents — the one-shot form (tokenize, rank, discard). A
    * pipeline that mines negatives repeatedly should [[bm25Index]] →
    * publish once and rank the stored table instead (`queryPred`
    * must then reference index columns, typically the id). */
  def hardNegatives(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryPred: org.apache.spark.sql.Column,
      k: Int = 5): DataFrame =
    hardNegativesFromIndex(
      graft.CacheScope.persisted(bm25Index(docs, idCol, textCol)),
      idCol, queryPred, k)

  /** Unicode text canonicalization — the cleanup pass a crawl corpus
    * runs BEFORE any hashing/shingling/dedup, because every identity
    * operator downstream compares bytes: `é` composed and `e`+U+0301
    * decomposed are the same text but different shingles, different
    * fingerprints, different MinHashes. Pipeline, strictly ordered:
    * NFC composition ([[graft.functions.NfcNormalize]], native
    * codegen'd expression — Spark has no built-in), strip
    * non-whitespace C0/DEL control characters (`\x00`–`\x08`, `\x0B`,
    * `\x0C`, `\x0E`–`\x1F`, `\x7F` — tab/LF/CR survive to the
    * collapse step), collapse whitespace runs to one space, trim.
    * Every regex lives in the Java ∩ RE2 subset (the piiScrub
    * contract) and DuckDB's `nfc_normalize` is the UAX #15 twin of
    * the expression, so the oracle hash-checks the NORMALIZED TEXT
    * itself. Pure narrow column algebra: one codegen'd pass, no
    * shuffle at any scale.
    * Output: id, `norm_text`, `n_chars_raw`, `n_chars`, `changed`. */
  /** Corpus-level SEGMENT dedup — CCNet/RefinedWeb boilerplate
    * removal at the sub-document grain: a span of text that repeats
    * across the corpus more than `maxFreq` times is boilerplate
    * (navigation chrome, license footers, template headers) and is
    * cut OUT of every document that carries it, while each document's
    * unique prose survives. The reference corpora split on newlines;
    * this corpus is flat token streams, so the segment is a fixed
    * `segLen`-token window — same machinery, deterministic
    * segmentation both engines can re-derive.
    *
    * Plan: segments materialize INSIDE the token array (`transform` +
    * `slice` + `array_join`, one narrow codegen'd pass — tokens are
    * never duplicated per segment) and explode to the (doc, seg_idx,
    * seg) grain; corpus frequency is one hash agg on the segment
    * text (exact — the hash-collision-free twin of CCNet's sha1
    * buckets, and the shuffle carries each segment once, the same
    * mass as one tokenize pass); survivors left-anti the
    * over-frequency set and reassemble per doc via
    * `array_sort(collect_list(struct(seg_idx, seg)))` — order
    * restored by the struct sort, never by shuffle luck. Totality:
    * every input doc returns (a fully-boilerplate doc keeps
    * n_kept = 0 and empty clean_text).
    * Output: (id, n_segs, n_kept, n_dropped, clean_text). */
  def segmentDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      segLen: Int = 12,
      maxFreq: Long = 2): DataFrame = {
    require(maxFreq >= 1, "maxFreq must be at least 1")
    val segs = segmentize(docs, idCol, textCol, segLen)
    val boiler = segs.groupBy("seg").agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxFreq)
      .select("seg")
    segmentDedupAgainst(docs, idCol, textCol, segLen, boiler)
  }

  /** The (doc, seg_idx, seg) segmentation relation — fixed
    * `segLen`-token windows built INSIDE the token array (one narrow
    * codegen'd pass; tokens never duplicate per segment). Shared by
    * [[segmentDedup]] (in-line frequency), [[segmentCounts]] (the
    * streaming-maintained frequency deltas), and the cut itself. */
  def segmentize(
      docs: DataFrame, idCol: String, textCol: String, segLen: Int): DataFrame = {
    require(segLen > 0, "segLen must be positive")
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__nseg",
        expr(s"(size(__toks) + ${segLen - 1}) div $segLen"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, __nseg - 1), " +
        s"i -> array_join(slice(__toks, i * $segLen + 1, $segLen), ' '))"))
        .as(Seq("seg_idx", "seg")))
  }

  /** Per-segment occurrence counts — a batch's ADDITIVE contribution
    * to the corpus frequency table (counts are per-doc quantities
    * summed, so deltas from disjoint batches sum to the from-scratch
    * corpus counts exactly). */
  def segmentCounts(
      docs: DataFrame, idCol: String, textCol: String, segLen: Int): DataFrame =
    segmentize(docs, idCol, textCol, segLen)
      .groupBy("seg").agg(count(lit(1)).as("n"))

  /** [[segmentDedup]]'s cut against an EXTERNALLY-derived boilerplate
    * set (one `seg` column) — the read side of the maintained-
    * frequency posture: frequency upkeep rides ingest, the cut is
    * applied here at read time, retroactively covering every stored
    * document (a segment that crossed the threshold in a LATER batch
    * drops from earlier carriers too, exactly as the one-shot
    * [[segmentDedup]] would). */
  def segmentDedupAgainst(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      segLen: Int,
      boiler: DataFrame): DataFrame = {
    val segs = segmentize(docs, idCol, textCol, segLen)
    val rebuilt = segs.join(boiler.select("seg"), Seq("seg"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            x => x.getField("seg")),
          " ").as("clean_text"))
    docs
      .select(col(idCol),
        expr(s"(size(split($textCol, ' ')) + ${segLen - 1}) div $segLen")
          .as("n_segs"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_segs") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def normalizeText(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol), col(textCol).as("__raw"))
      .withColumn("__t", call_function("graft_nfc", col("__raw")))
      .withColumn("__t",
        regexp_replace(col("__t"), "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""))
      .withColumn("norm_text", trim(regexp_replace(col("__t"), "\\s+", " ")))
      .select(col(idCol), col("norm_text"),
        length(col("__raw")).cast("long").as("n_chars_raw"),
        length(col("norm_text")).cast("long").as("n_chars"),
        (!(col("norm_text") <=> col("__raw"))).as("changed"))
  }
}
