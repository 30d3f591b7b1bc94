package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-construction
  * step of an LLM data pipeline (Sennrich et al.'s algorithm, the
  * GPT/Llama tokenizer family's core): starting from characters,
  * repeatedly find the most frequent ADJACENT symbol pair across the
  * corpus and fuse it into one symbol; the ordered merge list IS the
  * trained tokenizer.
  *
  * Scale shape (the trick every real BPE trainer uses): the corpus
  * collapses to the (word, count) grain FIRST — one tokenize pass and
  * one aggregate — and all `rounds` iterations run over that bounded
  * relation, never the corpus. Per round: one narrow pair expansion
  * (`zip_with` over the symbol array — no shuffle), one small
  * (pair → weighted count) aggregate, a 1-row argmax collected to the
  * driver (the Lloyd-iteration posture PQ codebook training already
  * uses), and one codegen'd literal `replace` applying the merge to
  * every word's symbol string.
  *
  * Determinism contract (what makes this ORACLE-CHECKABLE where real
  * trainers differ in tie handling): argmax ties break on (count
  * DESC, left ASC, right ASC); merge application is ONE leftmost
  * non-overlapping literal-string replace pass — `replace(s, ' l r ',
  * ' lr ')` over the space-joined, space-padded symbol string — whose
  * semantics are identical in Java and DuckDB (an occurrence sharing
  * its boundary space with a just-replaced occurrence defers to a
  * later round; stated variant of greedy pair fusion). Symbols must
  * stay free of spaces and quotes — true from character
  * initialization over a whitespace-tokenized corpus, and required
  * (the merge of two clean symbols is clean).
  *
  * Output: one row per executed round — (round, l_sym, r_sym, merged,
  * pair_n); stops early if every word has fused to a single symbol. */
object Bpe {

  def trainMerges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rounds: Int,
      pretokenize: Boolean = false): DataFrame =
    trainLoop(docs, textCol, rounds, pretokenize)._1

  /** The shared training loop: returns (merge table, final
    * (symbol-string, count) state) — [[trainMerges]] publishes the
    * first, [[vocabulary]] aggregates the second.
    *
    * `pretokenize` = GPT-style class pre-tokenization: instead of
    * whitespace words, the merge units are [[TextOps.BpeishPattern]]
    * classes (letter runs / digit runs / single marks), so a merge
    * can NEVER cross a class boundary — punctuation does not fuse
    * into words, version strings split into their runs. The regex
    * lives in the Java ∩ RE2 subset, so the oracle extracts the
    * identical units. */
  private def trainLoop(
      docs: DataFrame,
      textCol: String,
      rounds: Int,
      pretokenize: Boolean = false): (DataFrame, DataFrame) = {
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")
    val spark = docs.sparkSession
    import spark.implicits._

    // corpus → bounded (symbol-string, count) grain: ' a b c ' padded
    // so every symbol occurrence is space-delimited on both sides
    val units =
      if (pretokenize)
        explode(expr(
          s"regexp_extract_all($textCol, '${TextOps.BpeishPattern}', 0)"))
      else explode(split(col(textCol), " "))
    val words = docs
      .select(units.as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("c"))
      .select(
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")).as("s"),
        col("c"))

    var state = graft.CacheScope.persisted(words)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val top: Array[Row] = state
        // single-symbol words carry no pairs (and slice-length 0 is
        // not worth relying on) — drop them before the expansion
        .where(expr("size(split(trim(s), ' ')) >= 2"))
        .select(expr(
          "explode(zip_with(" +
            "slice(split(trim(s), ' '), 1, size(split(trim(s), ' ')) - 1), " +
            "slice(split(trim(s), ' '), 2, size(split(trim(s), ' ')) - 1), " +
            "(x, y) -> struct(x AS l, y AS r))) AS p"), col("c"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        require(!l.contains("'") && !r.contains("'"),
          "symbol universe must be quote-free (whitespace-tokenized corpus)")
        merges += ((round, l, r, n))
        // one leftmost non-overlapping literal replace — the merge
        val next = state
          .select(expr(s"replace(s, ' $l $r ', ' $l$r ')").as("s"), col("c"))
        state = graft.CacheScope.persisted(next)
      }
    }
    val mergeTable = merges.toSeq
      .toDF("round", "l_sym", "r_sym", "pair_n")
      .select(col("round"), col("l_sym"), col("r_sym"),
        concat(col("l_sym"), col("r_sym")).as("merged"), col("pair_n"))
    (mergeTable, state)
  }

  /** The trained VOCABULARY — the artifact a tokenizer actually
    * ships: every symbol surviving `rounds` merges, its corpus
    * occurrence count, and its dense token id (rank by count DESC,
    * symbol ASC — the deterministic id assignment an embedding table
    * is sized against). The vocabulary grain is DRIVER-BOUNDED by
    * construction: |initial alphabet| + at most `rounds` merged
    * symbols, so the id-assignment window runs over a few dozen rows
    * — the documented k-row exception to the no-global-window rule
    * (the CORPUS never passes through it; counts aggregate at the
    * bounded word grain first).
    * Output: (token_id, symbol, n_occurrences). */
  def vocabulary(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rounds: Int): DataFrame = {
    val (_, state) = trainLoop(docs, textCol, rounds)
    val counts = state
      .select(explode(split(trim(col("s")), " ")).as("symbol"), col("c"))
      .groupBy("symbol").agg(sum("c").as("n_occurrences"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occurrences").desc, col("symbol").asc)
    counts
      .withColumn("token_id", row_number().over(w).cast("long"))
      .select(col("token_id"), col("symbol"), col("n_occurrences"))
  }

  /** [[vocabulary]] derived from an ALREADY-TRAINED merge list — the
    * stored-posture form: no iterative argmax, just the corpus's
    * word grain with the merge chain applied in order (identical to
    * the training loop's final state by construction: the loop's
    * state IS the word table with each round's replace applied) and
    * one bounded aggregate. What a pipeline reading the published
    * merge table uses to size its embedding table. */
  def vocabularyFromMerges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    merges.foreach { case (l, r) =>
      require(!l.contains("'") && !r.contains("'"), "quote-free symbols required")
    }
    val applied = merges.foldLeft(
      "concat(' ', regexp_replace(word, '(.)', '$1 '))") { case (acc, (l, r)) =>
      s"replace($acc, ' $l $r ', ' $l$r ')"
    }
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("c"))
      .select(explode(split(trim(expr(applied)), " ")).as("symbol"), col("c"))
      .groupBy("symbol").agg(sum("c").as("n_occurrences"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occurrences").desc, col("symbol").asc)
    counts
      .withColumn("token_id", row_number().over(w).cast("long"))
      .select(col("token_id"), col("symbol"), col("n_occurrences"))
  }

  /** The DuckDB twin of [[vocabulary]]: the [[oracleSql]] CTE chain,
    * then the final state's symbols aggregate and rank. */
  def vocabOracleSql(table: String, textCol: String, rounds: Int): String = {
    val trainCtes = oracleSql(table, textCol, rounds)
    val withClause = trainCtes.substring(0, trainCtes.indexOf("\nSELECT 1 AS round"))
    withClause + ",\n" +
      s"""v AS (
         |  SELECT sym AS symbol, SUM(c) AS n_occurrences
         |  FROM (SELECT UNNEST(string_split(trim(s), ' ')) AS sym, c FROM s$rounds)
         |  GROUP BY sym
         |)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, symbol ASC) AS BIGINT)
         |    AS token_id,
         |  symbol, CAST(n_occurrences AS BIGINT) AS n_occurrences
         |FROM v""".stripMargin
  }

  /** The ENCODE side of the tokenizer — apply a learned merge list to
    * the corpus and report each document's token counts (the step a
    * data pipeline actually bills by: context-window budgeting, token
    * accounting, packing all consume ENCODED lengths, not characters).
    *
    * The merge list is driver-bounded by construction (≤ `rounds`
    * rows), so application is ONE narrow codegen'd expression per
    * document: the word array is transformed with the merge chain —
    * each word char-splits to its padded symbol string and the
    * `rounds` literal replaces apply IN MERGE ORDER (order is the
    * tokenizer: applying p+ar before a+r would never fire) — and the
    * per-word symbol counts fold to the doc total. No shuffle, no
    * explode, no join: encode cost is a single corpus map pass at any
    * scale. Word boundaries are hard (symbols never merge across
    * words — the padded per-word string makes that structural).
    * Output: (id, n_words, n_chars_sym, n_bpe_tokens) — n_chars_sym
    * is the pre-merge symbol count, so the compression the merges
    * bought is n_chars_sym − n_bpe_tokens, exactly. */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    merges.foreach { case (l, r) =>
      require(!l.contains("'") && !r.contains("'"), "quote-free symbols required")
    }
    val applied = merges.foldLeft(
      "concat(' ', regexp_replace(w, '(.)', '$1 '))") { case (acc, (l, r)) =>
      s"replace($acc, ' $l $r ', ' $l$r ')"
    }
    docs.select(
      col(idCol),
      expr(s"size(filter(split($textCol, ' '), w -> w <> ''))")
        .cast("long").as("n_words"),
      expr(s"aggregate(filter(split($textCol, ' '), w -> w <> ''), " +
        "0, (a, w) -> a + length(w))").cast("long").as("n_chars_sym"),
      expr(s"aggregate(transform(filter(split($textCol, ' '), w -> w <> ''), " +
        s"w -> size(split(trim($applied), ' '))), 0, (a, x) -> a + x)")
        .cast("long").as("n_bpe_tokens"))
  }

  /** [[encode]] with the merges trained on the same corpus — the
    * standard self-tokenization posture (train the tokenizer on the
    * corpus, then bill the corpus in its own tokens). */
  def trainAndEncode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rounds: Int): DataFrame = {
    val merges = trainMerges(docs, idCol, textCol, rounds)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    encode(docs, idCol, textCol, merges)
  }

  /** Encode to the ordered TOKEN-ID STREAM — the artifact training
    * actually consumes: every document becomes its in-order sequence
    * of vocabulary ids (the rows sequence packing / context-window
    * assembly take as input; [[encode]]'s counts are this stream's
    * lengths). Same driver-bounded merge chain as [[encode]] applied
    * per word; symbols join the vocabulary for their ids; position is
    * a PER-DOC row_number over (word_pos, sym_pos) — partitioned by
    * document, never a global sort. Empty documents have no tokens
    * (a stream, not a stats row — totality is [[encode]]'s job).
    * `vocab` must cover the corpus's post-merge symbols (true by
    * construction under self-tokenization: [[vocabulary]] from the
    * same corpus and rounds).
    * Output: (id, pos, token_id, symbol), pos 1-based per doc. */
  def encodeIds(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      vocab: DataFrame): DataFrame = {
    merges.foreach { case (l, r) =>
      require(!l.contains("'") && !r.contains("'"), "quote-free symbols required")
    }
    val applied = merges.foldLeft(
      "concat(' ', regexp_replace(w, '(.)', '$1 '))") { case (acc, (l, r)) =>
      s"replace($acc, ' $l $r ', ' $l$r ')"
    }
    val words = docs.select(col(idCol),
      posexplode(expr(s"filter(split($textCol, ' '), w -> w <> '')"))
        .as(Seq("word_pos", "w")))
    val syms = words
      .withColumn("__s", expr(applied))
      .select(col(idCol), col("word_pos"),
        posexplode(split(trim(col("__s")), " ")).as(Seq("sym_pos", "symbol")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("word_pos"), col("sym_pos"))
    syms.join(vocab.select(col("token_id"), col("symbol")), Seq("symbol"))
      .withColumn("pos", row_number().over(win).cast("long"))
      .select(col(idCol), col("pos"), col("token_id"), col("symbol"))
  }

  /** The DuckDB twin of [[encodeIds]] under self-tokenization: the
    * [[oracleSql]] CTE chain learns the merges, the vocabulary ranks
    * the final state's symbols, and the corpus re-explodes at the
    * (doc, word_pos) grain (list index over `range(len)` — order by
    * construction, not engine luck), applies the same replace chain,
    * and joins its post-merge symbols to their ids. */
  def encodeIdsOracleSql(
      table: String, idCol: String, textCol: String, rounds: Int): String = {
    val trainCtes = oracleSql(table, textCol, rounds)
    val withClause = trainCtes.substring(0, trainCtes.indexOf("\nSELECT 1 AS round"))
    val tail =
      s"""v AS (
         |  SELECT sym AS symbol, SUM(c) AS n_occurrences
         |  FROM (SELECT UNNEST(string_split(trim(s), ' ')) AS sym, c FROM s$rounds)
         |  GROUP BY sym
         |), vv AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, symbol ASC)
         |      AS token_id, symbol
         |  FROM v
         |), dw AS (
         |  SELECT $idCol, i AS word_pos, t[i + 1] AS word
         |  FROM (SELECT $idCol,
         |          list_filter(string_split($textCol, ' '), w -> w <> '') AS t
         |        FROM $table),
         |       UNNEST(range(len(t))) AS u(i)
         |), e0 AS (
         |  SELECT $idCol, word_pos,
         |    ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS s
         |  FROM dw
         |)""".stripMargin
    val eCtes = (1 to rounds).map { i =>
      s"""e$i AS (
         |  SELECT $idCol, word_pos,
         |    replace(s, ' ' || m.l_sym || ' ' || m.r_sym || ' ',
         |            ' ' || m.l_sym || m.r_sym || ' ') AS s
         |  FROM e${i - 1}, m$i m
         |)""".stripMargin
    }
    val tok =
      s"""tok AS (
         |  SELECT $idCol, word_pos, j AS sym_pos, y[j + 1] AS symbol
         |  FROM (SELECT $idCol, word_pos, string_split(trim(s), ' ') AS y FROM e$rounds),
         |       UNNEST(range(len(y))) AS u(j)
         |)""".stripMargin
    (Seq(withClause, tail) ++ eCtes ++ Seq(tok)).mkString("", ",\n", "\n") +
      s"""SELECT tok.$idCol,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY tok.$idCol
         |    ORDER BY tok.word_pos, tok.sym_pos) AS BIGINT) AS pos,
         |  CAST(vv.token_id AS BIGINT) AS token_id, tok.symbol
         |FROM tok JOIN vv USING (symbol)""".stripMargin
  }

  /** The DuckDB twin of [[trainAndEncode]]: the [[oracleSql]] CTE
    * chain learns the merges, then the corpus explodes to the
    * (doc, word) grain and the same replace chain applies round by
    * round (dN = d(N−1) ⋈ mN); per-doc counts aggregate at the end.
    * LEFT JOIN restores totality for documents with no non-empty
    * words (the Spark side's fold over an empty array is 0). */
  def encodeOracleSql(
      table: String, idCol: String, textCol: String, rounds: Int): String = {
    val trainCtes = oracleSql(table, textCol, rounds)
    val withClause = trainCtes.substring(0, trainCtes.indexOf("\nSELECT 1 AS round"))
    val d0 =
      s"""d0 AS (
         |  SELECT $idCol, length(word) AS n_chars_sym,
         |    ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS s
         |  FROM (SELECT $idCol, UNNEST(string_split($textCol, ' ')) AS word FROM $table)
         |  WHERE word <> ''
         |)""".stripMargin
    val dCtes = (1 to rounds).map { i =>
      s"""d$i AS (
         |  SELECT $idCol, n_chars_sym,
         |    replace(s, ' ' || m.l_sym || ' ' || m.r_sym || ' ',
         |            ' ' || m.l_sym || m.r_sym || ' ') AS s
         |  FROM d${i - 1}, m$i m
         |)""".stripMargin
    }
    val agg =
      s"""enc AS (
         |  SELECT $idCol, COUNT(*) AS n_words, SUM(n_chars_sym) AS n_chars_sym,
         |    SUM(len(string_split(trim(s), ' '))) AS n_bpe_tokens
         |  FROM d$rounds GROUP BY $idCol
         |)""".stripMargin
    (Seq(withClause) ++ Seq(d0) ++ dCtes ++ Seq(agg)).mkString("", ",\n", "\n") +
      s"""SELECT t.$idCol,
         |  CAST(COALESCE(enc.n_words, 0) AS BIGINT) AS n_words,
         |  CAST(COALESCE(enc.n_chars_sym, 0) AS BIGINT) AS n_chars_sym,
         |  CAST(COALESCE(enc.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
         |FROM $table t LEFT JOIN enc ON t.$idCol = enc.$idCol""".stripMargin
  }

  /** The DuckDB twin of [[trainMerges]], `rounds` unrolled as CTE
    * pairs (pN = weighted adjacent-pair counts over sN-1's symbol
    * strings, mN = the tie-broken argmax, sN = the replace applied
    * corpus-wide) — generated, not hand-maintained, so the two
    * engines can never drift round-structure. Exhaustion composes
    * identically: an empty mN empties every later sN/mN, so both
    * engines emit exactly the executed rounds. */
  def oracleSql(
      table: String, textCol: String, rounds: Int,
      pretokenized: Boolean = false): String = {
    val unitExpr =
      if (pretokenized)
        s"UNNEST(regexp_extract_all($textCol, '${TextOps.BpeishPattern}'))"
      else s"UNNEST(string_split($textCol, ' '))"
    val init =
      s"""w0 AS (
         |  SELECT word, COUNT(*) AS c FROM (
         |    SELECT $unitExpr AS word FROM $table
         |  ) WHERE word <> '' GROUP BY word
         |), s0 AS (
         |  SELECT ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS s, c
         |  FROM w0
         |)""".stripMargin
    val roundCtes = (1 to rounds).map { i =>
      val prev = s"s${i - 1}"
      s"""p$i AS (
         |  SELECT t[i + 1] AS l_sym, t[i + 2] AS r_sym, SUM(c) AS n
         |  FROM (SELECT string_split(trim(s), ' ') AS t, c FROM $prev),
         |       UNNEST(range(len(t) - 1)) AS u(i)
         |  GROUP BY 1, 2
         |), m$i AS (
         |  SELECT l_sym, r_sym, n FROM p$i
         |  ORDER BY n DESC, l_sym ASC, r_sym ASC LIMIT 1
         |), s$i AS (
         |  SELECT replace(s, ' ' || m.l_sym || ' ' || m.r_sym || ' ',
         |                 ' ' || m.l_sym || m.r_sym || ' ') AS s, c
         |  FROM $prev, m$i m
         |)""".stripMargin
    }
    val rows = (1 to rounds).map { i =>
      s"SELECT $i AS round, l_sym, r_sym, l_sym || r_sym AS merged, " +
        s"CAST(n AS BIGINT) AS pair_n FROM m$i"
    }
    (Seq(init) ++ roundCtes).mkString("WITH ", ",\n", "\n") +
      rows.mkString("", "\nUNION ALL\n", "")
  }
}
