package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Planted-fixture coverage for the Gopher-style quality/repetition
  * filters (q72/q73), the budget mixture sampler (q74), and the PII
  * scrubber (q99). */
class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  test("gopherQuality: exact stats and keep-flag logic on planted docs") {
    // doc 1: 4 words "aa bb1 ?? the" — 1 symbol-only word, 3 alpha
    // words, 1 distinct stopword, 10 chars total
    val docs = Seq(
      (1L, "aa bb1 ?? the"),
      (2L, ("the of and " * 20).trim) // 60 words, all stopwords (3 distinct)
    ).toDF("doc_id", "text")
    val got = TextOps.gopherQuality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val d1 = got(1L)
    assert(d1.getAs[Int]("n_words") == 4)
    assert(d1.getAs[Long]("mean_word_len_x100") == 10L * 100 / 4) // 250
    assert(d1.getAs[Long]("alpha_word_ppm") == 3L * 1000000 / 4)
    assert(d1.getAs[Long]("symbol_word_ppm") == 1L * 1000000 / 4)
    assert(d1.getAs[Int]("stop_hits") == 1)
    assert(!d1.getAs[Boolean]("keep"), "4 words is under the 50-word floor")

    val d2 = got(2L)
    assert(d2.getAs[Int]("n_words") == 60)
    assert(d2.getAs[Int]("stop_hits") == 3)
    assert(d2.getAs[Long]("alpha_word_ppm") == 1000000L)
    // mean word len (3+2+3)/3 = 2.67 chars → below the 3.00 floor
    assert(d2.getAs[Long]("mean_word_len_x100") == (3L + 2 + 3) * 20 * 100 / 60)
    assert(!d2.getAs[Boolean]("keep"), "mean word length below floor must fail the gate")
  }

  test("repetitionStats: exact ppm on a planted repetitive doc; clean doc unflagged") {
    // "x y x y x y x y" → 7 2-grams: "x y"×4, "y x"×3 → top 4/7,
    // dup = (7-2)/7
    val rep = (1L, "x y x y x y x y")
    // 8 distinct words → 7 distinct 2-grams, top share 1/7
    val clean = (2L, "a b c d e f g h")
    val got = TextOps.repetitionStats(Seq(rep, clean).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = got(1L)
    assert(r1.getAs[Long]("total_2grams") == 7L)
    assert(r1.getAs[Long]("distinct_2grams") == 2L)
    assert(r1.getAs[Long]("top_2gram_count") == 4L)
    assert(r1.getAs[Long]("dup_2gram_ppm") == 5L * 1000000 / 7)
    assert(r1.getAs[Long]("top_2gram_ppm") == 4L * 1000000 / 7)
    assert(r1.getAs[Boolean]("repetitive"))

    val r2 = got(2L)
    assert(r2.getAs[Long]("distinct_2grams") == 7L && r2.getAs[Long]("total_2grams") == 7L)
    assert(r2.getAs[Long]("dup_2gram_ppm") == 0L)
    assert(!r2.getAs[Boolean]("repetitive"))

    // a 1-token doc has no 2-grams and is excluded, not crashed on
    assert(TextOps.repetitionStats(Seq((3L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text").count() == 0)
  }

  test("q78: the composed curation pipeline enforces every stage's invariant") {
    import graft.similarity.Dedup
    import graft.text.TextOps
    val out = SparkEntry.q78CurationPipeline(spark, SfDir).cache()
    try {
      val docs = Tables.documents(spark, SfDir)
      assert(out.count() > 0, "pipeline must keep a non-degenerate survivor set")
      // stage 4: the domain cap binds
      assert(out.groupBy("source").count().where(col("count") > 15).count() == 0)
      // stage 1: survivors are exact-dedup keepers (one per content hash)
      val kept = docs.join(out.select("doc_id"), "doc_id")
      assert(kept.groupBy(md5(col("text"))).count().where(col("count") > 1).count() == 0,
        "two surviving docs share identical text")
      // stages 2+3: every survivor passes the quality gate and is not repetitive
      assert(TextOps.gopherQuality(kept, "doc_id", "text").where(!col("keep")).count() == 0)
      assert(TextOps.repetitionStats(kept, "doc_id", "text")
        .where(col("repetitive")).count() == 0)
      // stage 5: shard range + determinism
      assert(out.where(col("shard") < 0 || col("shard") > 7).count() == 0)
      val again = SparkEntry.q78CurationPipeline(spark, SfDir)
      assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
      // and the gates actually filtered something (not a pass-through)
      assert(out.count() < Dedup.exact(docs, "doc_id", "text").count())
    } finally { out.unpersist(): Unit }
  }

  test("q74: rates derive from source sizes; admission is deterministic and within-rate") {
    val out = SparkEntry.q74BudgetMixture(spark, SfDir).cache()
    try {
      val docs = Tables.documents(spark, SfDir).select("doc_id", "source", "n_chars")
      // rate re-derivation: min(1e6, budget*1e6 div total-chars)
      val want = docs.groupBy("source").agg(sum("n_chars").as("tot"))
        .select(col("source"),
          least(lit(1000000L), expr("(5000 * 1000000L) div tot")).as("want_ppm"))
      val bad = out.select("source", "rate_ppm").distinct()
        .join(want, "source")
        .where(col("rate_ppm") =!= col("want_ppm"))
      assert(bad.count() == 0, "published rate_ppm must equal the derived rate")

      // admitted set is exactly the hash predicate over the input
      val wantAdmitted = docs.join(want, "source")
        .where(pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L), lit(1000000L)) <
          col("want_ppm"))
      assert(out.count() == wantAdmitted.count())
      assert(out.select("doc_id").exceptAll(wantAdmitted.select("doc_id")).count() == 0)

      // determinism: rerun is identical
      val again = SparkEntry.q74BudgetMixture(spark, SfDir)
      assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)

      // and the sample is a real subsample (budget binds at every SF)
      assert(out.count() > 0 && out.count() < docs.count())
    } finally { out.unpersist(): Unit }
  }

  test("piiScrub: planted spans redacted and counted exactly; decoys and clean text survive") {
    val docs = Seq(
      (1L, "plain words only"),
      (2L, "reach me at dev.lead+ci@mail.example.org or 555-867-5309 thanks"),
      (3L, "hosts 10.0.0.1 and 192.168.255.254 but not 1.2 or 1.2.3"),
      (4L, "decoys: a@b, 12-34-5678, ver 1.2.3, and u@ex.org twice u@ex.org"),
      (5L, "")
    ).toDF("doc_id", "text")
    val got = TextOps.piiScrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    def counts(id: Long) = {
      val r = got(id)
      (r.getAs[Int]("n_email"), r.getAs[Int]("n_phone"), r.getAs[Int]("n_ipv4"))
    }
    assert(counts(1L) == ((0, 0, 0)) && !got(1L).getAs[Boolean]("has_pii"))
    assert(got(1L).getAs[String]("clean_text") == "plain words only")
    assert(counts(2L) == ((1, 1, 0)))
    assert(got(2L).getAs[String]("clean_text") ==
      "reach me at [EMAIL] or [PHONE] thanks")
    assert(counts(3L) == ((0, 0, 2)),
      "2-octet and 3-octet dotted numbers must NOT count as IPv4")
    assert(got(3L).getAs[String]("clean_text") ==
      "hosts [IP] and [IP] but not 1.2 or 1.2.3")
    // TLD-less a@b is no email; 2-2-4 digits is no NANP phone; but
    // both planted emails redact (count reflects ALL occurrences)
    assert(counts(4L) == ((2, 0, 0)))
    assert(got(4L).getAs[String]("clean_text") ==
      "decoys: a@b, 12-34-5678, ver 1.2.3, and [EMAIL] twice [EMAIL]")
    assert(counts(5L) == ((0, 0, 0)))

    // a scrubbed corpus is a fixed point: placeholder tokens carry no
    // matchable spans, so a second pass counts zero everywhere
    val again = TextOps.piiScrub(
      TextOps.piiScrub(docs, "doc_id", "text")
        .select(col("doc_id"), col("clean_text").as("text")),
      "doc_id", "text")
    assert(again.where(col("has_pii")).count() == 0)
  }

  test("q99: planted corpus counts re-derive from doc_id arithmetic") {
    val out = SparkEntry.q99PiiScrub(spark, SfDir).cache()
    try {
      val docs = Tables.documents(spark, SfDir)
      assert(out.count() == docs.count(), "scrub must be total: every doc survives")
      // the synthetic corpus itself carries no PII, so every count is
      // exactly the plant arithmetic
      val bad = out.where(
        col("n_email") =!= when(col("doc_id") % 3 === 0, 1).otherwise(0) ||
        col("n_phone") =!= when(col("doc_id") % 5 === 0, 1).otherwise(0) ||
        col("n_ipv4")  =!= when(col("doc_id") % 7 === 0, 1).otherwise(0))
      assert(bad.count() == 0, "planted counts must re-derive from doc_id")
      // decoy suffix survives redaction verbatim on every even doc
      assert(out.where(col("doc_id") % 2 === 0 &&
        !col("clean_text").endsWith(" ver 1.2 by a@b desk")).count() == 0,
        "the non-PII decoy must survive the scrub")
    } finally { out.unpersist(): Unit }
  }

  test("stripHtml: blocks dropped whole, tags counted, entities ordered, plain text normalized") {
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      (1L, "<html><body><script>var leak=1;</script><p>Hello <b>world</b></p>" +
        "<!-- secret --><style>p{}</style></body></html>"),
      // entity order: double-escaped &amp;lt; must come out as the
      // LITERAL string "&lt;", never double-unescape to "<"
      (2L, "<p>A &amp; B &lt;tag&gt; C&#39;s &quot;q&quot; &amp;lt; end</p>"),
      // multi-line script body: (?s) must span the newline
      (3L, "<script>\nvar a=1;\nvar b=2;\n</script>after"),
      // plain text: passes through, whitespace-normalized only
      (4L, "  no   markup\there  "))
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.stripHtml(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(out(1L) == ((8, "Hello world")), s"got ${out(1L)}")
    assert(out(2L) == ((2, "A & B <tag> C's \"q\" &lt; end")), s"got ${out(2L)}")
    assert(out(3L) == ((0, "after")), s"got ${out(3L)}")
    assert(out(4L) == ((0, "no markup here")), s"got ${out(4L)}")
  }

  test("bm25Rank: saturation, length normalization, coverage beats repetition, top-k determinism") {
    // doc 1: both query terms once, short — should rank first
    // doc 2: one query term hammered 8× in a long doc — saturation +
    //        length norm must keep it below doc 1
    // doc 3: one query term once — below doc 2
    // doc 4: no query term — absent
    val docs = Seq(
      (1L, "scan merge fast"),
      (2L, "scan scan scan scan scan scan scan scan pad pad pad pad pad pad pad pad"),
      (3L, "scan and other words here"),
      (4L, "nothing relevant at all")
    ).toDF("doc_id", "text")
    val got = TextOps.bm25Rank(docs, "doc_id", "text",
      Seq("scan", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), s"rank order wrong: ${got.toSeq}")
    assert(got.head._2 == 2L && got(1)._2 == 1L, "n_terms mismatch")
    // 8× tf must score under ~2× the 1× doc of same length class —
    // saturation: tf·(k1+1)/(tf+k1·norm) caps near k1+1
    val s2 = got(1)._3; val s3 = got(2)._3
    assert(s2 < 2.0 * s3, s"saturation failed: 8×tf=$s2 vs 1×tf=$s3")
    // deterministic rerun
    val again = TextOps.bm25Rank(docs, "doc_id", "text",
      Seq("scan", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("hardNegatives: self and duplicate text excluded, lexically-near docs rank, unrelated absent") {
    // query doc 10; doc 11 is its EXACT duplicate (false negative —
    // must be excluded); docs 12/13 share terms (the hard negatives,
    // 12 shares more → rank 1); doc 14 shares nothing (absent)
    val docs = Seq(
      (10L, "spark shuffle join window"),
      (11L, "spark shuffle join window"),
      (12L, "spark shuffle join elsewhere"),
      (13L, "spark alone here today"),
      (14L, "completely unrelated words")
    ).toDF("doc_id", "text")
    val got = TextOps.hardNegatives(docs, "doc_id", "text",
      queryPred = col("doc_id") === 10L, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.forall(_._1 == 10L))
    assert(!got.exists(_._3 == 10L), "self leaked as a negative")
    assert(!got.exists(_._3 == 11L), "an exact duplicate is a FALSE negative")
    assert(!got.exists(_._3 == 14L), "no shared term → no candidate")
    assert(got.map(g => (g._2, g._3)).toSeq == Seq((1, 12L), (2, 13L)),
      s"rank order wrong: ${got.toSeq}")
    assert(got.find(_._3 == 12L).get._4 == 3L &&
      got.find(_._3 == 13L).get._4 == 1L, "matched-term counts wrong")
    // ranks stay DENSE after exclusion (1..n, no gaps where the dup sat)
    assert(got.map(_._2).toSeq == (1 to got.length).toSeq)
  }

  test("bm25Rank / hardNegatives: an empty corpus yields an empty frame, not an NPE") {
    // SUM(dl) over zero docs is NULL — the plan-build-time scalar read
    // must guard it and return a correctly-typed empty result
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r1 = TextOps.bm25Rank(empty, "doc_id", "text", Seq("scan"), k = 5)
    assert(r1.columns.toSeq == Seq("doc_id", "n_terms", "score"))
    assert(r1.isEmpty)
    val r2 = TextOps.hardNegatives(empty, "doc_id", "text",
      queryPred = col("doc_id") === 1L, k = 5)
    assert(r2.columns.toSeq == Seq("qid", "rank", "neg_id", "n_terms", "score"))
    assert(r2.isEmpty)
  }

  test("normalizeText: NFC composition, control strip, whitespace collapse, idempotence") {
    val decomposed = "cafe\u0301" // e + combining acute (NFD)
    val composed = "caf\u00e9"     // precomposed (NFC)
    val docs = Seq(
      (1L, decomposed),
      (2L, "a\u0000b\u0007c\u007fd"), // control chars stripped, no space left
      (3L, "  x\t\ty\r\nz  "),              // runs collapse, ends trim
      (4L, "already clean"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.normalizeText(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(3)) -1 else r.getLong(3),
          if (r.isNullAt(4)) null else r.getBoolean(4)))).toMap
    assert(got(1L)._1 == composed && got(1L)._2 == 4L && got(1L)._3 == true,
      s"NFC: ${got(1L)}")
    assert(got(2L) == (("abcd", 4L, true)), s"controls: ${got(2L)}")
    assert(got(3L) == (("x y z", 5L, true)), s"whitespace: ${got(3L)}")
    assert(got(4L) == (("already clean", 13L, false)), s"clean: ${got(4L)}")
    assert(got(5L)._1 == null, s"null text: ${got(5L)}")
    // idempotent: a normalized corpus re-normalizes to itself unchanged
    val again = TextOps.normalizeText(
      got.toSeq.filter(_._1 != 5L).map { case (id, (t, _, _)) => (id, t) }
        .toDF("doc_id", "text"), "doc_id", "text")
    assert(again.where(col("changed")).count() == 0, "not idempotent")
  }

  test("q165 data card reconciles with whole-corpus counts; dup membership is corpus-wide") {
    val docs = Tables.documents(spark, SfDir)
    val card = TextOps.corpusCard(docs, "doc_id", "text", "source", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    // Σ n_docs over sources = the corpus
    assert(card.values.map(_._1).sum == docs.count())
    // Σ n_dup_docs = members of >1-sized fingerprint classes,
    // re-derived independently (q16's exact-dup partition)
    val dupMembers = docs
      .select(TextOps.fingerprintCol(col("text")).as("fp"))
      .groupBy("fp").count().where(col("count") > 1)
      .agg(coalesce(sum("count"), lit(0L))).head.getLong(0)
    assert(card.values.map(_._3).sum == dupMembers,
      s"dup membership drifted: ${card.values.map(_._3).sum} vs $dupMembers")
    // a cross-source duplicate counts in EVERY source holding a copy:
    // plant one and check both sides
    val sess = spark
    import sess.implicits._
    val planted = Seq(
      (1L, "same text here", "srcA", "en"),
      (2L, "same text here", "srcB", "en"),
      (3L, "unique text here", "srcA", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val small = TextOps.corpusCard(planted, "doc_id", "text", "source", "lang")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(small == Map("srcA" -> 1L, "srcB" -> 1L), small.toString)
  }

  test("calibratedQuality (q212): source-relative rank ppm, ties by id, " +
    "single-doc source calibrates to 0") {
    // srcA: three docs whose raw scores order c < a = b (tie broken by
    // id); srcB: one doc (calibrates to 0 whatever its raw score)
    val docs = Seq(
      (1L, "the and of to in", "srcA"),   // all-stopword prose: high score
      (2L, "the and of to in", "srcA"),   // identical → tie with doc 1
      (3L, "0123 4567 89!! ###", "srcA"), // digits+punct: low score
      (9L, "whatever text", "srcB"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.calibratedQuality(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    // srcA ranks: doc3 (lowest) → 0, doc1 → ⌊1e6/2⌋, doc2 → 1e6
    assert(got(3L) == (("srcA", 0L)), s"lowest rank must calibrate to 0: $got")
    assert(got(1L) == (("srcA", 500000L)), s"tie must break by id: $got")
    assert(got(2L) == (("srcA", 1000000L)), s"top rank must calibrate to 1e6: $got")
    assert(got(9L) == (("srcB", 0L)), s"single-doc source must calibrate to 0: $got")
  }
}
