package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** q182 (TextOps.segmentDedup): corpus-level boilerplate segment
  * removal. Planted corpus: a 4-token footer (segLen = 4 here) shared
  * by four docs is boilerplate (freq 4 > maxFreq 2); a footer shared
  * by only two docs is NOT (at the threshold, not over it); each
  * doc's unique prose survives and reassembles in segment order; a
  * doc that is pure boilerplate keeps totality with empty clean_text.
  */
class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private val footer = "copyright acme all rights" // one 4-token segment
  private val pair = "subscribe to our newsletter" // freq 2 — at maxFreq, kept

  test("over-frequency segments drop from every carrier; unique prose survives in order") {
    val docs = Seq(
      (1L, s"alpha beta gamma delta $footer"),
      (2L, s"epsilon zeta eta theta $footer"),
      (3L, s"iota kappa lambda mu $footer"),
      (4L, footer), // pure boilerplate
      (5L, s"nu xi omicron pi $pair"),
      (6L, s"rho sigma tau upsilon $pair"),
      (7L, "phi chi") // short unique doc, single ragged segment
    ).toDF("doc_id", "text")
    val got = TextOps.segmentDedup(docs, "doc_id", "text",
      segLen = 4, maxFreq = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L), "totality: every doc returns")
    assert(got(1L) == ((2L, 1L, 1L, "alpha beta gamma delta")))
    assert(got(2L) == ((2L, 1L, 1L, "epsilon zeta eta theta")))
    assert(got(3L) == ((2L, 1L, 1L, "iota kappa lambda mu")))
    assert(got(4L) == ((1L, 0L, 1L, "")), "pure-boilerplate doc: kept row, empty text")
    assert(got(5L) == ((2L, 2L, 0L, s"nu xi omicron pi $pair")),
      "freq == maxFreq is AT the threshold, not over it")
    assert(got(6L) == ((2L, 2L, 0L, s"rho sigma tau upsilon $pair")))
    assert(got(7L) == ((1L, 1L, 0L, "phi chi")), "ragged tail segment survives intact")
  }

  test("segment order is restored by the struct sort, not shuffle luck") {
    // 3 unique segments per doc across many docs — any ordering slip
    // scrambles the reassembled text
    val docs = (1L to 40L).map { i =>
      (i, s"a$i b$i c$i d$i e$i f$i g$i h$i i$i j$i k$i l$i")
    }.toDF("doc_id", "text")
    val got = TextOps.segmentDedup(docs, "doc_id", "text", segLen = 4, maxFreq = 2)
    val bad = got.join(docs, "doc_id")
      .where(col("clean_text") =!= col("text") || col("n_dropped") =!= 0)
      .count()
    assert(bad == 0L, "unique corpora must reassemble to their original text")
  }

  test("non-vacuous on the real testdata: boilerplate exists at sf0.001") {
    val got = TextOps.segmentDedup(
      Tables.documents(spark, SfDir), "doc_id", "text", segLen = 12, maxFreq = 2)
    assert(got.agg(sum("n_dropped")).head.getLong(0) > 0L,
      "the registry gate would be vacuous without real drops")
    assert(got.count() ==
      Tables.documents(spark, SfDir).count(), "totality on real data")
  }
}
