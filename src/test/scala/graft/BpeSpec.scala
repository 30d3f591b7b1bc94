package graft

import graft.text.Bpe

/** q183 (text.Bpe.trainMerges): BPE merge training. Hand-computed
  * merge sequences on planted corpora pin the algorithm: weighted
  * argmax, the (count DESC, l ASC, r ASC) tie-break, hierarchical
  * merges building on earlier rounds, early exhaustion, and the
  * documented leftmost-non-overlapping replace semantics. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String], rounds: Int) =
    Bpe.trainMerges(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "doc_id", "text", rounds)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("hierarchical merges with exact weighted counts; early exhaustion stops the loop") {
    // words: ab ×3, abc ×2, bc ×1
    // r1: (a,b) 3+2=5 beats (b,c) 3 → ab
    // r2: (ab,c) 2 beats (b,c) 1 → abc   (builds on r1's symbol)
    // r3: (b,c) 1 → bc; r4: no pairs left → stop at 3 of 5 rounds
    val got = run(Seq("ab ab abc", "ab abc bc"), rounds = 5)
    assert(got == Seq(
      (1, "a", "b", "ab", 5L),
      (2, "ab", "c", "abc", 2L),
      (3, "b", "c", "bc", 1L)), got.toString)
  }

  test("argmax ties break on left then right symbol, ascending") {
    // (x,y) and (y,z) both weigh 2 — x < y wins round 1
    val got = run(Seq("xy yz", "xy yz"), rounds = 1)
    assert(got == Seq((1, "x", "y", "xy", 2L)), got.toString)
  }

  test("leftmost non-overlapping replace: the boundary occurrence defers to the next round") {
    // 'aaa' → ' a a a ': (a,a) counts 2, ONE replace pass merges only
    // the leftmost → ' aa a '; round 2 merges (aa,a) → 'aaa'
    val got = run(Seq("aaa"), rounds = 3)
    assert(got == Seq(
      (1, "a", "a", "aa", 2L),
      (2, "aa", "a", "aaa", 1L)), got.toString)
  }

  test("non-vacuous at the real testdata: 8 full rounds of plausible English-ish merges") {
    val got = Bpe.trainMerges(
      Tables.documents(spark, SfDir), "doc_id", "text", rounds = 8)
    assert(got.count() == 8L, "testdata must carry 8 rounds of pair depth")
  }
}
