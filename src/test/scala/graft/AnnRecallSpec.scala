package graft

import org.apache.spark.sql.functions._

import graft.similarity.Ann

/** q187 (Ann.recallAtK): the retrieval-recall harness. The harness is
  * EXACT arithmetic over two top-k relations — pinned independently
  * of any index's quality: exact-vs-exact is 1e6 ppm by construction,
  * a planted half-overlap measures exactly 400000 ppm, and a missing
  * query in the approximate side scores 0 rather than vanishing.
  * The registry corpus's measured LSH recall floor is asserted so the
  * rows-only gate is never vacuous. */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  test("exact-vs-exact is 1.0 for every query; planted overlap measures exactly") {
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L), (2L, 24L)
    ).toDF("vec_id", "neighbor_id")
    val self = Ann.recallAtK(exact, exact).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(self == Map(1L -> 1000000L, 2L -> 1000000L), self.toString)

    // approx finds 2 of query 1's 5 and NONE of query 2's (query 2
    // absent from the approximate side entirely — scores 0, present)
    val approx = Seq((1L, 10L), (1L, 13L), (1L, 99L)).toDF("vec_id", "neighbor_id")
    val got = Ann.recallAtK(exact, approx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 5L, 2L, 400000L), (2L, 5L, 0L, 0L)), got.toString)
  }

  test("registry corpus: the auto-tuned LSH index clears a real recall floor") {
    val emb = Tables.embeddings(spark, SfDir)
    val exact = Ann.bruteForceKnn(emb, "vec_id", "embedding", k = 5)
    val r = Ann.recallAtK(exact,
      Ann.lshKnn(emb, "vec_id", "embedding", k = 5))
    val n = emb.count()
    assert(r.count() == n, "one recall row per query vector")
    val mean = r.agg(avg("recall_ppm")).head.getDouble(0)
    // isotropic sf0.001 embeddings are LSH's WORST case (no planted
    // clusters; neighbors sit near cosine 0) — even there the
    // auto-tuned multi-probe index must beat a random-candidates
    // floor by a wide margin, and the gate must never be vacuous
    assert(mean > 100000.0, s"mean recall ${mean} ppm — index or harness broke")
  }
}
