package graft

import graft.similarity.Ann

/** The compact (mapPartitions) and declarative (join+window) brute
  * force kNN must be EXACTLY interchangeable — same rounding, same
  * tiebreaks, bit-equal cosines. */
class AnnSpec extends SparkSpec {

  test("bruteForceKnnCompact ≡ bruteForceKnnExpr (exact)") {
    val emb = Tables.embeddings(spark, SfDir)
    val compact = Ann.bruteForceKnnCompact(emb, "vec_id", "embedding", k = 5)
    val expr = Ann.bruteForceKnnExpr(emb, "vec_id", "embedding", k = 5)
      .selectExpr("cast(vec_id as long) vec_id", "cast(neighbor_id as long) neighbor_id",
        "cosine", "rank")
    assert(compact.count() == expr.count())
    assert(compact.exceptAll(expr).count() == 0 && expr.exceptAll(compact).count() == 0,
      "compact and declarative kNN diverge")
  }
}
