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

  test("bruteForceKnn above the compact threshold dispatches to the distributed path, same values") {
    val emb = Tables.embeddings(spark, SfDir)
    // maxCompactRows=1 forces the no-broadcast distributed join — the
    // path the dispatcher takes when the collection cannot be
    // driver-materialized; values must be identical to the compact path
    val distributed = Ann.bruteForceKnn(emb, "vec_id", "embedding", k = 5, maxCompactRows = 1)
      .selectExpr("cast(vec_id as long) vec_id", "cast(neighbor_id as long) neighbor_id",
        "cosine", "rank")
    val compact = Ann.bruteForceKnnCompact(emb, "vec_id", "embedding", k = 5)
    assert(distributed.count() == compact.count())
    assert(distributed.exceptAll(compact).count() == 0 && compact.exceptAll(distributed).count() == 0,
      "dispatched distributed kNN diverges from compact")
  }

  test("nearDupPairsLsh ≡ cosinePairs: LSH candidates lose no qualifying pair on testdata") {
    val emb = Tables.embeddings(spark, SfDir)
    val exact = Ann.cosinePairs(emb, "vec_id", "embedding", threshold = 0.4)
    val lsh = Ann.nearDupPairsLsh(emb, "vec_id", "embedding", threshold = 0.4,
      numTables = 32, bitsPerTable = 3)
    assert(exact.count() > 0, "degenerate test: no qualifying pairs")
    assert(exact.exceptAll(lsh).count() == 0 && lsh.exceptAll(exact).count() == 0,
      "LSH-composed near-dup pairs diverge from the all-pairs oracle")
  }
}
