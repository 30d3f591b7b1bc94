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

  test("cosinePairsScreened ≡ cosinePairs, and the screen's candidate count beats all-pairs") {
    val emb = Tables.embeddings(spark, SfDir)
    val exact = Ann.cosinePairs(emb, "vec_id", "embedding", threshold = 0.4)
    val screened = Ann.cosinePairsScreened(emb, "vec_id", "embedding", threshold = 0.4)
      .selectExpr("cast(vec_a as long) vec_a", "cast(vec_b as long) vec_b", "cosine")
    val exactL = exact
      .selectExpr("cast(vec_a as long) vec_a", "cast(vec_b as long) vec_b", "cosine")
    assert(exactL.count() > 0, "degenerate test: no qualifying pairs")
    assert(exactL.exceptAll(screened).count() == 0 && screened.exceptAll(exactL).count() == 0,
      "screened exact pairs diverge from the all-pairs oracle")
    // the Cauchy–Schwarz screen must genuinely cull: candidates (pairs
    // that got a full dot + a materialized row) strictly below all-pairs
    val n = emb.count()
    val cands = Ann.screenedPairs(emb, "vec_id", "embedding", threshold = 0.4).count()
    assert(cands > 0 && cands < n * (n - 1) / 2,
      s"screen culled nothing: $cands candidates of ${n * (n - 1) / 2} pairs")
  }

  test("screened tiled kernel ≡ compact kernel (forced dispatch)") {
    val emb = Tables.embeddings(spark, SfDir)
    // maxCompactRows=1 forces the block-tiled shuffle kernel — the path
    // taken when the collection cannot be driver-materialized
    val tiled = Ann.cosinePairsScreened(emb, "vec_id", "embedding",
      threshold = 0.4, maxCompactRows = 1)
    val compact = Ann.cosinePairsScreened(emb, "vec_id", "embedding", threshold = 0.4)
    assert(tiled.count() == compact.count())
    assert(tiled.exceptAll(compact).count() == 0 && compact.exceptAll(tiled).count() == 0,
      "tiled and compact screened kernels diverge")
  }

  test("auto-tuned multi-probe LSH at τ=0.9: exact parity on planted near-dups, sub-all-pairs candidates") {
    // planted structure: 1000 seeded gaussian bases + a perturbed copy
    // of each (cosine ≈ 0.98) — the regime LSH exists for. τ=0.9 sits
    // between the dup cosines (~0.98) and the noise floor (~0).
    val rnd = new scala.util.Random(7)
    val dim = 32
    val base = Array.fill(1000)(Array.fill(dim)(rnd.nextGaussian()))
    val rows: Seq[(Long, Seq[Double])] =
      base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq ++
        base.zipWithIndex.map { case (v, i) =>
          ((i + 1000).toLong, v.map(_ + 0.15 * rnd.nextGaussian()).toSeq)
        }
    val sess = spark
    import sess.implicits._
    val emb = rows.toDF("vec_id", "embedding")
    val exact = Ann.cosinePairsScreened(emb, "vec_id", "embedding", threshold = 0.9)
    val lsh = Ann.nearDupPairsLsh(emb, "vec_id", "embedding", threshold = 0.9)
    assert(exact.count() > 500, "degenerate test: planted dups did not clear the threshold")
    assert(exact.exceptAll(lsh).count() == 0 && lsh.exceptAll(exact).count() == 0,
      "auto-tuned LSH pairs diverge from the exact pair set")
    // the whole point of the auto operating point: candidate mass
    // genuinely below all-pairs (T·(b+1)/2^b ≈ 0.25 at n=2000, τ=0.9)
    val n = rows.length.toLong
    val (t, b) = Ann.lshParams(n, threshold = 0.9)
    val v = emb.selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as __e")
    val cands = Ann.lshCandidates(v, emb, "vec_id", "embedding", t, b,
      multiProbe = true, seed = 42L).count()
    assert(cands > 0 && cands < n * (n - 1) / 4,
      s"LSH candidate mass not sub-all-pairs: $cands of ${n * (n - 1) / 2}")
  }

  test("singleQueryKnn ≡ the query row's slice of all-pairs bruteForceKnn") {
    val emb = Tables.embeddings(spark, SfDir)
    val k = 7
    val single = graft.similarity.Ann.singleQueryKnn(
        emb, "vec_id", "embedding", queryId = 0L, k = k)
      .select("vec_id", "cosine", "rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      .sortBy(_._3)
    val allPairs = graft.similarity.Ann.bruteForceKnn(
        emb, "vec_id", "embedding", k = k)
      .where(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("neighbor_id", "cosine", "rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      .sortBy(_._3)
    assert(single == allPairs,
      s"serving-time kNN diverges from the all-pairs slice:\n$single\n$allPairs")
    assert(single.size == k && single.map(_._1).forall(_ != 0L))
  }
}
