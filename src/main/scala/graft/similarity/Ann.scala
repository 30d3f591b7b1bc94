package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Every dot product — per-pair scoring, norms, hyperplane and
  * centroid projections — goes through the native codegen'd
  * [[graft.functions.DotProduct]] expression via `call_function`
  * (the `aggregate`/`zip_with` HOF spelling is semantically identical
  * but runs the expression interpreter per row, which dominated
  * these queries). Float32 inputs are widened to double before
  * summation so the result is reproducible and oracle-comparable at
  * 6 decimals.
  *
  * `bruteForceKnn` is the O(n²) correctness baseline (the small side
  * broadcasts, so it is a single broadcast-nested-loop stage);
  * `lshKnn` is the scale path: random-hyperplane bucketing turns the
  * cross join into an equi-join on the bucket id, the same structure
  * a 100 TB ANN pass uses (bucket = shuffle key, per-bucket
  * brute-force refinement).
  */
object Ann {

  /** Elementwise dot product via the codegen'd graft_dot expression
    * (the session must have called GraftFunctions.register; every
    * public entry point here does). The `aggregate`/`zip_with` HOF
    * spelling is semantically identical but interpreted per row. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Shared tail of the ANN paths: exact-cosine score the candidate
    * (vec_id, neighbor_id) pairs against the prepared vectors `v` and
    * keep the top k per vec_id — the scoring/tie-break contract lives
    * in exactly one place. */
  private def rankCandidates(cands: DataFrame, v: DataFrame, idCol: String, k: Int): DataFrame = {
    val pairs = cands
      .join(v.select(col(idCol).as("vec_id"), col("__e").as("__ea"), col("__norm").as("__na")), Seq("vec_id"))
      .join(v.select(col(idCol).as("neighbor_id"), col("__e").as("__eb"), col("__norm").as("__nb")), Seq("neighbor_id"))
      .withColumn("cosine", round(dot(col("__ea"), col("__eb")) / (col("__na") * col("__nb")), 6))
    val w = Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("vec_id", "neighbor_id", "cosine", "rank")
  }

  private def prepared(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    emb
      .select(col(idCol), transform(col(vecCol), x => x.cast("double")).as("__e"))
      .withColumn("__norm", sqrt(dot(col("__e"), col("__e"))))
      // cosine is undefined for the zero vector, and the engines
      // disagree on 0/0 (Spark non-ANSI NULL vs DuckDB NaN, which
      // sorts ABOVE everything) — excluded on both sides of the oracle
      .where(col("__norm") > 0)
  }

  /** Exact cosine top-k per vector.
    *
    * Size-dispatched: collections small enough to broadcast go through
    * [[bruteForceKnnCompact]] (block compute, n·k output rows, no pair
    * materialization); anything larger falls back to the fully
    * distributed join+window form with NO driver materialization and
    * no broadcast (shuffle-replicated nested loop), so the exact-kNN
    * entry point never OOMs the driver at scale — it just pays the
    * honest O(n²) cost that "exact" implies. At scale use
    * [[lshKnn]]/[[ivfKnn]]; brute force is the baseline either way.
    * All paths compute identical values (`AnnSpec` asserts equality).
    */
  def bruteForceKnn(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      maxCompactRows: Long = 1L << 17): DataFrame = {
    // the dispatch only needs "does n exceed the threshold", so count
    // a LIMIT threshold+1 subquery — a bounded short-circuiting job,
    // not a full scan of norms; the compact path's collect is then
    // bounded by construction (maxCompactRows × dim doubles)
    val probe = math.min(maxCompactRows, Int.MaxValue - 1L).toInt + 1
    val n = prepared(emb, idCol, vecCol).limit(probe).count()
    if (n <= maxCompactRows) bruteForceKnnCompact(emb, idCol, vecCol, k)
    else bruteForceKnnJoin(emb, idCol, vecCol, k, broadcastSmallSide = false)
  }

  /** Declarative join+window formulation: O(n²) pair rows through a
    * BroadcastNestedLoopJoin, then a rank window. Ranking is on the
    * ROUNDED cosine with the neighbor id as tiebreak so results are
    * deterministic across engines. */
  def bruteForceKnnExpr(emb: DataFrame, idCol: String, vecCol: String, k: Int = 5): DataFrame =
    bruteForceKnnJoin(emb, idCol, vecCol, k, broadcastSmallSide = true)

  private def bruteForceKnnJoin(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      broadcastSmallSide: Boolean): DataFrame = {
    val e = prepared(emb, idCol, vecCol)
    val a = e.select(col(idCol).as("vec_id"), col("__e").as("__ea"), col("__norm").as("__na"))
    GraftFunctions.register(emb.sparkSession)
    // without the hint the non-equi join plans as a shuffle-replicated
    // cartesian: distributed O(n²), zero driver-side materialization —
    // the only exact-kNN shape that survives when n is too big to
    // broadcast at all
    val bPrep = e.select(col(idCol).as("neighbor_id"), col("__e").as("__eb"), col("__norm").as("__nb"))
    val b = if (broadcastSmallSide) broadcast(bPrep) else bPrep
    val pairs = a
      .join(b, col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot(col("__ea"), col("__eb")) / (col("__na") * col("__nb")), 6))
      // drop the embedding arrays BEFORE the window shuffle: the rank
      // exchange then moves 24-byte rows instead of ~1 KB rows
      .select("vec_id", "neighbor_id", "cosine")
    val w = Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("vec_id", "neighbor_id", "cosine", "rank")
  }

  /** Block-compute top-k: broadcast the (small) collection as a
    * primitive matrix and emit exactly n·k result rows from a
    * mapPartitions pass — no 4M-pair row materialization, no rank
    * shuffle. This is the one justified mapPartitions in the library:
    * the declarative form spends ~750ns/pair on row plumbing around a
    * 64-FLOP dot. Values are BIT-IDENTICAL to [[bruteForceKnnExpr]]:
    * same left-to-right double summation, and rounding uses
    * BigDecimal.valueOf(...).setScale(HALF_UP) — the exact algorithm
    * of Spark's `round` (Decimal.fromDouble goes through
    * Double.toString like valueOf).
    *
    * Same scale envelope as the broadcast BNLJ it replaces: the
    * collection must fit in executor memory (it is the brute-force
    * baseline; LSH/IVF are the scale paths). Requires an integral id
    * column (emitted as bigint); use [[bruteForceKnnExpr]] for
    * non-numeric ids.
    */
  def bruteForceKnnCompact(emb: DataFrame, idCol: String, vecCol: String, k: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = prepared(emb, idCol, vecCol)
      .select(col(idCol).cast("long"), col("__e"), col("__norm"))
      .as[(Long, Seq[Double], Double)]
    val collected = e.collect().sortBy(_._1)
    val n = collected.length
    val dim = if (n == 0) 0 else collected.head._2.length
    // flat primitive layout: id/norm arrays + row-major matrix
    val ids = collected.map(_._1)
    val norms = collected.map(_._3)
    val mat = new Array[Double](n * dim)
    var r0 = 0
    while (r0 < n) {
      val v = collected(r0)._2
      var j = 0
      while (j < dim) { mat(r0 * dim + j) = v(j); j += 1 }
      r0 += 1
    }
    val bc = spark.sparkContext.broadcast((ids, norms, mat, dim))

    def roundHalfUp(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

    e.mapPartitions { it =>
      val (bids, bnorms, bmat, d) = bc.value
      val m = bids.length
      it.flatMap { case (id, eSeq, norm) =>
        val ea = eSeq.toArray
        val raw = new Array[Double](m)
        var i = 0
        while (i < m) {
          var s = 0.0
          val off = i * d
          var j = 0
          while (j < d) { s += ea(j) * bmat(off + j); j += 1 }
          raw(i) = s / (norm * bnorms(i))
          i += 1
        }
        // k-th largest raw cosine (self excluded) via a small top-k pass
        val top = Array.fill(k)(Double.NegativeInfinity)
        i = 0
        while (i < m) {
          if (bids(i) != id && raw(i) > top(k - 1)) {
            var p = k - 1
            top(p) = raw(i)
            while (p > 0 && top(p) > top(p - 1)) {
              val t = top(p); top(p) = top(p - 1); top(p - 1) = t; p -= 1
            }
          }
          i += 1
        }
        // HALF_UP rounding moves a value by <= 5e-7, so only candidates
        // within 1e-6 of the k-th raw cosine can participate in rounded
        // ties — BigDecimal-round just those (k+epsilon of them), never
        // all m. Ordering over this set equals ordering over all m.
        val cutoff = top(k - 1) - 1.000001e-6
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
        i = 0
        while (i < m) {
          if (bids(i) != id && raw(i) >= cutoff) buf += ((roundHalfUp(raw(i)), bids(i)))
          i += 1
        }
        buf.sortBy { case (c, bid) => (-c, bid) }
          .take(k)
          .iterator.zipWithIndex
          .map { case ((c, bid), r) => (id, bid, c, r + 1) }
      }
    }.toDF("vec_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (undirected, id_a < id_b).
    * Threshold applies to the rounded cosine so the DuckDB oracle
    * agrees at the boundary. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val e = prepared(emb, idCol, vecCol)
    val a = e.select(col(idCol).as("vec_a"), col("__e").as("__ea"), col("__norm").as("__na"))
    val b = e.select(col(idCol).as("vec_b"), col("__e").as("__eb"), col("__norm").as("__nb"))
    GraftFunctions.register(emb.sparkSession)
    // conservative raw-dot prefilter inside the join condition: kills
    // ~all pairs with ONE dot evaluation; the exact rounded-threshold
    // check then runs only on survivors (epsilon guards the boundary)
    a.join(broadcast(b),
        col("vec_a") < col("vec_b") &&
          dot(col("__ea"), col("__eb")) >= lit(threshold - 1e-6) * col("__na") * col("__nb"))
      .withColumn("cosine", round(dot(col("__ea"), col("__eb")) / (col("__na") * col("__nb")), 6))
      .where(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Multi-table random-hyperplane LSH top-k.
    *
    * `numTables` independent hash tables of `bitsPerTable` hyperplane
    * sign bits each; a pair is a candidate if it collides in ANY
    * table (union → distinct), then exact cosine re-ranks the
    * candidates. For neighbors at angle θ the per-table collision
    * rate is (1 − θ/π)^bits, so recall is tuned by adding tables —
    * the classic quality/shuffle-volume dial: each table is one more
    * explode row per vector, and the candidate join shuffles on the
    * (table, bucket) key, never a cross join. Planes come from a
    * fixed seed driver-side (tiny constant literals in the plan).
    *
    * Approximate by construction → rows-only check, no SQL oracle.
    */
  def lshKnn(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      numTables: Int = 12,
      bitsPerTable: Int = 4,
      seed: Long = 42L): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    // v feeds bucket generation + both re-rank sides; e self-joins —
    // persist both or every consumer re-runs the scan + projections
    val v = prepared(emb, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = lshBuckets(v, emb, idCol, vecCol, numTables, bitsPerTable, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = e.as("a")
      .join(e.as("b"),
        col("a.__table") === col("b.__table") && col("a.__bucket") === col("b.__bucket") &&
          col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("vec_id"), col(s"b.$idCol").as("neighbor_id"))
      .distinct()

    rankCandidates(cands, v, idCol, k)
  }

  /** Random-hyperplane LSH bucket table: one (id, table, bucket) row
    * per vector per hash table, shared by [[lshKnn]] and
    * [[nearDupPairsLsh]]. Planes come from a fixed seed driver-side
    * (tiny constant literals in the plan). */
  private def lshBuckets(
      v: DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      numTables: Int,
      bitsPerTable: Int,
      seed: Long): DataFrame = {
    // plane dimension comes from the data — a hardcoded width would
    // silently project onto a prefix (graft_dot truncates to the
    // shorter array) and quietly wreck recall on wider embeddings
    val dim = emb.select(size(col(vecCol)).as("__d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val rnd = new scala.util.Random(seed)
    def plane(): Column = array(Seq.fill(dim)(lit(rnd.nextGaussian())): _*)
    val tableBuckets: Seq[Column] = (0 until numTables).map { t =>
      val bits = (0 until bitsPerTable)
        .map(i => when(dot(col("__e"), plane()) >= 0, 1 << i).otherwise(0))
        .reduce(_ + _)
      struct(lit(t).as("table"), bits.as("bucket"))
    }
    v.withColumn("__tb", explode(array(tableBuckets: _*)))
      .select(col(idCol), col("__tb.table").as("__table"), col("__tb.bucket").as("__bucket"))
  }

  /** Scale-safe embedding near-duplicate pairs: hyperplane-LSH
    * candidate generation → exact rounded-cosine verification — the
    * embedding twin of [[Dedup.nearDupKeepers]]'s candidates→verify
    * composition, and the production route that replaces the all-pairs
    * [[cosinePairs]] at 100 TB. The candidate join shuffles on the
    * (table, bucket) key — never a cross join; per-table collision
    * probability for a pair at angle θ is (1 − θ/π)^bits, so recall is
    * dialed by adding tables (more explode rows, same join shape).
    * Verification computes the same rounded cosine as [[cosinePairs]],
    * so on any pair the two paths agree exactly; candidates the LSH
    * misses are the (tunable) recall gap. Output schema matches
    * [[cosinePairs]]: (vec_a, vec_b, cosine), undirected a < b. */
  def nearDupPairsLsh(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numTables: Int = 32,
      bitsPerTable: Int = 4,
      seed: Long = 42L): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    // v feeds bucket generation + both verify sides; e self-joins —
    // persist both or every consumer re-runs the scan + projections
    val v = prepared(emb, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = lshBuckets(v, emb, idCol, vecCol, numTables, bitsPerTable, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = e.as("a")
      .join(e.as("b"),
        col("a.__table") === col("b.__table") && col("a.__bucket") === col("b.__bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("vec_a"), col(s"b.$idCol").as("vec_b"))
      .distinct()
    cands
      .join(v.select(col(idCol).as("vec_a"), col("__e").as("__ea"), col("__norm").as("__na")), Seq("vec_a"))
      .join(v.select(col(idCol).as("vec_b"), col("__e").as("__eb"), col("__norm").as("__nb")), Seq("vec_b"))
      .withColumn("cosine", round(dot(col("__ea"), col("__eb")) / (col("__na") * col("__nb")), 6))
      .where(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** IVF (inverted-file) ANN top-k: partition the space into
    * `numCells` Voronoi cells (seeded init + one Lloyd refinement,
    * all as DataFrame aggregations), assign every vector to its
    * nearest centroid, and search each query's `nprobe` closest
    * cells. The cell id is the shuffle key — candidate generation is
    * an equi-join on (cell), exactly how an IVF index shards a 100 TB
    * embedding corpus (cells ≈ partitions; nprobe trades recall for
    * scan fan-out). Centroid work is O(n·numCells) with the centroid
    * side broadcast.
    *
    * Approximate by construction → rows-only check, no SQL oracle.
    */
  def ivfKnn(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      numCells: Int = 16,
      nprobe: Int = 3): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    // consumed by seeding, assignment, centroid aggregation, the probe
    // pass, and both re-rank sides — persist or the scan runs 6×
    val e = prepared(emb, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // seed centroids: the numCells lowest-id vectors (deterministic
    // for ANY id distribution — `id < numCells` would silently seed
    // nothing when ids aren't dense from 0); one Lloyd iteration:
    // assign-all → per-cell elementwise mean
    // (cell ids need only be distinct join keys, not dense ints, so
    // the seed's own id serves as its cell id)
    val seeds = e.orderBy(col(idCol)).limit(numCells)
      .select(col(idCol).cast("long").as("cell"), col("__e").as("__c"))
    def nearestCell(vecs: DataFrame, cents: DataFrame, outCol: String): DataFrame = {
      val w = Window.partitionBy(idCol).orderBy(col("__sim").desc, col("cell"))
      vecs.join(broadcast(cents), expr("true"))
        .withColumn("__sim", dot(col("__e"), col("__c")) /
          (col("__norm") * sqrt(dot(col("__c"), col("__c")))))
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= 1)
        .select(col(idCol), col("cell").as(outCol))
    }
    val assigned0 = nearestCell(e, seeds, "cell0")
    val centroids = e.join(assigned0, Seq(idCol))
      .select(col("cell0").as("cell"), posexplode(col("__e")).as(Seq("pos", "v")))
      .groupBy("cell", "pos")
      .agg(avg("v").as("v"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("__pv"))
      .select(col("cell"), expr("transform(__pv, s -> s.v)").as("__c"))

    // ONE ranked centroid-projection pass serves both roles: rank 1 is
    // the vector's cell assignment, ranks 1..nprobe are the query-side
    // probe list (a second nearestCell call would redo the whole
    // O(n·numCells) cross join)
    val wProbe = Window.partitionBy(idCol).orderBy(col("__sim").desc, col("cell"))
    val ranked = e.join(broadcast(centroids), expr("true"))
      .withColumn("__sim", dot(col("__e"), col("__c")) /
        (col("__norm") * sqrt(dot(col("__c"), col("__c")))))
      .withColumn("__rk", row_number().over(wProbe))
      .where(col("__rk") <= nprobe)
      .select(col(idCol), col("cell"), col("__rk"))
    val probes = ranked.select(col(idCol).as("vec_id"), col("cell"))
    val members = ranked.where(col("__rk") === 1)
      .select(col(idCol).as("neighbor_id"), col("cell"))
    val cands = probes.join(members, Seq("cell"))
      .where(col("vec_id") =!= col("neighbor_id"))
      .select("vec_id", "neighbor_id")
      .distinct()

    rankCandidates(cands, e, idCol, k)
  }
}
