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

  /** Cosine top-k of ONE query vector against the collection — the
    * SERVING-time shape (the kNN family above scores all-pairs;
    * retrieval scores one query). `queryId` names the collection row
    * whose vector is the query (excluded from results). One narrow
    * broadcast-join pass — the 1-row query side broadcasts, cosine
    * is the q20 parity expression, and the top-k cut is a
    * TakeOrdered by (rounded cosine DESC, id), never a global
    * window; ranks are assigned over only the k survivors. */
  def singleQueryKnn(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val e = prepared(emb, idCol, vecCol)
    val q = broadcast(e.where(col(idCol) === queryId)
      .select(col("__e").as("__eq"), col("__norm").as("__nq")))
    e.where(col(idCol) =!= queryId)
      .crossJoin(q)
      .withColumn("cosine",
        round(dot(col("__e"), col("__eq")) / (col("__norm") * col("__nq")), 6))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col(idCol))))
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
    // a LIMIT threshold+1 subquery on the RAW scan — a bounded
    // short-circuiting job that pays no projection or norm compute
    // (prepared() would); the compact path's collect is then bounded
    // by construction (maxCompactRows × dim doubles)
    val probe = math.min(maxCompactRows, Int.MaxValue - 1L).toInt + 1
    val n = emb.limit(probe).count()
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

    e.mapPartitions { it =>
      val (bids, bnorms, bmat, d) = bc.value
      val m = bids.length
      // per-PARTITION scratch, not per row (guide §5): an m-double raw
      // buffer allocated per row churned ~n·m·8 bytes of garbage per
      // run — with 32 concurrent local tasks that allocation rate was
      // the measured c32-vs-c8 penalty on this kernel. The buffer is
      // fully overwritten for every row and nothing emitted references
      // it, so reuse is value-identical.
      val raw = new Array[Double](m)
      it.flatMap { case (id, eSeq, norm) =>
        val ea = eSeq.toArray
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
          if (bids(i) != id && raw(i) >= cutoff) buf += ((roundHalfUp6(raw(i)), bids(i)))
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

  // ---------------------------------------------------------------
  // screened blocked exact pair scan — the LOW-threshold scale path
  // ---------------------------------------------------------------

  /** Spark's `round` algorithm in scalar form (Decimal.fromDouble goes
    * through Double.toString, exactly like BigDecimal.valueOf) — used
    * by every compact kernel so their values are bit-identical to the
    * declarative paths'. */
  private def roundHalfUp6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Screen prefix length: the partial dot covers the first 3/4 of the
    * dimensions; the Cauchy–Schwarz bound on the remaining quarter is
    * tight enough to cull ~90% of isotropic pairs at τ=0.4 while the
    * screen itself skips a quarter of the multiplies. */
  private def screenDims(d: Int): Int = math.max(1, d * 3 / 4)

  /** splitmix64 finalizer — block assignment for the tiled kernel must
    * spread ANY id distribution (sequential, clustered, sparse) evenly. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Screened evaluation of one pair: partial RAW dot over the first
    * `screenDims` coordinates, then the Cauchy–Schwarz bound
    * Σ_{i≥k} a_i·b_i ≤ ‖a_tail‖·‖b_tail‖ decides whether the full dot
    * is worth finishing. Returns the HALF_UP-rounded cosine, or NaN
    * when the bound proves the pair cannot reach `thr` — no qualifying
    * pair is ever screened out (the 1e-6 margin covers the rounding
    * boundary: raw ≥ thr − 5e-7 can still round up to thr, and dwarfs
    * fp error in the bound itself). The accumulation runs over the RAW
    * cast-to-double coordinates left-to-right and divides by the norm
    * product at the end — the EXACT float sequence of [[cosinePairs]]'
    * `graft_dot / (na·nb)` and [[bruteForceKnnCompact]], so rounded
    * values are bit-identical across all three paths (pre-normalizing
    * coordinates would be a different fp computation that can flip a
    * 6-decimal boundary). */
  private def screenEval(
      a: Array[Double], normA: Double, tailA: Double,
      b: Array[Double], normB: Double, tailB: Double,
      thr: Double): Double = {
    val d = a.length
    val k = screenDims(d)
    var s = 0.0
    var i = 0
    while (i < k) { s += a(i) * b(i); i += 1 }
    if (s + tailA * tailB < (thr - 1e-6) * normA * normB) Double.NaN
    else {
      while (i < d) { s += a(i) * b(i); i += 1 }
      roundHalfUp6(s / (normA * normB))
    }
  }

  /** (id, raw cast-to-double vector, norm, tail-norm) rows shared by
    * both screened kernels: tail = ‖(e_k..e_d)‖ = √(‖e‖² − Σ_{i<k}e_i²),
    * the Cauchy–Schwarz bound on the unseen tail of the raw dot. */
  private def rawRows(emb: DataFrame, idCol: String, vecCol: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Double], Double, Double)] = {
    val spark = emb.sparkSession
    import spark.implicits._
    prepared(emb, idCol, vecCol)
      .select(col(idCol).cast("long"), col("__e"), col("__norm"))
      .as[(Long, Seq[Double], Double)]
      .map { case (id, e, norm) =>
        val d = e.length
        val k = screenDims(d)
        val a = new Array[Double](d)
        var head = 0.0
        var i = 0
        while (i < d) {
          a(i) = e(i)
          if (i < k) head += a(i) * a(i)
          i += 1
        }
        (id, a, norm, math.sqrt(math.max(0.0, norm * norm - head)))
      }
  }

  /** Exact embedding near-duplicate pairs via a screened blocked pair
    * scan — the low-threshold production route that replaces both the
    * all-pairs BNLJ ([[cosinePairs]]) and the LSH composition at
    * thresholds where no LSH family can win. PLANS.md derives the
    * bound: at τ=0.4 (per-bit agreement 0.63 vs 0.5 random) any
    * hyperplane-LSH configuration with near-zero miss AND fewer
    * candidates than all-pairs needs ≥2³⁰⁰ tables-equivalent hashing
    * work — ≥10× brute force on hashing alone; [[nearDupPairsLsh]] is
    * the right tool only at τ ≳ 0.7 where per-bit agreement clears
    * ~0.75 (its scaladoc has the crossover arithmetic).
    *
    * Here recall is GUARANTEED, not sampled: the Cauchy–Schwarz screen
    * can only discard pairs that provably fall below the threshold, so
    * the output equals [[cosinePairs]]'s pair set on any input, any
    * seed — which is what makes the shared DuckDB oracle safe at every
    * SF. Candidate count (screen survivors, the pairs that get a full
    * dot + materialized row) is measured ~10% of n(n−1)/2 on isotropic
    * data and far fewer on clustered data; `AnnSpec` asserts it.
    *
    * Size-dispatched like [[bruteForceKnn]]: a broadcast-compact
    * kernel below `maxCompactRows`, a block-tiled shuffle kernel above
    * — B = O(√tasks) blocks, each row shuffled to B tiles, each tile
    * one task holding two blocks in memory (bounded by construction at
    * ~32 MB/block), the standard distributed triangle join a 100 TB
    * exact pass uses. */
  def cosinePairsScreened(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      maxCompactRows: Long = 1L << 17): DataFrame =
    screenedPairs(emb, idCol, vecCol, threshold, maxCompactRows)
      .where(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")

  /** Screen survivors with their exact rounded cosine (including
    * sub-threshold survivors — the "candidate pairs" the screen could
    * not prove away). Exposed package-private so specs can measure the
    * candidate count against n(n−1)/2. */
  private[graft] def screenedPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      maxCompactRows: Long = 1L << 17): DataFrame = {
    // bounded LIMIT probe on the RAW scan (cheapest possible dispatch
    // evidence — no projection or norm work, cf. q20's dispatcher)
    val probe = math.min(maxCompactRows, Int.MaxValue - 1L).toInt + 1
    val n = emb.limit(probe).count()
    if (n <= maxCompactRows) screenedPairsCompact(emb, idCol, vecCol, threshold)
    else screenedPairsTiled(emb, idCol, vecCol, threshold)
  }

  /** Compact kernel: broadcast all normalized vectors (same envelope
    * as [[bruteForceKnnCompact]]); each row screens against every
    * strictly-larger id in one primitive pass — no pair
    * materialization before the screen, no shuffle at all. */
  private def screenedPairsCompact(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = rawRows(emb, idCol, vecCol)
    val collected = rows.collect().sortBy(_._1)
    val ids = collected.map(_._1)
    val vecs = collected.map(_._2)
    val norms = collected.map(_._3)
    val tails = collected.map(_._4)
    val bc = spark.sparkContext.broadcast((ids, vecs, norms, tails))
    val thr = threshold
    rows.mapPartitions { it =>
      val (bids, bvecs, bnorms, btails) = bc.value
      val m = bids.length
      it.flatMap { case (id, a, na, ta) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        // start past the LAST occurrence of the own id: with duplicate
        // ids in the input (upstream bug), a pair (id, id) would
        // otherwise leak out — cosinePairs' strict a < b never emits it
        var j = java.util.Arrays.binarySearch(bids, id)
        if (j < 0) j = -j - 1 else { while (j < m && bids(j) == id) j += 1 }
        while (j < m) {
          val c = screenEval(a, na, ta, bvecs(j), bnorms(j), btails(j), thr)
          if (!java.lang.Double.isNaN(c)) out += ((id, bids(j), c))
          j += 1
        }
        out
      }
    }.toDF("vec_a", "vec_b", "cosine")
  }

  /** Tiled kernel: hash ids into B blocks, route every row to the B
    * tiles (i≤j) containing its block, evaluate each tile's pairs in
    * one task. Shuffle volume is n·B rows; tile memory is two blocks
    * (≤ ~32 MB each by construction); tasks = B(B+1)/2 spread the
    * n²/2 screens evenly. */
  private def screenedPairsTiled(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = rawRows(emb, idCol, vecCol)
    val n = emb.count()
    val dim = emb.select(size(col(vecCol)).as("__d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    // enough tiles for ~4 waves of the cluster; block rows bounded so
    // one block stays ≤ ~32 MB of task memory at any n
    val para = spark.sparkContext.defaultParallelism
    val maxBlockRows = math.max(1L, (32L << 20) / (math.max(1, dim) * 8L))
    val nB = math.max(2, math.max(
      math.ceil(math.sqrt(8.0 * para)).toInt,
      math.ceil(n.toDouble / maxBlockRows).toInt))
    val thr = threshold
    rows
      .flatMap { case (id, a, nm, t) =>
        val blk = (((mix64(id) % nB) + nB) % nB).toInt
        (0 until nB).iterator.map { o =>
          val i = math.min(blk, o)
          val j = math.max(blk, o)
          // Long tile key: nB exceeds ~46k exactly in the huge-n regime
          // this kernel exists for (dim 1536 → maxBlockRows≈2730, so
          // n ≳ 1.3e8 rows), where an Int i*nB+j overflows and aliased
          // keys would silently misroute blocks
          (i.toLong * nB + j, blk, id, a, nm, t)
        }
      }
      .groupByKey(_._1)
      .flatMapGroups { (key: Long, it: Iterator[(Long, Int, Long, Array[Double], Double, Double)]) =>
        val i = (key / nB).toInt
        val j = (key % nB).toInt
        val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double, Double)]
        val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double, Double)]
        it.foreach { case (_, blk, id, v, nm, t) =>
          if (i == j || blk == i) left += ((id, v, nm, t))
          else right += ((id, v, nm, t))
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        if (i == j) {
          val arr = left.sortBy(_._1).toArray
          var x = 0
          while (x < arr.length) {
            var y = x + 1
            while (y < arr.length) {
              // duplicate ids (upstream bug) must not emit an (id, id)
              // pair — strict a < b, like cosinePairs
              if (arr(x)._1 != arr(y)._1) {
                val c = screenEval(arr(x)._2, arr(x)._3, arr(x)._4,
                  arr(y)._2, arr(y)._3, arr(y)._4, thr)
                if (!java.lang.Double.isNaN(c)) out += ((arr(x)._1, arr(y)._1, c))
              }
              y += 1
            }
            x += 1
          }
        } else {
          left.foreach { case (ida, va, na, ta) =>
            right.foreach { case (idb, vb, nb, tb) =>
              if (ida != idb) {
                val c = screenEval(va, na, ta, vb, nb, tb, thr)
                if (!java.lang.Double.isNaN(c)) {
                  if (ida < idb) out += ((ida, idb, c)) else out += ((idb, ida, c))
                }
              }
            }
          }
        }
        out.iterator
      }
      .toDF("vec_a", "vec_b", "cosine")
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
      numTables: Int = -1,
      bitsPerTable: Int = -1,
      multiProbe: Boolean = true,
      seed: Long = 42L): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    // bits auto-scale with n (default -1): the sf-sweep measured slope
    // 1.4 for the fixed-4-bit r2 config — random candidate mass
    // T·n²/2^bits goes quadratic unless bits grow as log n. Tables
    // must then scale WITH bits (multi-probe alone cannot hold recall:
    // per-table hit still shrinks as p^b): auto-tables hold ≥95%
    // candidate probability for a neighbor at cosine 0.7 — the honest
    // price of recall as buckets get finer is more tables, paid in
    // O(log n) bucketing rows, not in n² candidate pairs.
    val b = if (bitsPerTable > 0) bitsPerTable else lshBits(emb.count())
    val t =
      if (numTables > 0) numTables
      else {
        val tNeeded = lshTablesFor(lshHit(pBit(0.7), b, multiProbe), math.log(20.0))
        // fail fast when the ceiling binds (mirrors nearDupPairsLsh):
        // clamping would quietly drop the 95% candidate-recall design
        // point (e.g. multiProbe=false at b=20 needs ~1030 tables —
        // clamped to 512 the per-pair recall decays to ~77%). The
        // caller's outs: keep multi-probe on, pass explicit numTables
        // as an accepted-recall expert choice, or coarsen bitsPerTable.
        require(tNeeded <= MaxAutoTables,
          s"lshKnn auto-tuning needs ~$tNeeded tables to hold the 95% candidate-recall " +
            s"design point at $b-bit tables (multiProbe=$multiProbe) — past the " +
            s"$MaxAutoTables sanity ceiling. Enable multiProbe, coarsen bitsPerTable, " +
            "or pass numTables explicitly to accept the reduced recall.")
        math.max(4, tNeeded)
      }
    // v feeds bucket generation + both re-rank sides — persist or
    // every consumer re-runs the scan + projections
    val v = prepared(emb, idCol, vecCol)
      .transform(graft.CacheScope.persisted(_))
    // kNN needs DIRECTED candidates: both orientations of the
    // undirected collision pairs
    val und = lshCandidates(v, emb, idCol, vecCol, t, b, multiProbe, seed)
    val cands = und.select(col("vec_a").as("vec_id"), col("vec_b").as("neighbor_id"))
      .unionByName(und.select(col("vec_b").as("vec_id"), col("vec_a").as("neighbor_id")))

    rankCandidates(cands, v, idCol, k)
  }

  /** Standalone LSH bucket table for an embedding collection —
    * (id, __table, __bucket) rows ready for the (table, bucket)
    * candidate equi-join. Deterministic for a fixed seed: the plane
    * set depends only on (seed, dim, numTables, bits), so an
    * incremental maintainer ([[graft.streaming.AnnIndexSink]]) can
    * hash each micro-batch independently and the accumulated table
    * equals this batch build — StreamingSpec S8 proves it. */
  def lshBucketTable(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      numTables: Int = 12,
      bitsPerTable: Int = 4,
      seed: Long = 42L): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    lshBuckets(prepared(emb, idCol, vecCol), emb, idCol, vecCol, numTables, bitsPerTable, seed)
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

  /** Bucket width from collection size: occupancy n/2^bits ≈
    * `targetBucketRows`. FIXED bits are the quadratic-slope trap the
    * sf-sweep caught (PLANS.md): random-collision candidate mass is
    * T·n²/2^bits, so bits must grow with log n for the mass to stay
    * ~T·n·targetBucketRows — linear. */
  private[graft] def lshBits(n: Long, targetBucketRows: Int = 8): Int =
    math.max(2, math.min(20,
      math.ceil(math.log(math.max(2.0, n.toDouble / targetBucketRows)) / math.log(2.0)).toInt))

  /** Per-bit agreement probability for a pair at the given cosine:
    * p = 1 − θ/π (the Goemans–Williamson identity). */
  private def pBit(cosine: Double): Double =
    1.0 - math.acos(math.max(-1.0, math.min(1.0, cosine))) / math.Pi

  /** Per-table candidate probability for a pair with per-bit agreement
    * p1 under a b-bit table — exact collision, or exactly one flipped
    * bit when multi-probing: p1^b + b·p1^(b−1)(1−p1). The ONE place
    * this probe model lives: the auto-tuners and their feasibility
    * guards must never drift apart. */
  private[graft] def lshHit(p1: Double, b: Int, multiProbe: Boolean): Double =
    if (multiProbe) math.pow(p1, b) + b * math.pow(p1, b - 1) * (1 - p1)
    else math.pow(p1, b)

  /** Tables needed for per-pair miss ≤ e^(−lnInvDelta) at per-table
    * hit rate `hit`. Unclamped — feasibility decisions belong to the
    * caller. */
  private[graft] def lshTablesFor(hit: Double, lnInvDelta: Double): Int =
    math.max(2, math.ceil(lnInvDelta / -math.log1p(-hit)).toInt)

  /** Sanity ceiling on auto-chosen table counts: past this, bucketing
    * itself (T explode rows + T·b hyperplane dots per vector) stops
    * being cheap and the operating point deserves an explicit caller
    * decision, not silent growth — [[nearDupPairsLsh]] fails fast at
    * this line instead of degrading recall quietly. */
  private[graft] val MaxAutoTables = 512

  /** Auto-tuned LSH operating point: bits from collection size (bucket
    * occupancy n/2^bits ≈ `targetBucketRows`) and table count from a
    * per-pair miss budget δ=1e-3 at the THRESHOLD angle — the worst
    * qualifying pair; real near-dups sit far above the threshold and
    * miss with exponentially lower probability (a planted pair at
    * cosine 0.98 under the τ=0.9 auto point misses at ~1e-7). With
    * multi-probe far fewer tables buy the same recall ([[lshHit]]).
    * Returns (tables, bits), tables clamped to [[MaxAutoTables]].
    *
    * Candidate work relative to all-pairs is T·(b+1)/2^b; at τ=0.9,
    * n=2000 the auto point (7 tables × 8 bits) puts it at 0.25 and it
    * SHRINKS with n (n=10⁶ → 15 tables × 17 bits → ~1e-3). Below
    * τ≈0.65 the same formula proves LSH unwinnable (PLANS.md) — use
    * [[cosinePairsScreened]] there. */
  private[graft] def lshParams(
      n: Long,
      threshold: Double,
      multiProbe: Boolean = true,
      targetBucketRows: Int = 8): (Int, Int) = {
    val b = lshBits(n, targetBucketRows)
    val t = math.min(MaxAutoTables,
      lshTablesFor(lshHit(pBit(threshold), b, multiProbe), math.log(1e3)))
    (t, b)
  }

  /** LSH candidate pairs (vec_a < vec_b, distinct). With `multiProbe`
    * the probe side explodes each signature into itself plus its b
    * Hamming-distance-1 neighbors and joins against the EXACT bucket
    * table, so a pair is a candidate iff some table hashes them within
    * Hamming distance 1 — the recall of b+1 tables for one table's
    * bucketing cost. The join still shuffles on the (table, bucket)
    * key; never a cross join. */
  private[graft] def lshCandidates(
      v: DataFrame,
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      numTables: Int,
      bitsPerTable: Int,
      multiProbe: Boolean,
      seed: Long): DataFrame = {
    val e = lshBuckets(v, emb, idCol, vecCol, numTables, bitsPerTable, seed)
      .transform(graft.CacheScope.persisted(_))
    val probeSide =
      if (!multiProbe) e
      else e.select(col(idCol), col("__table"),
        explode(array(col("__bucket") +:
          (0 until bitsPerTable).map(i => col("__bucket").bitwiseXOR(lit(1 << i))): _*))
          .as("__bucket"))
    probeSide.as("a")
      .join(e.as("b"),
        col("a.__table") === col("b.__table") && col("a.__bucket") === col("b.__bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("vec_a"), col(s"b.$idCol").as("vec_b"))
      .distinct()
  }

  /** Embedding near-duplicate pairs via hyperplane-LSH candidates →
    * exact rounded-cosine verification — the embedding twin of
    * [[Dedup.nearDupKeepers]]'s candidates→verify composition, and the
    * production route at HIGH thresholds (τ ≳ 0.7, where per-bit
    * agreement ≥ ~0.75 makes the candidate mass genuinely sub-all-pairs
    * — [[lshParams]] has the arithmetic; below that use
    * [[cosinePairsScreened]], whose recall needs no probability at
    * all). Defaults (-1) auto-tune tables and bits from the collection
    * size and threshold. Verification computes the same rounded cosine
    * as [[cosinePairs]], so on any candidate the paths agree exactly;
    * candidates the LSH misses are the (budgeted, δ=1e-3 at the
    * threshold boundary) recall gap. Output schema matches
    * [[cosinePairs]]: (vec_a, vec_b, cosine), undirected a < b. */
  def nearDupPairsLsh(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numTables: Int = -1,
      bitsPerTable: Int = -1,
      multiProbe: Boolean = true,
      seed: Long = 42L): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    // resolve the FINAL operating point first; guards below validate
    // what will actually run, and only for components the caller left
    // to the auto-tuner (explicit params are expert mode — accepted
    // as-is, like every other tuning knob in the library)
    val b =
      if (bitsPerTable > 0) bitsPerTable
      // parquet row-count metadata makes this a cheap action
      else lshBits(emb.count())
    val tNeeded = lshTablesFor(lshHit(pBit(threshold), b, multiProbe), math.log(1e3))
    val t =
      if (numTables > 0) numTables
      else {
        // fail FAST instead of degrading silently: when the δ=1e-3
        // budget needs an absurd table count (τ too close to random
        // agreement), the caller wanted cosinePairsScreened, whose
        // recall needs no probability at all
        require(tNeeded <= MaxAutoTables,
          s"LSH cannot meet its miss budget at threshold=$threshold with $b-bit tables " +
            s"(needs ~$tNeeded tables; per-bit agreement is too close to random) — " +
            "use cosinePairsScreened, the exact screened scan, for low thresholds")
        // ... and candidate work must actually undercut the all-pairs
        // scan it replaces: expected random-collision fraction is
        // T·(b+1)/2^b (T/2^b without multi-probe)
        val work = tNeeded * (if (multiProbe) b + 1.0 else 1.0) / math.pow(2.0, b)
        require(work < 1.0,
          f"LSH candidate mass at threshold=$threshold would be $work%.2f of all-pairs — " +
            "worse than the exact scan; use cosinePairsScreened for this threshold/size")
        tNeeded
      }
    // v feeds bucket generation + both verify sides — persist or every
    // consumer re-runs the scan + projections
    val v = prepared(emb, idCol, vecCol)
      .transform(graft.CacheScope.persisted(_))
    lshCandidates(v, emb, idCol, vecCol, t, b, multiProbe, seed)
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
      numCells: Int = -1,
      nprobe: Int = 3,
      targetCellRows: Int = 128): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    // cells auto-scale with n (default -1): a FIXED cell count is the
    // quadratic-slope trap the sf-sweep measured (slope 1.64 for the
    // r2 fixed-16 config) — candidate mass is n²·nprobe/C, so C must
    // grow as n/targetCellRows for the mass to stay n·nprobe·target,
    // i.e. linear. Centroid work is O(n·C): n²/targetCellRows, the
    // assignment pass's honest cost (an IVF index at 100 TB trains
    // centroids on a sample instead; the JOIN shape is identical).
    val c =
      if (numCells > 0) numCells
      else math.max(16, math.min(4096,
        math.ceil(emb.count().toDouble / targetCellRows).toInt))
    // consumed by seeding, assignment, centroid aggregation, the probe
    // pass, and both re-rank sides — persist or the scan runs 6×
    val e = prepared(emb, idCol, vecCol)
      .transform(graft.CacheScope.persisted(_))

    // seed centroids: the numCells lowest-id vectors (deterministic
    // for ANY id distribution — `id < numCells` would silently seed
    // nothing when ids aren't dense from 0); one Lloyd iteration:
    // assign-all → per-cell elementwise mean
    // (cell ids need only be distinct join keys, not dense ints, so
    // the seed's own id serves as its cell id)
    val seeds = e.orderBy(col(idCol)).limit(c)
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

  /** Retrieval-recall harness — the eval job every pipeline ships
    * beside its ANN index: per query, how much of the EXACT top-k an
    * approximate index actually returned. Takes any two top-k
    * relations on the (vec_id, neighbor_id) grain (exact from
    * [[bruteForceKnn]], approximate from [[lshKnn]]/[[ivfKnn]]/a PQ
    * variant), so the harness is decoupled from any one index — and
    * harness correctness is testable independently of index quality
    * (exact vs itself is 1.0 by construction; AnnRecallSpec pins it).
    * recall is integer ppm by FLOOR division (the q23/q74 posture) —
    * no float ratios. One equi-join on the top-k grain + two k-bounded
    * aggregates: cost is |queries|·k rows at any scale, nothing
    * corpus-sized moves.
    * Output: (vec_id, n_exact, n_hits, recall_ppm). */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val e = exact.select("vec_id", "neighbor_id")
    val hits = e.join(approx.select("vec_id", "neighbor_id"),
        Seq("vec_id", "neighbor_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("n_hits"))
    e.groupBy("vec_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("vec_id"), "left")
      .select(col("vec_id"), col("n_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("(coalesce(n_hits, 0) * 1000000) div n_exact").as("recall_ppm"))
  }
}
