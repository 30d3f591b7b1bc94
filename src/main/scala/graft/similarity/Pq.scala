package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — compressed-domain kNN for embedding
  * corpora, the memory-side complement of IVF: split each d-dim
  * vector into `m` sub-vectors, learn a small codebook (K centroids)
  * per sub-space with Lloyd's algorithm, store each vector as `m`
  * one-byte codes, and answer kNN with ASYMMETRIC distances (exact
  * query sub-vector vs quantized database sub-vector) summed from a
  * per-query lookup table — Jégou et al., "Product Quantization for
  * Nearest Neighbor Search" (TPAMI 2011). At 100 TB this is what
  * makes an embedding index FIT: 64 floats become 8 bytes, and the
  * scan reads codes, not vectors.
  *
  * Everything here is DETERMINISTIC and cross-engine — the repo's
  * q111 posture extended to an iterative algorithm: initial
  * centroids are a vec_id-stride sample (no RNG), every distance is
  * the ‖x‖²−2x·c+‖c‖² form over index-order dot products
  * (`graft_dot` / DuckDB `list_dot_product` — identical IEEE
  * sums), assignments argmin on (round(dist,6), code), and updated
  * centroids round at 1e-6 before the next iteration so both
  * engines re-derive bit-identical codebooks, codes, and ADC
  * distances — the whole PQ family sits under the hash gate instead
  * of a recall-only spec.
  *
  * Plan shape: the codebook is |m·K| rows BY CONTRACT (the bounded
  * dim-probe posture) and is COLLECTED to the driver once per
  * assignment, where it inlines as constant-folded literal per-sub
  * arrays — an assign is then one narrow codegen'd map over the
  * sub-vector rows, zero shuffles, zero joins (an empty codebook
  * throws at plan build; PqSpec pins it). Training and encoding are
  * one |vectors·m|-row long-form pass per Lloyd iteration (sub-vector
  * slices, NOT per-dim explosion, so dot products stay inside
  * codegen); only codebook-sized relations ever reach the driver.
  */
object Pq {

  /** Sub-vector slices in long form: (idCol, sub, subvec) with
    * `subvec` = dims [sub·dsub, (sub+1)·dsub) widened to double. */
  def subVectors(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int): DataFrame = {
    val subs = (0 until m).map { s =>
      struct(lit(s).as("sub"),
        expr(s"transform(slice($vecCol, ${s * dsub + 1}, $dsub), v -> cast(v as double))")
          .as("subvec"))
    }
    vecs.select(col(idCol), explode(array(subs: _*)).as("sv"))
      .select(col(idCol), col("sv.sub").as("sub"), col("sv.subvec").as("subvec"))
  }

  /** ‖x−c‖² via index-order dot products — the cross-engine-exact
    * distance every PQ stage uses. */
  def sqDist(x: Column, c: Column): Column =
    call_function("graft_dot", x, x) -
      lit(2.0d) * call_function("graft_dot", x, c) +
      call_function("graft_dot", c, c)

  private def dist(x: Column, c: Column): Column = sqDist(x, c)

  /** Assign each sub-vector its nearest code from `codebook`
    * (sub, code, cvec): returns (idCol, sub, code).
    *
    * Plan shape (r14-opt): the codebook folds to ONE row per sub
    * carrying the K (code, cvec) structs, and the argmin is
    * `array_min` over a `transform` — the same (round(d,6), code)
    * lexicographic minimum the old join+min(struct) computed, but as
    * a NARROW codegen'd map: no |sv|·K row blow-up, and no
    * aggregation at all where the old groupBy(min(struct)) planned as
    * SortAggregate (struct-typed buffer) with two Exchange+Sort
    * rounds (q116 before-plan, plans/r14). Assignment now costs zero
    * shuffles at any scale. */
  def assign(sv: DataFrame, codebook: DataFrame, idCol: String): DataFrame =
    assignCarry(sv, codebook, idCol).select(col(idCol), col("sub"), col("code"))

  /** [[assign]] keeping `subvec` on the output row — the Lloyd-loop
    * form: the centroid update needs (code, subvec) together, and
    * carrying the vector through the narrow argmin is free where
    * re-joining the sub-vector table on (id, sub) was a shuffle.
    *
    * The codebook is |m·K| rows by CONTRACT (the broadcast-sized
    * dim-probe posture this module documents), so it inlines as a
    * LITERAL per-sub array: collect once on the driver (trainCodebook
    * already localizes every codebook state, so this usually collects
    * a LocalRelation — no job), constant-fold the (code, cvec, ‖c‖²)
    * structs, and dispatch on `sub` with a when-chain. Against the
    * cbArr-broadcast draft this removes one groupBy job + one
    * broadcast build PER assign call — at sf0.1 those fixed job
    * round-trips, not arithmetic, were the family's cost.
    * ‖c‖² is precomputed here (index-order sum — bit-identical to
    * graft_dot) and ‖x‖² hoisted per row, so the K-way argmin pays
    * ONE dot product per candidate; the association order
    * (xx − 2x·c) + cc is sqDist's exactly. */
  private[graft] def assignCarry(
      sv: DataFrame, codebook: DataFrame, idCol: String): DataFrame =
    assignCarryLocal(sv,
      codebook.select(col("sub"), col("code"), col("cvec")).collect(), idCol)

  /** [[assignCarry]] over an ALREADY-COLLECTED codebook (rows of
    * (sub:int, code:int, cvec:array<double>)) — what a fixed-codebook
    * consumer that assigns repeatedly (S22's per-micro-batch search)
    * uses so the |m·K| collect and the literal when-chain build run
    * ONCE, not per batch. */
  private[graft] def assignCarryLocal(
      sv: DataFrame, local: Array[org.apache.spark.sql.Row],
      idCol: String): DataFrame = {
    require(local.nonEmpty, "assign: empty codebook")
    val bySub = local.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map {
      case (s, rs) =>
        val entries = rs.map { r =>
          (r.getInt(1), r.getSeq[Double](2).toArray)
        }.sortBy(_._1)
        val arr = array(entries.map { case (code, v) =>
          var cc = 0.0
          var i = 0
          while (i < v.length) { cc += v(i) * v(i); i += 1 }
          struct(lit(code).as("code"),
            array(v.map(lit(_)).toIndexedSeq: _*).as("cvec"),
            lit(cc).as("cc"))
        }.toIndexedSeq: _*)
        (s, arr)
    }
    val cbDispatch = bySub.tail
      .foldLeft(when(col("sub") === bySub.head._1, bySub.head._2)) {
        case (acc, (s, arr)) => acc.when(col("sub") === s, arr)
      }
    sv.withColumn("__cb", cbDispatch)
      // a `sub` with no codebook entry leaves __cb NULL; dropping the
      // row here preserves the pre-r14 inner-join contract (callers
      // with a PARTIAL codebook — driftReencode with a sub removed —
      // lose those rows instead of seeing NULL codes propagate)
      .where(col("__cb").isNotNull)
      .withColumn("__xx", expr("graft_dot(subvec, subvec)"))
      .withColumn("code",
        expr("array_min(transform(__cb, s -> struct(" +
          "round(__xx - 2.0D * graft_dot(subvec, s.cvec) + s.cc, 6) AS d, " +
          "s.code AS code))).code"))
      .drop("__cb", "__xx")
  }

  /** Train a PQ codebook: stride-sampled init, `iters` Lloyd rounds.
    * Returns (sub, code, cvec) with centroid components rounded at
    * 1e-6 (the cross-engine determinism contract). Empty clusters
    * keep their previous centroid. */
  def trainCodebook(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int, k: Int, iters: Int): DataFrame =
    trainCodebookStates(vecs, idCol, vecCol, m, dsub, k, iters).last

  /** [[trainCodebook]] exposing EVERY codebook state: element 0 is
    * the stride-sampled init, element i the codebook after Lloyd
    * round i. Each state is already a localized literal leaf (the
    * loop materializes them anyway), so capturing the sequence is
    * free — and a DRIFT consumer that needs both "the codebook before
    * the last refinement round" and "after" (q118) trains ONCE
    * instead of re-running the whole loop at iters−1: round i of two
    * separate trainings is bit-identical by the module's determinism
    * contract, so this is the same result for half the Lloyd work
    * (guide §1.2 — don't compute things twice). */
  def trainCodebookStates(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, dsub: Int, k: Int, iters: Int): Seq[DataFrame] = {
    val sv = graft.CacheScope.persisted(subVectors(vecs, idCol, vecCol, m, dsub))
    // deterministic init: the k smallest vec_ids' sub-vectors, code =
    // rank − 1 (same k seed vectors for every sub-space). orderBy +
    // limit plans as a distributed TakeOrdered — the global
    // row_number window only ever sees the k-row result
    val seeds = vecs.select(col(idCol)).orderBy(col(idCol)).limit(k)
      .withColumn("code",
        (row_number().over(Window.orderBy(col(idCol))) - 1).cast("int"))
    // EVERY codebook state is LOCALIZED — collected (|m·K| ≤ a few
    // hundred rows, the bounded dim-probe posture) and rebuilt as a
    // LocalRelation. Without this, each downstream reference — the
    // next Lloyd round, every assign/residual/LUT consumer in an
    // IVF-PQ composition — re-runs the ENTIRE training DAG (q122
    // measured 443 stages / 13× the input bytes re-scanned), and
    // persisting instead of localizing trades that recompute for
    // cache-materialization barriers that cost MORE wall at every
    // scale measured (TimeQ head-to-head: no-persist 25 s, persisted
    // 33–92 s). A literal leaf makes every broadcast free and every
    // downstream plan independent of the training lineage — the
    // measured best of both.
    def localized(df: DataFrame): DataFrame =
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    var codebook = localized(
      sv.join(seeds, Seq(idCol))
        .select(col("sub"), col("code"),
          expr("transform(subvec, v -> round(v, 6))").as("cvec")))
    val states = Seq.newBuilder[DataFrame]
    states += codebook

    for (_ <- 0 until iters) {
      // assignCarry keeps subvec on the assigned row, so the centroid
      // update reads it directly — the old sv⋈assigned re-join on
      // (id, sub) was a full shuffle of the sub-vector table per
      // Lloyd round; with the narrow argmin the only exchange left
      // per round is the (sub, code, pos) mean aggregation
      val assigned = assignCarry(sv, codebook, idCol)
      // element-wise mean per (sub, code), rounded; empty clusters
      // fall back to the previous centroid via the right join
      val updated = assigned
        .select(col("sub"), col("code"), posexplode(col("subvec")))
        .groupBy("sub", "code", "pos").agg(round(avg("col"), 6).as("c"))
        .groupBy("sub", "code").agg(
          expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
            .as("newvec"))
      codebook = localized(
        codebook.join(updated, Seq("sub", "code"), "left")
          .select(col("sub"), col("code"),
            coalesce(col("newvec"), col("cvec")).as("cvec")))
      states += codebook
    }
    states.result()
  }

  /** Asymmetric-distance kNN: for each probe (exact sub-vectors),
    * ADC(q, x) = Σ_sub dist(q_sub, centroid(code(x, sub))) — the
    * probe-side distances to every centroid form the |m·K| lookup
    * table, then a join against the CODES, never the vectors.
    * Returns (probeIdCol, rank, idCol, adist). */
  def adcKnn(
      probes: DataFrame, probeIdCol: String, vecCol: String,
      codes: DataFrame, idCol: String,
      codebook: DataFrame, m: Int, dsub: Int, topK: Int): DataFrame = {
    val qsv = subVectors(probes, probeIdCol, vecCol, m, dsub)
    val lut = qsv.join(broadcast(codebook), Seq("sub"))
      .select(col(probeIdCol), col("sub"), col("code"),
        dist(col("subvec"), col("cvec")).as("pd"))
    val adist = codes.join(lut, Seq("sub", "code"))
      .groupBy(col(probeIdCol), col(idCol))
      .agg(round(sum("pd"), 6).as("adist"))
    adist.withColumn("rank", row_number().over(
        Window.partitionBy(probeIdCol).orderBy(col("adist"), col(idCol))))
      .where(col("rank") <= topK)
      .select(col(probeIdCol), col("rank"), col(idCol), col("adist"))
  }

  /** Residual vectors for IVF-PQ: each vector minus its coarse cell's
    * centroid, element-wise ((vec_id, cell, e) with `e` double). The
    * standard accuracy refinement (Jégou et al. §IV): residuals
    * concentrate around the origin, so the SAME fine-codebook budget
    * quantizes them with far less error than raw vectors. Exact
    * cross-engine: the subtraction is one IEEE op per element over
    * the float-exact cast and the 1e-6-rounded centroid. */
  def residuals(
      vecs: DataFrame, idCol: String, vecCol: String,
      cells: DataFrame, coarse: DataFrame): DataFrame =
    vecs.select(col(idCol),
        expr(s"transform($vecCol, x -> cast(x as double))").as("__e"))
      .join(cells, Seq(idCol))
      .join(broadcast(coarse.select(col("code").as("cell"), col("cvec"))), Seq("cell"))
      .select(col(idCol), col("cell"),
        expr("zip_with(__e, cvec, (a, b) -> a - b)").as("e"))

  /** Incremental re-encode under codebook drift — the q110 storage-
    * maintenance story applied to an ML index: after a codebook
    * retrain, the work to refresh the CODES table should cost what
    * the drift cost, not a corpus re-encode. Cells whose centroid
    * moved at most `tau` (‖c_new − c_old‖², rounded at 1e-6 — the
    * same cross-engine distance every PQ stage uses) are STABLE:
    * codes assigned to them are carried bit-identically, never
    * re-reading the vector. Only (vector, sub) pairs whose assigned
    * cell moved re-enter [[assign]] against the new codebook — so
    * the refresh touches Σ_sub |members of moved cells of sub|
    * sub-vectors, per-SUBSPACE granularity (one vector can carry
    * sub 0's code while re-encoding sub 3's).
    *
    * The carried code is exact when the stable cell is still the
    * argmin under the new codebook; a foreign centroid moving CLOSER
    * can in principle steal a member without the member's own cell
    * moving — the documented approximation every drift-threshold
    * index maintenance makes (tau = 0 forces every cell dirty and
    * degenerates to the full re-encode; the spec pins both edges).
    * The rule itself is deterministic relational algebra, so unlike
    * recall-spec'd ANN maintenance it sits under the cross-engine
    * hash gate (q118).
    *
    * Plan shape: the movement table is |m·K| rows — a broadcast on
    * both the carry filter and the dirty filter — so the only
    * full-width pass is over the DIRTY sub-vectors; stable codes
    * flow straight from the codes table to the output with one
    * broadcast-hash semi-join and no shuffle.
    *
    * @param oldCodes (idCol, sub, code) under `oldCb`
    * @param oldCb,newCb (sub, code, cvec) codebooks; a cell missing
    *   from either side counts as moved
    * @return (idCol, sub, code, reencoded) — complete over oldCodes'
    *   (idCol, sub) pairs
    */
  def driftReencode(
      vecs: DataFrame, idCol: String, vecCol: String,
      oldCodes: DataFrame, oldCb: DataFrame, newCb: DataFrame,
      m: Int, dsub: Int, tau: Double): DataFrame = {
    val movement = oldCb.select(col("sub"), col("code"), col("cvec").as("ocv"))
      .join(newCb.select(col("sub"), col("code"), col("cvec").as("ncv")),
        Seq("sub", "code"), "full")
      .select(col("sub"), col("code"),
        (col("ocv").isNull || col("ncv").isNull ||
          round(sqDist(col("ocv"), col("ncv")), 6) > tau).as("moved"))
    val stableCells = movement.where(!col("moved")).select("sub", "code")
    val movedCells = movement.where(col("moved")).select("sub", "code")
    val carried = oldCodes.join(broadcast(stableCells), Seq("sub", "code"),
        "left_semi")
      .select(col(idCol), col("sub"), col("code"), lit(false).as("reencoded"))
    val dirtyPairs = oldCodes.join(broadcast(movedCells), Seq("sub", "code"),
        "left_semi")
      .select(col(idCol), col("sub"))
    val dirtySv = subVectors(vecs, idCol, vecCol, m, dsub)
      .join(dirtyPairs, Seq(idCol, "sub"), "left_semi")
    val reassigned = assign(dirtySv, newCb, idCol)
      .select(col(idCol), col("sub"), col("code"), lit(true).as("reencoded"))
    carried.unionByName(reassigned)
  }

  /** [[adcKnn]] restricted to CANDIDATE pairs (probeIdCol, idCol) —
    * the IVF-PQ search step: a coarse quantizer has already routed
    * each probe to its cells, so the ADC join touches only the
    * candidates' codes instead of the whole table. */
  def adcRankWithin(
      pairs: DataFrame,
      probes: DataFrame, probeIdCol: String, vecCol: String,
      codes: DataFrame, idCol: String,
      codebook: DataFrame, m: Int, dsub: Int, topK: Int): DataFrame = {
    val qsv = subVectors(probes, probeIdCol, vecCol, m, dsub)
    val lut = qsv.join(broadcast(codebook), Seq("sub"))
      .select(col(probeIdCol), col("sub"), col("code"),
        dist(col("subvec"), col("cvec")).as("pd"))
    val adist = pairs.join(codes, Seq(idCol))
      .join(lut, Seq(probeIdCol, "sub", "code"))
      .groupBy(col(probeIdCol), col(idCol))
      .agg(round(sum("pd"), 6).as("adist"))
    adist.withColumn("rank", row_number().over(
        Window.partitionBy(probeIdCol).orderBy(col("adist"), col(idCol))))
      .where(col("rank") <= topK)
      .select(col(probeIdCol), col("rank"), col(idCol), col("adist"))
  }
}
