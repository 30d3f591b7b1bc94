package graft

import org.apache.spark.sql.functions._

import graft.similarity.Pq

/** Product quantization (similarity/Pq.scala): the ADC identity
  * (lookup-table sums ≡ explicit reconstructed distances), training
  * progress (quantization error non-increasing across Lloyd rounds),
  * code completeness, determinism, and perfect retrieval on planted
  * separable clusters. */
class PqSpec extends SparkSpec {

  private val M = 8
  private val D = 8
  private val K = 16

  test("ADC distance equals the explicit reconstructed distance") {
    val emb = Tables.embeddings(spark, SfDir)
    val cb = Pq.trainCodebook(emb, "vec_id", "embedding", M, D, K, iters = 2)
    val codes = Pq.assign(
      Pq.subVectors(emb, "vec_id", "embedding", M, D), cb, "vec_id")
    val probes = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val adc = Pq.adcKnn(probes, "probe_id", "embedding",
      codes, "vec_id", cb, M, D, topK = 5)

    // re-derive: distance from the probe to the RECONSTRUCTED
    // (per-sub centroid) vector, summed per sub-space explicitly
    val qsv = Pq.subVectors(probes, "probe_id", "embedding", M, D)
    val explicit = codes.join(cb, Seq("sub", "code"))
      .join(qsv, Seq("sub"))
      .withColumn("pd",
        call_function("graft_dot", col("subvec"), col("subvec"))
          - lit(2.0d) * call_function("graft_dot", col("subvec"), col("cvec"))
          + call_function("graft_dot", col("cvec"), col("cvec")))
      .groupBy("probe_id", "vec_id")
      .agg(round(sum("pd"), 6).as("edist"))
    val joined = adc.join(explicit, Seq("probe_id", "vec_id"))
    assert(joined.count() == adc.count())
    assert(joined.where(abs(col("adist") - col("edist")) > 1e-5).count() == 0,
      "ADC lookup sum diverges from the reconstructed distance")
  }

  test("assign contract: partial codebook drops uncovered subs (inner-join " +
      "semantics); empty codebook throws at plan build") {
    val emb = Tables.embeddings(spark, SfDir)
    val sv = Pq.subVectors(emb, "vec_id", "embedding", M, D)
    val cb = Pq.trainCodebook(emb, "vec_id", "embedding", M, D, K, iters = 1)
    // drop one sub-space from the codebook: rows for that sub must
    // VANISH (the pre-r14 inner-join contract), never survive with a
    // NULL code that would poison downstream joins/groups
    val partial = cb.where(col("sub") =!= 3)
    val assigned = Pq.assign(sv, partial, "vec_id")
    assert(assigned.where(col("sub") === 3).count() == 0,
      "uncovered sub-space leaked rows through assign")
    assert(assigned.where(col("code").isNull).count() == 0,
      "assign emitted NULL codes")
    // full-codebook assignment of the remaining subs is unchanged
    val full = Pq.assign(sv, cb, "vec_id").where(col("sub") =!= 3)
    assert(assigned.exceptAll(full).isEmpty && full.exceptAll(assigned).isEmpty,
      "partial-codebook assignment diverges from the full assignment's slice")
    // empty codebook: loud plan-build failure, not a silent empty result
    intercept[IllegalArgumentException] {
      Pq.assign(sv, cb.limit(0), "vec_id")
    }
  }

  test("Lloyd rounds do not increase quantization error; codes complete") {
    val emb = Tables.embeddings(spark, SfDir)
    val sv = Pq.subVectors(emb, "vec_id", "embedding", M, D)
    def qerr(iters: Int): Double = {
      val cb = Pq.trainCodebook(emb, "vec_id", "embedding", M, D, K, iters)
      Pq.assign(sv, cb, "vec_id")
        .join(cb, Seq("sub", "code")).join(sv, Seq("vec_id", "sub"))
        .select((call_function("graft_dot", col("subvec"), col("subvec"))
          - lit(2.0d) * call_function("graft_dot", col("subvec"), col("cvec"))
          + call_function("graft_dot", col("cvec"), col("cvec"))).as("d"))
        .agg(sum("d")).collect()(0).getDouble(0)
    }
    val (e0, e1, e2) = (qerr(0), qerr(1), qerr(2))
    assert(e1 <= e0 + 1e-6 && e2 <= e1 + 1e-6,
      s"quantization error increased: $e0 -> $e1 -> $e2")
    // every (vector, sub) has exactly one code in [0, K)
    val codes = Pq.assign(sv, Pq.trainCodebook(
      emb, "vec_id", "embedding", M, D, K, 2), "vec_id")
    assert(codes.count() == emb.count() * M)
    assert(codes.where(col("code") < 0 || col("code") >= K).count() == 0)
    // determinism: training twice yields the identical codebook
    val a = Pq.trainCodebook(emb, "vec_id", "embedding", M, D, K, 2)
    val b = Pq.trainCodebook(emb, "vec_id", "embedding", M, D, K, 2)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("q117: IVF routing prunes candidates and agrees with full ADC on them") {
    val got = SparkEntry.q117IvfPqKnn(spark, SfDir)
    val full = SparkEntry.q116PqAdcKnn(spark, SfDir)
      .withColumnRenamed("adist", "full_adist").drop("rank")
    // every IVF-PQ result that full ADC also ranked carries the SAME
    // asymmetric distance — routing restricts the candidate set, it
    // never changes a distance
    val joined = got.join(full, Seq("probe_id", "vec_id"))
    assert(joined.where(abs(col("adist") - col("full_adist")) > 1e-9).count() == 0,
      "IVF-restricted ADC distance diverged from the full scan's")
    // and the probes all answered
    assert(got.select("probe_id").distinct().count() ==
      Tables.embeddings(spark, SfDir).where(col("vec_id") % 100 === 0).count())
  }

  test("q118: drift re-encode — edges pin full re-encode and full carry; " +
      "the split partitions the code space") {
    val emb = Tables.embeddings(spark, SfDir)
    val sv = Pq.subVectors(emb, "vec_id", "embedding", M, D)
    val oldCb = Pq.trainCodebook(emb, "vec_id", "embedding", M, D, K, iters = 1)
    val newCb = Pq.trainCodebook(emb, "vec_id", "embedding", M, D, K, iters = 2)
    val oldCodes = Pq.assign(sv, oldCb, "vec_id")
    val fresh = Pq.assign(sv, newCb, "vec_id")

    // tau = -1: every cell moved — output ≡ the full re-encode, all flagged
    val all = Pq.driftReencode(emb, "vec_id", "embedding",
      oldCodes, oldCb, newCb, M, D, tau = -1.0)
    assert(all.where(!col("reencoded")).count() == 0)
    assert(all.drop("reencoded").exceptAll(fresh).count() == 0 &&
      fresh.exceptAll(all.drop("reencoded")).count() == 0,
      "tau=-1 did not reproduce the full re-encode")

    // tau = ∞: no cell moved — codes carried bit-identically, none flagged
    val none = Pq.driftReencode(emb, "vec_id", "embedding",
      oldCodes, oldCb, newCb, M, D, tau = Double.MaxValue)
    assert(none.where(col("reencoded")).count() == 0)
    assert(none.drop("reencoded").exceptAll(oldCodes).count() == 0 &&
      oldCodes.exceptAll(none.drop("reencoded")).count() == 0,
      "tau=MaxValue did not carry the old codes verbatim")

    // the registry tau: output complete over (vec, sub); carried rows
    // are bit-equal to the old codes; re-encoded rows equal the fresh
    // assignment for exactly those pairs
    val got = SparkEntry.q118PqDriftReencode(spark, SfDir)
    assert(got.count() == emb.count() * M)
    assert(got.select("vec_id", "sub").distinct().count() == emb.count() * M)
    val carried = got.where(!col("reencoded")).drop("reencoded")
    assert(carried.exceptAll(oldCodes.join(carried.select("vec_id", "sub"),
      Seq("vec_id", "sub"), "left_semi")).count() == 0,
      "a carried code differs from the stored old code")
    val re = got.where(col("reencoded")).drop("reencoded")
    assert(re.exceptAll(fresh.join(re.select("vec_id", "sub"),
      Seq("vec_id", "sub"), "left_semi")).count() == 0,
      "a re-encoded code differs from the fresh assignment")
  }

  test("q122: residual encoding answers every probe and refines quantization " +
      "error vs raw-vector IVF-PQ") {
    val emb = Tables.embeddings(spark, SfDir)
    val nProbes = emb.where(col("vec_id") % 100 === 0).count()
    val res = SparkEntry.q122ResidualIvfPq(spark, SfDir).cache()
    assert(res.select("probe_id").distinct().count() == nProbes)
    assert(res.groupBy("probe_id").count().where(col("count") =!= 5).count() == 0)

    // each probe's own vector lives in its top-routed cell, so its
    // self-match ADC distance is PURE quantization error; residual
    // encoding must not quantize worse than raw-vector encoding on
    // average (the Jégou refinement claim), compared on the probes
    // where both variants ranked the self-match
    val raw = SparkEntry.q117IvfPqKnn(spark, SfDir)
    val selfR = res.where(col("probe_id") === col("vec_id"))
      .select(col("probe_id"), col("adist").as("resid_err"))
    val selfQ = raw.where(col("probe_id") === col("vec_id"))
      .select(col("probe_id"), col("adist").as("raw_err"))
    val both = selfR.join(selfQ, "probe_id").cache()
    assert(both.count() > 0, "no self-matches to compare")
    val Array(re, qe) = both.agg(avg("resid_err"), avg("raw_err"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    assert(re <= qe + 1e-9,
      s"residual encoding quantized WORSE than raw: resid=$re raw=$qe")
    both.unpersist(); res.unpersist()
  }

  test("planted separable clusters retrieve their own members") {
    val sess = spark
    import sess.implicits._
    // 4 tight 64-dim clusters far apart; PQ must rank own-cluster
    // vectors above all others for every probe
    val rows = (0 until 64).map { i =>
      val cluster = i % 4
      val base = cluster * 1000.0f
      (i.toLong, Array.tabulate(64)(d => base + ((i * 7 + d) % 5) * 0.1f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val cb = Pq.trainCodebook(emb, "vec_id", "embedding", M, D, K, 2)
    val codes = Pq.assign(Pq.subVectors(emb, "vec_id", "embedding", M, D), cb, "vec_id")
    val probes = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val top = Pq.adcKnn(probes, "probe_id", "embedding", codes, "vec_id",
      cb, M, D, topK = 10)
    // probe i belongs to cluster i; all 10 neighbors must share it
    assert(top.where(col("vec_id") % 4 =!= col("probe_id") % 4).count() == 0,
      "cross-cluster vector ranked into a separable cluster's top-10")
  }
}
