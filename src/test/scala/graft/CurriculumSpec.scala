package graft

import org.apache.spark.sql.functions._

import graft.text.Curriculum

/** q200 (text/Curriculum): quality-curriculum ordering. Planted
  * quality extremes pin the rank, the anneal cutoff, phase-major
  * consumption, and the within-phase scramble; the real corpus pins
  * permutation-ness, replay, and seed sensitivity. */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("planted quality extremes: rank, cutoff, and phase-major order are exact") {
    // quality_score_ppm is monotone in alpha mass here: d1..d4 pure
    // alpha+stopwords (high), d5..d8 digits+punct (low). annealPpm
    // 250000 over 8 docs → anneal = top 2 by (score DESC, id ASC).
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a dog and a cat"),
      (3L, "it is a fine day"),
      (4L, "of the people in the town"),
      (5L, "12345 67890 11111"),
      (6L, "!!! ??? ### $$$"),
      (7L, "99 bottles !!! 42"),
      (8L, "#$% 000 ^&* 111")).toDF("doc_id", "text")
    val got = Curriculum.phaseOrder(docs, "doc_id", "text",
      annealPpm = 250000L, seed = 1L).persist()

    // epoch_pos is a permutation of 1..8
    assert(got.select("epoch_pos").collect().map(_.getLong(0)).sorted.toSeq
      == (1L to 8L))
    // the anneal set is EXACTLY the top 2 quality ranks
    val phase2 = got.where(col("phase") === 2L)
      .select("quality_rank").collect().map(_.getLong(0)).toSet
    assert(phase2 == Set(1L, 2L), s"anneal set ranks $phase2")
    // every bulk position precedes every anneal position
    val maxBulk = got.where(col("phase") === 1L)
      .agg(max("epoch_pos")).head.getLong(0)
    val minAnneal = got.where(col("phase") === 2L)
      .agg(min("epoch_pos")).head.getLong(0)
    assert(maxBulk < minAnneal, s"bulk max $maxBulk vs anneal min $minAnneal")
    // rank matches the in-Scala reference on (score DESC, id ASC)
    val byRank = got.orderBy("quality_rank")
      .select("doc_id", "quality_score_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ref = byRank.sortBy { case (id, s) => (-s, id) }
    assert(byRank == ref, "rank order diverged from (score DESC, id ASC)")
    // all four alpha docs outrank all four symbol docs
    assert(byRank.take(4).map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    got.unpersist(): Unit
  }

  test("q203: the stored-score plan is identical to the fresh-scoring plan") {
    val fresh = SparkEntry.q200CurriculumOrder(spark, SfDir)
      .orderBy("epoch_pos").collect().map(_.toSeq).toSeq
    val stored = SparkEntry.q203CurriculumStored(spark, SfDir)
      .orderBy("epoch_pos").collect().map(_.toSeq).toSeq
    assert(stored == fresh, "stored-score plan diverged from fresh scoring")
    // and re-planning with a different seed over the score relation
    // keeps phase membership (the stored posture's point: schedule
    // sweeps re-rank (id, score) rows, never the corpus text)
    val scores = graft.text.TextOps.qualityScore(
        Tables.documents(spark, SfDir), "doc_id", "text")
      .select(col("doc_id"), col("quality_score_ppm"))
    val reseeded = graft.text.Curriculum.orderFromScores(
        scores, "doc_id", annealPpm = 250000L, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val base = fresh.map(s => (s(0).asInstanceOf[Long],
      s(3).asInstanceOf[Long])).toSet
    assert(reseeded == base, "seed must not move phase membership")
  }

  test("q204: repeat allocation — in-Scala reference, cap binding, subsample regime") {
    val docs = Tables.documents(spark, SfDir)
    val merges = graft.text.Bpe.trainMerges(docs, "doc_id", "text", rounds = 8)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val lens = graft.text.Bpe.encode(docs, "doc_id", "text", merges)
      .select("doc_id", "n_bpe_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 >= 1L).toSeq
    val t = lens.map(_._2).sum
    val M = 1000000007L
    def h(id: Long) =
      (math.floorMod(id, 1000003L) * 7919L + 1L) % M * 2654435761L % M

    def run(budget: Long, cap: Long): Map[Long, Long] =
      graft.text.Curriculum.repeatAllocation(docs, "doc_id", "text", merges,
        budget, cap, seed = 1L)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    // remainder regime: budget 3.5×T at cap 4 — exact vs the in-Scala
    // greedy reference, and the plan never overshoots
    val budget = 3L * t + t / 2L
    val got = run(budget, 4L)
    var cum = 0L
    val want = lens.sortBy { case (id, _) => (h(id), id) }.map { case (id, l) =>
      cum += l; id -> (3L + (if (cum <= t / 2L) 1L else 0L))
    }.toMap
    assert(got == want, "allocation diverged from the greedy reference")
    val spent = lens.map { case (id, l) => got(id) * l }.sum
    assert(spent <= budget && spent > budget - lens.map(_._2).max,
      s"spent $spent vs budget $budget")

    // cap binding: a huge budget grants exactly cap everywhere
    assert(run(100L * t, 4L).values.toSet == Set(4L))
    // subsample regime: budget < T → zero full epochs, scramble prefix
    val sub = run(t / 4L, 4L)
    assert(sub.values.toSet == Set(0L, 1L), s"subsample values ${sub.values.toSet}")
    val subSpent = lens.map { case (id, l) => sub(id) * l }.sum
    assert(subSpent <= t / 4L)
  }

  test("real corpus: permutation, replay, seed sensitivity, cutoff arithmetic") {
    val docs = Tables.documents(spark, SfDir)
    val n = docs.count()
    def run(seed: Long) = Curriculum.phaseOrder(
      docs, "doc_id", "text", annealPpm = 250000L, seed = seed)
      .orderBy("epoch_pos")
      .select("doc_id", "phase", "epoch_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val e1 = run(1L)
    assert(e1.map(_._3) == (1L to n))
    assert(e1.map(_._1).distinct.size == n.toInt)
    // the anneal set is floor(n/4) docs
    assert(e1.count(_._2 == 2L) == (n * 250000L / 1000000L).toInt)
    // replay: bit-identical under the same seed
    assert(run(1L) == e1)
    // re-seeding permutes WITHIN phases but never moves the membership
    val e2 = run(2L)
    assert(e2 != e1, "re-seeding must permute the epoch")
    def membership(e: Seq[(Long, Long, Long)]) =
      e.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(membership(e2) == membership(e1),
      "seed must not move documents across phases")
  }
}
