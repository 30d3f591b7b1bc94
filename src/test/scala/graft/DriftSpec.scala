package graft

import org.apache.spark.sql.functions._

/** q208 source-drift monitor: integer-exact total-variation ppm per
  * source vs the reference slice (text/Drift.scala). */
class DriftSpec extends SparkSpec {

  private def drift(df: org.apache.spark.sql.DataFrame) =
    graft.text.Drift.sourceDrift(df, "text", "source",
      refPred = col("lang") === "en", buckets = 256, alertPpm = 150000L)

  /** Independent BigInt recomputation of the TV statistic from the
    * same graft_grams buckets — exercises none of the operator's
    * join/grid/decimal plumbing. */
  private def tvByHand(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] = {
    GraftSession.local(4) // ensure graft functions are registered
    val prof = df
      .select(col("source"), (col("lang") === "en").as("ref"),
        explode(call_function("graft_grams", col("text"), lit(256))).as("b"))
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    val refCnt = prof.filter(_._2).groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val nR = BigInt(refCnt.values.sum)
    prof.groupBy(_._1).map { case (src, rows) =>
      val obs = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val nS = BigInt(obs.values.sum)
      val allBuckets = refCnt.keySet ++ obs.keySet
      val d = allBuckets.iterator.map { b =>
        (BigInt(obs.getOrElse(b, 0L)) * nR -
          BigInt(refCnt.getOrElse(b, 0L)) * nS).abs
      }.sum
      val ppm = (d * 1000000) / ((BigInt(2) * nS * nR).max(1))
      src -> ((nS.toLong, ppm.toLong))
    }
  }

  test("extremes are exact: identical profile 0 ppm, disjoint vocabulary 1e6 ppm") {
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      // the reference slice (also a source of its own)
      (1L, "alpha beta alpha gamma", "en", "base"),
      (2L, "beta gamma alpha alpha", "en", "base"),
      // 'twin' emits exactly the reference's gram multiset
      (3L, "alpha beta alpha gamma", "xx", "twin"),
      (4L, "beta gamma alpha alpha", "xx", "twin"),
      // 'alien' shares no words with the reference
      (5L, "zulu quux zulu quux", "xx", "alien"))
      .toDF("doc_id", "text", "lang", "source")
    // self-diagnose the bucket precondition the 1e6 extreme needs:
    // alien's buckets must not collide with the reference's (the hash
    // is deterministic, so a passing word choice stays passing)
    val hand = tvByHand(docs)
    val got = drift(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    // base IS the whole reference slice: 2 docs × (4 unigrams + 3
    // bigrams) = 14 grams, tv 0 by definition
    assert(got("base") == ((14L, 0L, 0)), s"reference source must report 0: $got")
    assert(got("twin")._2 == 0L && got("twin")._3 == 0,
      s"identical gram multiset must report 0 ppm: $got")
    assert(got("alien")._2 == 1000000L && got("alien")._3 == 1,
      s"disjoint vocabulary must report exactly 1e6 ppm: $got " +
        s"(hand=$hand — if < 1e6 the test words collided in a bucket; pick others)")
    // full identity vs the BigInt recomputation
    for ((src, (n, ppm)) <- hand)
      assert((got(src)._1, got(src)._2) == ((n, ppm)), s"$src drifted from hand calc")
  }

  test("real corpus: ppm bounded, deterministic, and hand-identical per source") {
    val docs = Tables.documents(spark, SfDir)
    val a = drift(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(a.nonEmpty)
    assert(a.forall(r => r._3 >= 0 && r._3 <= 1000000), s"ppm out of range: ${a.toSeq}")
    val hand = tvByHand(docs)
    for ((src, n, ppm, flag) <- a) {
      assert(hand(src) == ((n, ppm)), s"$src: operator != BigInt hand calc")
      assert(flag == (if (ppm >= 150000) 1 else 0))
    }
    // determinism: a second run is row-identical
    val b = drift(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(a.toSeq == b.toSeq)
  }

  // ---- groupedDrift (q210): keyed reference = the group's own union --

  private def grouped(df: org.apache.spark.sql.DataFrame) =
    graft.text.Drift.groupedDrift(df, "text", "source", "lang",
      buckets = 256, alertPpm = 300000L)

  test("grouped extremes: sole contributor 0 ppm, identical twins 0 ppm, " +
    "equal-mass disjoint pair exactly 500000 ppm") {
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      // lang 'aa': s1 is the only contributor — its profile IS the
      // reference, 0 ppm by the sole-contributor identity
      (1L, "alpha beta alpha gamma", "aa", "s1"),
      // lang 'bb': two sources with the same gram multiset — both 0
      (2L, "delta echo delta", "bb", "s2"),
      (3L, "delta echo delta", "bb", "s3"),
      // lang 'cc': two sources, disjoint vocabularies, EQUAL gram
      // mass — each source vs the union is exactly TV = 1/2: half the
      // union's mass sits in buckets the source fills alone
      // (|1 − 1/2| summed over its own mass) and half in the other's
      (4L, "zulu quux zulu", "cc", "s4"),
      (5L, "mike romeo mike", "cc", "s5"))
      .toDF("doc_id", "text", "lang", "source")
    val got = grouped(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    // 4 unigrams + 3 bigrams = 7 grams
    assert(got(("s1", "aa")) == ((7L, 0L, 0)), s"sole contributor: $got")
    assert(got(("s2", "bb"))._2 == 0L && got(("s3", "bb"))._2 == 0L,
      s"identical twins must both report 0: $got")
    assert(got(("s4", "cc"))._2 == 500000L && got(("s5", "cc"))._2 == 500000L,
      s"equal-mass disjoint pair must report exactly 1/2: $got " +
        "(if not, the test words collided in a bucket; pick others)")
    assert(got(("s4", "cc"))._3 == 1 && got(("s2", "bb"))._3 == 0)
  }

  test("grouped real corpus: hand-identical per (source, lang) grain") {
    GraftSession.local(4)
    val docs = Tables.documents(spark, SfDir)
    val got = grouped(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(got.nonEmpty)
    // independent BigInt recomputation, keyed by lang
    val prof = docs
      .select(col("source"), col("lang"),
        explode(call_function("graft_grams", col("text"), lit(256))).as("b"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byLang = prof.groupBy(_._2)
    for ((lang, rows) <- byLang) {
      val refCnt = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val nR = BigInt(refCnt.values.sum)
      for ((src, srcRows) <- rows.groupBy(_._1)) {
        val obs = srcRows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
        val nS = BigInt(obs.values.sum)
        val d = (refCnt.keySet ++ obs.keySet).iterator.map { b =>
          (BigInt(obs.getOrElse(b, 0L)) * nR -
            BigInt(refCnt.getOrElse(b, 0L)) * nS).abs
        }.sum
        val ppm = (d * 1000000) / ((BigInt(2) * nS * nR).max(1))
        assert(got((src, lang)) ==
          ((nS.toLong, ppm.toLong, if (ppm >= 300000) 1 else 0)),
          s"($src, $lang): operator != BigInt hand calc")
      }
    }
  }
}
