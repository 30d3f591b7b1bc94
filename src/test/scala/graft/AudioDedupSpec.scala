package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{ImageDedup, Multimodal, Riff}

/** q175 (multimodal audio near-dup): the energy-envelope dHash over
  * REAL WAV decode — gain invariance, envelope sensitivity, totality
  * over undecodable payloads, and the planted corpus clusters
  * collapsing through the actual codec. */
class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  private def pattern(seed: Long, n: Int, amp: Long): Array[Byte] =
    Array.tabulate(n) { i =>
      val x = (seed * 1000003L + (i / 16) * 7919L) % 1000000007L
      val v = (x * x % 1000000007L * 2654435761L % 1000000007L) % 49L - 24L
      (128L + v * amp).max(0L).min(255L).toByte
    }

  private def media(rows: (Long, Array[Byte])*) =
    rows.toSeq.map { case (id, p) => (id, "audio", p) }
      .toDF("doc_id", "media_type", "payload")

  test("codec round-trip determinism, gain invariance, envelope sensitivity") {
    val df = media(
      1L -> Riff.muxWav(8000, pattern(5, 1024, 1)),
      2L -> Riff.muxWav(8000, pattern(5, 1024, 1)),   // identical
      3L -> Riff.muxWav(8000, pattern(5, 1024, 2)),   // exact 2x gain
      4L -> Riff.muxWav(8000, pattern(9, 1024, 1)),   // different content
      5L -> Riff.muxWav(8000, pattern(5, 64, 1)),     // too short: stub
      6L -> "not audio at all".getBytes("UTF-8"))     // undecodable: stub
    val fp = Multimodal.audioFingerprints(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap

    assert(fp(1L) == fp(2L), "identical PCM must fingerprint identically")
    assert(fp(1L)._1 == fp(3L)._1,
      "an exact gain change must not move a single envelope-gradient bit")
    assert(java.lang.Long.bitCount(fp(1L)._1 ^ fp(4L)._1) > 10,
      "different content must be far in hamming space")
    assert(!fp(5L)._2 && !fp(6L)._2, "stub path for short/undecodable")
    assert(fp(1L)._2 && fp(4L)._2)

    val pairs = ImageDedup.dHashPairs(
      Multimodal.audioFingerprints(df).where(col("decoded")),
      "doc_id", "afp", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("corpus clusters collapse through the real WAV codec; no cross-cluster pair") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val audio = Multimodal.asAudioTable(docs, "doc_id", "text")
    // the payloads really are WAV containers the JDK codec accepts
    val fps = Multimodal.audioFingerprints(audio)
    assert(fps.where(!col("decoded")).isEmpty, "a synthetic WAV failed to decode")
    val pairs = ImageDedup.dHashPairs(fps, "doc_id", "afp", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty, "planted gain clusters must pair")
    assert(pairs.forall { case (a, b, _) => a / 9 == b / 9 },
      s"cross-cluster phantom pair: ${pairs.filter(p => p._1 / 9 != p._2 / 9).take(3).toSeq}")
    // every full 3-member cluster pairs; nearly all collapse fully
    // (the 4/5 and 6/5 gain TRUNCATION can flip >2 bits for a few
    // patterns — detector recall under integer-rounding noise, not
    // a miss of identical content)
    val audioIds = audio.select("doc_id").collect().map(_.getLong(0))
    val full = audioIds.groupBy(_ / 9).filter(_._2.length == 3).keys.toSet
    val pairedClusters = pairs.groupBy(_._1 / 9).view.mapValues(_.length).toMap
    assert(full.forall(c => pairedClusters.getOrElse(c, 0) >= 1),
      "a planted cluster paired nowhere")
    assert(full.count(c => pairedClusters.getOrElse(c, 0) == 3) * 10 >= full.size * 9,
      s"too few fully-collapsed clusters: ${pairedClusters.values.groupBy(identity).view.mapValues(_.size).toMap}")
  }
}
