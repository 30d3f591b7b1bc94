package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{ImageDedup, Multimodal, Riff}

/** q176 (multimodal audio band near-dup): dominant-band transition
  * fingerprint over integer Goertzel powers — the frequency-domain
  * depth behind q175's time-domain envelope. Pins the headline
  * property: a melody PITCH-SHIFTED across the band set fingerprints
  * identically here while the envelope dHash scatters past the
  * banding threshold (the planted cluster the envelope form misses),
  * plus rhythm sensitivity, determinism, and stub totality. */
class AudioBandDedupSpec extends SparkSpec {
  import spark.implicits._

  // exact integer samples of 2·cos(2πi/p) for the three band periods
  private val cosTab = Map(
    0 -> Array(2, 1, -1, -2, -1, 1),  // period 6 ⇔ coefficient +1
    1 -> Array(2, 0, -2, 0),          // period 4 ⇔ coefficient  0
    2 -> Array(2, -1, -1))            // period 3 ⇔ coefficient −1

  /** A "melody": one note (band index) per run of `runLen` windows
    * from a rhythm seed, constant amplitude; `shift` transposes every
    * note by whole bands — a pitch-shifted copy of the same melody. */
  private def melody(shift: Int, rhythmSeed: Long, runLen: Int, n: Int): Array[Byte] = {
    val W = 65
    Array.tabulate(n) { i =>
      val w = (i.toLong * W / n).toInt
      val note = (((w / runLen + rhythmSeed) * 2654435761L % 97L) % 3L).toInt
      val band = (note + shift) % 3
      val tone = 20 * cosTab(band)(i % cosTab(band).length)
      (128 + tone).max(0).min(255).toByte
    }
  }

  // window length 97–98 samples: deliberately NOT divisible by any
  // band period, so partial-cycle leakage is in play and the exact
  // integer comparisons still decide every bit deterministically
  private val N = 65 * 97 + 13

  private def media(rows: (Long, Array[Byte])*) =
    rows.toSeq.map { case (id, p) => (id, "audio", p) }
      .toDF("doc_id", "media_type", "payload")

  test("pitch-shifted copies fingerprint identically where the envelope scatters") {
    val df = media(
      1L -> Riff.muxWav(8000, melody(0, 5L, 4, N)),  // the melody
      2L -> Riff.muxWav(8000, melody(1, 5L, 4, N)),  // up one band
      3L -> Riff.muxWav(8000, melody(2, 5L, 4, N)),  // up two bands
      4L -> Riff.muxWav(8000, melody(0, 19L, 3, N))) // different rhythm
    val band = Multimodal.audioBandFingerprints(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    val env = Multimodal.audioFingerprints(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    def ham(m: Map[Long, Long], a: Long, b: Long) =
      java.lang.Long.bitCount(m(a) ^ m(b))
    assert(band.values.forall(_._2), "all synthetic WAVs must decode")

    // the planted cluster: transition bits are invariant under the
    // band permutation — hamming 0 across all three pitches
    val bfp = band.view.mapValues(_._1).toMap
    assert(ham(bfp, 1L, 2L) == 0 && ham(bfp, 1L, 3L) == 0 && ham(bfp, 2L, 3L) == 0,
      s"pitch shift moved transition bits: ${Seq(ham(bfp,1L,2L), ham(bfp,1L,3L), ham(bfp,2L,3L))}")
    // …exactly where the envelope form misses: the waveform's
    // pitch-dependent mean|amplitude| changes at every note boundary
    assert(Seq(ham(env, 1L, 2L), ham(env, 1L, 3L), ham(env, 2L, 3L)).forall(_ > 2),
      s"envelope unexpectedly survived the pitch shift: " +
        s"${Seq(ham(env,1L,2L), ham(env,1L,3L), ham(env,2L,3L))}")
    // rhythm sensitivity: a different melody does NOT collapse
    assert(Seq(ham(bfp, 1L, 4L), ham(bfp, 2L, 4L), ham(bfp, 3L, 4L)).forall(_ > 2),
      s"different rhythm paired: ${Seq(ham(bfp,1L,4L), ham(bfp,2L,4L), ham(bfp,3L,4L))}")

    // the same banding as q175/q130 pairs exactly the planted cluster
    val pairs = ImageDedup.dHashPairs(
      Multimodal.audioBandFingerprints(df).where(col("decoded")),
      "doc_id", "bfp", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("determinism and stub totality") {
    val df = media(
      1L -> Riff.muxWav(8000, melody(0, 5L, 4, N)),
      2L -> Riff.muxWav(8000, melody(0, 5L, 4, N)),   // identical bytes
      5L -> Riff.muxWav(8000, melody(0, 5L, 4, 64).take(64 + 44)), // too short
      6L -> "not audio at all".getBytes("UTF-8"))     // undecodable
    val fp = Multimodal.audioBandFingerprints(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(fp(1L) == fp(2L), "identical PCM must fingerprint identically")
    assert(!fp(6L)._2, "stub path for undecodable payloads")
    assert(fp(1L)._2)
  }
}
