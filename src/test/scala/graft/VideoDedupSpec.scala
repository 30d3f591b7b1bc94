package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{ImageDedup, Multimodal, Riff}

/** q180 (multimodal video near-dup): per-frame dHash through the real
  * AVI container + JPEG codec, the all-positions sequence rule, and
  * the planted brightness-variant clusters collapsing with no
  * cross-base pair. */
class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  test("brightness clusters collapse; cross-base separated; sequence rule excludes a divergent frame") {
    val docs = (0L to 26L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val media = Multimodal.asVideoTable(docs, "doc_id", "text")
    // every synthetic AVI decodes through the real codecs
    val fh = Multimodal.videoFrameHashes(media)
    assert(fh.where(!col("decoded")).isEmpty, "a synthetic MJPEG failed to decode")
    assert(fh.count() == 27L * 4, "four sampled frames per doc")

    val pairs = Multimodal.videoNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(pairs.nonEmpty, "planted brightness clusters must pair")
    assert(pairs.forall { case (a, b, _, _) => a / 9 == b / 9 },
      s"cross-base phantom pair: ${pairs.filter(p => p._1 / 9 != p._2 / 9).take(3).toSeq}")
    assert(pairs.forall(_._3 == 4L), "a pair must match at every frame position")
    // all three 9-member clusters pair somewhere
    assert(pairs.map(_._1 / 9).distinct.length == 3)

    // sequence rule: splice ONE divergent frame into a copy of doc 0's
    // clip — three positions still match, the pair must NOT survive
    val base = media.where(col("doc_id") === 0L)
      .select("payload").collect()(0).getAs[Array[Byte]](0)
    val info = Riff.parseAvi(base).get
    val frames = (0 until info.nFrames).map { j =>
      val (off, len) = info.frames(j)
      java.util.Arrays.copyOfRange(base, off, off + len)
    }
    val alien = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32)
        img.setRGB(x, y, if (((x / 4) + (y / 4)) % 2 == 0) 0xFFFFFF else 0)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val spliced = Riff.muxMjpeg(32, 32, fps = 24,
      frames.updated(2, alien))
    val withSplice = media.unionByName(
      Seq((900L, "video", spliced)).toDF("doc_id", "media_type", "payload"))
    val pairs2 = Multimodal.videoNearDupPairs(withSplice)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairs2.exists(p => p._1 == 900L || p._2 == 900L),
      "a clip with one divergent frame must not pair (inserted scene)")

    // …while the same splice-free remux DOES pair with its source
    val remux = Riff.muxMjpeg(32, 32, fps = 24, frames)
    val withRemux = media.unionByName(
      Seq((901L, "video", remux)).toDF("doc_id", "media_type", "payload"))
    val pairs3 = Multimodal.videoNearDupPairs(withRemux)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs3.contains((0L, 901L)), s"byte-identical frames must pair: $pairs3")
  }

  test("short clips (fewer frames than framesPerDoc) pair on their ACTUAL sampled count") {
    // two identical 2-frame clips: videoFrameHashes samples only
    // k = min(framesPerDoc, nFrames) = 2 positions, so the old
    // `n_frames === framesPerDoc` rule could never pair them
    def checker(phase: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32)
        img.setRGB(x, y,
          if (((x / 4) + (y / 4) + phase) % 2 == 0) 0xFFFFFF else 0)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val a = checker(0); val b = checker(1) // inverted board: dHash far apart
    val short1 = Riff.muxMjpeg(32, 32, fps = 24, Seq(a, b))
    val short2 = Riff.muxMjpeg(32, 32, fps = 24, Seq(a, b))
    val diverge = Riff.muxMjpeg(32, 32, fps = 24, Seq(a, a)) // differs at pos 1
    val long4 = Riff.muxMjpeg(32, 32, fps = 24, Seq(a, b, a, b))
    val media = Seq(
      (1L, "video", short1), (2L, "video", short2),
      (3L, "video", diverge), (4L, "video", long4))
      .toDF("doc_id", "media_type", "payload")
    val pairs = Multimodal.videoNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((1L, 2L, 2L)),
      s"identical 2-frame clips must pair with n_frames = 2: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "a short clip divergent at one sampled position must not pair")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "clips with different sampled-frame counts must not pair")
  }

  test("stub totality: non-AVI video payloads hash deterministically, excluded from pairs") {
    val media = Seq(
      (1L, "video", "not an avi at all".getBytes("UTF-8")),
      (2L, "video", "not an avi at all".getBytes("UTF-8")))
      .toDF("doc_id", "media_type", "payload")
    val fh = Multimodal.videoFrameHashes(media).collect()
    assert(fh.forall(!_.getBoolean(3)), "raw bytes must take the stub path")
    assert(Multimodal.videoNearDupPairs(media).isEmpty,
      "undecoded stubs must not pair")
  }
}
