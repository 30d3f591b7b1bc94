package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Multimodal, Riff}

/** AVI (RIFF) codec round-trips: mux → parse must recover the exact
  * header facts and frame byte ranges, the idx1-less fallback must
  * agree with the indexed path, garbage must degrade to None (stub
  * path), and the Spark-side ops must surface TRUE container values. */
class RiffSpec extends SparkSpec {

  private def frames4: Seq[Array[Byte]] = Seq(
    "first-frame".getBytes("UTF-8"),
    "the second frame payload".getBytes("UTF-8"),
    Array[Byte](1, 2, 3, 4, 5), // odd length → exercises word-align pad
    "final".getBytes("UTF-8"))

  test("mux → parse round-trips dims, timing, and exact frame bytes") {
    val avi = Riff.muxMjpeg(width = 320, height = 240, fps = 25, frames4)
    val info = Riff.parseAvi(avi).getOrElse(fail("muxed AVI did not parse"))
    assert(info.width == 320 && info.height == 240)
    assert(info.microSecPerFrame == 1000000L / 25)
    assert(info.nFrames == 4 && info.durationUs == 4 * 40000L)
    info.frames.zip(frames4).foreach { case ((off, len), want) =>
      assert(len == want.length, "frame length diverges from the muxed payload")
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len), want),
        "frame bytes at the parsed offset diverge from the original")
    }
  }

  test("an MJPEG frame extracted via the index decodes as a real JPEG") {
    // real 6×4 JPEG via the JDK encoder — an MJPEG AVI is exactly
    // "JPEGs in 00dc chunks", so frame extraction + image decode is a
    // fully real video→pixels path with zero external libraries
    val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, x * 30 + y * 5000 + 99)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val jpeg = baos.toByteArray

    val avi = Riff.muxMjpeg(64, 48, fps = 10, Seq(jpeg, jpeg))
    val info = Riff.parseAvi(avi).get
    val (off, len) = info.frames.head
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      java.util.Arrays.copyOfRange(avi, off, off + len)))
    assert(decoded != null, "extracted frame must be a decodable JPEG")
    assert(decoded.getWidth == 6 && decoded.getHeight == 4)
  }

  test("idx1-less AVI falls back to the movi scan with identical frames") {
    val avi = Riff.muxMjpeg(128, 96, fps = 30, frames4)
    val indexed = Riff.parseAvi(avi).get
    // strip the trailing idx1 chunk and shrink the RIFF size field:
    // idx1 is 8 + 16*nFrames bytes, muxed last
    val idxBytes = 8 + 16 * frames4.length
    val stripped = java.util.Arrays.copyOfRange(avi, 0, avi.length - idxBytes)
    val riffSize = stripped.length - 8
    stripped(4) = (riffSize & 0xff).toByte
    stripped(5) = ((riffSize >> 8) & 0xff).toByte
    stripped(6) = ((riffSize >> 16) & 0xff).toByte
    stripped(7) = ((riffSize >> 24) & 0xff).toByte
    val scanned = Riff.parseAvi(stripped).getOrElse(fail("idx1-less AVI did not parse"))
    assert(scanned.frames == indexed.frames,
      "movi-scan fallback must locate the same frame ranges as idx1")
    assert(scanned.width == 128 && scanned.height == 96)
  }

  test("garbage, truncation, and wrong containers degrade to None") {
    assert(Riff.parseAvi("not a riff file at all".getBytes("UTF-8")).isEmpty)
    assert(Riff.parseAvi(Array.emptyByteArray).isEmpty)
    val avi = Riff.muxMjpeg(64, 48, fps = 10, frames4)
    // truncate mid-movi: header parses but the walker must stop
    // cleanly; idx1 is gone and remaining frames may be partial
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length / 2)
    Riff.parseAvi(cut) // must not throw (may be None or partial frames)
    // a RIFF that is not an AVI (WAVE form type) is rejected up front
    val wav = avi.clone()
    System.arraycopy("WAVE".getBytes("US-ASCII"), 0, wav, 8, 4)
    assert(Riff.parseAvi(wav).isEmpty)
  }

  test("extractMetadata surfaces true container dims for AVI payloads; text video stays stub") {
    val sess = spark
    import sess.implicits._
    val avi = Riff.muxMjpeg(width = 400, height = 300, fps = 24, frames4)
    val textBytes = "just some text pretending to be video".getBytes("UTF-8")
    val media = Seq(
      (1L, "video", avi),
      (2L, "video", textBytes),
      (3L, "image", avi) // wrong modality: AVI bytes must NOT image-decode
    ).toDF("doc_id", "media_type", "payload")
    val meta = Multimodal.extractMetadata(media)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getInt(3) == 400 && meta(1L).getInt(4) == 300,
      "AVI video must decode true header dims")
    val n2 = textBytes.length
    assert(meta(2L).getInt(3) == 16 + n2 % 64 && meta(2L).getInt(4) == 16 + (n2 / 64) % 64,
      "non-AVI video must take the stub")
    assert(meta(3L).getInt(3) == 16 + avi.length % 64,
      "image rows must not take the video codec")
  }

  test("sampleFrames walks the real index: offsets slice out the original frame bytes") {
    val sess = spark
    import sess.implicits._
    // 6 container frames, sample 4 → evenly spaced true frames 0,1,3,4
    val fr = (0 until 6).map(i => s"frame-payload-number-$i!".getBytes("UTF-8"))
    val avi = Riff.muxMjpeg(80, 60, fps = 12, fr)
    val media = Seq((7L, "video", avi)).toDF("doc_id", "media_type", "payload")
    val rows = Multimodal.sampleFrames(media, framesPerDoc = 4)
      .orderBy("frame_idx").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Int]("src_frame")).toSeq == Seq(0, 1, 3, 4),
      "sampled source frames must be evenly spaced over the container index")
    rows.foreach { r =>
      val off = r.getAs[Int]("byte_offset")
      val len = r.getAs[Int]("n_bytes")
      val want = fr(r.getAs[Int]("src_frame"))
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len), want),
        s"frame ${r.getAs[Int]("src_frame")}: offset/len do not locate the original bytes")
    }
    // determinism across reruns (same payload → same checksums)
    val again = Multimodal.sampleFrames(media, framesPerDoc = 4).orderBy("frame_idx").collect()
    assert(rows.map(_.getAs[Long]("frame_checksum")).toSeq ==
      again.map(_.getAs[Long]("frame_checksum")).toSeq)
  }

  test("decodeFrames: MJPEG frames decode to true rasters; non-AVI payloads stay stub") {
    val sess = spark
    import sess.implicits._
    // real 6×4 JPEGs in the container → decode must recover 6×4
    val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, x * 11 + y * 4000 + 7)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val jpeg = baos.toByteArray
    val avi = Riff.muxMjpeg(64, 48, fps = 10, Seq(jpeg, jpeg, jpeg))
    val media = Seq(
      (1L, "video", avi),
      (2L, "video", "not a container".getBytes("UTF-8"))
    ).toDF("doc_id", "media_type", "payload")
    val rows = Multimodal.decodeFrames(media, framesPerDoc = 2)
      .collect().groupBy(_.getLong(0))
    val real = rows(1L)
    assert(real.length == 2 && real.forall(_.getAs[Boolean]("decoded")),
      "every MJPEG frame must decode")
    assert(real.forall(r => r.getAs[Int]("width") == 6 && r.getAs[Int]("height") == 4),
      "decoded dims must come from the frame raster, not the container header")
    val stub = rows(2L)
    assert(stub.forall(!_.getAs[Boolean]("decoded")), "raw text windows must not decode")
  }

  test("q75 on testdata: every sampled frame of every video decodes") {
    val out = SparkEntry.q75FrameDecode(spark, SfDir).cache()
    try {
      val nVideos = Multimodal.asMediaTable(Tables.documents(spark, SfDir), "doc_id", "text")
        .where(col("media_type") === "video").count()
      assert(out.count() == nVideos, "one rollup row per video")
      assert(out.where(col("n_decoded") =!= col("n_frames")).count() == 0,
        "a sampled MJPEG frame failed to decode")
      // frame dims derive from payload length: width 8..12, height 6..9
      assert(out.where(col("max_width") < 8 || col("max_width") > 12 ||
        col("max_height") < 6 || col("max_height") > 9).count() == 0,
        "decoded dims outside the synthetic frame range — stub values leaked in")
      // deterministic rerun (JPEG bytes are a pure function of raster+encoder)
      val again = SparkEntry.q75FrameDecode(spark, SfDir)
      assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    } finally { out.unpersist(): Unit }
  }

  test("q27/q46 on testdata run the real container path for every video row") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, SfDir), "doc_id", "text")
    val videos = media.where(col("media_type") === "video").cache()
    try {
      val n = videos.count()
      assert(n > 0)
      // every muxed payload must parse as AVI (no stub fallbacks) —
      // checked via the metadata dims: muxed width is 160..216, while
      // stub width is 16..79
      val meta = Multimodal.extractMetadata(videos)
      assert(meta.where(col("width") < 160).count() == 0,
        "a testdata video row fell back to the stub — mux or parse broke")
      // and q46's sampled offsets point INSIDE the payload with real lengths
      val frames = SparkEntry.q46FrameSample(spark, SfDir)
      val joined = frames.join(
        videos.select(col("doc_id"), length(col("payload")).as("payload_len")), "doc_id")
      assert(joined.where(col("byte_offset") + col("n_bytes") > col("payload_len")).count() == 0,
        "a sampled frame range escapes its payload")
      assert(frames.count() == n * 4, "4 sampled frames per video")
    } finally { videos.unpersist(): Unit }
  }
}
