package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM AVI (RIFF) container codec — the video sibling of the
  * javax.imageio / javax.sound.sampled paths in [[Multimodal]]. The
  * JDK has no video API, but an MJPEG AVI is just a RIFF chunk tree:
  * a 56-byte `avih` main header (true width/height/frame count/frame
  * duration), one `strl` stream definition, a `movi` list of `00dc`
  * frame chunks, and an `idx1` frame index. Both directions are
  * implemented from the public AVI RIFF spec:
  *
  *   - [[Riff.muxMjpeg]] writes a standards-shaped AVI around caller
  *     frame payloads (real JPEGs make it an actual MJPEG video);
  *   - [[Riff.parseAvi]] walks the chunk tree back to header fields
  *     and TRUE per-frame byte offsets/lengths, preferring the `idx1`
  *     index (both absolute and movi-relative offset conventions) and
  *     falling back to a `movi` scan when the index is absent.
  *
  * All parsing is bounds-checked against the payload — truncated or
  * non-AVI bytes return None (callers fall through to their stub
  * path), never throw. Mirrors the reference's treatment of media as
  * opaque blobs with typed metadata alongside.
  */
object Riff {

  /** Parsed container facts: true dims, frame timing, and the frame
    * index as (absolute data offset, length) pairs into the payload. */
  case class AviInfo(
      width: Int,
      height: Int,
      microSecPerFrame: Long,
      frames: Vector[(Int, Int)]) {
    def nFrames: Int = frames.length
    def durationUs: Long = microSecPerFrame * nFrames
  }

  private def fourCC(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def readU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    if (off + 4 <= b.length)
      new String(b, off, 4, "US-ASCII")
    else ""

  // -----------------------------------------------------------------
  // writer
  // -----------------------------------------------------------------

  /** Mux frame payloads into an MJPEG-flavored AVI. Frames are written
    * as `00dc` chunks (word-aligned, as the spec requires) with a
    * keyframe-flagged `idx1` index using movi-relative offsets — the
    * convention most writers emit and the harder of the two for a
    * parser to get right. `fps` drives dwMicroSecPerFrame and the
    * stream header's scale/rate pair. */
  def muxMjpeg(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty,
      s"muxMjpeg needs positive dims/fps and >=1 frame, got ${width}x$height@$fps×${frames.length}")

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(fourCC(id)); o.write(u32le(body.length)); o.write(body)
      if (body.length % 2 == 1) o.write(0) // word alignment pad
      o.toByteArray
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(fourCC("LIST")); o.write(u32le(4L + children.length))
      o.write(fourCC(listType)); o.write(children)
      o.toByteArray
    }

    val usPerFrame = 1000000L / fps
    val avih = { // MainAVIHeader: 14 u32 fields
      val o = new ByteArrayOutputStream()
      o.write(u32le(usPerFrame))            // dwMicroSecPerFrame
      o.write(u32le(0)); o.write(u32le(0))  // dwMaxBytesPerSec, dwPaddingGranularity
      o.write(u32le(0x10))                  // dwFlags: AVIF_HASINDEX
      o.write(u32le(frames.length.toLong))  // dwTotalFrames
      o.write(u32le(0)); o.write(u32le(1))  // dwInitialFrames, dwStreams
      o.write(u32le(0))                     // dwSuggestedBufferSize
      o.write(u32le(width.toLong)); o.write(u32le(height.toLong))
      (1 to 4).foreach(_ => o.write(u32le(0))) // dwReserved
      o.toByteArray
    }
    val strh = { // AVIStreamHeader for the single video stream
      val o = new ByteArrayOutputStream()
      o.write(fourCC("vids")); o.write(fourCC("MJPG"))
      o.write(u32le(0)); o.write(u16le(0)); o.write(u16le(0)) // flags, priority, language
      o.write(u32le(0))                     // dwInitialFrames
      o.write(u32le(1)); o.write(u32le(fps.toLong)) // dwScale, dwRate → fps
      o.write(u32le(0)); o.write(u32le(frames.length.toLong)) // dwStart, dwLength
      o.write(u32le(0)); o.write(u32le(10000)) // dwSuggestedBufferSize, dwQuality
      o.write(u32le(0))                     // dwSampleSize
      o.write(u16le(0)); o.write(u16le(0)); o.write(u16le(width)); o.write(u16le(height))
      o.toByteArray
    }
    val strf = { // BITMAPINFOHEADER
      val o = new ByteArrayOutputStream()
      o.write(u32le(40)) // biSize
      o.write(u32le(width.toLong)); o.write(u32le(height.toLong))
      o.write(u16le(1)); o.write(u16le(24)) // biPlanes, biBitCount
      o.write(fourCC("MJPG"))               // biCompression
      o.write(u32le(width.toLong * height * 3)) // biSizeImage
      o.write(u32le(0)); o.write(u32le(0)); o.write(u32le(0)); o.write(u32le(0))
      o.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))

    // movi children + idx1 entries (offsets relative to the position
    // of the "movi" fourcc itself, the common writer convention)
    val moviChildren = new ByteArrayOutputStream()
    val idx = new ByteArrayOutputStream()
    frames.foreach { f =>
      val rel = 4 + moviChildren.size() // past "movi", at this chunk's header
      idx.write(fourCC("00dc")); idx.write(u32le(0x10L)) // AVIIF_KEYFRAME
      idx.write(u32le(rel.toLong)); idx.write(u32le(f.length.toLong))
      moviChildren.write(chunk("00dc", f))
    }
    val movi = list("movi", moviChildren.toByteArray)
    val idx1 = chunk("idx1", idx.toByteArray)

    val body = new ByteArrayOutputStream()
    body.write(fourCC("AVI ")); body.write(hdrl); body.write(movi); body.write(idx1)
    val out = new ByteArrayOutputStream()
    out.write(fourCC("RIFF")); out.write(u32le(body.size().toLong)); out.write(body.toByteArray)
    out.toByteArray
  }

  // -----------------------------------------------------------------
  // parser
  // -----------------------------------------------------------------

  private def isFrameChunk(id: String): Boolean =
    id.length == 4 && id(0).isDigit && id(1).isDigit &&
      (id.endsWith("dc") || id.endsWith("db"))

  /** Parse an AVI payload to header facts + the true frame index.
    * Returns None (never throws) unless the RIFF/AVI signature, a
    * well-formed `avih`, and at least one locatable frame are all
    * present — partial garbage downgrades to the caller's stub path
    * rather than fabricating metadata. */
  def parseAvi(b: Array[Byte]): Option[AviInfo] = {
    if (b.length < 24 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ") return None

    var width = -1
    var height = -1
    var usPerFrame = 0L
    var moviPos = -1 // absolute position of the "movi" fourcc
    var moviEnd = -1
    var idx1: Option[(Int, Int)] = None // (body offset, body length)

    // walk a run of sibling chunks in [pos, end)
    def walk(pos0: Int, end: Int): Unit = {
      var pos = pos0
      while (pos + 8 <= end) {
        val id = tag(b, pos)
        val size = readU32(b, pos + 4)
        if (size < 0 || pos + 8 + size > b.length) return // truncated: stop cleanly
        val bodyStart = pos + 8
        val bodyEnd = (bodyStart + size).toInt
        id match {
          case "RIFF" | "LIST" =>
            val listType = tag(b, bodyStart)
            if (listType == "movi") { moviPos = bodyStart; moviEnd = bodyEnd }
            // recurse into hdrl/strl/movi alike; frame chunks are
            // collected by the movi scan below only if idx1 is absent
            if (listType != "movi") walk(bodyStart + 4, bodyEnd)
          case "avih" if size >= 40 =>
            usPerFrame = readU32(b, bodyStart)
            width = readU32(b, bodyStart + 32).toInt
            height = readU32(b, bodyStart + 36).toInt
          case "idx1" =>
            idx1 = Some((bodyStart, size.toInt))
          case _ => ()
        }
        pos = bodyEnd + (size % 2).toInt // word alignment
      }
    }
    walk(12, b.length)
    if (width <= 0 || height <= 0) return None

    // frame index: idx1 when present and sane, else movi scan
    def framesFromIdx1(off: Int, len: Int): Vector[(Int, Int)] = {
      val out = Vector.newBuilder[(Int, Int)]
      var p = off
      while (p + 16 <= off + len) {
        val id = tag(b, p)
        val ckOff = readU32(b, p + 8).toInt
        val ckLen = readU32(b, p + 12).toInt
        if (isFrameChunk(id)) {
          // offset convention: relative to the "movi" fourcc (common)
          // or absolute from file start (some writers) — accept the
          // one whose target actually IS this chunk's header
          val candidates = Seq(moviPos + ckOff, ckOff).filter(_ >= 0)
          candidates.find(at => tag(b, at) == id &&
              at + 8 + ckLen <= b.length && readU32(b, at + 4) == ckLen.toLong)
            .foreach(at => out += ((at + 8, ckLen)))
        }
        p += 16
      }
      out.result()
    }
    def framesFromMovi(): Vector[(Int, Int)] = {
      val out = Vector.newBuilder[(Int, Int)]
      if (moviPos >= 0) {
        var pos = moviPos + 4
        while (pos + 8 <= moviEnd) {
          val id = tag(b, pos)
          val size = readU32(b, pos + 4)
          if (size < 0 || pos + 8 + size > b.length) return out.result()
          if (isFrameChunk(id)) out += ((pos + 8, size.toInt))
          pos = (pos + 8 + size + size % 2).toInt
        }
      }
      out.result()
    }

    val frames = idx1.map { case (o, l) => framesFromIdx1(o, l) }
      .filter(_.nonEmpty)
      .getOrElse(framesFromMovi())
    if (frames.isEmpty) None
    else Some(AviInfo(width, height, usPerFrame, frames))
  }

  /** Mux raw 8-bit unsigned mono PCM into a canonical WAV container
    * (the audio sibling of [[muxMjpeg]]): RIFF/WAVE + the 16-byte PCM
    * fmt chunk + one data chunk. `javax.sound.sampled` round-trips it
    * bit-exactly, which is what makes audio-CONTENT operators real
    * rather than header stubs. */
  def muxWav(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dataLen = samples.length
    out.write(fourCC("RIFF")); out.write(u32le(36L + dataLen))
    out.write(fourCC("WAVE"))
    out.write(fourCC("fmt ")); out.write(u32le(16L))
    out.write(u16le(1))            // PCM
    out.write(u16le(1))            // mono
    out.write(u32le(sampleRate.toLong))
    out.write(u32le(sampleRate.toLong)) // byte rate (8-bit mono)
    out.write(u16le(1))            // block align
    out.write(u16le(8))            // bits per sample
    out.write(fourCC("data")); out.write(u32le(dataLen.toLong))
    out.write(samples)
    out.toByteArray
  }
}
