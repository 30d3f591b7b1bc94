package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` payload column with typed
  * metadata alongside — the schema/partitioning/batching pattern a
  * 100 TB multimodal pipeline needs. Decode runs per-partition in
  * fixed-size batches (the shape a vectorized codec or GPU decode
  * wants). The IMAGE codec is REAL: `javax.imageio` ships in the JDK,
  * so PNG/JPEG/GIF/BMP payloads decode to true width/height and a
  * checksum over actual pixel values (OperatorInvariantsSpec decodes
  * a generated PNG). The AUDIO header codec is REAL too:
  * `javax.sound.sampled` (also JDK-resident) parses WAV/AIFF/AU
  * containers to true sample rate / channels / sample width / frame
  * count (spec round-trips a synthesized WAV). The VIDEO container
  * codec is REAL as well: [[Riff]] muxes and parses AVI (RIFF) —
  * true width/height/frame timing from the `avih` header and true
  * per-frame byte offsets from the `idx1` index — with no external
  * dependency (the JDK has no video API, but the container format
  * needs none). Only pixel-level video DECODE (e.g. of a codec'd
  * frame payload) and the resize re-encode remain stubbed with a
  * deterministic fake — except MJPEG frames, whose payloads are
  * JPEGs and flow through the real [[decodeImage]].
  */
object Multimodal {

  // memory-backed ImageInputStreams, not temp-file caches, in every
  // task JVM (runs once per executor classload)
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      checksum: Long)

  /** Batch size handed to the (stubbed) codec — the unit a real
    * vectorized decoder or GPU kernel would consume. */
  val DecodeBatchSize = 64

  /** Rolling polynomial checksum over payload[from, until) — the ONE
    * stub hash every fake codec in this object uses, so the
    * "deterministic stub" values cannot drift between ops. */
  private def polyChecksum(bytes: Array[Byte], from: Int, until: Int,
      seed: Long = 0L): Long = {
    var cs = seed
    var j = from
    while (j < until) { cs = (cs * 131 + (bytes(j) & 0xff)) % 1000000007L; j += 1 }
    cs
  }

  /** REAL image decode via the JDK's javax.imageio: width/height from
    * the decoded raster and a rolling checksum over the actual ARGB
    * pixel values (the feature-extract stand-in that proves pixel data
    * was read, not just sniffed). Returns None when the payload is not
    * a decodable image — ImageIO's signature sniff rejects non-image
    * bytes cheaply, so mixed corpora (the testdata's text-backed
    * payloads) fall through to the stub without a decode attempt
    * per-byte. PNG is lossless, so every value here is deterministic. */
  private def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        // bulk getRGB: one ColorModel conversion pass into a primitive
        // row-major ARGB array — per-pixel getRGB(x, y) pays a virtual
        // call + conversion per pixel, the slow path on a decode that
        // runs per row at corpus scale. Values are identical.
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        var cs = 0L
        var i = 0
        while (i < argb.length) {
          cs = (cs * 131 + (argb(i) & 0xffffffffL)) % 1000000007L
          i += 1
        }
        (w, h, cs)
      }
    } catch { case _: Exception => None }

  /** REAL video container decode via [[Riff.parseAvi]]: true dims
    * from the avih header, and a checksum folded over the INDEXED
    * frame payload bytes — proof the frame index was walked to the
    * actual data, not just the header sniffed. */
  private def decodeVideoMeta(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    Riff.parseAvi(bytes).map { info =>
      val cs = info.frames.foldLeft(0L) { case (acc, (off, len)) =>
        polyChecksum(bytes, off, off + len, acc)
      }
      (info.width, info.height, cs)
    }

  /** Batched decode: image payloads go through the REAL
    * [[decodeImage]] codec and video payloads through the REAL
    * [[Riff]] container parser; audio (and image/video payloads that
    * are not actually encoded media) take the deterministic STUB —
    * dims derived from payload length, checksum a polynomial over the
    * raw bytes — so tests can assert exact values on both paths. */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaMeta] =
    batch.map { r =>
      val n = r.payload.length
      val real = r.media_type match {
        case "image" => decodeImage(r.payload)
        case "video" => decodeVideoMeta(r.payload)
        case _       => None
      }
      real match {
        case Some((w, h, pixelCs)) => MediaMeta(r.doc_id, r.media_type, n, w, h, pixelCs)
        case None =>
          MediaMeta(r.doc_id, r.media_type, n, 16 + n % 64, 16 + (n / 64) % 64,
            polyChecksum(r.payload, 0, n))
      }
    }

  /** Deterministic tiny JPEG: a w×h RGB raster whose pixels mix the
    * source bytes with the frame index, JDK-encoded. The MJPEG frame
    * payload generator for [[asMediaTable]] — real JPEGs, so the full
    * container→frame→pixels pipeline (q75) decodes genuinely. JPEG
    * encoding is lossy but the BYTES are a pure function of the
    * raster and encoder, so checksums are reproducible run-to-run. */
  private[multimodal] def syntheticJpeg(src: Array[Byte], frameIdx: Int,
      w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val b = if (src.isEmpty) 0 else src((x + y * w + frameIdx) % src.length) & 0xff
        img.setRGB(x, y, (b << 16) | ((x * 31 + frameIdx * 57) & 0xff) << 8 | (y * 53 & 0xff))
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Wrap a text table into a binary media table (media_type
    * round-robins on the id). Image/audio payloads are the raw utf-8
    * bytes standing in for encoded media (their real codecs reject
    * them into the stub path). VIDEO payloads are REAL MJPEG AVIs
    * ([[Riff.muxMjpeg]] around [[syntheticJpeg]] frames seeded from
    * the text bytes): genuine header fields, idx1 index, AND
    * JPEG-decodable frame payloads — so the whole container→frame→
    * pixels pipeline (q27 dims, q46 offsets, q75 frame decode) runs
    * real codecs on testdata. Frame count (4–6) and frame dims
    * derive deterministically from the payload length. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        if (r.media_type != "video") r
        else {
          val n = r.payload.length
          val k = 4 + n % 3
          val (fw, fh) = (8 + n % 5, 6 + n % 4)
          val frames = (0 until k).map(i => syntheticJpeg(r.payload, i, fw, fh))
          r.copy(payload = Riff.muxMjpeg(
            160 + (n % 8) * 8, 120 + (n % 6) * 8, fps = 24, frames))
        }
      })
      .toDF()
  }

  /** Wrap a text table into a VIDEO table with planted perceptual
    * near-dup clusters — the video twin of [[asAudioTable]]'s gain
    * clusters: every 9-block of doc ids shares one base CONTENT
    * (cell-structured rasters keyed by (base, frame, cell) — strong
    * ≥24-level gaps between dHash cells, far above JPEG quantization
    * noise) and each member re-encodes it at a different BRIGHTNESS
    * (+8·(id%9), the "same footage, different exposure/grading"
    * population). dHash is a gradient code, so a global brightness
    * shift through the REAL JPEG encode/decode must not move a bit —
    * while different bases randomize every cell. Frames mux into a
    * genuine MJPEG AVI ([[Riff.muxMjpeg]]), so the near-dup pipeline
    * exercises the actual container and image codecs end to end. */
  def asVideoTable(docs: DataFrame, idCol: String, textCol: String,
      framesPerDoc: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      lit("video").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val base = r.doc_id / 9
        val bright = (r.doc_id % 9).toInt * 8
        val (w, h) = (32, 32)
        val frames = (0 until framesPerDoc).map { f =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // one level per dHash GRID cell (9×8 — dHashOf's exact
              // geometry, so every gradient comparison sees two
              // independent (base, frame, cell)-keyed levels, never a
              // same-block tie), 7 levels 24 apart ≫ JPEG noise. The
              // mix is QUADRATIC in the key (the q175 lesson, pinned
              // there in code comments): a linear pattern differs
              // between bases by a constant shift, and whenever that
              // shift ≡ 0 mod the level count the two bases render
              // near-identical rasters — phantom cross-cluster pairs
              val cell = (x * 9 / w) + (y * 8 / h) * 9
              val key = (base * 1000003L + f * 7919L + cell * 2654435761L) %
                1000000007L
              val mix = key * key % 1000000007L * 2654435761L % 1000000007L
              val v = math.min(255, 16 + (mix % 7L).toInt * 24 + bright)
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", baos)
          baos.toByteArray
        }
        r.copy(payload = Riff.muxMjpeg(w, h, fps = 24, frames))
      })
      .toDF()
  }

  /** The SCENE-STRUCTURED twin of [[asVideoTable]] — synthetic MJPEG
    * clips whose frames group into planted SCENES: frames inside one
    * scene render the IDENTICAL raster (same quadratic cell mix keyed
    * on the scene index, so the real JPEG encode emits identical
    * bytes and dHash hamming is exactly 0), while a scene boundary
    * re-keys every cell (≥24-level gaps — dHash hamming far above any
    * intra-scene value). Scene length is doc-derived
    * (1 + doc_id % 3), so every document plants a KNOWN boundary
    * structure for [[sceneChanges]] to recover — the q131/q180
    * planted-input pattern. */
  def asSceneVideoTable(docs: DataFrame, idCol: String, textCol: String,
      framesPerDoc: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      lit("video").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val sceneLen = 1 + (r.doc_id % 3).toInt
        val (w, h) = (32, 32)
        // frames of one scene are BIT-IDENTICAL by construction (the
        // raster is keyed on the scene index alone), so the JPEG
        // encode runs once per SCENE and repeated frames reuse the
        // byte array (r14-opt, guide §1.2 "don't compute things you
        // throw away": the encode was ~half this operator's cost and
        // produced identical bytes up to sceneLen times per clip).
        // Output payload is byte-for-byte what the per-frame encode
        // produced — the muxer sees the same frame bytes either way.
        val sceneJpeg = scala.collection.mutable.HashMap.empty[Int, Array[Byte]]
        val frames = (0 until framesPerDoc).map { f =>
          val scene = f / sceneLen
          sceneJpeg.getOrElseUpdate(scene, {
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                // one level per dHash grid cell, quadratic mix (the
                // q175/q180 lesson) keyed on the SCENE index — frames
                // of one scene are bit-identical, a boundary re-keys
                // every cell
                val cell = (x * 9 / w) + (y * 8 / h) * 9
                val key = (r.doc_id * 1000003L + scene * 7919L +
                  cell * 2654435761L) % 1000000007L
                val mix = key * key % 1000000007L * 2654435761L % 1000000007L
                val v = math.min(255, 16 + (mix % 7L).toInt * 24)
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", baos)
            baos.toByteArray
          })
        }
        r.copy(payload = Riff.muxMjpeg(w, h, fps = 24, frames))
      })
      .toDF()
  }

  case class FrameHash(doc_id: Long, frame_idx: Int, fhash: Long, decoded: Boolean)

  /** Per-sampled-frame perceptual hashes — [[decodeFrames]]'s frame
    * sampling with [[ImageDedup.dHashOf]] over each decoded raster:
    * (doc_id, frame_idx, fhash, decoded). Frames that don't
    * image-decode and non-AVI payloads stub deterministically. */
  def videoFrameHashes(media: DataFrame, framesPerDoc: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.flatMap { r =>
        val n = r.payload.length
        val ranges = Riff.parseAvi(r.payload) match {
          case Some(info) =>
            val k = math.max(1, math.min(framesPerDoc, info.nFrames))
            (0 until k).map(i => (i, info.frames(info.nFrames * i / k)))
          case None =>
            val k = math.max(1, math.min(framesPerDoc, n))
            (0 until k).map { i =>
              val off = (n.toLong * i / k).toInt
              (i, (off, math.min(16, n - off)))
            }
        }
        // byte-identical frames decode once per clip (r14-opt):
        // same JPEG bytes ⇒ same raster ⇒ same dHash, and MJPEG
        // clips repeat frame bytes whenever consecutive frames show
        // the same shot (the q193 scene structure). Failures memoize
        // as None — the re-decode ATTEMPT is skipped for repeated
        // undecodable bytes — while the undecodable STUB stays keyed
        // per (off, len) outside the cache, which identical bytes at
        // different offsets must NOT share. A decode failure is
        // deterministic per byte string, so caching Option is safe.
        val seen = scala.collection.mutable.HashMap
          .empty[java.nio.ByteBuffer, Option[Long]]
        ranges.map { case (i, (off, len)) =>
          val bytes = java.util.Arrays.copyOfRange(r.payload, off, off + len)
          val hash = seen.getOrElseUpdate(java.nio.ByteBuffer.wrap(bytes), {
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: Exception => null }
            if (img != null) Some(ImageDedup.dHashOf(img)) else None
          })
          hash match {
            case Some(h) => FrameHash(r.doc_id, i, h, decoded = true)
            case None => FrameHash(r.doc_id, i,
              (off.toLong * 2654435761L + len) % 1000000007L, decoded = false)
          }
        }
      }))
      .toDF()
  }

  /** SCENE-CHANGE detection + keyframe selection — the video-curation
    * step between decode and training-data sampling: uniform frame
    * sampling (q46) wastes its budget re-sampling one long scene and
    * misses short ones; sampling at scene BOUNDARIES captures each
    * distinct shot once. A boundary is a consecutive-frame perceptual
    * jump: dHash hamming between frame i and i−1 above
    * `maxIntraHamming` (dHash is a gradient code — same-shot frames
    * land within JPEG-noise hamming, a cut re-keys most gradient
    * bits). Per frame: its hamming to the previous frame (−1 for the
    * first), its scene id (1 + running boundary count), and whether
    * it is the scene's KEYFRAME (first frame of its scene — the
    * frame a sampler keeps).
    *
    * Scale shape: decode is [[videoFrameHashes]]'s narrow batched
    * map; the lag/cumsum windows partition BY DOCUMENT over
    * |docs|·framesPerDoc (id, int, long) rows — raster bytes never
    * shuffle, and no window is unpartitioned. Undecodable frames are
    * excluded (their stub hashes would fabricate boundaries).
    * Output: (doc_id, frame_idx, hamming_prev, scene_id, is_keyframe). */
  def sceneChanges(
      media: DataFrame,
      framesPerDoc: Int = 6,
      maxIntraHamming: Int = 8): DataFrame = {
    val fh = videoFrameHashes(media, framesPerDoc).where(col("decoded"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    fh.withColumn("__prev", lag(col("fhash"), 1).over(w))
      .withColumn("hamming_prev",
        when(col("__prev").isNull, lit(-1L))
          .otherwise(expr("bit_count(fhash ^ __prev)").cast("long")))
      .withColumn("__chg",
        when(col("hamming_prev") > lit(maxIntraHamming.toLong), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("scene_id", lit(1L) + sum(col("__chg")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      // the first SURVIVING frame (lag-null ⇒ hamming_prev = −1) opens
      // scene 1 — not frame_idx 0, which may have failed decode and
      // been filtered above; keying on the index would leave scene 1
      // keyframe-less and break sampleKeyframes' every-scene-covered
      // property for clips whose opening frame is undecodable
      .withColumn("is_keyframe",
        col("hamming_prev") === -1L || col("__chg") === 1L)
      .select(col("doc_id"), col("frame_idx"), col("hamming_prev"),
        col("scene_id"), col("is_keyframe"))
  }

  /** SCENE-BUDGETED frame sampling — [[sceneChanges]]'s consumer: pick
    * up to `budget` frames per video, KEYFRAMES FIRST (scene openers,
    * in frame order), then fill the remainder with the earliest
    * non-keyframes. The property uniform sampling (q46) lacks: when
    * the budget covers the scene count, EVERY scene contributes a
    * frame — no shot is unrepresented because a long scene ate the
    * budget. Deterministic (the rank's tie order is total), so the
    * planted-structure spec pins exact sample sets. One ranked window
    * per document over |docs|·framesPerDoc rows.
    * Output: (doc_id, frame_idx, scene_id, is_keyframe, sample_rank). */
  def sampleKeyframes(
      media: DataFrame,
      framesPerDoc: Int = 6,
      budget: Int = 4,
      maxIntraHamming: Int = 8): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val scenes = sceneChanges(media, framesPerDoc, maxIntraHamming)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("is_keyframe").desc, col("frame_idx").asc)
    scenes
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= budget)
      .select(col("doc_id"), col("frame_idx"), col("scene_id"),
        col("is_keyframe"), col("sample_rank"))
  }

  /** Video perceptual near-dup — the SEQUENCE rule over frame
    * hashes: two videos pair iff EVERY sampled frame position's
    * dHashes band-match within `maxHamming` (per-position
    * [[ImageDedup.dHashPairs]] banding — exact recall at the frame
    * level — then an all-positions conjunction). Matching clips with
    * one divergent frame (an inserted scene) do NOT pair: stricter
    * and deterministic. "Every sampled position" means BOTH docs'
    * actual decoded-frame counts, not the `framesPerDoc` constant —
    * [[videoFrameHashes]] samples k = min(framesPerDoc, nFrames)
    * frames, so two identical short clips (k < framesPerDoc) must
    * still pair, and a doc with an undecodable frame must match on
    * every frame it DID decode, on both sides. Output: (doc_a,
    * doc_b, n_frames, max_hamming). Scale shape: frame hashes are
    * |docs|·k rows of (id, int, long); each per-position banding
    * joins only that position's slice; the conjunction is one
    * (a, b) aggregate joined to the |docs|-row per-doc frame-count
    * table (broadcast-sized). */
  def videoNearDupPairs(
      media: DataFrame,
      framesPerDoc: Int = 4,
      maxHamming: Int = 2): DataFrame = {
    val fh = graft.CacheScope.persisted(
      videoFrameHashes(media, framesPerDoc).where(col("decoded")))
    val perFrame = (0 until framesPerDoc).map { i =>
      ImageDedup.dHashPairs(fh.where(col("frame_idx") === i),
        "doc_id", "fhash", maxHamming)
    }.reduce(_ unionByName _)
    val cnt = fh.groupBy(col("doc_id")).agg(count(lit(1)).as("__n"))
    perFrame
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_frames"), max(col("hamming")).as("max_hamming"))
      .join(cnt.select(col("doc_id").as("doc_a"), col("__n").as("__na")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("__n").as("__nb")), "doc_b")
      .where(col("n_frames") === col("__na") && col("n_frames") === col("__nb"))
      .select(col("doc_a"), col("doc_b"), col("n_frames"), col("max_hamming"))
  }

  /** Decode/feature-extract pass: per-partition, batched. The only
    * wide operation a real pipeline adds here is an optional
    * repartition to match decoder parallelism; the decode itself is a
    * narrow mapPartitions. */
  def extractMetadata(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRow]
      .mapPartitions(it => it.grouped(DecodeBatchSize).flatMap(decodeBatch))
      .toDF()
  }

  case class AudioMeta(
      doc_id: Long,
      n_bytes: Int,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_frames: Long,
      duration_us: Long,
      decoded: Boolean)

  /** REAL audio header decode via the JDK's javax.sound.sampled —
    * WAV/AIFF/AU containers parse to true sample rate, channel count,
    * sample width, and frame length with zero external dependencies
    * (the audio sibling of [[decodeImage]]). Non-audio payloads are
    * rejected by the format sniff (UnsupportedAudioFileException)
    * without scanning the body. */
  private def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
    try {
      val aff = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
      val f = aff.getFormat
      // a container can parse yet omit rate/length (AudioSystem
      // returns NOT_SPECIFIED = -1): emitting n_frames=-1 and a
      // negative duration as "decoded" would poison downstream
      // aggregates — treat header-incomplete audio as undecodable
      val rate = f.getSampleRate.toInt
      val frames = aff.getFrameLength.toLong
      if (rate <= 0 || frames < 0 || f.getChannels <= 0 || f.getSampleSizeInBits <= 0) None
      else Some((rate, f.getChannels, f.getSampleSizeInBits, frames))
    } catch { case _: Exception => None }

  /** Audio metadata pass: audio rows only, batched narrow map like
    * [[extractMetadata]]. Real container headers decode via
    * [[decodeAudio]] (`decoded = true`); other payloads take the
    * deterministic stub so the corpus-scale plumbing (schema, batch
    * shape, totality over mixed data) stays testable either way.
    * duration_us is integer microseconds = frames · 10⁶ / rate —
    * integral math, no float drift across engines. */
  def extractAudioMetadata(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("media_type") === "audio")
      .select(col("doc_id"), col("media_type"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.map { r =>
        val n = r.payload.length
        decodeAudio(r.payload) match {
          case Some((rate, ch, bits, frames)) =>
            AudioMeta(r.doc_id, n, rate, ch, bits, frames,
              if (rate > 0) frames * 1000000L / rate else 0L, decoded = true)
          case None =>
            val rate = 8000 + (n % 8) * 1000
            val frames = n.toLong
            AudioMeta(r.doc_id, n, rate, 1 + n % 2, 8 + (n % 3) * 8, frames,
              frames * 1000000L / rate, decoded = false)
        }
      }))
      .toDF()
  }

  /** Audio corpus with REAL WAV payloads ([[Riff.muxWav]], the audio
    * sibling of the video rows' AVI muxing): each audio-typed doc gets
    * a deterministic 8-bit PCM waveform, and consecutive audio docs
    * share a CLUSTER base pattern played at different per-doc gains —
    * the "same recording, different mastering" population an
    * audio-content near-dup operator exists to find (the synthetic-
    * media posture of [[asMediaTable]]'s video frames: the payloads
    * are synthetic, the codec path and the detector are real). */
  def asAudioTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    asMediaTable(docs, idCol, textCol)
      .where(col("media_type") === "audio")
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val base = r.doc_id / 9        // audio ids step by 3: 3 per cluster
        val gainIdx = ((r.doc_id / 3) % 3).toInt
        val (gn, gd) = Seq((1L, 1L), (4L, 5L), (6L, 5L))(gainIdx)
        val n = 1024
        val samples = Array.tabulate(n) { i =>
          val block = i / 16
          // QUADRATIC mix of (base, block): a linear-only pattern is an
          // arithmetic progression mod 97 whose envelope SHAPE repeats
          // across bases (phantom cross-cluster near-dups — found by
          // the first two runs; min cross-base hamming is 11 with the
          // square in, 0–2 without)
          val x = (base * 1000003L + block * 7919L) % 1000000007L
          val v = (x * x % 1000000007L * 2654435761L % 1000000007L) % 97L - 48L
          val scaled = 128L + v * gn / gd
          math.max(0L, math.min(255L, scaled)).toByte
        }
        r.copy(payload = Riff.muxWav(8000, samples))
      })
      .toDF()
  }

  case class AudioFp(doc_id: Long, n_frames: Long, afp: Long, decoded: Boolean)

  /** Perceptual audio fingerprint — the time-domain dHash of the
    * waveform's ENERGY ENVELOPE (the audio sibling of
    * [[ImageDedup.dHashOf]]): decode the container to PCM through the
    * real `javax.sound` codec, split the samples into 65 windows,
    * sum each window's absolute deviation from the 8-bit midpoint,
    * and emit one bit per adjacent-window energy GRADIENT. Like the
    * image form, absolute level changes (gain riding, re-encoding
    * headroom) wash out while the envelope SHAPE — where the energy
    * rises and falls — survives; the comparison cross-multiplies the
    * integer window sums by the neighbor's sample count, so the bits
    * are exact integer decisions (no float, no drift). Payloads that
    * do not decode or are shorter than 65 samples emit the
    * deterministic stub with decoded=false (mixed-corpus totality).
    * One narrow batched map — |docs| rows of (id, long) out. */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("media_type") === "audio")
      .select(col("doc_id"), col("media_type"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.map { r =>
        decodePcm(r.payload) match {
          case Some(pcm) if pcm.length >= 65 =>
            AudioFp(r.doc_id, pcm.length.toLong, envelopeHash(pcm), decoded = true)
          case _ =>
            AudioFp(r.doc_id, r.payload.length.toLong,
              r.payload.length * 2654435761L % 1000000007L, decoded = false)
        }
      }))
      .toDF()
  }

  /** 8-bit unsigned PCM samples via the real codec (container-agnostic:
    * whatever javax.sound parses), or None for undecodable payloads. */
  private def decodePcm(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 8 || fmt.getChannels != 1) None
        else Some(in.readAllBytes().map(b => b & 0xff))
      } finally in.close()
    } catch { case _: Exception => None }

  case class AudioBandFp(doc_id: Long, n_frames: Long, bfp: Long, decoded: Boolean)

  /** Band-energy audio fingerprint — the FREQUENCY-domain sibling of
    * [[audioFingerprints]]: per window, resonant power at three fixed
    * frequencies whose Goertzel coefficients are exact integers
    * (2·cos ω ∈ {1, 0, −1} ⇔ periods 6, 4, 3 samples ⇔ fs/6, fs/4,
    * fs/3); the bit for window w marks whether the DOMINANT band
    * changed from window w to w+1 — the note-boundary rhythm of the
    * clip. Dominance transitions are invariant under any permutation
    * of the band set, so a copy whose melody is PITCH-SHIFTED across
    * the bands fingerprints identically — while the time-domain
    * envelope sees the waveform's pitch-dependent mean |amplitude|
    * change at every note boundary and scatters its gradient bits
    * (the planted case AudioBandDedupSpec pins). The converse caveat
    * is stated: two different melodies with the same note RHYTHM
    * collide here — this is the candidate-recall half of a
    * near-dup pipeline, like every LSH family in the repo; the
    * verify stage separates them. Integer-exact end to end: integer
    * Goertzel recurrence, within-window power comparisons between
    * equal-length signals (no floats, ties break to the lower band).
    * Same banding, same (id, long) shuffle shape as q175/q130. */
  def audioBandFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("media_type") === "audio")
      .select(col("doc_id"), col("media_type"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.map { r =>
        decodePcm(r.payload) match {
          case Some(pcm) if pcm.length >= 65 =>
            AudioBandFp(r.doc_id, pcm.length.toLong, bandEnergyHash(pcm), decoded = true)
          case _ =>
            AudioBandFp(r.doc_id, r.payload.length.toLong,
              r.payload.length * 2654435761L % 1000000007L, decoded = false)
        }
      }))
      .toDF()
  }

  /** 64 dominant-band TRANSITION bits over 65 windows. Goertzel with
    * integer coefficient k = 2·cos ω: s₀ = x + k·s₁ − s₂; power =
    * s₁² + s₂² − k·s₁·s₂ — exact integers throughout (|s| ≤ 128·N
    * keeps the recurrence in Long; powers go through BigInt). The
    * dominant band per window is the argmax of the three powers
    * (equal-length signals within one window — direct comparison;
    * ties break to the lower band index). */
  private[multimodal] def bandEnergyHash(pcm: Array[Int]): Long = {
    val W = 65
    val n = pcm.length
    val dom = new Array[Int](W)
    val coefs = Array(1, 0, -1)
    var start = 0
    var w = 0
    while (w < W) {
      val end = (((w + 1).toLong * n) / W).toInt
      var best = BigInt(-1)
      var c = 0
      while (c < 3) {
        val k = coefs(c)
        var s1 = 0L
        var s2 = 0L
        var i = start
        while (i < end) {
          val s0 = (pcm(i) - 128).toLong + k * s1 - s2
          s2 = s1; s1 = s0
          i += 1
        }
        val p = BigInt(s1) * s1 + BigInt(s2) * s2 - BigInt(k) * s1 * s2
        if (p > best) { best = p; dom(w) = c }
        c += 1
      }
      start = end
      w += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (dom(b + 1) != dom(b)) h |= 1L << b
      b += 1
    }
    h
  }

  /** 64 adjacent-window energy-gradient bits over 65 windows. */
  private[multimodal] def envelopeHash(pcm: Array[Int]): Long = {
    val W = 65
    val n = pcm.length
    val sums = new Array[Long](W)
    val cnts = new Array[Long](W)
    var i = 0
    while (i < n) {
      val w = (i.toLong * W / n).toInt
      sums(w) += math.abs(pcm(i) - 128)
      cnts(w) += 1
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      // mean(b+1) > mean(b), cross-multiplied to stay integer-exact
      if (sums(b + 1) * cnts(b) > sums(b) * cnts(b + 1)) h |= 1L << b
      b += 1
    }
    h
  }

  case class ResizedRow(doc_id: Long, media_type: String, width: Int, height: Int,
      payload: Array[Byte])
  case class FrameRow(doc_id: Long, frame_idx: Int, src_frame: Int, byte_offset: Int,
      n_bytes: Int, frame_checksum: Long)

  case class DecodedFrame(doc_id: Long, frame_idx: Int, src_frame: Int,
      n_bytes: Int, width: Int, height: Int, pixel_checksum: Long, decoded: Boolean)

  /** Full video→pixels pipeline: parse the AVI container, sample
    * `framesPerDoc` evenly-spaced TRUE frames from the idx1 index,
    * and DECODE each frame payload through the real image codec —
    * MJPEG frames are JPEGs, so width/height/pixel checksum come from
    * the actual decoded raster. Frames that don't image-decode
    * (non-MJPEG codecs) and non-AVI payloads (sampled as raw windows)
    * emit the deterministic stub with decoded=false, keeping mixed
    * corpora total. Same narrow batched-map scale shape as every
    * codec pass here. */
  def decodeFrames(media: DataFrame, framesPerDoc: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.flatMap { r =>
        val n = r.payload.length
        val ranges = Riff.parseAvi(r.payload) match {
          case Some(info) =>
            val k = math.max(1, math.min(framesPerDoc, info.nFrames))
            (0 until k).map { i =>
              val j = info.nFrames * i / k
              (i, j, info.frames(j))
            }
          case None =>
            val k = math.max(1, math.min(framesPerDoc, n))
            (0 until k).map { i =>
              val off = (n.toLong * i / k).toInt
              (i, i, (off, math.min(16, n - off)))
            }
        }
        ranges.map { case (i, j, (off, len)) =>
          val bytes = java.util.Arrays.copyOfRange(r.payload, off, off + len)
          decodeImage(bytes) match {
            case Some((w, h, cs)) =>
              DecodedFrame(r.doc_id, i, j, len, w, h, cs, decoded = true)
            case None =>
              DecodedFrame(r.doc_id, i, j, len, 16 + len % 64, 16 + (len / 64) % 64,
                polyChecksum(bytes, 0, len), decoded = false)
          }
        }
      }))
      .toDF()
  }

  /** Resize pass (STUB codec): emits a payload of exactly width×height
    * bytes per row — a real implementation decodes, resamples, and
    * re-encodes inside the same batched narrow pass. The fake fills
    * the target buffer by cycling the source bytes, so output size is
    * schema-checkable and values are deterministic. Narrow map — the
    * 100 TB shape is "payload in, payload out, no shuffle". */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    // guard BEFORE the job runs: width*height is an Int allocation —
    // oversized dims would overflow (silent empty/negative buffers)
    // inside every task instead of failing fast on the driver
    require(width > 0 && height > 0 && width.toLong * height <= Int.MaxValue,
      s"resize dims must satisfy 0 < width*height <= Int.MaxValue, got ${width}x$height")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.map { r =>
        val out = new Array[Byte](width * height)
        val n = r.payload.length
        var i = 0
        while (i < out.length) { out(i) = if (n == 0) 0 else r.payload(i % n); i += 1 }
        ResizedRow(r.doc_id, r.media_type, width, height, out)
      }))
      .toDF()
  }

  /** Frame sampling: one video row fans out to `framesPerDoc` frame
    * rows. AVI payloads take the REAL path — [[Riff.parseAvi]] walks
    * the container's frame index, sampling evenly-spaced TRUE frames:
    * `src_frame` is the container frame number, `byte_offset`/
    * `n_bytes` locate the actual frame payload in the blob, and the
    * checksum covers the full frame bytes (exactly what a keyframe
    * seek in a real pipeline yields). Non-AVI payloads keep the
    * deterministic stub (evenly-spaced raw offsets, 16-byte windows)
    * so mixed corpora stay total. The op is a narrow map (frames stay
    * in their source video's partition); a downstream consumer
    * feeding per-frame image ops should repartition the frame table
    * so one long video cannot skew a partition — that shuffle belongs
    * to the consumer, which knows its parallelism, not here. */
  def sampleFrames(media: DataFrame, framesPerDoc: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("payload")).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.flatMap { r =>
        val n = r.payload.length
        Riff.parseAvi(r.payload) match {
          case Some(info) =>
            val k = math.max(1, math.min(framesPerDoc, info.nFrames))
            (0 until k).map { i =>
              val j = info.nFrames * i / k // evenly spaced true frames
              val (off, len) = info.frames(j)
              FrameRow(r.doc_id, i, j, off, len,
                polyChecksum(r.payload, off, off + len))
            }
          case None =>
            val k = math.max(1, math.min(framesPerDoc, n))
            (0 until k).map { i =>
              val off = (n.toLong * i / k).toInt
              val end = math.min(off + 16, n)
              FrameRow(r.doc_id, i, i, off, end - off, polyChecksum(r.payload, off, end))
            }
        }
      }))
      .toDF()
  }
}
