package graft.multimodal

import java.awt.image.BufferedImage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image near-duplication — dHash over DECODED rasters.
  *
  * Text near-dup (q17/q18/q19) covers the document side of a
  * training-data curation pass; the image side needs the same
  * candidate-generation + verify shape over a PERCEPTUAL fingerprint,
  * because re-encoded / slightly-brightened copies of one image share
  * zero bytes (exact dedup is blind) while their downsampled
  * GRADIENTS are nearly identical. dHash is the standard cheap form:
  * average the raster into a (w+1)×h grayscale grid, emit one bit per
  * horizontally-adjacent cell pair (left < right) — 64 bits at the
  * default 9×8, robust to uniform brightness shifts (comparisons are
  * invariant to adding a constant) and to codec noise (block averages
  * smooth it), cheap enough to ride the decode pass.
  *
  * Pairing reuses the simhash banding argument
  * ([[graft.similarity.Dedup.simhashPairs]],
  * reference: dreams-labs/etl-pipelines has no image pipeline — this
  * extends the engine's curation family beyond the reference): split
  * the 64 bits into ≥ maxHamming+1 bands; hamming ≤ maxHamming forces
  * at least one band EXACTLY equal (pigeonhole), so candidates are an
  * equi-join on (band, sig) — one keyed shuffle, no all-pairs — and
  * recall at the threshold is EXACT, proven in ImageDedupSpec against
  * the brute-force join. Verification is one xor+bit_count per
  * candidate.
  *
  * Scale: decode is a narrow batched mapPartitions (the q75 shape);
  * the fingerprint table is |docs| rows of (id, long); banding
  * shuffles 4 rows per doc. At 100 TB of video the decode dominates
  * and parallelizes embarrassingly; the pair join never sees raster
  * bytes.
  */
object ImageDedup {

  /** 64-bit difference hash of a raster: block-average to a
    * (w+1)×h grayscale grid, bit (y*w + x) = 1 iff cell(x,y) <
    * cell(x+1,y). Default 9×8 → 64 bits. */
  def dHashOf(img: BufferedImage, w: Int = 8, h: Int = 8): Long = {
    require(w * h <= 64, s"dHash needs w*h <= 64 bits, got ${w}x$h")
    val gw = w + 1
    val cells = Array.ofDim[Double](gw, h)
    val iw = img.getWidth
    val ih = img.getHeight
    var cy = 0
    while (cy < h) {
      var cx = 0
      while (cx < gw) {
        // cell rectangle in source pixels (at least one pixel)
        val x0 = iw * cx / gw; val x1 = math.max(x0 + 1, iw * (cx + 1) / gw)
        val y0 = ih * cy / h;  val y1 = math.max(y0 + 1, ih * (cy + 1) / h)
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1 && y < ih) {
          var x = x0
          while (x < x1 && x < iw) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            n += 1
            x += 1
          }
          y += 1
        }
        cells(cx)(cy) = if (n == 0) 0.0 else sum.toDouble / n
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    var j = 0
    while (j < w * h) {
      val x = j % w; val y = j / w
      if (cells(x)(y) < cells(x + 1)(y)) bits |= 1L << j
      j += 1
    }
    bits
  }

  /** (doc_id, dhash) for every video row whose FIRST frame decodes
    * through the real image codec ([[Riff.parseAvi]] container walk →
    * JPEG decode). Undecodable payloads are dropped — a perceptual
    * hash of bytes that never were an image is noise, not data.
    * Narrow batched map, the q75 decode shape. */
  def imageDHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("media_type") === "video")
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[Multimodal.MediaRow]
      .mapPartitions(_.flatMap { r =>
        Riff.parseAvi(r.payload).flatMap { info =>
          if (info.nFrames == 0) None
          else {
            val (off, len) = info.frames(0)
            val bytes = java.util.Arrays.copyOfRange(r.payload, off, off + len)
            scala.util.Try(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))).toOption
              .flatMap(Option(_))
              .map(img => (r.doc_id, dHashOf(img)))
          }
        }
      })
      .toDF("doc_id", "dhash")
  }

  /** The `(id, hash, band, sig)` banded form of a 64-bit fingerprint
    * table — pure column algebra over `(id, long)` rows (shift, mask,
    * stack: no shuffle), exposed so incremental pipelines can band a
    * PUBLISHED fingerprint index at join time instead of re-decoding
    * anything. Band layout is the smallest band count ≥ maxHamming+1
    * dividing 64 (the simhash pigeonhole rule), a pure function of
    * `maxHamming` — so bands computed for a batch today join exactly
    * against bands computed over an index published last month. */
  private[graft] def bandedHashes(
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int): DataFrame = {
    val bands = (maxHamming + 1 to 64)
      .find(b => 64 % b == 0 && 64 / b <= 63)
      .getOrElse(throw new IllegalArgumentException(
        s"no band layout for maxHamming=$maxHamming"))
    val bandBits = 64 / bands
    val mask = (1L << bandBits) - 1
    val stackExpr = "stack(" + bands + ", " +
      (0 until bands).map(b => s"$b, __band$b").mkString(", ") + ") AS (band, sig)"
    (0 until bands).foldLeft(hashes.select(col(idCol), col(hashCol))) {
      (df, b) => df.withColumn(s"__band$b",
        shiftrightunsigned(col(hashCol), b * bandBits).bitwiseAND(lit(mask)))
    }.select(col(idCol), col(hashCol), expr(stackExpr))
  }

  /** Near-duplicate pairs among (idCol, hashCol) fingerprints:
    * banding candidates (exact recall at the threshold by
    * pigeonhole), one xor+bit_count verification per candidate.
    * Returns (doc_a, doc_b, hamming), doc_a < doc_b. */
  def dHashPairs(
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 2): DataFrame = {
    val banded = bandedHashes(hashes, idCol, hashCol, maxHamming)
    val a = banded.select(col(idCol).as("doc_a"), col(hashCol).as("__ha"),
      col("band"), col("sig"))
    val b = banded.select(col(idCol).as("doc_b"), col(hashCol).as("__hb"),
      col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Incremental perceptual near-dup of a batch against a MAINTAINED
    * fingerprint index — [[graft.similarity.Dedup
    * .incrementalNearDupPairs]]'s crawl-ingest posture carried to the
    * perceptual media family. `index` is the published `(id, hash)`
    * fingerprint table of everything ingested so far (versioned under
    * the commit protocol; each admitted batch appends its own
    * fingerprints via `Txn.append`, cost ∝ batch — corpus media is
    * never re-decoded). The fingerprints (image dHash, audio
    * envelope/band-energy hashes, video frame hashes) are
    * corpus-independent integers, so the q166 identity carries
    * directly: banding both sides at join time is narrow column
    * algebra, the equi-join on `(band, sig)` is one index scan per
    * batch with the batch side broadcast-able (the daily-crawl
    * shape), and hamming verifies each candidate exactly. Returns
    * `(corpus_doc, batch_doc, hamming)`; same-id rows are excluded
    * (a re-ingested identical payload is the exact gate's job).
    *
    * Equivalence contract (IncrementalMediaDedupSpec): the pair set
    * is exactly the corpus×batch cross slice of a from-scratch
    * [[dHashPairs]] run over corpus ∪ batch fingerprints —
    * maintaining the index is an optimization, never a recall
    * change. */
  def incrementalDHashPairs(
      index: DataFrame,
      batchHashes: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 2): DataFrame = {
    val a = bandedHashes(index, idCol, hashCol, maxHamming)
      .select(col(idCol).as("corpus_doc"), col(hashCol).as("__ha"),
        col("band"), col("sig"))
    val b = bandedHashes(batchHashes, idCol, hashCol, maxHamming)
      .select(col(idCol).as("batch_doc"), col(hashCol).as("__hb"),
        col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .where(col("corpus_doc") =!= col("batch_doc"))
      .select(col("corpus_doc"), col("batch_doc"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
