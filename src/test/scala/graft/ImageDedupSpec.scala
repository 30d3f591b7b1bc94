package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.multimodal.{ImageDedup, Multimodal}

/** Image near-dup (multimodal/ImageDedup.scala): dHash gradient
  * semantics, invariance to uniform brightness shift, robustness to
  * JPEG re-encode, exact banding recall vs brute force, and the
  * real-codec path over the media table. */
class ImageDedupSpec extends SparkSpec {

  /** 72×64 image of 9×8 constant-brightness blocks — strong cell
    * structure, so block averages are exact and JPEG noise cannot
    * reorder adjacent cells. */
  private def blockImage(vals: Array[Int]): BufferedImage = {
    require(vals.length == 72)
    val img = new BufferedImage(72, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 72) {
      val v = vals((y / 8) * 9 + (x / 8)) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def randomBlocks(seed: Long): Array[Int] = {
    val rnd = new java.util.Random(seed)
    // mid-range so +10 brightness never clamps
    Array.fill(72)(40 + rnd.nextInt(160))
  }

  private def jpegRoundtrip(img: BufferedImage): BufferedImage = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(baos.toByteArray))
  }

  test("dHashOf: monotone gradients give all-ones / all-zeros") {
    val inc = blockImage(Array.tabulate(72)(i => 40 + (i % 9) * 20))
    val dec = blockImage(Array.tabulate(72)(i => 220 - (i % 9) * 20))
    assert(ImageDedup.dHashOf(inc) == -1L)  // every left < right
    assert(ImageDedup.dHashOf(dec) == 0L)
  }

  test("uniform brightness shift leaves the hash untouched; re-encode stays within threshold") {
    val vals = randomBlocks(7L)
    val base = ImageDedup.dHashOf(blockImage(vals))
    val brighter = ImageDedup.dHashOf(blockImage(vals.map(_ + 10)))
    assert(base == brighter, "dHash must be invariant to uniform brightness")
    val reenc = ImageDedup.dHashOf(jpegRoundtrip(blockImage(vals)))
    assert(java.lang.Long.bitCount(base ^ reenc) <= 2,
      s"JPEG re-encode moved the hash ${java.lang.Long.bitCount(base ^ reenc)} bits")
    // independent image: far away
    val other = ImageDedup.dHashOf(blockImage(randomBlocks(8L)))
    assert(java.lang.Long.bitCount(base ^ other) > 10,
      "distinct random images should not be near-dups")
  }

  test("dHashPairs: banding recall is EXACT vs brute force at the threshold") {
    val sess = spark
    import sess.implicits._
    val rnd = new java.util.Random(42L)
    val bases = (0 until 40).map(i => (i.toLong, rnd.nextLong()))
    // planted: for each of 10 bases, a copy with k ∈ {0,1,2} flipped
    // bits (in-threshold) and one with 5 flips (outside)
    val planted = (0 until 10).flatMap { i =>
      val (_, h) = bases(i)
      def flip(h: Long, k: Int, seed: Int): Long = {
        val r = new java.util.Random(seed)
        (0 until k).foldLeft(h)((acc, _) => acc ^ (1L << r.nextInt(64)))
      }
      Seq(
        (100L + i, flip(h, i % 3, i)),
        (200L + i, flip(h, 5, i + 77)))
    }
    val hashes = (bases ++ planted).toDF("id", "h")
    val got = ImageDedup.dHashPairs(hashes, "id", "h", maxHamming = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val brute = hashes.as("a").join(hashes.as("b"),
        col("a.id") < col("b.id") &&
          bit_count(col("a.h").bitwiseXOR(col("b.h"))) <= 2)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
    assert(got.nonEmpty, "planted in-threshold pairs must exist")
  }

  test("real-codec path: identical documents hash identically, corpus pairs found") {
    val docs = Tables.documents(spark, SfDir)
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val hashes = ImageDedup.imageDHashes(media)
    val nVideos = media.where(col("media_type") === "video").count()
    assert(hashes.count() == nVideos,
      "every muxed AVI's first frame must decode through the real codec")
    // same text ⇒ same payload ⇒ same frames ⇒ same hash: verify on
    // the corpus's planted exact-dup documents
    val textPairs = docs.select(col("doc_id").as("doc_a"), col("text"))
      .join(docs.select(col("doc_id").as("doc_b"), col("text")), Seq("text"))
      .where(col("doc_a") < col("doc_b") &&
        col("doc_a") % 3 === 2 && col("doc_b") % 3 === 2)
      .select("doc_a", "doc_b")
    val found = ImageDedup.dHashPairs(hashes, "doc_id", "dhash", maxHamming = 2)
    val missed = textPairs.join(found, Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed == 0, s"$missed exact-dup video pairs missed by the image path")
  }
}
