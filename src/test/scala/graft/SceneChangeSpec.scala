package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** q193 (Multimodal.sceneChanges): video scene-change detection over
  * real MJPEG decode. The scene-structured table plants a KNOWN
  * boundary layout (scene length 1 + doc_id % 3 over 6 frames), so
  * recovery is asserted exactly: every frame's scene id, every
  * keyframe, intra-scene hamming 0 through the real JPEG codec, and
  * boundary hammings far above the gate. */
class SceneChangeSpec extends SparkSpec {
  import spark.implicits._

  test("planted scene structure is recovered exactly through the real codecs") {
    val docs = Tables.documents(spark, SfDir).where(col("doc_id") < 90L)
    val got = Multimodal.sceneChanges(
      Multimodal.asSceneVideoTable(docs, "doc_id", "text"))
      .persist()
    assert(got.count() == docs.count() * 6, "every frame decodes")

    // expected: sceneLen L = 1 + doc_id % 3; frame f belongs to scene
    // f/L + 1 and is the keyframe iff f % L == 0
    val bad = got
      .withColumn("L", lit(1L) + pmod(col("doc_id"), lit(3L)))
      .where(
        col("scene_id") =!= expr("cast(frame_idx AS bigint) div L") + 1L ||
        col("is_keyframe") =!= (pmod(col("frame_idx").cast("long"), col("L")) === 0L))
    assert(bad.isEmpty, s"mis-assigned frames: ${bad.collect().take(5).mkString}")

    // intra-scene consecutive frames are BIT-IDENTICAL through the
    // real JPEG encode/decode (hamming exactly 0); boundaries sit far
    // above the gate, not just barely over it
    val intra = got.where(col("hamming_prev") >= 0L && !col("is_keyframe"))
    assert(intra.where(col("hamming_prev") =!= 0L).isEmpty,
      "JPEG noise leaked into an intra-scene hamming")
    val boundary = got.where(col("hamming_prev") >= 0L && col("is_keyframe"))
    val minB = boundary.agg(min("hamming_prev")).head.getLong(0)
    assert(minB > 16L, s"weakest boundary hamming $minB — the gate has no margin")
    got.unpersist(): Unit
  }

  test("keyframe sampling: keyframes first, every scene covered when the budget reaches") {
    val docs = Tables.documents(spark, SfDir).where(col("doc_id") < 90L)
    val got = Multimodal.sampleKeyframes(
      Multimodal.asSceneVideoTable(docs, "doc_id", "text"), budget = 4)
      .persist()
    // exact sample sets per planted scene length L = 1 + doc_id % 3
    // over 6 frames, budget 4:
    //   L=1: all frames are keyframes → frames {0,1,2,3}
    //   L=2: keyframes {0,2,4} then earliest non-keyframe 1
    //   L=3: keyframes {0,3} then non-keyframes {1,2}
    val bad = got
      .withColumn("L", lit(1L) + pmod(col("doc_id"), lit(3L)))
      .withColumn("want", when(col("L") === 1L,
          col("frame_idx") <= 3)
        .when(col("L") === 2L,
          col("frame_idx").isin(0, 2, 4, 1))
        .otherwise(col("frame_idx").isin(0, 3, 1, 2)))
      .where(!col("want"))
    assert(bad.isEmpty, s"unexpected sample: ${bad.collect().take(5).mkString}")
    val sizes = got.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .where(col("n") =!= 4L)
    assert(sizes.isEmpty, "every doc must fill its budget of 4")
    // the q46 contrast: every scene contributes ≥1 sampled frame
    // wherever budget ≥ scene count (L=2 → 3 scenes; L=3 → 2 scenes)
    val uncovered = Multimodal.sceneChanges(
      Multimodal.asSceneVideoTable(docs, "doc_id", "text"))
      .select("doc_id", "scene_id").distinct()
      .join(got.select("doc_id", "scene_id").distinct(),
        Seq("doc_id", "scene_id"), "left_anti")
      .withColumn("L", lit(1L) + pmod(col("doc_id"), lit(3L)))
      .where(col("L") =!= 1L) // L=1 has 6 scenes > budget 4: 2 uncovered OK
    assert(uncovered.isEmpty, "a scene inside the budget went unsampled")
    got.unpersist(): Unit
  }

  test("undecodable frame 0: the first surviving frame opens scene 1 as its keyframe") {
    // a clip whose FIRST frame fails JPEG decode: keying keyframes on
    // frame_idx == 0 would leave scene 1 keyframe-less (the r12 advice
    // case); the contract is the first SURVIVING row (hamming_prev −1)
    def jpeg(level: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        // re-key every dHash cell per level — far-apart rasters
        val cell = (x * 9 / 32) + (y * 8 / 32) * 9
        val mix = {
          val k = (level * 7919L + cell * 2654435761L) % 1000000007L
          k * k % 1000000007L * 2654435761L % 1000000007L
        }
        val v = math.min(255, 16 + (mix % 7L).toInt * 24)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    // frame 0 garbage; frames 1–2 scene A (identical raster); frame 3 scene B
    val a = jpeg(1); val b = jpeg(2)
    val payload = graft.multimodal.Riff.muxMjpeg(32, 32, fps = 24,
      Seq(Array.fill[Byte](64)(0x5a), a, a, b))
    val media = Seq((1L, "video", payload))
      .toDF("doc_id", "media_type", "payload")
    val got = Multimodal.sceneChanges(media, framesPerDoc = 4)
      .orderBy("frame_idx").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2, 3), "frame 0 must be dropped")
    // (frame_idx, hamming_prev sign, scene_id, is_keyframe)
    assert(got(0).getLong(2) == -1L && got(0).getLong(3) == 1L &&
      got(0).getBoolean(4), "first surviving frame must open scene 1 as keyframe")
    assert(got(1).getLong(3) == 1L && !got(1).getBoolean(4))
    assert(got(2).getLong(3) == 2L && got(2).getBoolean(4))
    // and the sampler covers both scenes inside a budget of 2
    val sampled = Multimodal.sampleKeyframes(media, framesPerDoc = 4, budget = 2)
      .select("scene_id").distinct().collect().map(_.getLong(0)).toSet
    assert(sampled == Set(1L, 2L), "every scene must be covered at budget 2")
  }

  test("single-scene clips yield one scene and one keyframe") {
    // doc_id % 3 == 2 → L = 3 over 6 frames = exactly 2 scenes; a
    // constant-scene table comes from L ≥ frames: build 4-frame clips
    // on L=3 docs → scenes = {1,2} with frame 3 opening scene 2
    val docs = Tables.documents(spark, SfDir)
      .where(pmod(col("doc_id"), lit(3L)) === 2L && col("doc_id") < 90L)
    val got = Multimodal.sceneChanges(
      Multimodal.asSceneVideoTable(docs, "doc_id", "text", framesPerDoc = 3))
    // 3 frames at L=3: all one scene, single keyframe at frame 0
    val perDoc = got.groupBy("doc_id")
      .agg(countDistinct("scene_id").as("n_scenes"),
        sum(when(col("is_keyframe"), 1L).otherwise(0L)).as("n_keys"))
    assert(perDoc.where(col("n_scenes") =!= 1L || col("n_keys") =!= 1L).isEmpty)
  }
}
