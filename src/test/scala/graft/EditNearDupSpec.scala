package graft

import graft.similarity.Dedup

/** q211 (Dedup.editNearDupPairs): blocked exact Levenshtein
  * verification — planted-pair arithmetic and blocking semantics. */
class EditNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("planted near-pair scores exactly; blocking excludes cross-block pairs") {
    // docs 1/2: same first word, same last word, same 64-char length
    // bucket, one substitution apart → lev 5 ("bravo"→"delta"),
    // sim = 1e6 − ⌊5e6/29⌋
    val t1 = "alpha bravo charlie zulu omega"
    val t2 = "alpha delta charlie zulu omega"
    // doc 3: same block key as 1/2 but mostly different middle
    val t3 = "alpha xx yy zz qq rr ss omega"
    // doc 4: different first word — never paired despite equal text tail
    val t4 = "beta bravo charlie zulu omega"
    val docs = Seq((1L, t1), (2L, t2), (3L, t3), (4L, t4)).toDF("doc_id", "text")

    val all = Dedup.editNearDupPairs(docs, "doc_id", "text",
      lenBucket = 64, minSimPpm = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // blocking: (1,2), (1,3), (2,3) share the key; 4 is excluded
    assert(all.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"blocking drifted: ${all.keySet}")
    val mx = math.max(t1.length, t2.length).toLong
    assert(all((1L, 2L)) == ((5L, 1000000L - 5L * 1000000 / mx)),
      s"planted pair arithmetic: ${all((1L, 2L))}")

    // threshold keeps only the near pair
    val kept = Dedup.editNearDupPairs(docs, "doc_id", "text",
      lenBucket = 64, minSimPpm = 700000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.toSeq == Seq((1L, 2L)), s"threshold drifted: ${kept.toSeq}")
  }

  test("identical documents score 1e6 ppm, lev 0") {
    val docs = Seq((1L, "same text here ok"), (2L, "same text here ok"))
      .toDF("doc_id", "text")
    val got = Dedup.editNearDupPairs(docs, "doc_id", "text", 64, 0L).collect()
    assert(got.length == 1 && got(0).getLong(2) == 0L && got(0).getLong(3) == 1000000L)
  }
}
