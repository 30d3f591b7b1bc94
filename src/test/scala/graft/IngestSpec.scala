package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Ingest

/** CSV ingestion path: typed round-trip + corrupt-row quarantine. */
class IngestSpec extends SparkSpec {

  test("readCsv round-trips typed data and quarantines corrupt rows") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val ev = Tables.events(spark, SfDir)
      .select("event_id", "event_type", "user_id", "value")
    // hand-write the CSV (appending to Spark's own output would break
    // its .crc checksum sidecar) with one malformed row at the end
    val rows = ev.collect().map(r => s"${r.getLong(0)},${r.getString(1)},${r.getLong(2)},${r.getDouble(3)}")
    Files.writeString(java.nio.file.Paths.get(dir, "data.csv"),
      ("event_id,event_type,user_id,value" +: rows :+ "oops,not,a,number").mkString("", "\n", "\n"))

    // Spark disallows querying only _corrupt_record on the raw scan;
    // cache the parsed result first (per the AnalysisException hint)
    val back = Ingest.readCsv(spark, dir,
      "event_id BIGINT, event_type STRING, user_id BIGINT, value DOUBLE").cache()
    assert(back.where(col("_corrupt_record").isNotNull).count() == 1)
    val clean = back.where(col("_corrupt_record").isNull).drop("_corrupt_record")
    assert(clean.count() == ev.count())
    assert(clean.exceptAll(ev).count() == 0)
    assert(clean.schema("value").dataType.typeName == "double")
  }
}
