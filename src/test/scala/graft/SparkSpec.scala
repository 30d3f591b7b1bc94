package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local-session fixture: one SparkSession per suite, sf0.001
  * testdata as input (TESTDATA.md — driver-generated, read-only). */
abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val SfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = {
    // session is shared process-wide (getOrCreate); don't stop between suites
    super.afterAll()
  }
}
