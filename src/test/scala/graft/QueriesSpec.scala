package graft

/** Registry-level contract: every SURVEY §2 query runs at sf0.001,
  * returns rows, and its oracle (when present) names a registered
  * query. Per-operator semantics are covered by the dedicated specs;
  * the end-to-end value equality is the driver's DuckDB gate. */
class QueriesSpec extends SparkSpec {

  test("every registered query executes and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, SfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key is a registered query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle column names match the Spark result columns") {
    // the driver sorts columns by name before hashing — a name-set
    // mismatch is guaranteed failure, catch it before the gate does
    val duckdbOnlyFns = Set.empty[String]
    SparkEntry.oracleSql.keys.filterNot(duckdbOnlyFns).foreach { name =>
      val cols = SparkEntry.queries(name)(spark, SfDir).columns.toSet
      // cheap structural check: oracle text mentions every output column
      val sql = SparkEntry.oracleSql(name).toLowerCase
      val missing = cols.filterNot(c => sql.contains(c.toLowerCase))
      assert(missing.isEmpty, s"$name: oracle SQL never mentions columns $missing")
    }
  }
}
