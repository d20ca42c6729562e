package graft

/** Every SparkEntry query must run on sf0.001 and return rows; every oracle
  * key must reference an existing query (driver-contract invariants).
  */
class QuerySmokeSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows on sf0.001") {
      val df = fn(spark, dir)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without queries: $extra")
  }
}
