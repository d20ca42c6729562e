package graft

/** Driver-contract smoke: entry() must return rows > 0 on sf0.001. */
class EntrySmoke extends SparkTestBase {
  test("SparkEntry.entry returns rows on sf0.001") {
    val n = SparkEntry.entry(spark).count()
    info(s"entry rows: $n")
    assert(n > 0)
  }
}
