package graft

/** Contract guards: every oracle key has a query, every query runs at
  * sf0.001 and returns rows (a 0-row result would "pass" the driver's
  * hash compare vacuously — caught once in review, guarded forever). */
class SmokeSpec extends SparkSpec {

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query returns >0 rows at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, d).count()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }
}
