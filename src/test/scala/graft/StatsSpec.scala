package graft

import graft.operators.Stats

/** The HLL sketch values are engine-specific, so q58 exposes the
  * sketch CONTRACT instead: exact counts + error-bound booleans the
  * oracle pins to TRUE. Assert the booleans here too (and at a tighter
  * tolerance than the query's 10% emergency bound). */
class StatsSpec extends SparkSpec {

  test("approx_count_distinct bound booleans hold at sf0.001") {
    val r = Stats.q58ApproxDistinct(spark, "/root/testdata/sf0.001").head()
    assert(r.getAs[Boolean]("parts_within_10pct"),
      s"parts sketch outside 10%: $r")
    assert(r.getAs[Boolean]("orders_within_10pct"),
      s"orders sketch outside 10%: $r")
    assert(r.getAs[Long]("exact_parts") > 0 && r.getAs[Long]("exact_orders") > 0)
  }
}
