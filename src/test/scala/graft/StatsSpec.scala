package graft

import graft.operators.Stats

/** The approx-distinct query has no oracle (HLL sketches are engine-
  * specific) — assert its error bound against the exact counts here. */
class StatsSpec extends SparkSpec {

  test("approx_count_distinct within the requested 2% rsd (loose 3x bound)") {
    val r = Stats.q58ApproxDistinct(spark, "/root/testdata/sf0.001").head()
    val (ap, ep) = (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts"))
    val (ao, eo) = (r.getAs[Long]("approx_orders"), r.getAs[Long]("exact_orders"))
    assert(math.abs(ap - ep).toDouble / ep < 0.06, s"parts: $ap vs $ep")
    assert(math.abs(ao - eo).toDouble / eo < 0.06, s"orders: $ao vs $eo")
  }
}
