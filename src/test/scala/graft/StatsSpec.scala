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

  test("q80 moment-form stats agree with Spark's native aggregates") {
    val rows = Stats.q80StatsFamily(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("native_corr_ok"), s"corr drifted: $r")
      assert(r.getAs[Boolean]("native_covar_ok"), s"covar drifted: $r")
      assert(r.getAs[Boolean]("native_stddev_ok"), s"stddev drifted: $r")
      val c = r.getAs[Double]("corr_xy")
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $c")
      assert(r.getAs[Double]("stddev_x") >= 0.0)
    }
  }

  test("sketch error is within 6% (3x the requested 2% rsd)") {
    import org.apache.spark.sql.functions._
    val li = graft.io.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r = li.agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
      countDistinct(col("l_partkey")).as("ep"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
      countDistinct(col("l_orderkey")).as("eo")).head()
    val (ap, ep) = (r.getAs[Long]("ap"), r.getAs[Long]("ep"))
    val (ao, eo) = (r.getAs[Long]("ao"), r.getAs[Long]("eo"))
    assert(math.abs(ap - ep).toDouble / ep < 0.06, s"parts: $ap vs $ep")
    assert(math.abs(ao - eo).toDouble / eo < 0.06, s"orders: $ao vs $eo")
  }
}
