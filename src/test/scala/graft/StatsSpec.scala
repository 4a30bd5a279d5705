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

  test("q127: CMS never undercounts, and the grid is linear in N") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val rows = Stats.q127CountMin(spark, d).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("over_ok"), s"CMS undercounted: $r")
      assert(r.getAs[Long]("err") >= 0L)
    }
    // linearity: every sketch row's counters sum to the occurrence total
    val occ = graft.io.Tables.documents(spark, d)
      .select(explode(graft.functions.Fns.tokens(col("text"))).as("term"))
    val n = occ.count()
    val perRow = occ
      .select((graft.functions.Fns.hash60(col("term")) % 2147483647L).as("hp"),
        explode(sequence(lit(0), lit(3))).as("r"))
      .groupBy(col("r")).agg(count(lit(1)).as("s"))
      .collect().map(_.getAs[Long]("s"))
    assert(perRow.length == 4 && perRow.forall(_ == n))
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
