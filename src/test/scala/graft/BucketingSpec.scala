package graft

import org.apache.spark.sql.functions._

/** Bucketing (SURVEY.md scale design): pre-bucketing both fact tables
  * on the join key makes the join shuffle-free — at 100 TB this is the
  * difference between re-shuffling every query and paying the shuffle
  * once at write time. Asserted on the physical plan: the bucketed
  * join contains NO Exchange, the plain join does. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed orders⋈lineitem join plans without an Exchange") {
    val d = "/root/testdata/sf0.001"
    // tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    // static conf and can't be pointed elsewhere on a live session
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")

    graft.io.Tables.orders(spark, d)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    graft.io.Tables.lineitem(spark, d)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    // broadcast would bypass the bucket test — force a sort-merge join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("orders_b")
        .join(spark.table("lineitem_b"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val bucketedJoinPlan = bucketed.queryExecution.executedPlan.toString
      // the JOIN itself is exchange-free (the groupBy exchange remains)
      val joinSection = bucketedJoinPlan
        .linesIterator.dropWhile(!_.contains("SortMergeJoin")).mkString("\n")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join still shuffles:\n$joinSection")

      val plain = graft.io.Tables.orders(spark, d)
        .join(graft.io.Tables.lineitem(spark, d), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))

      // and the answers agree
      assert(bucketed.collect().map(_.toSeq).toSet ==
        plain.collect().map(_.toSeq).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
