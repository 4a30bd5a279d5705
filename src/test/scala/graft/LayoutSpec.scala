package graft

import org.apache.spark.sql.functions._

/** Data-layout evidence: hive-style partitioned writes and partition
  * pruning at read — the first lever of the 100 TB design (a pruned
  * partition is never listed, let alone scanned; cf. the bucketed-join
  * evidence in BucketingSpec). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy write + filter on partition column prunes at the source") {
    val dir = java.nio.file.Files.createTempDirectory("layout_part").toString
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date($"ts"))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)

    val days = ev.select($"day").distinct().count()
    assert(days > 5, "fixture spans too few days for pruning to be visible")

    val read = spark.read.parquet(dir)
    val oneDay = read.filter($"day" === "2024-01-15")
      .agg(count(lit(1)).as("n"), countDistinct($"day").as("nd"))
    val plan = oneDay.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (directory-level
    // pruning), NOT PushedFilters (row-group level) and NOT a Filter node
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"partition filter missing:\n$plan")
    val expected = ev.filter($"day" === "2024-01-15").count()
    val row = oneDay.head()
    assert(row.getLong(0) == expected && expected > 0)
    // only one partition directory survives pruning
    assert(row.getLong(1) == 1)
  }

  test("sortWithinPartitions clusters data so min/max row-group stats can skip") {
    val dir = java.nio.file.Files.createTempDirectory("layout_sort").toString
    graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
      .repartition(4, $"o_custkey")
      .sortWithinPartitions($"o_custkey")
      .write.mode("overwrite").parquet(dir)
    val read = spark.read.parquet(dir).filter($"o_custkey" === 7L)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)"),
      s"predicate did not push to the clustered scan:\n$plan")
    assert(read.count() ==
      graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
        .filter($"o_custkey" === 7L).count())
  }
}
