package graft

import org.apache.spark.sql.functions._

/** Evidence that the runtime re-planning machinery the 100 TB design
  * leans on (SURVEY §4) actually fires on this engine's plans: AQE
  * shuffle coalescing, runtime shuffle→broadcast join conversion, and
  * runtime bloom-filter row pruning. These are conf-driven, so the
  * specs document the exact confs a large deployment sets. */
class AdaptiveSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces an over-partitioned shuffle at runtime") {
    withConfs("spark.sql.shuffle.partitions" -> "64",
              "spark.sql.adaptive.enabled" -> "true") {
      val df = graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      df.collect() // AQE finalizes the plan only on execution
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead coalesced"),
        s"no runtime coalesce in:\n$plan")
    }
  }

  test("AQE converts a shuffle join to broadcast once the small side is measured") {
    withConfs(
      // static planner must NOT broadcast (threshold off) — the
      // conversion has to happen at RUNTIME from measured sizes
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB") {
      val dim = graft.io.Tables.nation(spark, "/root/testdata/sf0.001")
      val fact = graft.io.Tables.customer(spark, "/root/testdata/sf0.001")
      val j = fact.join(dim, $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name").agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"runtime broadcast conversion did not fire:\n$plan")
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false", // keep the injected filter visible
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local testdata is far below the 10GB default application-side
      // threshold; at real scale the defaults fire on their own
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val ord = graft.io.Tables.orders(spark, "/root/testdata/sf0.01")
        .filter($"o_orderpriority" === "1-URGENT") // selective creation side
      val li = graft.io.Tables.lineitem(spark, "/root/testdata/sf0.01")
      val j = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter on the fact scan:\n$plan")
      assert(j.collect().nonEmpty)
    }
  }
}
