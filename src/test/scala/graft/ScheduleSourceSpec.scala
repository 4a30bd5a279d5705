package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
import graft.sources.{ScheduleScanBuilder, ScheduleSource}

/** The DSv2 connector: pushdown-to-pruning at the ScanBuilder level,
  * plan-visible pushdown end to end, and row fidelity vs the closed
  * formula (the same formula q186's DuckDB oracle regenerates). */
class ScheduleSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read() = spark.read
    .format("graft.sources.ScheduleSource")
    .option("leagues", 4).option("rowsPerLeague", 10).load()

  test("full read: cardinality, schema, deterministic content") {
    val df = read()
    assert(df.schema.fieldNames.toSeq ==
      Seq("league", "match_idx", "raw_text", "row_id"))
    val rows = df.collect()
    assert(rows.length == 40)
    // formula fidelity at a spot-checked coordinate
    val r = rows.find(r => r.getString(0) == "league_02" && r.getLong(1) == 7L).get
    assert(r.getString(2) == ScheduleSource.rawText(2, 7))
    assert(r.getString(3) == "g_1_2_7")
    // every raw_text parses into the reference's 3-line scraped shape
    assert(df.filter(size(split($"raw_text", "\n")) =!= 3).count() == 0)
  }

  test("ScanBuilder: league filters prune partitions, others are residual") {
    val b = new ScheduleScanBuilder(8, 10)
    val residual = b.pushFilters(Array[Filter](
      EqualTo("league", "league_03"),
      IsNotNull("league"),
      EqualTo("match_idx", 5L))) // not ours — must come back
    assert(residual.toSeq == Seq(EqualTo("match_idx", 5L)))
    assert(b.pushedFilters().length == 2)
    val scan = b.build()
    val parts = scan.asInstanceOf[graft.sources.ScheduleScan].planInputPartitions()
    assert(parts.length == 1, s"expected 1 surviving partition, got ${parts.length}")

    val b2 = new ScheduleScanBuilder(8, 10)
    b2.pushFilters(Array[Filter](In("league", Array("league_00", "league_05"))))
    val parts2 = b2.build()
      .asInstanceOf[graft.sources.ScheduleScan].planInputPartitions()
    assert(parts2.length == 2)
  }

  test("end to end: pushdown visible in the plan; pruned read == post-filter") {
    val filtered = read().filter($"league" === "league_01")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("league"),
      s"league pushdown not visible:\n$plan")
    val viaPrune = filtered.collect().map(_.toSeq).toSet
    val viaSpark = read().collect().filter(_.getString(0) == "league_01")
      .map(_.toSeq).toSet
    assert(viaPrune == viaSpark && viaPrune.size == 10)
  }

  test("column pruning reaches the connector (raw_text absent from ReadSchema)") {
    val slim = read().select($"league", $"match_idx")
    val plan = slim.queryExecution.executedPlan.toString
    assert(!plan.contains("raw_text"), s"raw_text not pruned:\n$plan")
    assert(slim.distinct().count() == 40)
  }
}
