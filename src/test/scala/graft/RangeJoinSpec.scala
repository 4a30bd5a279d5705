package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketized range join vs the naive non-equi join (the O(n·m)
  * nested-loop Spark would otherwise plan) on real sf0.001 events —
  * same answer, and the bucketized physical plan must contain NO
  * nested-loop/cartesian node (that's its whole point). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fixtures = {
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val windows = ev
      .filter($"event_type" === "purchase" && $"event_id" % 7 === 0)
      .select($"event_id".as("w_id"),
        date_trunc("second", $"ts").as("w_start"),
        // hours, not minutes: sf0.001 has ~0.3 clicks/hour, so minute
        // windows yield an empty (vacuous) equality check
        expr("timestampadd(HOUR, 4 * (1 + event_id % 3), date_trunc('second', ts))")
          .as("w_end"))
    val points = ev.filter($"event_type" === "click")
      .select($"event_id".as("p_id"), $"ts")
    (points, windows)
  }

  test("bucketed == naive non-equi join, across bucket widths") {
    val (points, windows) = fixtures
    val naive = points.join(windows, $"ts" >= $"w_start" && $"ts" < $"w_end")
      .select($"w_id", $"p_id").collect().map(_.toSeq).toSet
    assert(naive.nonEmpty, "fixture produced no pairs — widen the windows")
    // widths both smaller and larger than the max interval (12 h):
    // correctness must not depend on the granularity choice
    for (mins <- Seq(30L, 240L, 1440L)) {
      val got = RangeJoin.bucketed(points, windows,
          $"ts", $"w_start", $"w_end", bucketUs = mins * 60 * 1000000)
        .select($"w_id", $"p_id").collect().map(_.toSeq).toSet
      assert(got == naive, s"mismatch at bucket=${mins}min")
    }
  }

  test("bucketized plan is an equi-join: no nested loop, no cartesian") {
    val (points, windows) = fixtures
    val plan = RangeJoin.bucketed(points, windows,
        $"ts", $"w_start", $"w_end", bucketUs = 10L * 60 * 1000000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"bucketized range join fell back to a nested loop:\n$plan")
    val naivePlan = points.join(windows, $"ts" >= $"w_start" && $"ts" < $"w_end")
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") || naivePlan.contains("CartesianProduct"),
      "naive formulation unexpectedly avoided the nested loop — update this spec")
  }

  test("degenerate and boundary intervals") {
    val points = Seq((1L, "2024-01-01 00:10:00"), (2L, "2024-01-01 00:20:00"))
      .toDF("p_id", "s").select($"p_id", $"s".cast("timestamp").as("ts"))
    val windows = Seq(
      (10L, "2024-01-01 00:10:00", "2024-01-01 00:20:00"), // [incl, excl)
      (11L, "2024-01-01 00:15:00", "2024-01-01 00:15:00")  // empty
    ).toDF("w_id", "a", "b")
      .select($"w_id", $"a".cast("timestamp").as("w_start"),
        $"b".cast("timestamp").as("w_end"))
    val got = RangeJoin.bucketed(points, windows,
        $"ts", $"w_start", $"w_end", bucketUs = 60L * 1000000)
      .select($"w_id", $"p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // point 1 is ON the inclusive start; point 2 ON the exclusive end;
    // window 11 is empty and must match nothing (not explode negatively)
    assert(got == Set((10L, 1L)))
  }

  test("overlapBucketed == direct inequality join; duplicate-free across buckets") {
    val g = 100L // tiny bucket so real overlaps span MANY buckets
    val mk = Seq(
      (1L, 0L, 1000L),    // spans 10 buckets
      (2L, 950L, 2000L),  // overlaps 1 in bucket 9, spans 11
      (3L, 1000L, 1100L), // TOUCHES 1 (half-open: no overlap), overlaps 2
      (4L, 5000L, 5001L), // isolated sliver
      (5L, 0L, 2500L))    // overlaps 1, 2, 3 (whole span)
    val a = mk.toDF("id1", "s1", "e1")
    val b = mk.toDF("id2", "s2", "e2")
    val got = RangeJoin.overlapBucketed(a, b,
        $"s1", $"e1", $"s2", $"e2", g)
      .filter($"id1" < $"id2")
      .select($"id1", $"id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // no duplicates even though overlaps span many buckets
    assert(got.length == got.toSet.size, s"duplicates: ${got.toSeq}")
    val want = (for {
      (i, s1, e1) <- mk; (j, s2, e2) <- mk
      if i < j && s1 < e2 && s2 < e1
    } yield (i, j)).toSet
    assert(got.toSet == want, s"got ${got.toSet} want $want")
    assert(want == Set((1L, 2L), (2L, 3L), (1L, 5L), (2L, 5L), (3L, 5L)))
  }
}
