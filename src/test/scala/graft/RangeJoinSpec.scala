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

  test("q241: FIFO arc sums equal a sequential per-part replay") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val got = operators.RangeJoin.q241FifoAllocation(spark, d).collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Long]("n_arcs"), r.getAs[Long]("allocated_qty"),
          r.getAs[Long]("unmatched_demand"), r.getAs[Long]("leftover_supply"))).toMap
    assert(got.nonEmpty)
    val rows = graft.io.Tables.lineitem(spark, d)
      .filter($"l_returnflag".isin("A", "R"))
      .join(graft.io.Tables.part(spark, d),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_partkey", $"l_returnflag",
        $"l_quantity".cast("long"), unix_micros($"l_shipdate".cast("timestamp")),
        $"l_orderkey", $"l_linenumber".cast("long"))
      .as[(String, Long, String, Long, Long, Long, Long)].collect()
    // sequential FIFO replay per part: walk both ship-date-ordered
    // streams with two cursors, consuming greedily — the textbook
    // serial algorithm the interval formulation must reproduce
    val byBrand = rows.groupBy(_._1)
    byBrand.foreach { case (brand, brows) =>
      var arcs = 0L; var alloc = 0L; var unm = 0L; var left = 0L
      brows.groupBy(_._2).foreach { case (_, prows) =>
        def stream(side: String) = prows.filter(_._3 == side)
          .sortBy(t => (t._5, t._6, t._7)).map(_._4).toArray
        val sup = stream("A"); val dem = stream("R")
        var si = 0; var di = 0
        var sRem = if (sup.nonEmpty) sup(0) else 0L
        var dRem = if (dem.nonEmpty) dem(0) else 0L
        while (si < sup.length && di < dem.length) {
          val take = math.min(sRem, dRem)
          if (take > 0) { alloc += take; arcs += 1 }
          sRem -= take; dRem -= take
          if (sRem == 0) { si += 1; if (si < sup.length) sRem = sup(si) }
          if (dRem == 0) { di += 1; if (di < dem.length) dRem = dem(di) }
        }
        unm += dRem + dem.drop(di + 1).sum
        left += sRem + sup.drop(si + 1).sum
      }
      val (ga, gal, gu, gl) = got(brand)
      assert(gal == alloc, s"$brand allocated $gal vs replay $alloc")
      assert(ga == arcs, s"$brand arcs $ga vs replay $arcs")
      assert(gu == unm && gl == left, s"$brand tails ($gu,$gl) vs ($unm,$left)")
    }
  }

  test("q246: aged leftovers reconcile with q241 brand-level leftover supply") {
    val d = "/root/testdata/sf0.001"
    val aging = operators.RangeJoin.q246InventoryAging(spark, d).collect()
    assert(aging.nonEmpty)
    val agingByBrand = aging.groupBy(_.getAs[String]("brand"))
      .view.mapValues(_.map(_.getAs[Long]("qty")).sum).toMap
    val fifo = operators.RangeJoin.q241FifoAllocation(spark, d).collect()
      .map(r => r.getAs[String]("brand") -> r.getAs[Long]("leftover_supply"))
      .toMap
    fifo.foreach { case (brand, leftover) =>
      assert(agingByBrand.getOrElse(brand, 0L) == leftover,
        s"$brand: aged ${agingByBrand.get(brand)} vs FIFO leftover $leftover")
    }
    // buckets are the fixed taxonomy
    val buckets = aging.map(_.getAs[String]("bucket")).toSet
    assert(buckets.subsetOf(Set("a_0_30", "b_31_60", "c_61_90", "d_over_90")))
  }
}
