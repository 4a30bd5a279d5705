package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows

/** Focused spec for the r15 selection-engine internals
  * ([[Windows.valuesAtRanks]] / [[Windows.valuesAtRanksByKey]] /
  * [[Windows.tileBoundaries]]): the weighted-rank generalization, the
  * per-population start intervals, the adaptive per-level bin sizing,
  * and the ADVICE-r14 hardening (null guard, snapshot narrowing) —
  * all against brute-force order statistics on crafted data. */
class WindowsEngineSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force value at weighted rank r: smallest v whose cumulative
    * weight (in v order) reaches r. */
  private def bruteAtRank(vw: Seq[(Long, Long)], r: Long): Long = {
    val sorted = vw.sortBy(_._1)
    var cum = 0L
    sorted.foreach { case (v, w) =>
      cum += w
      if (cum >= r) return v
    }
    sys.error("rank beyond total")
  }

  test("tileBoundaries matches brute-force ntile boundaries (ties, skew, wide domain)") {
    // heavy tie blocks + a far outlier to force multiple narrowing levels
    val vals = Seq.fill(400)(7L) ++ (1L to 300L).map(_ * 13) ++
      Seq.fill(50)(9000000L) ++ Seq(-5000000L, 12345678L)
    val df = vals.toDF("v")
    for (nTiles <- Seq(1, 4, 16)) {
      val tb = Windows.tileBoundaries(df, $"v", Seq(("all", lit(1L))), nTiles)
      val n = vals.size.toLong
      val q = n / nTiles; val r = n % nTiles
      val expect = (1 to nTiles).map { t =>
        bruteAtRank(vals.map(v => (v, 1L)), t * q + math.min(t, r))
      }
      assert(tb.bounds("all").toSeq == expect, s"nTiles=$nTiles")
      assert(tb.counts("all") == n)
      assert(tb.lo == vals.min && tb.hi == vals.max)
    }
  }

  test("tileBoundaries: explicit small bin count still exact (multi-level path)") {
    val vals = (1L to 5000L).map(v => v * v % 999983L)
    val df = vals.toDF("v")
    val tb = Windows.tileBoundaries(df, $"v", Seq(("all", lit(1L))), 8, bins = 7)
    val n = vals.size.toLong; val q = n / 8; val r = n % 8
    val expect = (1 to 8).map(t =>
      bruteAtRank(vals.map(v => (v, 1L)), t * q + math.min(t, r)))
    assert(tb.bounds("all").toSeq == expect)
  }

  test("valuesAtRanks: overlapping populations start at their own intervals") {
    // pop "even" occupies a disjoint low band, pop "all" the full range
    val rows = ((1L to 1000L).map(v => (v, 1L)) ++
      (2000000L to 2000500L).map(v => (v, 0L))).toDF("v", "isLow")
    val tb = Windows.valuesAtRanks(rows, $"v",
      Seq(("low", $"isLow"), ("all", lit(1L))), n => Seq((n + 1) / 2))
    assert(tb.bounds("low")(0) == 500L) // median of 1..1000 at rank 500
    val all = (1L to 1000L) ++ (2000000L to 2000500L)
    assert(tb.bounds("all")(0) == bruteAtRank(all.map(v => (v, 1L)), (all.size + 1L) / 2))
    assert(tb.lo == 1L && tb.hi == 2000500L) // global stays unfiltered
  }

  test("valuesAtRanksByKey: weighted median equals the 2·cum ≥ tot crossing") {
    val data = Seq(
      ("A", 10L, 3L), ("A", 20L, 1L), ("A", 30L, 4L), ("A", 40L, 2L),
      ("B", 5L, 1L), ("B", 6L, 1L),
      ("C", 100L, 7L), ("C", 100L, 5L), ("C", 101L, 1L))
    val df = data.toDF("k", "v", "w")
    val tb = Windows.valuesAtRanksByKey(df, $"v", $"k",
      n => Seq((n + 1) / 2), weight = $"w")
    // brute force per key with the oracle's crossing rule
    data.groupBy(_._1).foreach { case (k, rows) =>
      val tot = rows.map(_._3).sum
      val byV = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val med = byV.collectFirst {
        case (v, w) if { cum += w; 2 * cum >= tot } => v
      }.get
      assert(tb.bounds(k)(0) == med, s"key=$k")
      assert(tb.counts(k) == tot, s"key=$k")
    }
  }

  test("valuesAtRanksByKey: zero-weight values are never selected") {
    val df = Seq(("A", 1L, 5L), ("A", 2L, 0L), ("A", 3L, 5L))
      .toDF("k", "v", "w")
    val tb = Windows.valuesAtRanksByKey(df, $"v", $"k",
      n => Seq((n + 1) / 2), weight = $"w")
    // rank ⌈10/2⌉ = 5 crosses at v=1 (cum 5 ≥ 5); v=2 carries no weight
    assert(tb.bounds("A")(0) == 1L)
  }

  test("null values fail loudly (ADVICE r14 guard)") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Windows.valuesAtRanks(df, $"v", Seq(("all", lit(1L))), n => Seq(1L))
    }
    assert(e.getMessage.contains("null"))
  }

  test("out-of-range rank fails loudly") {
    val df = Seq(1L, 2L).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Windows.valuesAtRanks(df, $"v", Seq(("all", lit(1L))), n => Seq(n + 1))
    }
    assert(e.getMessage.contains("outside"))
  }
}
