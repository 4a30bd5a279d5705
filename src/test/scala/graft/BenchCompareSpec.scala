package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench drift comparator is pure logic — test it red/green without
  * a SparkSession. */
class BenchCompareSpec extends AnyFunSuite {

  test("flags a reproducible multi-x regression, ignores noise and wobble") {
    val prev = Map("q286_x" -> 0.96, "q109_x" -> 0.39, "q182_x" -> 2.6,
      "q_small" -> 0.05, "q_new" -> 1.0)
    val cur = Map(
      "q286_x" -> 4.80, // 5× with agreeing samples → flagged
      "q109_x" -> 2.31, // 6× with agreeing samples → flagged
      "q182_x" -> 4.50, // big jump but spread says box noise → NOT flagged
      "q_small" -> 0.11, // 2.2× but only 60 ms absolute → NOT flagged
      "q_gone_fast" -> 9.9) // no previous sample → NOT flagged
    val spread = Map("q286_x" -> 1001L, "q109_x" -> 1030L,
      "q182_x" -> 7398L, "q_small" -> 1000L, "q_gone_fast" -> 1000L)
    val r = BenchCompare.regressions(prev, cur, spread)
    assert(r.keySet == Set("q286_x", "q109_x"))
    assert(r("q286_x").prevSec == 0.96 && r("q286_x").curSec == 4.80 &&
      r("q286_x").spreadPermille == 1001L)
  }

  test("a query with no current spread sample is treated as untrusted") {
    val r = BenchCompare.regressions(
      Map("q1_x" -> 1.0), Map("q1_x" -> 3.0), Map.empty)
    assert(r.isEmpty)
  }

  test("zero/negative previous time never divides into a flag") {
    val r = BenchCompare.regressions(
      Map("q1_x" -> -1.0, "q2_x" -> 0.0),
      Map("q1_x" -> 3.0, "q2_x" -> 3.0),
      Map("q1_x" -> 1000L, "q2_x" -> 1000L))
    assert(r.isEmpty)
  }

  test("toJson renders name-sorted objects; parseDetail round-trips") {
    val r = Map(
      "qb" -> BenchCompare.Regression(1.0, 2.5, 1100L),
      "qa" -> BenchCompare.Regression(0.5, 1.9, 1001L))
    val s = BenchCompare.toJson(r)
    assert(s.indexOf("\"qa\"") < s.indexOf("\"qb\""))
    val tmp = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.write(tmp,
      ("""{"metric":"total","queries":{"q1_x":1.5,"q2_x":0.2},""" +
        """"spread_permille":{"q1_x":1010,"q2_x":1200},"sf":"x"}""")
        .getBytes("UTF-8"))
    val (q, sp) = BenchCompare.parseDetail(tmp)
    assert(q == Map("q1_x" -> 1.5, "q2_x" -> 0.2))
    assert(sp == Map("q1_x" -> 1010L, "q2_x" -> 1200L))
    java.nio.file.Files.delete(tmp)
  }

  test("absent or corrupt previous artifact yields empty maps, not a crash") {
    val (q, sp) = BenchCompare.parseDetail(
      java.nio.file.Paths.get("/nonexistent/bench_detail.json"))
    assert(q.isEmpty && sp.isEmpty)
    val tmp = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.write(tmp, "not json at all".getBytes("UTF-8"))
    val (q2, sp2) = BenchCompare.parseDetail(tmp)
    assert(q2.isEmpty && sp2.isEmpty)
    java.nio.file.Files.delete(tmp)
  }

  test("twinFlags applies both gates and annotates the wave exemption") {
    val cur = Map(
      "q_slow_ratio" -> 3.0,  // >2s and >2x twin → flagged
      "q_slow_parity" -> 3.0, // >2s but ~1x twin → not flagged
      "q_fast_ratio" -> 0.5,  // 10x twin but <2s → not flagged
      "q_wave" -> 4.0,        // flagged, but ≥25 jobs → wave-exempt
      "q_failed" -> -1.0,     // failed runs never flag
      "q_no_twin" -> 5.0)     // no twin measurement → not flagged
    val twin = Map(
      "q_slow_ratio" -> 0.5, "q_slow_parity" -> 2.8,
      "q_fast_ratio" -> 0.05, "q_wave" -> 0.4, "q_failed" -> 0.1)
    val jobs = Map("q_slow_ratio" -> 8L, "q_wave" -> 30L)
    val f = BenchCompare.twinFlags(cur, twin, jobs)
    assert(f.keySet == Set("q_slow_ratio", "q_wave"), f.keySet)
    assert(!f("q_slow_ratio").waveExempt && f("q_slow_ratio").ratioPermille == 6000)
    assert(f("q_wave").waveExempt && f("q_wave").jobs == 30L)
    // json renders name-sorted with the exemption visible
    val js = BenchCompare.twinFlagsJson(f)
    assert(js.indexOf("q_slow_ratio") < js.indexOf("q_wave"))
    assert(js.contains("\"wave_exempt\":true"))
    // unaudited flags render audited:false (screen converges on these)
    assert(js.contains("\"audited\":false"))
  }

  test("audited-inherent allowlist is frozen (VERDICT r13 ask #3)") {
    // Adding a query here requires a SAME-COMMIT audit entry in
    // BENCH_NOTES.md naming the measured floor — the allowlist is an
    // exemption register, not a mute button. Every value must cite the
    // BENCH_NOTES section carrying the audit.
    // r15: q465 added with the BENCH_NOTES §Round-15 floor decomposition
    // (serial one-row-group scan + pc materialization + MM tail; the
    // p1-checkpoint removal A/B measured 70% worse)
    val frozen = Set("q157_copurchase", "q182_apriori_triples",
      "q237_pagerank_loop", "q401_encoding_advisor", "q480_dawid_skene",
      "q465_bradley_terry")
    assert(BenchCompare.AuditedInherent.keySet == frozen,
      s"allowlist drifted: ${BenchCompare.AuditedInherent.keySet} vs $frozen")
    BenchCompare.AuditedInherent.foreach { case (n, cite) =>
      assert(cite.contains("BENCH_NOTES"), s"$n exemption lacks a citation")
      assert(SparkEntry.queries.contains(n), s"$n is not a suite query")
    }
    // an allowlisted query that flags carries its citation in the JSON
    val f = BenchCompare.twinFlags(
      Map("q157_copurchase" -> 3.0), Map("q157_copurchase" -> 0.3),
      Map("q157_copurchase" -> 7L))
    assert(f("q157_copurchase").audited.exists(_.contains("BENCH_NOTES")))
    assert(BenchCompare.twinFlagsJson(f).contains("\"audited\":\"BENCH_NOTES"))
  }

  test("parseFlatQueryMap reads the child-JVM output and fails closed") {
    assert(BenchCompare.parseFlatQueryMap("""{"q1_x":1.5,"q2_x":-1.0}""") ==
      Map("q1_x" -> 1.5, "q2_x" -> -1.0))
    // a missing/corrupt child must read as jvm_runs=1, never as zeros
    assert(BenchCompare.parseFlatQueryMap("not json").isEmpty)
    assert(BenchCompare.parseFlatQueryMap("[1,2]").isEmpty)
    assert(BenchCompare.parseFlatQueryMap("""{"q1_x":"oops"}""").isEmpty)
  }
}
