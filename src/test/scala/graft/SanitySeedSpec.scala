package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Seeded-bug red test for the engine-wide sanity registry (VERDICT
  * r12 ask #2): the q489 failure class is a SHARED-ALGEBRA scale slip —
  * the Spark query and its DuckDB twin transcribe the same wrong
  * normalization, hash-match on garbage, and the oracle compare stays
  * green. This spec proves the mechanical guard catches that class in
  * a NON-annotation family: it runs a real Stats-family query at
  * sf0.001, mirrors a 1000× scale slip into its reported statistic
  * (exactly what a mis-scaled `div` would do in BOTH engines at once),
  * and asserts the registered hook flags it — and that the same hook
  * is silent on the correct output. */
class SanitySeedSpec extends AnyFunSuite with SparkSpec {

  test("a mirrored 1000x gini_bp slip at sf0.001 trips the q211 hook") {
    val hooks = SparkEntry.sanities("q211_gini")
    val good = graft.operators.Stats.q211Gini(spark, "/root/testdata/sf0.001")
      .localCheckpoint() // one computation feeds both the clean and seeded checks
    // baseline: the real output is clean under its own hooks
    assert(Sanity.run("q211_gini", good, hooks).isEmpty,
      "hooks must pass on the correct output")
    // the seeded bug: the statistic arrives 1000x its contract scale in
    // BOTH engines (a shared mis-scaled normalization) — the hash
    // compare would PASS this; the range hook must not
    val seeded = good.withColumn("gini_bp", col("gini_bp") * 1000)
    val violations = Sanity.run("q211_gini", seeded, hooks)
    assert(violations.nonEmpty, "1000x slip must trip the range hook")
    assert(violations.exists(_.contains("gini_bp")),
      s"violation must name the slipped column: $violations")
  }

  test("registry coverage: hooks span well beyond the annotation+eval families") {
    val all = SparkEntry.sanities
    assert(all.size >= 150, s"sanity coverage regressed to ${all.size} queries")
    // at least these non-annotation families must stay covered
    val families = Seq("q211_gini", "q252_auc", "q306_k_anonymity",
      "q354_brier", "q449_consistent_hashing", "q85_temperature_mix")
    families.foreach(q => assert(all.contains(q), s"$q lost its hooks"))
  }
}
