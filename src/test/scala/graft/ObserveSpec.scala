package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** `Dataset.observe` — pipeline accounting that RIDES the job instead
  * of re-running it: each observe point accumulates its aggregates on
  * the executors while the main action streams past, so a curation
  * pipeline gets stage-by-stage row/volume accounting for free. At
  * 100 TB this replaces the "run count() per stage" pattern (each a
  * full re-scan) with zero extra passes — the same motivation as
  * q90's single-plan staged accounting, expressed with the engine's
  * native observability hook. */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("observe points report exact per-stage counts in ONE job") {
    val raw = Observation("raw")
    val kept = Observation("kept")
    val docs = graft.io.Tables.documents(spark, d)
      .observe(raw, count(lit(1)).as("n"), sum($"n_chars").as("chars"))
      .filter($"lang" === "en")
      .observe(kept, count(lit(1)).as("n"))
    val keptRows = docs.count() // the ONLY action

    val total = graft.io.Tables.documents(spark, d).count()
    val chars = graft.io.Tables.documents(spark, d)
      .agg(sum($"n_chars")).as[Long].head()
    assert(raw.get("n") == total)
    assert(raw.get("chars") == chars)
    assert(kept.get("n") == keptRows)
    assert(keptRows < total) // the filter actually filtered
  }

  test("observed filter selectivity matches the direct ratio") {
    val o = Observation("sel")
    val ds = graft.io.Tables.orders(spark, d)
      .observe(o, count(lit(1)).as("n_in"),
        sum(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L))
          .as("n_urgent"))
      .filter($"o_orderpriority" === "1-URGENT")
    val urgent = ds.count()
    assert(o.get("n_urgent") == urgent)
    assert(o.get("n_in").asInstanceOf[Long] > urgent)
  }
}
