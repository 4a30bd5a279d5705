package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipelines.{Fixtures, RefPipeline, TeamPipeline}

/** Reference-parity pipeline queries (SURVEY.md §3): the two end-to-end
  * pipelines over reference-shaped fixtures (FIXTURES.md §B). These are
  * not SQL-expressible over the driver's parquet tables (their inputs
  * are the scrape-boundary fixtures), so they are registered WITHOUT
  * oracle SQL — the driver records a rows-only check, and the ScalaTest
  * golden suites (`TeamPipelineSpec`, `RefPipelineSpec`) carry the
  * field-level parity assertions.
  */
object Parity {

  def q60TeamPipeline(s: SparkSession, d: String): DataFrame =
    TeamPipeline.run(
      Fixtures.schedule(s), Fixtures.h2hTokens(s), Fixtures.matchEvents(s),
      Fixtures.Today, Fixtures.Tomorrow)

  def q61RefPipeline(s: SparkSession, d: String): DataFrame =
    RefPipeline.run(
      Fixtures.resultsRows(s), Fixtures.refereeLinks(s),
      Fixtures.refereeHistLinks(s), Fixtures.refereeHistRows(s),
      Fixtures.Today, Fixtures.Tomorrow)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_team_pipeline" -> q60TeamPipeline,
    "q61_ref_pipeline" -> q61RefPipeline,
  )

  /** No oracles: fixture-driven, non-SQL-expressible (see above). */
  val oracles: Map[String, String] = Map.empty
}
