package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** S1 as a DataSource V2 connector (q186): the schedule scan read
    * through [[graft.sources.ScheduleSource]] — filter pushdown on
    * `league` becomes partition pruning inside the connector, column
    * pruning reaches it too (both asserted in `ScheduleSourceSpec`) —
    * then the reference transform chain: T1 newline split, T11 date
    * parse with the hardcoded-year injection, P6 today/tomorrow window.
    * UNLIKE q60/q61 this fixture IS oracle-checked: the source's row
    * formula is closed-form, so the oracle SQL regenerates the
    * identical relation with generate_series and applies the same
    * filters — the driver hash-compares a custom connector end to end. */
  def q186Dsv2Schedule(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    s.read.format("graft.sources.ScheduleSource")
      .option("leagues", 6).option("rowsPerLeague", 48).load()
      .filter($"league".isin("league_01", "league_03"))
      .withColumn("f", split($"raw_text", "\n"))
      .select($"league", $"match_idx",
        date_format(to_timestamp(concat(element_at($"f", 1), lit(".2023")),
          "dd.MM. HH:mm.yyyy"), "yyyy-MM-dd HH:mm:ss").as("kickoff"),
        element_at($"f", 2).as("hometeam"),
        element_at($"f", 3).as("awayteam"), $"row_id")
      .filter(to_date($"kickoff").isin(Fixtures.Today, Fixtures.Tomorrow))
      .orderBy($"league", $"match_idx")
  }

  val q186Oracle: String =
    """WITH g AS (
         SELECT i, j FROM generate_series(0, 5) s(i), generate_series(0, 47) t(j)
         WHERE i IN (1, 3)),
       r AS (
         SELECT 'league_' || lpad(CAST(i AS VARCHAR), 2, '0') AS league,
           CAST(j AS BIGINT) AS match_idx,
           DATE '2023-10-28' + CAST((j % 5) - 1 AS INTEGER) AS d,
           10 + (j % 12) AS hr,
           (i*31 + j*7) % 97 AS home,
           ((i*31 + j*7) % 97 + 1 + (i*17 + j*13) % 96) % 97 AS away,
           'g_1_' || i || '_' || j AS row_id
         FROM g)
       SELECT league, match_idx,
         strftime(CAST(d AS TIMESTAMP) + hr * INTERVAL 1 HOUR,
           '%Y-%m-%d %H:%M:%S') AS kickoff,
         'team_' || lpad(CAST(home AS VARCHAR), 2, '0') AS hometeam,
         'team_' || lpad(CAST(away AS VARCHAR), 2, '0') AS awayteam,
         row_id
       FROM r
       WHERE d IN (DATE '2023-10-28', DATE '2023-10-29')
       ORDER BY league, match_idx"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q186_dsv2_schedule" -> q186Dsv2Schedule,
    "q60_team_pipeline" -> q60TeamPipeline,
    "q61_ref_pipeline" -> q61RefPipeline,
  )

  /** q60/q61 have no oracles: fixture-driven, non-SQL-expressible (see
    * above). q186's connector rows ARE SQL-regenerable → oracle-checked. */
  val oracles: Map[String, String] = Map(
    "q186_dsv2_schedule" -> q186Oracle,
  )
}
