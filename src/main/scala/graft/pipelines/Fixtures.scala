package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference-shaped fixture data (FIXTURES.md §B): deterministic
  * literal rows mirroring the engine ingestion boundaries of the
  * reference pipelines (scrape OUTPUTS are the engine's inputs — the
  * browser/HTTP layer is outside the engine, SURVEY.md §2.1).
  *
  * Edge cases covered: cancelled-match arity (P3), the "Toon meer
  * wedstrijden" blacklist token (P1), all three T5 resync paths,
  * every T8 svg class incl. the bare-`card` special case, overtime
  * minutes (T7), both T9 role resolutions, blank-date forward-fill
  * runs (W1), empty rows/links (P4/P5), and the header-row +
  * popped-column referee detail shape (T14).
  */
object Fixtures {
  val Today = "2023-10-28"
  val Tomorrow = "2023-10-29"

  def schedule(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      // in-window match (today 21:00)
      ("La Liga", "28.10. 21:00\nReal Madrid\nBarcelona", "g_1_abc123"),
      // in-window match (tomorrow)
      ("La Liga", "29.10. 18:30\nGirona\nSevilla", "g_1_def456"),
      // out-of-window match (dropped by P6)
      ("La Liga", "15.11. 20:00\nValencia\nBetis", "g_1_zzz999"),
      // cancelled match (extra "-\n-" scrubbed -> still 3 fields) and a
      // malformed row that splits into 4 fields (dropped by P3)
      ("Serie B", "28.10. 14:00\nComo\nPisa\nextra", "g_1_bad000"),
      ("Serie B", "28.10. 16:00\nParma\nBari\n-\n-", "g_1_ghi789"),
    ).toDF("league", "raw_text", "row_id")
  }

  private val H = "LAATSTE WEDSTRIJDEN: %s"
  private val H2H = "HEAD-TO-HEAD"

  /** One token stream per match_url, with the three T5 resync edges:
    * home segment has a numeric 7th token (skip), away segment a
    * non-numeric 7th token (reset-drop), h2h segment a >3-char token
    * after a record (new record's date). */
  def h2hTokens(s: SparkSession): DataFrame = {
    import s.implicits._
    val base = "https://www.flashscore.nl/wedstrijd/"
    Seq(
      (s"${base}abc123/#/h2h/overall", Seq(
        "junk-before-first-header",
        H.format("Real Madrid"),
        "21.10.", "LaLiga", "Real Madrid", "Girona", "3", "0", "1", // numeric 7th+8th: skipped
        "14.10.", "LaLiga", "Cadiz", "Real Madrid", "0", "2",
        "Toon meer wedstrijden", // P1 blacklist
        H.format("Barcelona"),
        "22.10.", "LaLiga", "Barcelona", "Athletic", "1", "0", "oops", // non-numeric 7th: reset, dropped
        "15.10.", "LaLiga", "Granada", "Barcelona", "2", "2",
        H2H,
        "01.04.", "LaLiga", "Real Madrid", "Barcelona", "2", "1", "28.03.2015", // >3 chars: new date
        "LaLiga", "Barcelona", "Real Madrid", "1", "0")),
      (s"${base}def456/#/h2h/overall", Seq(
        H.format("Girona"),
        "20.10.", "LaLiga", "Girona", "Almeria", "5", "2",
        H.format("Sevilla"),
        "21.10.", "LaLiga", "Sevilla", "Osasuna", "1", "1",
        H2H)), // empty h2h segment (no matches played)
    ).toDF("match_url", "tokens")
  }

  /** Per-side in-match event rows for the detail pages (B3): keyed by
    * the team page url + match_idx; css_side is the DOM side, the
    * pipeline resolves team/opponent roles from the team name (T9). */
  def matchEvents(s: SparkSession): DataFrame = {
    import s.implicits._
    val base = "https://www.flashscore.nl/wedstrijd/"
    val hu = s"${base}abc123/#/h2h/home" // Real Madrid home_url
    def svg(c: String) = s"""<div><svg class="$c-ico something">x</svg></div>"""
    Seq(
      // match 0: Real Madrid (home role) vs Girona
      (hu, "Real Madrid", 0, 0, "home", "12'\nVinicius", svg("soccer"),
        "SPANJE: LaLiga", "21.10.2023 16:15", "Real Madrid", "Girona", "3-0"),
      (hu, "Real Madrid", 0, 1, "home", "45+2'\nModric", svg("yellow"),
        "SPANJE: LaLiga", "21.10.2023 16:15", "Real Madrid", "Girona", "3-0"),
      (hu, "Real Madrid", 0, 2, "away", "60'\nStuani", svg("warning"),
        "SPANJE: LaLiga", "21.10.2023 16:15", "Real Madrid", "Girona", "3-0"),
      (hu, "Real Madrid", 0, 3, "away", "75'\nBlind", svg("red"),
        "SPANJE: LaLiga", "21.10.2023 16:15", "Real Madrid", "Girona", "3-0"),
      // match 1: Real Madrid plays AWAY (role flip, T9) vs Cadiz
      (hu, "Real Madrid", 1, 0, "home", "30'\nChris", svg("substitution"),
        "SPANJE: LaLiga", "14.10.2023 21:00", "Cadiz", "Real Madrid", "0-2"),
      (hu, "Real Madrid", 1, 1, "away", "55'\nBellingham", svg("var"),
        "SPANJE: LaLiga", "14.10.2023 21:00", "Cadiz", "Real Madrid", "0-2"),
      (hu, "Real Madrid", 1, 2, "away", "80'\nKroos", svg("card"), // bare card -> red-yellowcard
        "SPANJE: LaLiga", "14.10.2023 21:00", "Cadiz", "Real Madrid", "0-2"),
    ).toDF("team_url", "team", "match_idx", "row_idx", "css_side",
      "minute_raw", "event_html",
      "tournament", "match_date", "home_name", "away_name", "match_score")
  }

  /** worldfootball results-table rows (B4): blank date cells forward-
    * fill in scrape order; fully-empty rows and empty matchlinks drop. */
  def resultsRows(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("Premier League", 0, Seq("28/10/2023", "15:00", "Arsenal", "2:1", "Chelsea", "2:1"), "/report/arsenal-chelsea/"),
      ("Premier League", 1, Seq[String](), ""), // empty row (P4)
      ("Premier League", 2, Seq("", "17:30", "Liverpool", "1:1", "Everton", "1:1"), "/report/liverpool-everton/"), // ffill date
      ("Premier League", 3, Seq("", "20:00", "Wolves", "0:3", "City", "0:3"), ""), // empty link (P5)
      ("Premier League", 4, Seq("29/10/2023", "14:00", "Spurs", "1:0", "Villa", "1:0"), "/report/spurs-villa/"),
      ("Premier League", 5, Seq("15/11/2023", "19:45", "Brighton", "2:2", "Fulham", "2:2"), "/report/brighton-fulham/"), // out of window
    ).toDF("league", "row_idx", "cells", "matchlink")
  }

  /** Match page → referee profile link (B5; may be missing). */
  def refereeLinks(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("https://www.worldfootball.net/report/arsenal-chelsea/",
        "https://www.worldfootball.net/referee_summary/taylor/"),
      // liverpool-everton: no referee link row at all (left join miss)
      ("https://www.worldfootball.net/report/spurs-villa/",
        "https://www.worldfootball.net/referee_summary/oliver/"),
    ).toDF("matchlink", "refereelink")
  }

  /** Referee profile → season match-list links (B5). */
  def refereeHistLinks(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("https://www.worldfootball.net/referee_summary/taylor/", Seq(
        "https://www.worldfootball.net/referee_summary/taylor/2022-2023/",
        "https://www.worldfootball.net/not_a_summary/taylor/x/")), // filtered (no 'referee_summary')
      ("https://www.worldfootball.net/referee_summary/oliver/", Seq[String]()),
    ).toDF("refereelink", "hist_links")
  }

  /** Referee season page table rows (B5): row 0 is the header (dropped,
    * T14), and every row's 3rd cell is popped. 8 cells per raw row. */
  def refereeHistRows(s: SparkSession): DataFrame = {
    import s.implicits._
    val l = "https://www.worldfootball.net/referee_summary/taylor/2022-2023/"
    Seq(
      (l, 0, Seq("Date", "Home", "drop", "Away", "Score", "Yellow", "Unknown", "Red")),
      (l, 1, Seq("01/10/2022", "Leeds", "x", "Derby", "1:0", "3", "0", "1")),
      (l, 2, Seq("08/10/2022", "Stoke", "x", "Hull", "2:2", "5", "1", "0")),
    ).toDF("hist_link", "row_idx", "cells")
  }
}
