package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline's scalar/window transforms (SURVEY.md §2.2,
  * §2.5, §2.8), each as a small named Column function. Everything here
  * is a native Catalyst expression — no UDFs — so filters/projections
  * around them stay visible to the optimizer (pushdown, pruning,
  * whole-stage codegen). The lone stateful parse (T5) lives in
  * [[TokenParse]] as a Scala UDF.
  */
object RefOps {

  /** P1 — token-blacklist predicate (row form; the pipeline applies it
    * post-explode). Ref: app/team_utilities.py:56-57. */
  def notBlacklisted(tok: Column, blacklist: Seq[String]): Column =
    !tok.isin(blacklist.map(lit): _*)

  /** P2 — token contains none of the given header markers.
    * Ref: app/team_utilities.py:69-71. */
  def containsNone(tok: Column, markers: Seq[String]): Column =
    markers.map(m => !tok.contains(m)).reduce(_ && _)

  /** T1/T3 — newline→comma normalize (with optional marker scrub) then
    * split. Ref: app/team_utilities.py:53-54, :415. */
  def cleanSplit(raw: Column, scrub: Seq[String] = Nil): Column = {
    val scrubbed = scrub.foldLeft(raw)((c, m) =>
      regexp_replace(c, java.util.regex.Pattern.quote(m), ""))
    split(regexp_replace(scrubbed, "\n", ","), ",")
  }

  /** T6 — event-minute head: text before the first newline.
    * Ref: app/team_utilities.py:133-134. */
  def minuteHead(raw: Column): Column =
    substring_index(regexp_replace(raw, "\n", "'"), "'", 1)

  /** T7 — overtime minute arithmetic: "45+2" → "47"; plain minutes pass
    * through. Ref: app/team_utilities.py:135-139. */
  def overtimeMinute(minute: Column): Column =
    when(minute.contains("+"),
      aggregate(transform(split(minute, "\\+"), _.cast("int")),
        lit(0), (acc, x) => acc + x).cast("string"))
      .otherwise(minute)

  /** T8 — event-type classification from the svg class fragment of the
    * event HTML, first-match-wins in the reference's dict order with the
    * bare-"card" special case. Ref: app/team_utilities.py:143-163. */
  def classifyEvent(html: Column): Column = {
    val cls = regexp_extract(html, "svg class=\"([^\"]+)", 1)
    // Exact dict-iteration-order semantics of the reference
    // (keys: card, red, soccer, substitution, var, warning, yellow;
    // first match wins, 'card' only counts when neither 'red' nor
    // 'yellow' is present — so a combined red-yellow class string
    // classifies as 'redcard', the literal reference behavior):
    when(cls.contains("card") && !cls.contains("red") && !cls.contains("yellow"),
        "red-yellowcard")
      .when(cls.contains("red"), "redcard")
      .when(cls.contains("soccer"), "goal")
      .when(cls.contains("substitution"), "substitution")
      .when(cls.contains("var"), "var")
      .when(cls.contains("warning"), "penalty(missed)")
      .when(cls.contains("yellow"), "yellowcard")
      .otherwise("unknown")
  }

  /** T11 — schedule date parse with year injection.
    * Ref: app/team_utilities.py:433 (hardcoded ".2023" — here the year
    * is a parameter; parity callers pass 2023). try_to_timestamp rather
    * than to_timestamp: the reference's hardcoded year makes Feb 29
    * unparseable in non-leap years (SURVEY.md §7.5.3) — we surface that
    * as NULL instead of a job-killing exception. */
  def parseScheduleDate(raw: Column, year: Int): Column =
    try_to_timestamp(concat(raw, lit(s".$year")), lit("dd.MM. HH:mm.yyyy"))

  /** T12 — results-page date parse. Ref: app/ref_utilities.py:104. */
  def parseResultsDate(raw: Column): Column = to_date(raw, "dd/MM/yyyy")

  /** P11 — h2h URL synthesis from a row id: strip the "g_1_" prefix and
    * build the three h2h variants. Ref: app/team_utilities.py:423-430. */
  def h2hUrls(rowId: Column, base: String = "https://www.flashscore.nl/wedstrijd/"): Seq[Column] = {
    val stem = concat(lit(base), regexp_replace(rowId, "^g_1_", ""))
    Seq("overall", "home", "away").map(v => concat(stem, lit(s"/#/h2h/$v")))
  }

  /** P6 — the load-bearing today/tomorrow date-window predicate.
    * Ref: app/team_utilities.py:436, app/ref_utilities.py:107. */
  def inDateWindow(d: Column, today: String, tomorrow: String): Column =
    to_date(d).isin(today, tomorrow)

  /** W1 — forward fill in scrape order: last non-null value up to the
    * current row. Requires an explicit order column captured at parse
    * time (never DataFrame row order). Ref: app/ref_utilities.py:103.
    *
    * Scale note: an unpartitioned orderBy window is a single-task
    * bottleneck; real callers partition by the scrape unit (league/
    * page), which is how the reference's per-league frames behave. */
  def ffill(c: Column, partition: Seq[Column], order: Column): Column = {
    val w = (if (partition.isEmpty) Window.partitionBy()
             else Window.partitionBy(partition: _*))
      .orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last(c, ignoreNulls = true).over(w)
  }

  /** T4 — running-sum segmentation: a monotone segment id that increments
    * at each marker row. The same idiom drives session windows at scale.
    * Ref: app/team_utilities.py:62-66. */
  def segmentId(isMarker: Column, partition: Seq[Column], order: Column): Column = {
    val w = (if (partition.isEmpty) Window.partitionBy()
             else Window.partitionBy(partition: _*))
      .orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sum(when(isMarker, 1).otherwise(0)).over(w)
  }
}
