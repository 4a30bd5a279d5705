package graft.ops

import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** T5 — the reference's round-robin 6-field record parser with stateful
  * resynchronization (SURVEY.md §2.8 T5, §7.5.1). The only UDF in the
  * engine: the resync semantics are inherently sequential over the
  * token stream, but each stream lives in ONE array cell, so the UDF is
  * a pure per-row function — order-safe and embarrassingly parallel
  * across rows (fine at any scale; arrays are tiny).
  *
  * Column-parallel output shape (struct of six string arrays) mirrors
  * the reference's dict-of-lists exactly; `to_json` of the struct
  * reproduces its `json.dumps` key order.
  */
object TokenParse {

  /** The six fields, in reference key order
    * (app/team_utilities.py:74). */
  case class FormRecord(
      date: Seq[String],
      league: Seq[String],
      home_club: Seq[String],
      away_club: Seq[String],
      home_club_goal: Seq[String],
      away_club_goal: Seq[String])

  private def isPyInt(s: String): Boolean = {
    // mirrors Python int(str): optional sign, decimal digits (Unicode Nd
    // — Char.isDigit is Unicode-aware), surrounding whitespace, and
    // PEP 515 single underscores BETWEEN digits ("1_0" ok; "_1", "1_",
    // "1__0" are not). Known deviation: Python also trims some
    // non-ASCII whitespace that String.trim does not.
    val t = s.trim
    t.nonEmpty && {
      val body = if (t.head == '+' || t.head == '-') t.tail else t
      body.nonEmpty && body.head != '_' && body.last != '_' &&
        !body.contains("__") &&
        body.forall(c => c.isDigit || c == '_')
    }
  }

  private class Builder {
    val cols: Array[List[String]] = Array.fill(6)(Nil)
    def add(i: Int, v: String): Unit = cols(i) = v :: cols(i)
    def result: FormRecord = {
      val r = cols.map(_.reverse)
      FormRecord(r(0), r(1), r(2), r(3), r(4), r(5))
    }
  }

  /** Team-form variant (app/team_utilities.py:77-88 home, :95-106 away):
    * tokens fill the six columns cyclically; on the 7th token, a numeric
    * token is skipped (extra goal-ish value) and a non-numeric token
    * RESETS the cycle and is itself dropped — the next token starts a
    * new record at `date`. */
  def parseTeamSegment(tokens: Seq[String]): FormRecord = {
    val b = new Builder
    var count = 0
    for (item <- Option(tokens).getOrElse(Nil)) {
      if (count <= 5) {
        b.add(count, item)
        count += 1
      } else if (isPyInt(item)) {
        // numeric overflow token: skip, stay in post-record state
      } else {
        count = 0 // resync; the triggering token is dropped (ref :87)
      }
    }
    b.result
  }

  /** Head-to-head variant (app/team_utilities.py:113-123): on the 7th
    * token, a token longer than 3 chars is treated as the NEXT record's
    * date (appended to `date`, cycle continues at `league`); short
    * tokens are skipped. */
  def parseH2hSegment(tokens: Seq[String]): FormRecord = {
    val b = new Builder
    var count = 0
    for (item <- Option(tokens).getOrElse(Nil)) {
      if (count <= 5) {
        b.add(count, item)
        count += 1
      } else if (item.length > 3) {
        b.add(0, item) // new record's date (ref :119-121)
        count = 1
      }
      // else: skip
    }
    b.result
  }

  val parseTeamUdf: UserDefinedFunction = udf(parseTeamSegment _)
  val parseH2hUdf: UserDefinedFunction = udf(parseH2hSegment _)
}
