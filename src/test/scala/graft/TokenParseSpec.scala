package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TokenParse
import graft.ops.TokenParse.FormRecord

/** T5 resync semantics vs hand-derived goldens for the three variants
  * (SURVEY.md §7.5.1; ref app/team_utilities.py:77-124). Pure function
  * tests — no Spark session needed. */
class TokenParseSpec extends AnyFunSuite {

  test("team variant: happy path fills 6 columns cyclically... until 7th") {
    val r = TokenParse.parseTeamSegment(Seq(
      "21.10.", "LaLiga", "Real", "Girona", "3", "0"))
    assert(r == FormRecord(Seq("21.10."), Seq("LaLiga"), Seq("Real"),
      Seq("Girona"), Seq("3"), Seq("0")))
  }

  test("team variant: numeric 7th token skipped (ref :82-85)") {
    val r = TokenParse.parseTeamSegment(Seq(
      "21.10.", "LaLiga", "Real", "Girona", "3", "0", "1", "2"))
    // both numeric overflow tokens skipped, no new record started
    assert(r.date == Seq("21.10.") && r.away_club_goal == Seq("0"))
  }

  test("team variant: non-numeric 7th resets AND drops the token (ref :86-88)") {
    val r = TokenParse.parseTeamSegment(Seq(
      "21.10.", "LaLiga", "Real", "Girona", "3", "0",
      "14.10.", // triggers reset, itself dropped
      "LaLiga2", "Cadiz", "RealM", "0", "2"))
    assert(r.date == Seq("21.10.", "LaLiga2")) // misaligned: literal ref behavior
    assert(r.league == Seq("LaLiga", "Cadiz"))
    assert(r.home_club_goal == Seq("3", "2"))
    assert(r.away_club_goal == Seq("0"))
  }

  test("team variant: python int semantics for the numeric check") {
    // int(' 3 ') and int('+3')/int('-3') succeed in Python
    val r = TokenParse.parseTeamSegment(Seq(
      "d", "l", "h", "a", "1", "2", " 3 ", "+4", "-5", "x", "next"))
    // ' 3 ', '+4', '-5' skipped as numeric; 'x' resets+drops; 'next' -> date
    assert(r.date == Seq("d", "next"))
  }

  test("team variant: PEP 515 underscore literals count as numeric") {
    // Python int('1_0') == 10, so a '1_0' 7th token is SKIPPED, not a reset;
    // '_1', '1_', '1__0' raise in Python -> reset+drop
    val skip = TokenParse.parseTeamSegment(Seq(
      "d", "l", "h", "a", "1", "2", "1_0", "next"))
    assert(skip.date == Seq("d")) // '1_0' skipped, 'next' also in post-record
    val reset = TokenParse.parseTeamSegment(Seq(
      "d", "l", "h", "a", "1", "2", "_1", "next"))
    assert(reset.date == Seq("d", "next")) // '_1' resets+drops
    val reset2 = TokenParse.parseTeamSegment(Seq(
      "d", "l", "h", "a", "1", "2", "1__0", "next"))
    assert(reset2.date == Seq("d", "next"))
  }

  test("h2h variant: >3-char 7th token becomes the next record's date (ref :119-121)") {
    val r = TokenParse.parseH2hSegment(Seq(
      "01.04.", "LaLiga", "Real", "Barca", "2", "1",
      "28.03.2015", // len > 3 -> new date, count = 1
      "LaLiga", "Barca", "Real", "1", "0"))
    assert(r.date == Seq("01.04.", "28.03.2015"))
    assert(r.league == Seq("LaLiga", "LaLiga"))
    assert(r.home_club == Seq("Real", "Barca"))
    assert(r.away_club_goal == Seq("1", "0"))
  }

  test("h2h variant: short 7th token skipped (ref :122-123)") {
    val r = TokenParse.parseH2hSegment(Seq(
      "01.04.", "L", "R", "B", "2", "1", "xyz", "29.03.2014", "L2"))
    // 'xyz' (len 3) skipped; '29.03.2014' becomes new date; 'L2' -> league
    assert(r.date == Seq("01.04.", "29.03.2014"))
    assert(r.league == Seq("L", "L2"))
  }

  test("empty segment yields six empty columns (no matches played, ref :126)") {
    val r = TokenParse.parseH2hSegment(Nil)
    assert(r == FormRecord(Nil, Nil, Nil, Nil, Nil, Nil))
  }
}
