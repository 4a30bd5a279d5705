package graft

import org.apache.spark.sql.functions._
import graft.ops.RefOps

/** Unit tests for the scalar/window transform library (SURVEY.md §2.8)
  * against hand-derived expectations from the reference code. */
class RefOpsSpec extends SparkSpec {
  import spark.implicits._

  test("T6 minuteHead + T7 overtimeMinute") {
    val df = Seq("12'\nVinicius", "45+2'\nModric", "90+12'\nX", "7'\nY")
      .toDF("raw")
      .select(RefOps.overtimeMinute(RefOps.minuteHead($"raw")).as("m"))
    assert(df.as[String].collect().toSeq == Seq("12", "47", "102", "7"))
  }

  test("T8 classifyEvent: dict-order first-match-wins incl. special cases") {
    def html(c: String) = s"""<div><svg class="$c">x</svg></div>"""
    val cases = Seq(
      html("soccer-ico") -> "goal",
      html("yellowcard-ico") -> "yellowcard",
      html("redcard-ico") -> "redcard",
      html("card-ico") -> "red-yellowcard", // bare card (ref :155-158)
      html("red-yellowcard-ico") -> "redcard", // literal ref: 'red' wins
      html("substitution-in") -> "substitution",
      html("var-ico") -> "var",
      html("warning-ico") -> "penalty(missed)")
    val got = cases.map(_._1).toDF("h")
      .select(RefOps.classifyEvent($"h")).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("T3 cleanSplit scrubs cancelled markers then splits on newlines") {
    // trailing "-\n-" marker (the reference's cancelled-match shape)
    val df = Seq("28.10. 16:00\nParma\nBari\n-\n-", "28.10. 17:00\nA\nB")
      .toDF("raw")
      .select(RefOps.cleanSplit($"raw", scrub = Seq("\n-\n-")).as("f"))
    assert(df.as[Seq[String]].collect().toSeq == Seq(
      Seq("28.10. 16:00", "Parma", "Bari"), Seq("28.10. 17:00", "A", "B")))
  }

  test("P11 h2hUrls strips g_1_ and builds the three variants") {
    val Seq(o, h, a) = RefOps.h2hUrls(lit("g_1_abc"), "https://x/")
    val r = spark.range(1).select(o, h, a).as[(String, String, String)].head()
    assert(r == (("https://x/abc/#/h2h/overall",
      "https://x/abc/#/h2h/home", "https://x/abc/#/h2h/away")))
  }

  test("W1 ffill propagates last non-null in explicit order per partition") {
    val df = Seq(("a", 0, Some("d1")), ("a", 1, None), ("a", 2, None),
        ("a", 3, Some("d2")), ("b", 0, None), ("b", 1, Some("d3")))
      .toDF("grp", "idx", "v")
      .withColumn("f", RefOps.ffill($"v", Seq($"grp"), $"idx"))
      .orderBy($"grp", $"idx")
    assert(df.select($"f").as[Option[String]].collect().toSeq ==
      Seq(Some("d1"), Some("d1"), Some("d1"), Some("d2"), None, Some("d3")))
  }

  test("T4 segmentId increments at markers") {
    val df = Seq((0, "HDR"), (1, "x"), (2, "y"), (3, "HDR"), (4, "z"))
      .toDF("pos", "tok")
      .withColumn("seg", RefOps.segmentId($"tok" === "HDR", Nil, $"pos"))
      .orderBy($"pos")
    assert(df.select($"seg").as[Long].collect().toSeq == Seq(1, 1, 1, 2, 2))
  }

  test("T11 parseScheduleDate: year injection + non-leap Feb 29 -> NULL") {
    val df = Seq("28.10. 21:00", "29.02. 12:00").toDF("raw")
      .select(RefOps.parseScheduleDate($"raw", 2023).cast("string").as("ts"))
    assert(df.as[Option[String]].collect().toSeq ==
      Seq(Some("2023-10-28 21:00:00"), None))
  }
}
