package graft

import graft.sources.Sinks

/** Retry/salvage/digest semantics (the JDBC write itself needs a live
  * database; the protocol around it is what the reference encodes). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writeWithRetry: succeeds first try -> no errors") {
    val df = Seq((1, "a")).toDF("id", "v")
    var calls = 0
    val (ok, errs) = Sinks.writeWithRetry(df, 2) { _ => calls += 1 }
    assert(ok && errs.isEmpty && calls == 1)
  }

  test("writeWithRetry: transient failure -> retries and records the error") {
    val df = Seq((1, "a")).toDF("id", "v")
    var calls = 0
    val (ok, errs) = Sinks.writeWithRetry(df, 2) { _ =>
      calls += 1
      if (calls == 1) throw new RuntimeException("connection reset Stacktrace: xyz")
    }
    assert(ok && calls == 2)
    assert(errs == Seq("RuntimeException: connection reset "))
  }

  test("writeWithRetry: permanent failure -> gives up after N attempts") {
    val df = Seq((1, "a")).toDF("id", "v")
    val (ok, errs) = Sinks.writeWithRetry(df, 2) { _ =>
      throw new RuntimeException("down")
    }
    assert(!ok && errs.size == 2)
  }

  test("salvageAndRetry unions parked frames BY NAME and writes once") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(("y", 2)).toDF("v", "id") // reversed column order
    var written: Long = -1
    val (ok, _) = Sinks.salvageAndRetry(Seq(a, b), 2) { df =>
      written = df.count()
    }
    assert(ok && written == 2)
  }

  test("errorDigest folds the error map like the reference email body") {
    val digest = Sinks.errorDigest(scala.collection.immutable.ListMap(
      "La Liga: 0 (Historic Score)" -> "TimeoutException: page load",
      "(Final Database Loading): 1" -> "OperationalError: down"))
    assert(digest ==
      "La Liga: 0 (Historic Score) --> TimeoutException: page load\n" +
        "(Final Database Loading): 1 --> OperationalError: down")
  }

  test("JSONB column-type DDL strings cover every sink column") {
    assert(Sinks.historicMatchColumnTypes.split(",").length == 12)
    assert(Sinks.refHistoricMatchColumnTypes.split(",").length == 10)
    assert(Sinks.historicMatchColumnTypes.contains("home_team_matches JSONB"))
    assert(Sinks.refHistoricMatchColumnTypes.contains("referee_matchhistdetails JSONB"))
  }
}
