package graft

import graft.streaming.JudgmentStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** Streaming consensus maintenance vs the batch majority vote: the
  * stateful per-item fold (arrivals across microbatches, incremental
  * min-label collapse) must land on EXACTLY the batch vote for every
  * item — two very different plans, one semantics. */
class JudgmentStreamsSpec extends SparkSpec {
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  /** Write df as a single parquet FILE named `name` directly under
    * `dir` (the file-source stream lists *.parquet files, not Spark
    * output directories). */
  private def stageFile(df: DataFrame, dir: Path, name: String): Unit = {
    val tmp = dir.resolve(s"_tmp_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, dir.resolve(name))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(tmp.toFile)
  }

  test("streaming vote == batch vote on sf0.001 across 3 microbatches") {
    // raw judgment events (NOT deduped — the stream collapses
    // multi-row raters itself, like the batch judgments relation)
    val raw = graft.io.Tables.lineitem(spark, d)
      .select($"l_orderkey".as("item"),
        ($"l_suppkey" % 7).as("rater"), $"l_returnflag".as("label"))
    // batch truth: the q480/q485/q489 vote over collapsed judgments
    val judB = raw.groupBy($"item", $"rater").agg(min($"label").as("label"))
    val w = Window.partitionBy($"item").orderBy($"c".desc, $"label")
    val batch = judB.groupBy($"item", $"label").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"item", $"label".as("vlabel"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // stage the SAME events as 3 parquet files → 3 microbatches, so
    // an item's raters (and repeated rows of one rater) split across
    // triggers and the state must stitch them back together. The split
    // is on LINENUMBER, so most items genuinely span microbatches.
    val staged = Files.createTempDirectory("jud_stream")
    val withLn = graft.io.Tables.lineitem(spark, d)
      .select($"l_orderkey".as("item"), ($"l_suppkey" % 7).as("rater"),
        $"l_returnflag".as("label"), $"l_linenumber".as("ln"))
    (0 until 3).foreach { i =>
      stageFile(withLn.filter($"ln" % 3 === i).drop("ln"),
        staged, s"jud_$i.parquet")
    }

    val q = JudgmentStreams.voteStreamUnbounded(spark, staged.toString)
      .writeStream.outputMode("append")
      .format("memory").queryName("vote_out")
      .start()
    try {
      q.processAllAvailable()
      // the stream emits one update per (item, microbatch-it-appears-in);
      // the final answer per item is its max-seq update
      val wseq = Window.partitionBy($"item").orderBy($"seq".desc)
      val streamed = spark.table("vote_out")
        .withColumn("rk", row_number().over(wseq)).filter($"rk" === 1)
        .select($"item", $"vlabel")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed.keySet == batch.keySet, "every item must be voted")
      val diff = streamed.collect { case (k, v) if batch(k) != v => k }
      assert(diff.isEmpty,
        s"stream and batch votes disagree on ${diff.take(5)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("event-time TTL drops closed items' state; live items still match batch") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    // TTL 30 s of event time, zero watermark delay. Batches:
    //   b0: item 1 (rater 0 → R) and item 2 (rater 0 → A) at 10 s
    //   b1: item 2 again (rater 1 → R) at 100 s   → watermark 100 s
    //   b2: item 3 at 200 s → the sweep fires item 1's timeout
    //       (10+30 < 100): state removed, NOTHING emitted.
    //       item 2 is re-armed to 130 s and stays alive this sweep.
    //   b3: item 1 again (rater 1 → A) at 210 s → FRESH state: the
    //       expired rater-0 vote must be gone (n_raters 1, seq 1)
    val staged = Files.createTempDirectory("jud_ttl")
    stageFile(Seq((1L, 0L, "R", t(10)), (2L, 0L, "A", t(10)))
      .toDF("item", "rater", "label", "ts"), staged, "b0.parquet")
    stageFile(Seq((2L, 1L, "R", t(100)))
      .toDF("item", "rater", "label", "ts"), staged, "b1.parquet")
    stageFile(Seq((3L, 0L, "N", t(200)))
      .toDF("item", "rater", "label", "ts"), staged, "b2.parquet")
    stageFile(Seq((1L, 1L, "A", t(210)))
      .toDF("item", "rater", "label", "ts"), staged, "b3.parquet")
    val q = JudgmentStreams.voteStreamTtl(spark, staged.toString,
        java.time.Duration.ofSeconds(30), "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("vote_ttl")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("vote_ttl").collect()
        .map(r => (r.getAs[Long]("item"), r.getAs[String]("vlabel"),
          r.getAs[Long]("n_raters"), r.getAs[Long]("seq")))
      // expiry emits nothing: item 1 has exactly its b0 and b3 updates,
      // item 2 exactly b0 and b1 (no third row from its own timeout)
      val i1 = rows.filter(_._1 == 1L).sortBy(_._4)
      val i2 = rows.filter(_._1 == 2L).sortBy(_._4)
      assert(i1.length == 2 && i2.length == 2,
        s"timeout sweeps must not emit: ${rows.toSeq}")
      // fresh state after expiry: rater 0's R is gone, not stitched
      assert(i1.head == ((1L, "R", 1L, 1L)))
      assert(i1.last == ((1L, "A", 1L, 1L)),
        s"expired item must restart from scratch: ${i1.last}")
      // the live-window item matches the batch twin over its history:
      // {0→A, 1→R} ties 1-1 → label-asc tie-break → A, 2 raters
      assert(i2.last == ((2L, "A", 2L, 2L)))
    } finally q.stop()
  }

  test("incremental min-label collapse and batch tie-break on a crafted stream") {
    // two microbatches: rater 0 says 'R' first (vote R), then rater 0
    // says 'A' (collapse to A) and rater 1 says 'R' — counts tie 1-1,
    // batch tie-break (count desc, label asc) → 'A'
    val staged = Files.createTempDirectory("jud_tiny")
    stageFile(Seq((1L, 0L, "R")).toDF("item", "rater", "label"),
      staged, "t0.parquet")
    stageFile(Seq((1L, 0L, "A"), (1L, 1L, "R"))
      .toDF("item", "rater", "label"), staged, "t1.parquet")
    val q = JudgmentStreams.voteStreamUnbounded(spark, staged.toString)
      .writeStream.outputMode("append").format("memory").queryName("vote_tiny")
      .start()
    try {
      q.processAllAvailable()
      val ups = spark.table("vote_tiny")
        .orderBy($"seq").collect()
        .map(r => (r.getAs[Long]("seq"), r.getAs[String]("vlabel"),
          r.getAs[Long]("n_raters")))
      assert(ups.head == ((1L, "R", 1L)), s"first batch vote: ${ups.head}")
      assert(ups.last == ((3L, "A", 2L)),
        s"collapse + tie-break must yield A with 2 raters: ${ups.last}")
    } finally q.stop()
  }
}
