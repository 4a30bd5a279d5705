package graft

import graft.streaming.EventStreams

/** Drives the Structured Streaming path end to end on the sf0.001
  * events parquet via the memory sink and checks it agrees with the
  * same transform run in batch (the unification guarantee; complete
  * output mode because the aggregation is the whole query). */
class StreamingSpec extends SparkSpec {

  test("streaming hourly windows == batch hourly windows on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val batch = EventStreams.hourlyCounts(
        spark.read.schema(EventStreams.rawSchema)
          .parquet(s"$dir/events.parquet"))
      .collect().map(_.toSeq).toSet

    // the file stream source wants a directory: stage one
    val staged = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))

    val q = EventStreams.hourlyCountsStream(spark, staged.toString)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out").collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
