package graft

import graft.operators.Corpus
import graft.streaming.DocStreams

/** Stream-static decontamination: the streamed per-doc probe must
  * agree with the batch q78 pipeline (broadcast semi-join + groupBy)
  * on the same corpus — two very different plans, one semantics. */
class DocStreamsSpec extends SparkSpec {

  test("streaming decontam == batch q78 on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val bench = DocStreams.benchmarkShingles(spark, d)
    assert(bench.nonEmpty)

    val batch = Corpus.q78Decontam(spark, d)
      .collect().map(_.toSeq).toSet

    val staged = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/documents.parquet"),
      staged.resolve("documents.parquet"))

    val q = DocStreams.decontamStream(spark, staged.toString, bench)
      .writeStream.outputMode("append")
      .format("memory").queryName("decontam_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("decontam_out").collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("decontam transform is stateless (no state store operators)") {
    val d = "/root/testdata/sf0.001"
    val bench = DocStreams.benchmarkShingles(spark, d)
    val staged = java.nio.file.Files.createTempDirectory("docs_stream2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$d/documents.parquet"),
      staged.resolve("documents.parquet"))
    val q = DocStreams.decontamStream(spark, staged.toString, bench)
      .writeStream.outputMode("append")
      .format("memory").queryName("decontam_stateless")
      .start()
    try {
      q.processAllAvailable()
      // a stateful plan would carry StateStoreSave/StateStoreRestore
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { q.explain(extended = false) }
      val plan = buf.toString
      assert(plan.nonEmpty && !plan.contains("StateStore"),
        s"unexpected state in:\n$plan")
      // and no aggregation state metrics were reported
      assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty))
    } finally q.stop()
  }
}
