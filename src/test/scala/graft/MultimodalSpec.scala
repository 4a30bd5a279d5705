package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaIn

/** The typed mapPartitions decode path must agree bit-for-bit with the
  * oracle-checked expression path — swapping the stub for a real codec
  * keeps the same plumbing. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("typed mapPartitions path == expression path on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val exprPath = Multimodal.q50MultimodalMeta(spark, d)
      .collect().map(_.toSeq).toSet
    val typedIn = graft.io.Tables.documents(spark, d)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaIn]
    val typedPath = Multimodal.decodePartitions(typedIn)
      .toDF().collect().map(_.toSeq).toSet
    assert(typedPath == exprPath)
    assert(typedPath.nonEmpty)
  }
}
