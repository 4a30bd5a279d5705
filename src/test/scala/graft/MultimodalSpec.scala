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

  test("typed frame extraction samples the same frame_nos as q51") {
    val d = "/root/testdata/sf0.001"
    val exprFrames = Multimodal.q51FrameSample(spark, d)
      .select($"doc_id", $"frame_no")
      .as[(Long, Long)].collect().toSet
    val typedIn = graft.io.Tables.documents(spark, d)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaIn]
    val typed = Multimodal.sampleFramesTyped(typedIn)
    val typedFrames = typed.map(f => (f.doc_id, f.frame_no)).collect().toSet
    assert(typedFrames == exprFrames)
    // ≤ 8 frames sampled per doc, stub payloads deterministic + non-empty
    val perDoc = typed.groupByKey(_.doc_id).count().collect()
    assert(perDoc.nonEmpty && perDoc.forall(_._2 <= 8))
    assert(typed.head().frame_bytes.length == 16) // md5 stub payload
  }

  test("frame extraction is partitioning-invariant (batch boundaries don't leak)") {
    val rows = (0L until 50L)
      .map(i => MediaIn(i, s"payload-$i".getBytes("UTF-8")))
    val one = Multimodal.sampleFramesTyped(
      spark.createDataset(rows).repartition(1))
      .collect().map(f => (f.doc_id, f.frame_no, f.frame_bytes.toSeq)).toSet
    val many = Multimodal.sampleFramesTyped(
      spark.createDataset(rows).repartition(7))
      .collect().map(f => (f.doc_id, f.frame_no, f.frame_bytes.toSeq)).toSet
    assert(one == many && one.nonEmpty)
  }

  test("q97 closed-form budget == q51 explode-and-count per doc") {
    val d = "/root/testdata/sf0.001"
    val fromExplode = Multimodal.q51FrameSample(spark, d)
      .groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max($"n_patches").as("p"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, p) => id -> ((n, p)) }.toMap
    val budget = Multimodal.q97MmBudget(spark, d)
      .select($"doc_id", $"n_sampled", $"n_patches")
      .as[(Long, Long, Long)].collect()
    assert(budget.nonEmpty)
    budget.foreach { case (id, ns, np) =>
      val (n, p) = fromExplode(id)
      assert(ns == n && np == p, s"doc $id: closed form ($ns,$np) vs explode ($n,$p)")
    }
  }
}
