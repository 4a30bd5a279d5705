package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.Tables

/** Streaming twins of the corpus operators — documents as an unbounded
  * stream (continuous-ingest training pipelines: new crawl shards land
  * as files, each doc must be scored/filtered on arrival).
  *
  * The decontamination probe is the canonical STREAM-STATIC shape:
  * the benchmark shingle set is static and small (a benchmark suite),
  * the document stream is unbounded. Keeping the per-doc shingle set
  * as one array row (the single-pass ShingleHashes expression) makes
  * the whole probe STATELESS — `array_intersect` against the pinned
  * benchmark array is a per-row scalar op, so the query runs in
  * append mode with no watermark, no state store, and no shuffle.
  * That is the only shape that survives an endless stream: any
  * formulation that explodes shingles and re-aggregates per doc_id
  * would accumulate unbounded aggregation state.
  *
  * At real scale the pinned array is a broadcast variable per
  * executor (same memory budget as the batch q78 broadcast); if the
  * benchmark set ever outgrows memory, swap to a bloom-filter column
  * (build once, `might_contain` per row — still stateless).
  */
object DocStreams {

  /** Read-side schema of the documents parquet. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The static side: distinct benchmark shingle hashes (source =
    * 'src0'), collected once at stream start. Sorted for determinism. */
  def benchmarkShingles(s: SparkSession, d: String): Array[Long] = {
    import s.implicits._
    Tables.documents(s, d)
      .filter($"source" === "src0")
      .select(explode(
        graft.functions.TextExprs.shingle_hashes($"text", 3, 15)).as("sh"))
      .distinct()
      .as[Long].collect().sorted
  }

  /** Shared transform: per-doc contamination against the pinned
    * benchmark set. Works identically on batch and streaming inputs —
    * asserted equal to the batch q78 output in DocStreamsSpec. */
  def decontam(docs: DataFrame, bench: Array[Long]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .filter($"source" =!= "src0")
      .select($"doc_id",
        graft.functions.TextExprs.shingle_hashes($"text", 3, 15).as("shs"))
      .filter(size($"shs") > 0)
      .select($"doc_id",
        size($"shs").cast("long").as("n_shingles"),
        size(array_intersect($"shs", typedLit(bench))).cast("long").as("n_contam"))
      .withColumn("contam_permille", expr("n_contam * 1000 div n_shingles"))
  }

  /** Streaming entry: file-source stream over a staged documents dir,
    * decontaminated on arrival. Stateless → append mode. */
  def decontamStream(s: SparkSession, docsDir: String,
      bench: Array[Long]): DataFrame =
    decontam(
      s.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
        .parquet(docsDir),
      bench)
}
