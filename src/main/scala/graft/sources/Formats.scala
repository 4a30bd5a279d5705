package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source formats beyond parquet (SURVEY.md §2.1): CSV/JSON/ORC with
  * explicit schemas (never inference on a hot path — schema inference
  * is a full extra scan at 100 TB), plus the raw-text ingest that the
  * scrape boundary maps to (S1/S4: page dumps in, rows out via pure
  * per-line parsing — a flatMap, not a crawler).
  */
object Formats {

  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)

  def readJson(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** PERMISSIVE JSON ingest with corrupt-record salvage — the U1/T16
    * retry-and-salvage discipline applied at the SOURCE: malformed
    * lines land in `_corrupt_record` instead of failing the scan
    * (FAILFAST) or silently vanishing (DROPMALFORMED). Returns (good
    * rows with the user schema, quarantine rows carrying the raw bad
    * line) so the pipeline loads what parses and files the rest for
    * the error digest — at 100 TB one bad crawl line must not kill a
    * stage, and dropping it unrecorded corrupts recall silently.
    *
    * Spark caveat encoded here: `_corrupt_record` must be part of the
    * scan schema to be populated, and a query that selects ONLY the
    * corrupt column is disallowed (Spark requires referencing data
    * columns alongside it), so the split is projected from one cached
    * full read. */
  def readJsonSalvage(s: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    val withCorrupt = schema
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val raw = s.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // one scan feeds both splits (and satisfies Spark's
               // no-corrupt-column-only-query rule)
    val good = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, quarantine)
  }

  /** S4 in-engine equivalent: raw results-page text → (row_idx, cells)
    * rows. One table row per line, cells separated by `;` — the shape
    * a fetcher outside the engine would dump. Pure Column ops: the
    * line index is captured at source (W1's ordering requirement). */
  def parseResultsDump(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.text(path)
      .select(monotonically_increasing_id().as("row_idx"),
        split($"value", ";").as("cells"))
      .filter(size(filter($"cells", c => c =!= "")) > 0)
  }
}
