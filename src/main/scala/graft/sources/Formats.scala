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
