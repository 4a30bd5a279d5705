package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.10 north-star): the
  * events table as a stream — the same hourly windowed aggregation the
  * batch engine runs as q24, expressed once over an input DataFrame so
  * batch and streaming share the transform (the Structured Streaming
  * unification contract).
  *
  * Scale notes: the windowed aggregate carries a 2-hour watermark so
  * state is bounded (late events beyond it are dropped); parallelism
  * comes from the (window × event_type) grouping key like any hash
  * aggregation.
  */
object EventStreams {

  /** Read-side schema of the events parquet (ts as raw nanos — parquet
    * TIMESTAMP(NANOS) needs the nanosAsLong legacy read, Tables.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Shared transform: nanos → timestamp, watermark, 1-hour tumbling
    * windows per event type. Works on both batch and streaming inputs. */
  def hourlyCounts(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        $"event_type", $"n", $"total_value")
  }

  /** Streaming entry: file-source stream over the events parquet. The
    * file source wants a directory, so `eventsDir` must contain (only)
    * events parquet files — callers with a single-file layout stage a
    * directory (see StreamingSpec). */
  def hourlyCountsStream(s: SparkSession, eventsDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    hourlyCounts(s.readStream.schema(rawSchema).parquet(eventsDir))
  }
}
