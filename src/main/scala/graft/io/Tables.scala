package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables (TESTDATA.md /
  * FIXTURES.md §A). One parquet file per table under `$dir/`.
  *
  * All engine queries read through here so that scan-level concerns
  * (column pruning, predicate pushdown) stay visible in one place: we
  * hand Spark the bare parquet scan and let Catalyst prune/push —
  * never pre-`.cache()` or pre-`.collect()` at the source.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** The events table carries parquet TIMESTAMP(NANOS), which Spark 4
    * refuses outright; read it as raw nanos (legacy conf) and floor to a
    * microsecond TimestampType column. Oracle parity: DuckDB keeps full
    * nanos, so engine outputs derived from `ts` are always emitted at
    * second (or coarser) granularity, where floor(ns)==floor(µs). */
  def events(s: SparkSession, d: String): DataFrame = {
    // DELIBERATE session-global mutation, kept (unlike the streaming
    // readers, which require the builder-set conf): this is the one
    // entry point a driver-owned session (e.g. the smoke check calling
    // SparkEntry.entry) reaches without our builders, and without the
    // conf the read throws outright. The flag only affects parquet
    // files that actually carry TIMESTAMP(NANOS) — of the testdata,
    // exactly this table.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events")
      // integer division: ns values exceed 2^53, double `/` mis-truncates
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
