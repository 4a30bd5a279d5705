package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One lazy local session per suite (spark_guide.md §ScalaTest). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // same extension set as the Verify/Bench builders: SQL-registered
    // graft functions (dot_q etc.) must resolve in tests too (q110)
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    // events testdata carries TIMESTAMP(NANOS); session-wide by design (documented)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
