package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: dump the formatted physical plan of one query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    SparkEntry.queries(name)(spark, d).explain("formatted")
    spark.stop()
  }
}
