package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

/** Dev utility: dump formatted physical plans of many queries to files.
  * Usage: runMain graft.ExplainDump <outDir> <suffix> <name> [<name>...]
  * Writes <outDir>/<name>_<suffix>.txt for each query.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val suffix = args(1)
    val dataDir = "/root/testdata/sf0.001"
    args.drop(2).foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, dataDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"ERROR dumping $name: ${e.getMessage}" }
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      println(s"[explaindump] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
