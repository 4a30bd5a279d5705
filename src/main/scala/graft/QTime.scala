package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time a handful of queries (min of N noop-write runs)
  * without paying for the full Bench sweep. Usage:
  * `runMain graft.QTime <sfDir> <runs> <name> [name ...]` — env
  * SPARK_GRAFT_CPUS sets parallelism like Bench. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // same decoupling as Bench (VERDICT r14 ask #2): partitions track
      // data, not cores, so a CPUS=8 probe times cores — not a re-plan
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // static conf; override to probe codegen-compile cost (cache=1
      // forces a recompile of every fragment on every run, isolating
      // the cost an in-suite LRU eviction would charge the query)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      // SPARK_GRAFT_AUDIT=1 replicates Bench's audit surface (plan-time
      // ScaleGuard rule + executed-plan PlanAudit listener) so QTime
      // numbers are comparable to in-suite Bench numbers
      .config(graft.plans.ScaleGuard.EnabledKey,
        sys.env.get("SPARK_GRAFT_AUDIT").contains("1").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // SPARK_GRAFT_CONF="k=v;k=v" — extra RUNTIME SQL confs for A/B
    // probing (static confs still need the builder above)
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("SPARK_GRAFT_AUDIT").contains("1"))
      graft.plans.PlanAudit.install(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // SPARK_GRAFT_PRERUN=1 reproduces in-suite conditions: one untimed
    // pass over the ENTIRE suite first, so the timed queries below see
    // the same JVM (code cache, codegen LRU, heap) state they'd see in
    // Bench's second pass — isolation numbers lie when the suite-level
    // JVM state is the regression (r11 q286/q109 were 1× isolated, 4×
    // in-suite)
    if (sys.env.get("SPARK_GRAFT_PRERUN").contains("1")) {
      SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.toLowerCase.contains("code"))
        .foreach(p => println(f"POOL ${p.getName}%-28s used=${p.getUsage.getUsed / 1e6}%.1fMB max=${p.getUsage.getMax / 1e6}%.1fMB"))
    }
    // jobs/stages per steady-state run (last run's delta): the counts
    // that tell a many-stage query from a slow-scan one. Listener
    // events land asynchronously, so counts can bleed ±1 across
    // snapshots — triage precision, not accounting
    val counter = JobCounter.install(spark)
    names.foreach { n =>
      var lastJobs = 0L; var lastStages = 0L
      val ts = (1 to runs).map { _ =>
        val (j0, s0) = counter.snapshot
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50) // let the listener bus catch up
        val (j1, s1) = counter.snapshot
        lastJobs = j1 - j0; lastStages = s1 - s0
        dt
      }
      println(f"QTIME $n%-28s min=${ts.min}%.3f jobs=$lastJobs stages=$lastStages all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
