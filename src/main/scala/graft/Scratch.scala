package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scratch: stage-by-stage timing of q465 (deleted at round
  * close; exempt from the checkpoint lint). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // warm
    operators.Eval.q465BradleyTerry(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()

    def pairs() = graft.io.Tables.lineitem(spark, d)
      .select($"l_orderkey".as("ord"), $"l_suppkey".as("sk"),
        (($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(18,2)") * 100).cast("long").as("c"))
      .repartition($"ord")
      .groupBy($"ord", $"sk").agg(sum($"c").as("rev"))
      .groupBy($"ord")
      .agg(collect_list(struct($"sk", $"rev")).as("bs"))
      .filter(size($"bs") >= 2)
      .select(explode(expr(
        """flatten(transform(bs, x ->
             transform(filter(bs, y -> y.sk > x.sk), y -> struct(
               x.sk AS lo, y.sk AS hi,
               CASE WHEN x.rev >= y.rev THEN 1L ELSE 0L END AS lo_win))))"""))
        .as("pr"))
      .select($"pr.lo", $"pr.hi", $"pr.lo_win")

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name%-24s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def sel() = graft.io.Tables.lineitem(spark, d)
      .select($"l_orderkey".as("ord"), $"l_suppkey".as("sk"),
        (($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(18,2)") * 100).cast("long").as("c"))
    time("a0_scan_sel") {
      sel().write.format("noop").mode("overwrite").save()
    }
    time("a1_repart") {
      sel().repartition($"ord").write.format("noop").mode("overwrite").save()
    }
    time("a2_agg1") {
      sel().repartition($"ord").groupBy($"ord", $"sk").agg(sum($"c").as("rev"))
        .write.format("noop").mode("overwrite").save()
    }
    time("a3_agg2_collect") {
      sel().repartition($"ord").groupBy($"ord", $"sk").agg(sum($"c").as("rev"))
        .groupBy($"ord").agg(collect_list(struct($"sk", $"rev")).as("bs"))
        .filter(size($"bs") >= 2)
        .write.format("noop").mode("overwrite").save()
    }
    time("a_front_noop") {
      pairs().write.format("noop").mode("overwrite").save()
    }
    time("b_pc_checkpoint") {
      pairs().groupBy($"lo", $"hi")
        .agg(count(lit(1)).as("n"), sum($"lo_win").as("w_lo"))
        .localCheckpoint().write.format("noop").mode("overwrite").save()
    }
    var pcSaved: DataFrame = null
    time("b2_pc_only") {
      pcSaved = pairs().groupBy($"lo", $"hi")
        .agg(count(lit(1)).as("n"), sum($"lo_win").as("w_lo"))
        .localCheckpoint()
    }
    time("c_p1_from_pc") {
      val sup = pcSaved.select(explode(array(
          struct($"lo".as("sk"), $"n", $"w_lo".as("w")),
          struct($"hi".as("sk"), $"n", ($"n" - $"w_lo").as("w")))).as("e"))
        .groupBy($"e.sk".as("sk"))
        .agg(sum($"e.n").as("games"), sum($"e.w").as("wins"))
      val p1 = sup.withColumn("p1_micro",
        expr("CAST(CAST(wins AS DECIMAL(38,0)) * 2000000 div games AS BIGINT)"))
        .localCheckpoint()
      val g = p1.agg(coalesce(sum($"games"), lit(0L))).as[Long].head()
      assert(g > 0)
    }
    time("d_full") {
      operators.Eval.q465BradleyTerry(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    // variant: no p1 checkpoint; int64 gate measured on pc (Σgames = 2Σn)
    time("e_no_p1_ckpt") {
      val pc = pairs().groupBy($"lo", $"hi")
        .agg(count(lit(1)).as("n"), sum($"lo_win").as("w_lo"))
        .localCheckpoint()
      val sup = pc.select(explode(array(
          struct($"lo".as("sk"), $"n", $"w_lo".as("w")),
          struct($"hi".as("sk"), $"n", ($"n" - $"w_lo").as("w")))).as("e"))
        .groupBy($"e.sk".as("sk"))
        .agg(sum($"e.n").as("games"), sum($"e.w").as("wins"))
      val p1 = sup.withColumn("p1_micro",
        expr("CAST(CAST(wins AS DECIMAL(38,0)) * 2000000 div games AS BIGINT)"))
      val int64Safe = pc.agg(coalesce(sum($"n"), lit(0L)).as("sg"))
        .select($"sg" * 2).as[Long].head() <= 8000000L
      def scaled(v: String, scale: String, den: String, castOut: Boolean = true) =
        if (int64Safe) expr(s"$v * ${scale}L div greatest($den, 1L)")
        else if (castOut) expr(
          s"CAST(CAST($v AS DECIMAL(38,0)) * $scale div greatest($den, 1L) AS BIGINT)")
        else expr(s"CAST($v AS DECIMAL(38,0)) * $scale div greatest($den, 1L)")
      val terms = pc
        .join(p1.select($"sk".as("lo"), $"p1_micro".as("pa")), "lo")
        .join(p1.select($"sk".as("hi"), $"p1_micro".as("pb")), "hi")
        .withColumn("t", scaled("n", "1000000000000", "pa + pb", castOut = false))
      val den = terms.select(explode(array(
          struct($"lo".as("sk"), $"t"), struct($"hi".as("sk"), $"t"))).as("e"))
        .groupBy($"e.sk".as("sk")).agg(sum($"e.t").as("denom"))
      p1.join(den, "sk")
        .select($"sk".as("suppkey"), $"games", $"wins", $"p1_micro",
          scaled("wins", "1000000000000", "denom").as("p2_micro"))
        .orderBy($"p2_micro".desc, $"suppkey").limit(20)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
