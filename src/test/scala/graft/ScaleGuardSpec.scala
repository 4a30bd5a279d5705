package graft

import org.apache.spark.sql.functions._

/** The plan-time scale guard (graft.plans.ScaleGuardRule, injected via
  * GraftExtensions as a query-stage-prep rule): with
  * `spark.graft.scaleGuard.enabled=true` — as the Verify and Bench
  * sessions set it — a cartesian-class physical join with BOTH sides
  * data-sized refuses to execute, while the engine's bounded shapes
  * (q45's capped all-pairs, q383's capped-broadcast hubness scan) run
  * normally. This is the production enforcement of the rule the
  * `NestedLoopShapeSpec` audit-lock proves over the whole suite. */
class ScaleGuardSpec extends SparkSpec {
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  private def withGuard[T](body: => T): T = {
    spark.conf.set(graft.plans.ScaleGuard.EnabledKey, "true")
    try body
    finally spark.conf.set(graft.plans.ScaleGuard.EnabledKey, "false")
  }

  test("an unbounded theta self-join refuses to execute under the guard") {
    val e = io.Tables.embeddings(spark, d)
    val bad = e.select($"vec_id".as("id1"))
      .join(e.select($"vec_id".as("id2")), $"id1" < $"id2")
    withGuard {
      val ex = intercept[Throwable] { bad.count() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("GRAFT_SCALE_GUARD")),
        s"expected the scale guard to fire, got: $ex")
    }
    // and without the guard the same plan is allowed (test-scale runs)
    assert(bad.count() > 0)
  }

  test("the guard also fires with AQE DISABLED (ADVICE r9 #2: pre-columnar path)") {
    // injectQueryStagePrepRule runs only inside AdaptiveSparkPlanExec;
    // the ScaleGuardColumnarRule covers the classic preparations chain
    val e = io.Tables.embeddings(spark, d)
    val bad = e.select($"vec_id".as("id1"))
      .join(e.select($"vec_id".as("id2")), $"id1" < $"id2")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withGuard {
      val ex = intercept[Throwable] { bad.count() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("GRAFT_SCALE_GUARD")),
        s"guard did not fire with AQE off, got: $ex")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("a statically-huge Range is cartesian fuel, not a bounded grid (ADVICE r9 #3)") {
    import graft.plans.ScaleGuard
    // range(2^40) would let an opt-in user plan an O(N²) self-join the
    // guard waves through; numElements is statically known on the node
    val big = spark.range(1L << 40)
    assert(!ScaleGuard.boundedRelation(big.queryExecution.sparkPlan),
      "range(2^40) classified bounded (physical)")
    assert(!ScaleGuard.boundedLogical(big.queryExecution.optimizedPlan),
      "range(2^40) classified bounded (logical)")
    val small = spark.range(1024)
    assert(ScaleGuard.boundedRelation(small.queryExecution.sparkPlan))
    assert(ScaleGuard.boundedLogical(small.queryExecution.optimizedPlan))
    // end-to-end: the engine's small literal grids still run under the guard
    withGuard {
      val grid = spark.range(16).toDF("a")
        .join(spark.range(16).toDF("b"), $"a" < $"b")
      assert(grid.count() > 0)
    }
  }

  test("with AQE ON, a no-exchange cartesian still hits the guard (ADVICE r10 #4)") {
    // InsertAdaptiveSparkPlan declines to wrap a plan with no exchange
    // and no subquery, so the query-stage-prep rule never fires on it;
    // a bare CartesianProductExec of two scans is exactly that shape.
    // autoBroadcastJoinThreshold=-1 forces CartesianProduct over BNLJ
    // (a broadcast build WOULD add an exchange and get AQE-wrapped),
    // and the noop write adds no aggregation exchange either.
    val e = io.Tables.embeddings(spark, d)
    val bad = e.select($"vec_id".as("id1"))
      .join(e.select($"vec_id".as("id2")), $"id1" < $"id2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withGuard {
      val ex = intercept[Throwable] {
        bad.write.format("noop").mode("overwrite").save()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("GRAFT_SCALE_GUARD")),
        s"guard did not fire on the AQE-exempt no-exchange plan, got: $ex")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("a registered bounded dim classifies bounded; unregistered does not (VERDICT r10 ask #3)") {
    import graft.plans.ScaleGuard
    // a library user's own fixed-cardinality dimension — not one of the
    // {region,nation} defaults — registered via the session conf
    val dir = java.nio.file.Files.createTempDirectory("graft_dim").toString
    val path = s"$dir/channels.parquet"
    spark.range(7).selectExpr("id AS channel_id", "concat('ch_', id) AS name")
      .coalesce(1).write.mode("overwrite").parquet(path)
    def plans() = {
      val df = spark.read.parquet(path)
      (df.queryExecution.optimizedPlan, df.queryExecution.sparkPlan)
    }
    val (l0, p0) = plans()
    assert(!ScaleGuard.boundedLogical(l0), "unregistered scan classified bounded")
    assert(!ScaleGuard.boundedRelation(p0))
    spark.conf.set(ScaleGuard.DimPathsKey, "channels.parquet, other_dim.parquet")
    try {
      val (l1, p1) = plans()
      assert(ScaleGuard.boundedLogical(l1),
        "registered dim scan not classified bounded (logical)")
      assert(ScaleGuard.boundedRelation(p1),
        "registered dim scan not classified bounded (physical)")
      // the hardcoded defaults still classify with the registry set
      val nation = spark.read.parquet(s"$d/nation.parquet")
      assert(ScaleGuard.boundedLogical(nation.queryExecution.optimizedPlan))
    } finally spark.conf.unset(ScaleGuard.DimPathsKey)
    val (l2, p2) = plans()
    assert(!ScaleGuard.boundedLogical(l2), "registry did not reset with the conf")
    assert(!ScaleGuard.boundedRelation(p2))
  }

  test("broadcastIfSmall refuses a proof limit that cannot fit in Int (ADVICE r10 #1)") {
    import graft.plans.ScaleGuard
    val df = spark.range(10).toDF("id")
    // a wrapped toInt would silently DROP rows while the gate passes
    val ex = intercept[IllegalArgumentException] {
      ScaleGuard.broadcastIfSmall(df, measuredRows = 5L,
        maxRows = Int.MaxValue.toLong + 1)
    }
    assert(ex.getMessage.contains("does not fit in Int"))
    // the in-range path still stamps the no-op limit and preserves rows
    val ok = ScaleGuard.broadcastIfSmall(df, measuredRows = 10L, maxRows = 1024L)
    assert(ok.count() == 10)
  }

  test("the engine's bounded cartesian-class shapes still run under the guard") {
    withGuard {
      // q45: both sides under the plan-enforced MaxExactPairSide limit
      assert(operators.Similarity.q45EmbeddingNearDup(spark, d).count() > 0)
      // q383: bounded (sampled + capped) broadcast side nested loop
      assert(operators.Similarity.q383HubnessAudit(spark, d).count() > 0)
    }
  }
}
