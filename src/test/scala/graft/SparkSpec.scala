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

  /** Every physical node in an executed plan, descending through AQE
    * wrappers and materialized query stages (plain `.collect` on a
    * SparkPlan stops at stage boundaries, hiding most of the plan). */
  def allPlanNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allPlanNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allPlanNodes(q.plan)
    case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
      p +: allPlanNodes(r.child)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      p +: allPlanNodes(r.child)
    case _ => p +: p.children.flatMap(allPlanNodes)
  }

  /** Unpartitioned-window scale rule (VERDICT r5 #1/#7): a WindowExec
    * with an EMPTY partitionSpec is a single-partition global sort, so
    * it may only sit above a relation that is provably BOUNDED —
    * below it there must be (a) an aggregation (value histogram /
    * spine / decile table), (b) a limit (top-k cut), or (c) no data
    * source scan at all (pure literal/range relation). Anything else
    * is a row-level global sort that dies at 100 TB. */
  def badGlobalWindows(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.window.WindowExec
    def bounded(p: SparkPlan): Boolean = {
      val sub = allPlanNodes(p)
      val hasAggOrLimit = sub.exists {
        case _: aggregate.HashAggregateExec => true
        case _: aggregate.ObjectHashAggregateExec => true
        case _: aggregate.SortAggregateExec => true
        case _: GlobalLimitExec => true
        case _: TakeOrderedAndProjectExec => true
        case _: CollectLimitExec => true
        case _ => false
      }
      val hasScan = sub.exists {
        case _: FileSourceScanExec => true
        case _: RowDataSourceScanExec => true
        case _: datasources.v2.BatchScanExec => true
        case _ => false
      }
      hasAggOrLimit || !hasScan
    }
    allPlanNodes(plan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) => w
    }
  }

  /** Assert form of [[badGlobalWindows]] for single-query specs. Call
    * after an action so the AQE final plan is in place. */
  def assertNoRowLevelGlobalWindow(
      df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val bad = badGlobalWindows(df.queryExecution.executedPlan)
    assert(bad.isEmpty,
      s"$name has ${bad.size} unpartitioned row-level WindowExec(s):\n" +
        bad.map(_.treeString).mkString("\n"))
  }
}
