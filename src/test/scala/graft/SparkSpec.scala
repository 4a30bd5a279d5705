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

  /** Unpartitioned-window scale rule (VERDICT r5 #1/#7, sharpened per
    * VERDICT r6 #3): a WindowExec whose partitionSpec is EMPTY — or
    * made only of constants/booleans, a ≤2-partition window and thus
    * the same global sort in disguise (q265's pre-fix shape) — is a
    * single-partition sort, so it may only sit above a relation that
    * is provably BOUNDED. Bounded now means: EVERY path from the
    * window's child down to a data-source scan passes through a
    * bounding node — a global limit / top-k cut, or an aggregation
    * whose grouping keys are bounded-domain (value histogram, spine,
    * dim table). Grouping directly on a fact-table key attribute
    * (custkey / orderkey / doc_id / user_id / ...) is NOT bounding:
    * those key domains scale linearly with the data (q226's pre-fix
    * shape), and the old any-agg-in-subtree test even let a broadcast
    * 1-row agg on a join's other leg vouch for the unbounded main
    * branch. Anything else is a row-level global sort that dies at
    * 100 TB. */
  def badGlobalWindows(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Expression}
    import org.apache.spark.sql.types.BooleanType
    // (b) constant / boolean-only partitioning is "effectively empty"
    def effectivelyEmpty(ps: Seq[Expression]): Boolean =
      ps.forall(e => e.foldable || e.dataType == BooleanType)
    // (a) fact-table key attributes: unbounded domains. Matches bare
    // attribute names only — a DERIVED grouping expression over a key
    // (hash bucket, modulo, date part) has a generated alias like
    // "(o_custkey % 64)" and passes, which is the intent.
    val factKey = java.util.regex.Pattern.compile(
      "^[a-z]{0,2}_?(custkey|orderkey|partkey|suppkey)$" +
        "|^(doc_id|user_id|event_id|emb_id|id|query_id)$")
    def strip(e: Expression): Expression = e match {
      case a: Alias => strip(a.child)
      case c: Cast => strip(c.child)
      case other => other
    }
    def unboundedKey(e: Expression): Boolean = strip(e) match {
      case a: Attribute => factKey.matcher(a.name.toLowerCase).matches()
      case _ => false
    }
    def aggBounds(grouping: Seq[Expression], child: SparkPlan): Boolean =
      grouping.forall(g => !unboundedKey(g)) || bounded(child)
    def bounded(p: SparkPlan): Boolean = p match {
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec |
           _: CollectLimitExec => true
      case a: aggregate.HashAggregateExec =>
        aggBounds(a.groupingExpressions, a.child)
      case a: aggregate.ObjectHashAggregateExec =>
        aggBounds(a.groupingExpressions, a.child)
      case a: aggregate.SortAggregateExec =>
        aggBounds(a.groupingExpressions, a.child)
      case _: FileSourceScanExec | _: RowDataSourceScanExec |
           _: datasources.v2.BatchScanExec => false
      case q: adaptive.QueryStageExec => bounded(q.plan)
      case a: adaptive.AdaptiveSparkPlanExec => bounded(a.executedPlan)
      case r: exchange.ReusedExchangeExec => bounded(r.child)
      case r: ReusedSubqueryExec => bounded(r.child)
      case leaf if leaf.children.isEmpty => true // literal/range/local
      case other => other.children.forall(bounded)
    }
    allPlanNodes(plan).collect {
      case w: WindowExec
          if effectivelyEmpty(w.partitionSpec) && !bounded(w.child) => w
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
