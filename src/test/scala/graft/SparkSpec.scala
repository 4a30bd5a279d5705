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
  // (a) fact-table key attributes: unbounded domains. Matches bare
  // attribute names only — a DERIVED grouping expression over a key
  // (hash bucket, modulo, date part) has a generated alias like
  // "(o_custkey % 64)" and passes, which is the intent.
  private val factKey = java.util.regex.Pattern.compile(
    "^[a-z]{0,2}_?(custkey|orderkey|partkey|suppkey)$" +
      "|^(doc_id|user_id|event_id|emb_id|id|query_id|vec_id)$")

  /** Fixed-cardinality dimension tables: bounded BY SCHEMA (their row
    * counts do not scale with SF — region 5, nation 25), so a scan of
    * them is a bounded relation even though it is a file scan. */
  private val dimTables = Set("region.parquet", "nation.parquet")

  /** Core boundedness predicate shared by the window audit
    * ([[badGlobalWindows]]) and the broadcast audit ([[badBroadcasts]]):
    * a relation is BOUNDED when every path from it down to a
    * data-source scan passes through a bounding node — a global
    * limit / top-k cut, an aggregation whose grouping keys are
    * bounded-domain, a literal id-prefix filter (`vec_id < 20`: an
    * explicit bounded query-id sample, parquet-pruned at scale), or a
    * fixed-cardinality dim-table scan. Grouping directly on a
    * fact-table key attribute is NOT bounding (those domains scale
    * linearly with the data), and — ADVICE r7 — neither is a
    * checkpoint / cache scan (`RDDScanExec` / `InMemoryTableScanExec`):
    * materialization erases provenance, so a checkpointed fact-sized
    * relation must not silently pass. */
  private def strip(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = e match {
    case a: org.apache.spark.sql.catalyst.expressions.Alias => strip(a.child)
    case c: org.apache.spark.sql.catalyst.expressions.Cast => strip(c.child)
    case other => other
  }

  private def unboundedKey(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    strip(e) match {
      case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
        factKey.matcher(a.name.toLowerCase).matches()
      case _ => false
    }

  private def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** A conjunct pinning an id-like attribute to/below a SMALL integer
    * literal selects a bounded id-domain (an explicit prefix sample):
    * `vec_id < 20`, `vec_id <= k`, `vec_id = k` — the predicate is
    * also exactly what parquet min/max pruning pushes down at scale. */
  private def idUpperBound(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def smallLit(l: Literal): Boolean = l.value match {
      case n: java.lang.Number => math.abs(n.longValue) <= 100000L
      case _ => false
    }
    e match {
      case LessThan(a, l: Literal) => unboundedKey(a) && smallLit(l)
      case LessThanOrEqual(a, l: Literal) => unboundedKey(a) && smallLit(l)
      case EqualTo(a, l: Literal) => unboundedKey(a) && smallLit(l)
      case EqualTo(l: Literal, a) => unboundedKey(a) && smallLit(l)
      case GreaterThan(l: Literal, a) => unboundedKey(a) && smallLit(l)
      case GreaterThanOrEqual(l: Literal, a) => unboundedKey(a) && smallLit(l)
      case _ => false
    }
  }

  def boundedRelation(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.catalyst.expressions.Expression
    def aggBounds(grouping: Seq[Expression], child: SparkPlan): Boolean =
      grouping.forall(g => !unboundedKey(g)) || bounded(child)
    def dimScan(f: FileSourceScanExec): Boolean =
      f.relation.location.rootPaths.forall(p =>
        dimTables.exists(t => p.toString.endsWith(t)))
    def bounded(p: SparkPlan): Boolean = p match {
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec |
           _: CollectLimitExec => true
      case a: aggregate.HashAggregateExec =>
        aggBounds(a.groupingExpressions, a.child)
      case a: aggregate.ObjectHashAggregateExec =>
        aggBounds(a.groupingExpressions, a.child)
      case a: aggregate.SortAggregateExec =>
        aggBounds(a.groupingExpressions, a.child)
      case f: FilterExec if conjuncts(f.condition).exists(idUpperBound) => true
      case f: FileSourceScanExec => dimScan(f)
      case _: RowDataSourceScanExec | _: datasources.v2.BatchScanExec => false
      // checkpoint/cache scans: provenance erased ⇒ NOT bounded
      case _: RDDScanExec | _: ExternalRDDScanExec[_] |
           _: columnar.InMemoryTableScanExec => false
      case q: adaptive.QueryStageExec => bounded(q.plan)
      case a: adaptive.AdaptiveSparkPlanExec => bounded(a.executedPlan)
      case r: exchange.ReusedExchangeExec => bounded(r.child)
      case r: ReusedSubqueryExec => bounded(r.child)
      // remaining leaves are literal-backed: LocalTableScan / Range /
      // OneRowRelation (every data/RDD/cache scan is matched above)
      case leaf if leaf.children.isEmpty => true
      case other => other.children.forall(bounded)
    }
    bounded(p)
  }

  def badGlobalWindows(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.types.BooleanType
    // (b) constant / boolean-only partitioning is "effectively empty"
    def effectivelyEmpty(ps: Seq[Expression]): Boolean =
      ps.forall(e => e.foldable || e.dataType == BooleanType)
    allPlanNodes(plan).collect {
      case w: WindowExec
          if effectivelyEmpty(w.partitionSpec) && !boundedRelation(w.child) => w
    }
  }

  /** Logical twin of [[boundedRelation]], for plans where the physical
    * tree is not yet decorated with exchanges (pre-AQE). Same rule:
    * bounded ⟺ every path to a source relation passes a limit, a
    * bounded-domain aggregate, a literal id-prefix filter, or a
    * fixed-cardinality dim scan; LogicalRDD (checkpoint) and cached
    * InMemoryRelation erase provenance ⇒ NOT bounded. */
  def boundedLogical(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit | _: LocalLimit => true
      case a: Aggregate =>
        a.groupingExpressions.forall(g => !unboundedKey(g)) || bounded(a.child)
      case f: Filter if conjuncts(f.condition).exists(idUpperBound) => true
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.forall(rp =>
          dimTables.exists(t => rp.toString.endsWith(t)))
        case _ => false
      }
      case _: LogicalRDD | _: InMemoryRelation => false
      case _: LocalRelation | _: OneRowRelation | _: Range => true
      case leaf if leaf.children.isEmpty => false // unknown source: assume data-sized
      case other => other.children.forall(bounded)
    }
    bounded(p)
  }

  /** Data-sized-broadcast scale rule (VERDICT r7 #2, the window rule's
    * twin): a join side carrying an explicit BROADCAST hint must be a
    * provably BOUNDED relation (same predicate as the window audit),
    * because a `broadcast()` hint FORCES the ship-to-every-executor
    * plan at ANY scale — q383's pre-fix shape (and an O(N²) nested
    * loop when the join is non-equi). Planner-chosen broadcasts are
    * deliberately exempt: they are stats-driven and AQE re-plans them
    * to shuffle joins when the size estimate grows, so only the hint
    * pins a data-sized broadcast at 100 TB. Walks the optimized
    * logical plan, where hints survive on the Join nodes. */
  def badBroadcasts(qe: org.apache.spark.sql.execution.QueryExecution)
      : Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join}
    def isB(h: Option[HintInfo]) = h.exists(_.strategy.contains(BROADCAST))
    qe.optimizedPlan.collect {
      case j: Join =>
        (if (isB(j.hint.leftHint) && !boundedLogical(j.left)) Seq(j.left) else Nil) ++
          (if (isB(j.hint.rightHint) && !boundedLogical(j.right)) Seq(j.right) else Nil)
    }.flatten
  }

  /** Cartesian-class-join scale rule (VERDICT r8 #1, closing the hole
    * [[badBroadcasts]] structurally cannot see): a logical Join with NO
    * equi-join key — a theta/range join or a bare cross join — can only
    * execute as CartesianProduct or a nested loop, O(|L|·|R|) predicate
    * evaluations. That is fine when at least ONE side is provably
    * BOUNDED (the q383 shape: a capped query set streaming against the
    * corpus is O(N·cap)), and a cluster-killer when BOTH sides are
    * data-sized (q45's pre-fix all-pairs shape) — invisible to the
    * broadcast audit because planner-CHOSEN nested loops carry no hint.
    * Walks the optimized logical plan (post pushdown/pruning, where
    * join conditions are in final conjunct form). */
  def badNestedLoops(qe: org.apache.spark.sql.execution.QueryExecution)
      : Seq[org.apache.spark.sql.catalyst.plans.logical.Join] = {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // an equi conjunct splits cleanly across the two join sides (each
    // side of the = referencing exactly one child's output)
    def splits(a: Expression, b: Expression, j: Join): Boolean = {
      def oneSide(e: Expression, s: org.apache.spark.sql.catalyst.expressions.AttributeSet) =
        e.references.nonEmpty && e.references.subsetOf(s)
      (oneSide(a, j.left.outputSet) && oneSide(b, j.right.outputSet)) ||
        (oneSide(b, j.left.outputSet) && oneSide(a, j.right.outputSet))
    }
    def hasEquiKey(j: Join): Boolean =
      j.condition.toSeq.flatMap(conjuncts).exists {
        case EqualTo(a, b) => splits(a, b, j)
        case EqualNullSafe(a, b) => splits(a, b, j)
        case _ => false
      }
    qe.optimizedPlan.collect {
      case j: Join if !hasEquiKey(j) &&
          !boundedLogical(j.left) && !boundedLogical(j.right) => j
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
