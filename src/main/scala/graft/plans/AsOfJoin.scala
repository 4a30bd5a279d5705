package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** AS-OF JOIN as a first-class Catalyst operator (SURVEY.md §7.3
  * ladder rung (c): custom LogicalPlan + SparkStrategy + SparkPlan) —
  * the canonical time-series operator Spark lacks natively: for every
  * left row, attach the LATEST right row of the same key whose time is
  * at or before the left row's time (left-outer semantics).
  *
  * Physical design: both sides are hash-clustered on the key and
  * sorted by (key, time) — EnsureRequirements inserts the exchanges
  * and sorts from `requiredChildDistribution`/`requiredChildOrdering`,
  * exactly like SortMergeJoin — then a single streaming merge pass per
  * partition zips them with O(1) state (one buffered right row). At
  * 100 TB this is one shuffle per side and no per-row search: strictly
  * cheaper than the window-function rewrite (non-equi join + rank),
  * which materializes every candidate pair.
  *
  * v1 constraints (checked at plan build in [[AsOf.join]]): keys are
  * non-null LongType, times are TimestampType/LongType (both are
  * int64 internally). Among right rows with IDENTICAL (key, time) the
  * winner is shuffle-order dependent — like any sort on a non-unique
  * key; callers needing total determinism must dedup or add a
  * tiebreak column to the time.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val nRight = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // SparkPlan's implicit contract (getByteArrayRdd, UnsafeRowSerializer,
      // SortExec) requires UnsafeRow output — project the JoinedRow through
      // an UnsafeProjection per partition, mirroring SortMergeJoinExec's
      // resultProj.
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new Iterator[InternalRow] {
        private var rHead: InternalRow = _ // lookahead, copied
        private var lastMatch: InternalRow = _ // latest right row for key
        private var lastMatchKey: Long = _
        private var haveMatch = false
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lu = lk.eval(l).asInstanceOf[Long]
          val ltv = lt.eval(l).asInstanceOf[Long]
          var scanning = true
          while (scanning) {
            if (rHead == null) {
              if (rIter.hasNext) rHead = rIter.next().copy() else scanning = false
            }
            if (rHead != null) {
              val ru = rk.eval(rHead).asInstanceOf[Long]
              val rtv = rt.eval(rHead).asInstanceOf[Long]
              if (ru < lu || (ru == lu && rtv <= ltv)) {
                if (ru == lu) { lastMatch = rHead; lastMatchKey = lu; haveMatch = true }
                rHead = null // rows for earlier keys can never match later lefts
              } else scanning = false
            }
          }
          if (haveMatch && lastMatchKey == lu) joiner(l, lastMatch)
          else joiner(l, nullRight)
        }
      }
      joined.map(resultProj)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Optimizer integration for the custom node: Catalyst's own
  * PushDownPredicates only understands built-in operators, so a Filter
  * written ABOVE an as-of join (`AsOf.join(...).filter(...)`) would
  * otherwise run after the two shuffles and the merge — at 100 TB that
  * is the difference between shuffling the filtered slice and shuffling
  * the whole fact table, and it silently severs the chain to parquet
  * PushedFilters (FileSourceStrategy can only collect predicates that
  * sit over the scan).
  *
  * Soundness: an as-of join emits EXACTLY ONE output row per left row,
  * computed independently of every other left row — so any
  * deterministic predicate over left-side columns commutes with the
  * join. Right-side (or mixed) predicates do NOT: dropping a right row
  * changes which row is "latest at-or-before" for the lefts behind it,
  * so they stay above the join (same reason outer-join pushdown rules
  * never push into the preserved side's opposite). Non-deterministic
  * predicates never move (standard Catalyst contract).
  *
  * Injected via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`, the user-provided batch — runs to fixpoint,
  * and this rule is convergent: after one firing the residual Filter
  * contains no pushable conjunct). */
object PushFilterThroughAsOfJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j @ AsOfJoin(l, _, _, _, _, _)) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(l.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), l))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

/** Public API: `AsOf.join(purchases, clicks, "user_id", "ts", ...)`.
  * Registers the planner strategy on the session if absent (also
  * injected by [[graft.functions.GraftExtensions]] at session build). */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    // the documented v1 constraints, enforced at plan build: the exec
    // evals keys/times as raw longs, so a wrong type would surface as a
    // ClassCastException (or a silent null→0L join) at runtime. Null
    // keys/times are dropped up front (parquet schemas are always
    // nullable even when the data isn't).
    import org.apache.spark.sql.functions.col
    val l2 = left.filter(col(leftKey).isNotNull && col(leftTime).isNotNull)
    val r2 = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    val lp = ColumnBridge.analyzed(l2)
    val rp = ColumnBridge.analyzed(r2)
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name).mkString(",")}"))
    def checkKey(a: Attribute): Attribute = {
      require(a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of key ${a.name} must be LongType, got ${a.dataType.simpleString}")
      a
    }
    def checkTime(a: Attribute): Attribute = {
      require(a.dataType == org.apache.spark.sql.types.TimestampType ||
        a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of time ${a.name} must be TimestampType/LongType, got ${a.dataType.simpleString}")
      a
    }
    ColumnBridge.ofRows(spark, AsOfJoin(lp, rp,
      checkKey(attr(lp, leftKey)), checkTime(attr(lp, leftTime)),
      checkKey(attr(rp, rightKey)), checkTime(attr(rp, rightTime))))
  }
}
