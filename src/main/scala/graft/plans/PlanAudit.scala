package graft.plans

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Executed-plan scale audit (VERDICT r9 ask #3): a
  * [[QueryExecutionListener]] that runs the ScaleGuard shape checks —
  * data-sized broadcast HINTS and cartesian-class joins with both
  * sides data-sized — on EVERY plan the session executes, not just the
  * plan a query function returns.
  *
  * Why it exists: the three repo audit-locks walk the RETURNED plan,
  * but iterative query bodies (the CC label loop, BFS, PageRank/HITS)
  * execute their own internal plans through eager actions —
  * `localCheckpoint()`, `count()`, `isEmpty` — that the locks
  * structurally never see; VERDICT r9 finding #1's loop-internal
  * broadcast hints were invisible to all three. Dataset actions route
  * through `withAction`, which notifies the session's
  * `ExecutionListenerManager`, so every such internal plan lands here.
  *
  * The listener ACCUMULATES violations instead of throwing: listener
  * exceptions are swallowed by the bus, so enforcement is a post-sweep
  * assertion — Verify/Bench install one per session and fail loudly at
  * the end; the executed-plan specs drain it per query. The bus is
  * async: call [[PlanAudit.flush]] (listener-bus drain) before reading
  * [[violations]]. */
class PlanAudit extends QueryExecutionListener {
  private val found = new ConcurrentLinkedQueue[String]()

  private def check(funcName: String, qe: QueryExecution): Unit =
    // the audit must never fail or slow the query it observes; any
    // analysis error here is a bug in the audit, not the plan
    try {
      ScaleGuard.broadcastHintViolations(qe.optimizedPlan).foreach(h =>
        found.add(s"[$funcName] data-sized BROADCAST hint on:\n${h.treeString}"))
      ScaleGuard.cartesianViolations(qe.optimizedPlan).foreach(j =>
        found.add(s"[$funcName] cartesian-class join, both sides " +
          s"data-sized:\n${j.treeString}"))
    } catch { case _: Throwable => () }

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = check(funcName, qe)

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit = check(funcName, qe)

  def violations: Seq[String] = {
    import scala.jdk.CollectionConverters._
    found.asScala.toSeq
  }

  /** Read-and-clear, for per-query spec loops. */
  def drain(): Seq[String] = {
    val v = violations
    found.clear()
    v
  }
}

object PlanAudit {
  def install(spark: SparkSession): PlanAudit = {
    val l = new PlanAudit
    spark.listenerManager.register(l)
    l
  }

  /** Drain the async listener bus so every callback for completed
    * actions has been delivered before violations are read. */
  def flush(spark: SparkSession): Unit =
    org.apache.spark.GraftListenerBusBridge.flush(spark.sparkContext)
}
