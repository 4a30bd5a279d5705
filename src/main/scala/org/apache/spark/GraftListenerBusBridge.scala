package org.apache.spark

/** Package-private-API bridge (same discipline as the JSONB dialect
  * bridge): `SparkContext.listenerBus` and `waitUntilEmpty` are
  * `private[spark]`, but flushing the shared async listener bus is the
  * only way a post-sweep assertion can know every
  * `QueryExecutionListener` callback for already-finished actions has
  * been DELIVERED — the bus is asynchronous, so "the action returned"
  * does not imply "the audit listener has seen its plan". Used by
  * `graft.plans.PlanAudit` in the Verify/Bench post-sweep checks and
  * the executed-plan audit specs. */
object GraftListenerBusBridge {
  /** Block until the async listener bus has drained (10 s cap — the
    * bus drains in milliseconds when healthy; the cap only bounds a
    * wedged listener thread). */
  def flush(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
