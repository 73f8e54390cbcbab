package org.apache.spark

/** Deterministic listener-bus drain for the bench's per-query
  * telemetry snapshots. `SparkContext.listenerBus` is
  * `private[spark]`; this 1-method shim (same public-extension idiom
  * as `sql.GraftBridge`) exposes `waitUntilEmpty` so the bench can
  * wait for straggler task-end events instead of a fixed sleep —
  * otherwise late events get attributed to the FOLLOWING query's
  * telemetry row, which is exactly the drift-attribution signal the
  * telemetry exists to provide. No Spark internals are modified.
  */
object GraftListenerBridge {
  /** Block until the listener bus has delivered every queued event,
    * or `timeoutMillis` elapses (a bounded wait: telemetry is
    * diagnostics, a hung bus must not hang the bench).
    */
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
