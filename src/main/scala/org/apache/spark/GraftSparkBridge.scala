package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]` — same pattern as
  * `sql.GraftColumnBridge` for the sql-private surface. Bench drains
  * the async listener bus between queries so per-query
  * `executorCpuTime` sums don't bleed into the next query's window.
  */
object GraftSparkBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
