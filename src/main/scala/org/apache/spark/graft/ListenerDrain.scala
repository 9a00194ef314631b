package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-only shim into `private[spark]` surface: the listener bus
  * delivers task-end events ASYNCHRONOUSLY, so a per-query metrics
  * delta read right after an action can miss the tail of the query's
  * own tasks (and bill them to the next query). Draining the bus
  * between the action and the read makes the per-query attribution
  * exact. Lives under `org.apache.spark` solely for access; nothing
  * else in the engine reaches Spark internals.
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
