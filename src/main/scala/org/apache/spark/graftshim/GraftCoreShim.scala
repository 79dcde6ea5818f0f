package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Minimal `private[spark]` core bridge (same stance as
  * sql.graftshim.GraftSqlShim): one forwarder so the bench can flush
  * the async listener bus before reading its spill counters — task-end
  * events ride the bus, so a read immediately after an action returns
  * can miss the tail of the just-finished job. Keep this file to
  * forwarders only.
  */
object GraftCoreShim {

  /** Block until all queued listener events are delivered (or the
    * timeout elapses — the bench treats a late event as noise, not an
    * error, so the timeout is swallowed). */
  def flushListenerBus(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
