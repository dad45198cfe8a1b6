package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the bench needs to
  * drain it between queries so per-query shuffle/spill snapshots don't
  * bleed task-end events into the next query's bucket. Second (and
  * last) file outside the `graft` namespace, alongside
  * `org.apache.spark.sql.graft.ColumnShim`.
  */
object ListenerShim {
  def drain(sc: SparkContext, timeoutMs: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
