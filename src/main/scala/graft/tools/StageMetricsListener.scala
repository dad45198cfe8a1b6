package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Aggregates executor task metrics (shuffle read/write bytes, spill)
  * across whatever runs between a [[reset]] and a [[snapshot]] — the
  * bench wraps each query's timed runs in a reset/drain/snapshot pair
  * to expose per-query `shuffle_mb` / `spill_mb` in the bench record,
  * and the metrics spec uses the same listener to pin shuffle-volume
  * budgets (the 16-byte-fingerprint discipline: a regression that
  * starts shuffling corpus text bodies again trips the budget long
  * before it trips a timing).
  *
  * Task-end granularity (not stage-end): task metrics are final at
  * task end, and a query whose last stage is still running when the
  * snapshot is taken would silently lose that stage's bytes. Callers
  * must drain the listener bus (ListenerShim.drain) before reading —
  * events are delivered asynchronously.
  */
final class StageMetricsListener extends SparkListener {
  private val shuffleWriteB = new AtomicLong
  private val shuffleReadB = new AtomicLong
  private val spillDiskB = new AtomicLong
  private val spillMemB = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      spillDiskB.addAndGet(m.diskBytesSpilled)
      spillMemB.addAndGet(m.memoryBytesSpilled)
    }
  }

  def reset(): Unit = {
    shuffleWriteB.set(0); shuffleReadB.set(0); spillDiskB.set(0); spillMemB.set(0)
  }

  /** (shuffle write bytes, shuffle read bytes, disk spill bytes,
    * memory spill bytes) accumulated since the last reset.
    */
  def snapshot(): (Long, Long, Long, Long) =
    (shuffleWriteB.get, shuffleReadB.get, spillDiskB.get, spillMemB.get)
}
