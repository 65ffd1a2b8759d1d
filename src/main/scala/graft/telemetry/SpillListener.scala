package graft.telemetry

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Session-wide spill accumulator — the local-engine source for the
  * spill clause of the COMPLEXITY routing gate (the reference harvests
  * `avg_spill_bytes` from the warehouse QUERY_HISTORY, traffic.py:34,
  * 158-391; Spark exposes the same signal as per-task
  * `memoryBytesSpilled`/`diskBytesSpilled`). Models run serially in
  * [[graft.GraftSession.run]], so a before/after snapshot of the running
  * total attributes spill to the model that caused it.
  */
final class SpillListener extends SparkListener {
  private val spilled = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null)
      spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
  }

  def totalSpillBytes: Long = spilled.get()
}
