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

object SpillListener {
  private val perContext =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, SpillListener]()

  /** One shared listener per SparkContext — sessions come and go (the
    * CLI builds one per command), so per-session registration would
    * accrete listeners on the long-lived context forever. The running
    * total is context-global; before/after deltas attribute spill to a
    * model because models run serially within a session (concurrent
    * sessions on one context share attribution — same as the
    * reference's account-wide QUERY_HISTORY harvest). */
  def forContext(sc: org.apache.spark.SparkContext): SpillListener =
    perContext.synchronized {
      val existing = perContext.get(sc)
      if (existing != null) existing
      else {
        val l = new SpillListener
        sc.addSparkListener(l)
        perContext.put(sc, l)
        l
      }
    }
}
