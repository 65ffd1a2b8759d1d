package graft.telemetry

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage task-metric accumulator for scaling diagnosis (dev-only,
  * `SPARK_GRAFT_STAGES=1` in [[graft.Bench]]): when a query's decade
  * exponent drifts above 1.0 at zero spill, the per-stage run/cpu/GC
  * and shuffle-byte columns say WHICH stage grew superlinearly and in
  * WHAT term (sort constants, shuffle write amplification, GC
  * pressure, codegen fallback) — the question VERDICT round 11 asked
  * of d_dedup_minhash / t_fingerprint's 1.12.
  */
final class StageMetricsListener extends SparkListener {

  final case class StageRow(
      stageId: Int,
      name: String,
      numTasks: Int,
      runTimeMs: Long,
      cpuTimeMs: Long,
      gcTimeMs: Long,
      inputBytes: Long,
      inputRecords: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      shuffleWriteRecords: Long,
      spillBytes: Long)

  private val rows = ArrayBuffer[StageRow]()

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val i = ev.stageInfo
    val m = i.taskMetrics
    if (m != null) synchronized {
      rows += StageRow(
        stageId = i.stageId,
        // callsite first line only — enough to match the plan node
        name = i.name.takeWhile(_ != '\n').take(80),
        numTasks = i.numTasks,
        runTimeMs = m.executorRunTime,
        cpuTimeMs = m.executorCpuTime / 1000000L,
        gcTimeMs = m.jvmGCTime,
        inputBytes = m.inputMetrics.bytesRead,
        inputRecords = m.inputMetrics.recordsRead,
        shuffleReadBytes = m.shuffleReadMetrics.totalBytesRead,
        shuffleWriteBytes = m.shuffleWriteMetrics.bytesWritten,
        shuffleWriteRecords = m.shuffleWriteMetrics.recordsWritten,
        spillBytes = m.memoryBytesSpilled + m.diskBytesSpilled)
    }
  }

  /** Stages completed so far (monotone; callers snapshot a size before
    * a query and drain from it after — queries run serially). */
  def size: Int = synchronized(rows.size)

  def drainFrom(n: Int): Seq[StageRow] = synchronized(rows.drop(n).toList)
}

object StageMetricsListener {
  private val perContext =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, StageMetricsListener]()

  def forContext(sc: org.apache.spark.SparkContext): StageMetricsListener =
    perContext.synchronized {
      val existing = perContext.get(sc)
      if (existing != null) existing
      else {
        val l = new StageMetricsListener
        sc.addSparkListener(l)
        perContext.put(sc, l)
        l
      }
    }
}
