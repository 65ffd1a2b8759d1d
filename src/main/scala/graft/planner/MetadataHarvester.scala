package graft.planner

import graft.telemetry.RunSummary

/** Per-model execution statistics from the local run-summary ledger —
  * the engine-side port of the reference's MetadataHarvester (reference
  * `metadata.py:109-232`), which aggregates a warehouse's QUERY_HISTORY
  * into per-model avg runtime / spill / rows for the COMPLEXITY routing
  * gate. In a single-engine deployment the run-summary sessions ARE the
  * query history, so the harvest is a local file read: group runs by
  * model, average duration, spill, and rows. Spill is recorded per
  * model by [[graft.telemetry.SpillListener]] (task-metric
  * memory+disk bytes spilled), so BOTH clauses of Gate 5 — runtime and
  * `avg_spill_bytes` (traffic.py:34) — can fire from local history.
  *
  * Stats are memoized per instance; call [[refresh]] after a run to see
  * new sessions.
  */
final class MetadataHarvester(summaryPath: String) {

  private var cached: Option[Map[String, ModelStats]] = None

  /** Aggregate sessions → per-model stats (metadata.py:178-210 shape). */
  def harvest(): Map[String, ModelStats] = {
    val stats = RunSummary.loadAllRuns(summaryPath)
      .filter(_.status == "success")
      .groupBy(_.name)
      .map { case (name, rs) =>
        name -> ModelStats(
          avgSeconds = rs.map(_.durationSeconds).sum / rs.length,
          avgSpillBytes = rs.map(_.spillBytes).sum / rs.length,
          avgRowsProduced = rs.map(_.rows).sum / rs.length,
          runCount = rs.length)
      }
    cached = Some(stats)
    stats
  }

  def refresh(): Unit = cached = None

  /** Lookup by model name or uniqueId (`model.<project>.<name>` — the
    * trailing segment is the run-summary key). */
  def statsOf(modelId: String): Option[ModelStats] = {
    val stats = cached.getOrElse(harvest())
    stats.get(modelId).orElse(stats.get(modelId.split('.').last))
  }
}
