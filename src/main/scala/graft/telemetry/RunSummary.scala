package graft.telemetry

import java.nio.file.{Files, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Run-session recorder — port of the reference's run summary
  * (reference `run_summary.py:22-49, 152-163, 227-235`): one session per
  * engine run, with per-model results, persisted as JSON and rendered as
  * a closing summary line. Clock is injected (no wall-clock reads inside
  * operators — SURVEY.md §7).
  */
final case class ModelRun(
    name: String,
    venue: String,
    durationSeconds: Double,
    rows: Long,
    status: String) // success | error

final class RunSummary(path: String,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
  private val startedAt = clock()
  private val runs = scala.collection.mutable.ArrayBuffer[ModelRun]()

  def record(run: ModelRun): Unit = runs += run

  def persist(): Unit = {
    val obj = Map(
      "started_at" -> startedAt,
      "finished_at" -> clock(),
      "models" -> runs.map(r => Map(
        "name" -> r.name, "venue" -> r.venue,
        "duration_seconds" -> r.durationSeconds,
        "rows" -> r.rows, "status" -> r.status)))
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, mapper.writeValueAsString(obj))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The closing summary line (run_summary.py render). */
  def render: String = {
    val ok = runs.count(_.status == "success")
    val failed = runs.length - ok
    val local = runs.count(_.venue == "local")
    val total = runs.map(_.durationSeconds).sum
    f"${runs.length} models ($ok ok, $failed failed), $local local, " +
      f"$total%.1f s total, ${runs.map(_.rows).sum} rows produced"
  }

  /** Load a persisted session's model count (history reader analog). */
  def loadModelCount(): Int =
    if (!Files.exists(Paths.get(path))) 0
    else mapper.readTree(Files.readString(Paths.get(path)))
      .path("models").size()
}
