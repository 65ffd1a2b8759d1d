package graft.telemetry

import scala.util.Try

import graft.cache.SourceCache
import graft.planner.StateManager
import graft.sync.SyncManager
import graft.warehouse.Warehouse

/** Engine health report — port of the reference's health checker
  * (reference `health_check.py:69-97, 278-343`): each check returns
  * pass/warn/fail with a detail line; the report aggregates them.
  */
object HealthCheck {

  final case class Check(name: String, status: String, detail: String)

  def run(
      warehouse: Option[(Warehouse, String, String)] = None, // wh, schema, probe table
      cache: Option[SourceCache] = None,
      state: Option[StateManager] = None,
      sync: Option[SyncManager] = None): Seq[Check] = {
    val checks = scala.collection.mutable.ArrayBuffer[Check]()

    warehouse.foreach { case (wh, schema, table) =>
      checks += (Try(wh.rowCount(schema, table)) match {
        case scala.util.Success(n) =>
          Check("warehouse", "pass", s"$schema.$table readable, $n rows")
        case scala.util.Failure(e) =>
          Check("warehouse", "fail", s"cannot read $schema.$table: ${e.getMessage}")
      })
    }

    cache.foreach { c =>
      val gb = c.totalSizeBytes.toDouble / (1L << 30)
      checks += Check("cache",
        if (gb <= 10.0) "pass" else "warn",
        f"${c.size} entries, $gb%.2f GB")
    }

    state.foreach { s =>
      checks += Check("stability",
        if (s.localSharePct >= 50.0 || s.localSharePct == 0.0) "pass" else "warn",
        f"local share ${s.localSharePct}%.0f%%")
    }

    sync.foreach { sm =>
      val failed = sm.ledger.count(_.status == "failed")
      checks += Check("sync",
        if (failed == 0) "pass" else "fail",
        s"${sm.ledger.length} syncs, $failed failed")
    }

    checks.toSeq
  }

  def render(checks: Seq[Check]): String =
    checks.map(c => f"[${c.status.toUpperCase}%-4s] ${c.name}%-10s ${c.detail}")
      .mkString("\n")

  def healthy(checks: Seq[Check]): Boolean = !checks.exists(_.status == "fail")
}
