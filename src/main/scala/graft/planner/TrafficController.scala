package graft.planner

import scala.util.Try

import org.apache.spark.sql.SparkSession

import graft.model.ModelNode
import graft.transpile.SnowflakeSql

/** The 6-gate traffic controller — port of the reference's
  * `TrafficController.decide` (reference `traffic.py:96-152`), gates in
  * order:
  *
  *  1. INTENT     — user override
  *  2. GRAVITY    — internal/proprietary sources must stay where they live
  *  3. CAPABILITY — blacklisted syntax, untranspilable SQL, toxic types
  *  4. STABILITY  — crash WAL (dangling `running` / repeated crashes)
  *  5. COMPLEXITY — telemetry: avg runtime > `maxLocalSeconds` or spill >
  *                  `maxSpillBytes`
  *  6. PHYSICS    — declared/estimated input volume > `maxLocalSizeGb`
  *  default       — LOCAL (free!)
  *
  * CAPABILITY's "can_transpile dry-run" becomes: our transpiler rewrite +
  * Spark's parser accept the SQL (the reference calls sqlglot the same
  * way, traffic.py:250-259).
  */
final class TrafficController(
    config: PlannerConfig = PlannerConfig(),
    state: StateManager = null,
    statsOf: String => Option[ModelStats] = _ => None) {

  /** Types Spark cannot represent (reference "toxic types",
    * traffic.py:250-259 + tests/test_traffic.py:74-85). */
  val toxicTypes: Set[String] = Set("GEOGRAPHY", "GEOMETRY")

  def decide(spark: SparkSession, model: ModelNode, sql: String,
      sources: Seq[SourceMeta] = Nil): RoutingDecision = {
    // 1. INTENT
    model.config.routeOverride match {
      case Some("cloud") => return RoutingDecision(Venue.Cloud,
        RoutingReason.UserOverride, gate = Some("INTENT"))
      case Some("local") => return RoutingDecision(Venue.Local,
        RoutingReason.UserOverrideLocal, gate = Some("INTENT"))
      case _ =>
    }
    // 2. GRAVITY
    sources.find(s => s.format.contains("internal")) match {
      case Some(s) => return RoutingDecision(Venue.Cloud,
        RoutingReason.InternalSource, gate = Some("GRAVITY"),
        detail = Some(s.name))
      case None =>
    }
    // 3. CAPABILITY
    val sqlLower = sql.toLowerCase
    QueryAnalyzer.cloudOnlyFunctions.find(sqlLower.contains) match {
      case Some(f) => return RoutingDecision(Venue.Cloud,
        RoutingReason.Untranspilable, gate = Some("CAPABILITY"),
        detail = Some(f))
      case None =>
    }
    model.config.toxicTypes.map(_.toUpperCase).find(toxicTypes.contains) match {
      case Some(t) => return RoutingDecision(Venue.Cloud,
        RoutingReason.ToxicTypes, gate = Some("CAPABILITY"),
        detail = Some(t))
      case None =>
    }
    if (!canTranspile(spark, sql))
      return RoutingDecision(Venue.Cloud, RoutingReason.Untranspilable,
        gate = Some("CAPABILITY"), detail = Some("parse failed"))
    // 4. STABILITY
    if (state != null && state.isBlacklisted(model.uniqueId))
      return RoutingDecision(Venue.Cloud, RoutingReason.CrashHistory,
        gate = Some("STABILITY"),
        detail = Some(s"${state.crashCount(model.uniqueId)} crashes"))
    // 5. COMPLEXITY
    statsOf(model.uniqueId) match {
      case Some(s) if s.avgSeconds > config.maxLocalSeconds =>
        return RoutingDecision(Venue.Cloud, RoutingReason.HighComplexity,
          gate = Some("COMPLEXITY"),
          detail = Some(f"avg ${s.avgSeconds}%.0f s > ${config.maxLocalSeconds}%.0f s"))
      case Some(s) if s.avgSpillBytes > config.maxSpillBytes =>
        return RoutingDecision(Venue.Cloud, RoutingReason.HighComplexity,
          gate = Some("COMPLEXITY"),
          detail = Some(s"avg spill ${s.avgSpillBytes} B"))
      case _ =>
    }
    // 6. PHYSICS
    model.config.estimatedSizeGb match {
      case Some(gb) if gb > config.maxLocalSizeGb =>
        return RoutingDecision(Venue.Cloud, RoutingReason.LargeVolume,
          gate = Some("PHYSICS"),
          detail = Some(f"$gb%.1f GB > ${config.maxLocalSizeGb}%.1f GB"))
      case _ =>
    }
    RoutingDecision(Venue.Local, RoutingReason.DefaultLocal,
      gate = Some("DEFAULT"))
  }

  /** Transpile + parse dry-run (the sqlglot `can_transpile` analog).
    * Empty SQL (DataFrame-defined models have no SQL text) is trivially
    * transpilable, matching the reference's empty-input behavior. */
  def canTranspile(spark: SparkSession, sql: String): Boolean =
    sql.trim.isEmpty || Try {
      val t = SnowflakeSql.transpile(sql)
      SnowflakeSql.splitQualify(t) match {
        case Some((inner, _, _, _)) =>
          spark.sessionState.sqlParser.parsePlan(inner)
        case None => spark.sessionState.sqlParser.parsePlan(t)
      }
    }.isSuccess
}
