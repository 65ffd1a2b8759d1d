package graft.planner

import org.apache.spark.sql.SparkSession

import graft.model.ModelNode

/** The 7-check venue router — port of the reference's `AutoRouter.decide`
  * (reference `auto_router.py:192-291`), priority order preserved:
  *
  *  1. user override (`icebreaker_route`)
  *  2. previous local failures (crash WAL)
  *  3. external sources (regex + source metadata, Iceberg exempt)
  *  4. cloud-only functions (+ semi-structured syntax the engine lacks —
  *     for us that set is empty: colon paths transpile natively)
  *  5. cloud-routed upstream dependencies
  *  6. estimated input volume vs `max_local_size_gb`
  *  7. historical cost under `cost_threshold_usd` ⇒ local
  *  default ⇒ LOCAL (free compute)
  */
final class AutoRouter(
    config: PlannerConfig = PlannerConfig(),
    state: StateManager = null,
    volumeOf: String => Option[Double] = _ => None, // model -> input GB
    statsOf: String => Option[ModelStats] = _ => None) {

  private val history =
    scala.collection.mutable.Map[String, RoutingDecision]()

  def decide(spark: SparkSession, model: ModelNode, sql: String,
      sources: Seq[SourceMeta] = Nil): RoutingDecision = {
    val d = decideInner(spark, model, sql, sources)
    history(model.uniqueId) = d
    d
  }

  private def decideInner(spark: SparkSession, model: ModelNode,
      sql: String, sources: Seq[SourceMeta]): RoutingDecision = {
    // 1. user override
    model.config.routeOverride match {
      case Some("cloud") =>
        return RoutingDecision(Venue.Cloud, RoutingReason.UserOverride)
      case Some("local") =>
        return RoutingDecision(Venue.Local, RoutingReason.UserOverrideLocal)
      case _ =>
    }
    // 2. previous local failures
    if (state != null && state.isBlacklisted(model.uniqueId))
      return RoutingDecision(Venue.Cloud, RoutingReason.PreviousFailure,
        detail = Some(s"${state.crashCount(model.uniqueId)} crashes"))

    val facts = QueryAnalyzer.analyze(spark, sql)

    // 3. external sources — Iceberg catalog references are exempt
    // (auto_router.py:181-190): they ARE locally scannable
    val icebergRefs = facts.relations.exists(_.headOption
      .exists(_.equalsIgnoreCase("iceberg_catalog"))) ||
      sources.exists(_.iceberg)
    val externalHit = facts.externalPatterns.nonEmpty ||
      sources.exists(s => s.external ||
        s.format.exists(f => Set("external", "stage", "s3", "gcs").contains(f))) ||
      facts.threePartRelations.exists(!_.startsWith("iceberg_catalog."))
    if (externalHit && !icebergRefs)
      return RoutingDecision(Venue.Cloud, RoutingReason.ExternalSource,
        detail = facts.externalPatterns.headOption
          .orElse(facts.threePartRelations.headOption))

    // 4. cloud-only functions
    val sqlLower = sql.toLowerCase
    QueryAnalyzer.cloudOnlyFunctions.find(f =>
      facts.functions.contains(f) || sqlLower.contains(f)) match {
      case Some(f) =>
        return RoutingDecision(Venue.Cloud, RoutingReason.CloudFunction,
          detail = Some(f))
      case None =>
    }

    // 5. cloud-routed upstream dependencies
    model.dependsOn.find(dep => history.get(dep).exists(d =>
      d.venue == Venue.Cloud &&
        Set(RoutingReason.ExternalSource, RoutingReason.CloudFunction)
          .contains(d.reason))) match {
      case Some(dep) =>
        return RoutingDecision(Venue.Cloud, RoutingReason.CloudDependency,
          detail = Some(dep))
      case None =>
    }

    // 6. input volume
    volumeOf(model.uniqueId).orElse(model.config.estimatedSizeGb) match {
      case Some(gb) if gb > config.maxLocalSizeGb =>
        return RoutingDecision(Venue.Cloud, RoutingReason.VolumeExceedsLimit,
          detail = Some(f"$gb%.1f GB > ${config.maxLocalSizeGb}%.1f GB"))
      case _ =>
    }

    // 7. historical cost
    statsOf(model.uniqueId).flatMap(_.avgCostUsd) match {
      case Some(c) if c < config.costThresholdUsd =>
        RoutingDecision(Venue.Local, RoutingReason.HistoricalCheap,
          detail = Some(f"avg $$${c}%.3f"))
      case _ =>
        RoutingDecision(Venue.Local, RoutingReason.AutoLocal)
    }
  }

  /** Gate-by-gate analysis — port of `AutoRouter.explain`
    * (auto_router.py:424-459). */
  def explain(spark: SparkSession, model: ModelNode, sql: String,
      sources: Seq[SourceMeta] = Nil): String = {
    val facts = QueryAnalyzer.analyze(spark, sql)
    val d = decide(spark, model, sql, sources)
    val lines = Seq(
      s"Routing analysis for ${model.name}:",
      s"  1. override        : ${model.config.routeOverride.getOrElse("-")}",
      s"  2. crash history   : ${Option(state).map(_.crashCount(model.uniqueId)).getOrElse(0)}",
      s"  3. external sources: ${if (facts.externalPatterns.isEmpty) "-" else facts.externalPatterns.mkString(",")}",
      s"  4. cloud functions : ${facts.functions.intersect(QueryAnalyzer.cloudOnlyFunctions).mkString(",")}",
      s"  5. upstream        : ${model.dependsOn.mkString(",")}",
      s"  6. est. volume gb  : ${volumeOf(model.uniqueId).orElse(model.config.estimatedSizeGb).getOrElse("-")}",
      s"  7. complexity      : ${facts.complexityClass} (joins=${facts.joinCount}, windows=${facts.windowCount})",
      s"  => ${d.render}")
    lines.mkString("\n")
  }
}
