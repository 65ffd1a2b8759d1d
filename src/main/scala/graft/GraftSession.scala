package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

import graft.cache.SourceCache
import graft.materialize.Materializer
import graft.model.{Dag, ModelNode}
import graft.planner._
import graft.sync.SyncManager
import graft.telemetry.{HealthCheck, ModelRun, RunSummary, SavingsTracker}
import graft.transpile.SnowflakeSql
import graft.warehouse.Warehouse

/** The engine facade — what `impl.execute_model` + connection manager are
  * to the reference (reference `impl.py:222-303`, SURVEY.md §3.2): one
  * object wiring the planner (route → explain), the WAL (crash
  * accounting around execution), materializations, the source cache,
  * verified sync, and savings telemetry over a Spark session.
  *
  * Venue semantics in a single-engine deployment: `Local` executes here;
  * `Cloud` is surfaced to the caller as a flagged decision (the model is
  * still executed locally when `executeCloudRouted`, the default, since
  * there is no second engine attached — exactly the "planner advice"
  * reinterpretation SURVEY.md §7 calls for).
  */
final class GraftSession(
    val spark: SparkSession,
    warehouseRoot: String,
    targetSchema: String = "main",
    target: String = "prod", // "dev" enables LIMIT sampling
    config: PlannerConfig = PlannerConfig(),
    executeCloudRouted: Boolean = true) {

  val warehouse = new Warehouse(spark, warehouseRoot)
  val state = new StateManager(s"$warehouseRoot/_graft/state.json", config)
  val scanner = new CatalogScanner()
  val router = new AutoRouter(config, state)
  val traffic = new TrafficController(config, state)
  val materializer = new Materializer(warehouse, targetSchema)
  val cache = new SourceCache(spark, s"$warehouseRoot/_graft/cache")
  val sync = new SyncManager()
  val savings = new SavingsTracker()
  val runSummary = new RunSummary(s"$warehouseRoot/_graft/run_summary.json")

  /** Snowflake-dialect SQL entry point. */
  def sql(text: String): DataFrame = SnowflakeSql.run(spark, text)

  /** Routing explanation for a model (the `icebreaker explain` analog). */
  def explain(node: ModelNode, sqlText: String): String =
    router.explain(spark, node, sqlText)

  final case class RunResult(name: String, decision: RoutingDecision,
      durationSeconds: Double, rows: Long)

  /** Execute a model DAG in topological order with routing, WAL
    * accounting, dev sampling, and savings logging per node. */
  def run(nodes: Seq[ModelNode], now: Column = lit(null),
      sqlOf: ModelNode => String = _ => ""): Seq[RunResult] =
    Dag.topoOrder(nodes).map { node =>
      val decision = traffic.decide(spark, node, sqlOf(node))
      val venue =
        if (decision.venue == Venue.Cloud && !executeCloudRouted) Venue.Cloud
        else Venue.Local
      state.markRunning(node.uniqueId)
      val t0 = System.nanoTime()
      try {
        val sampled =
          if (target == "dev" && node.config.materialized != "snapshot")
            node.copy(build = s => node.build(s).limit(node.config.devSampleSize))
          else node
        val out = materializer.materialize(sampled, Option(now))
        val rows = out.count()
        val dur = (System.nanoTime() - t0) / 1e9
        state.markSuccess(node.uniqueId, venue)
        val venueName = if (venue == Venue.Local) "local" else "cloud"
        savings.logExecution(node.name, venueName, dur)
        runSummary.record(ModelRun(node.name, venueName, dur, rows, "success"))
        runSummary.persist()
        RunResult(node.name, decision, dur, rows)
      } catch {
        case e: Throwable =>
          state.markCrash(node.uniqueId)
          runSummary.record(ModelRun(node.name, "local",
            (System.nanoTime() - t0) / 1e9, 0L, "error"))
          runSummary.persist()
          throw e
      }
    }

  /** CSV seed load (reference adapters.sql:130-152). */
  def seed(csvPath: String, name: String): DataFrame = {
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(csvPath)
    warehouse.createTableAs(df, targetSchema, name)
    warehouse.read(targetSchema, name)
  }

  def health(probeTable: Option[String] = None): String =
    HealthCheck.render(HealthCheck.run(
      warehouse = probeTable.map(t => (warehouse, targetSchema, t)),
      cache = Some(cache), state = Some(state), sync = Some(sync)))
}
