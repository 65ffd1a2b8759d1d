package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Model configuration — the dbt-node config surface the reference's
  * router/materializations consume (reference `tests/test_auto_router.py:
  * 22-29`, `impl.py:92-113`, FIXTURES.md §A.1). */
final case class ModelConfig(
    materialized: String = "table", // view|table|incremental|snapshot
    uniqueKey: Seq[String] = Nil,
    incrementalStrategy: String = "merge", // append|delete+insert|merge
    partitionBy: Option[String] = None,
    // storage format of the materialized table: "parquet" (warehouse
    // dir, the default) or "iceberg" (v2 table via IcebergWriter —
    // the reference's actual target format, bridge.py:69-232; table
    // re-runs become replace snapshots, incremental delete+insert/
    // merge become positional-tombstone commits)
    tableFormat: String = "parquet",
    routeOverride: Option[String] = None, // icebreaker_route: local|cloud
    estimatedSizeGb: Option[Double] = None,
    toxicTypes: Seq[String] = Nil,
    devSampleSize: Int = 10000,
    // dev sampling method (reference impl.py:403-415 injects LIMIT and
    // notes "More sophisticated approach would use USING SAMPLE"):
    // "limit" matches the reference; "tablesample" is that upgrade —
    // a Bernoulli df.sample(devSampleFraction) pushed into the scan,
    // statistically unbiased where LIMIT returns whatever rows the
    // first partitions happen to hold (and on a 1000-executor cluster
    // LIMIT serializes into one partial scan, while sample stays an
    // embarrassingly parallel per-row filter)
    devSampleMethod: String = "limit",
    devSampleFraction: Double = 0.01,
    customSchema: Option[String] = None,
    // incremental: dbt on_schema_change ("ignore" | "append_new_columns")
    onSchemaChange: String = "ignore",
    // incremental: dbt incremental_predicates — SQL expression bounding
    // the replaceable target slice (the huge-target scale lever)
    incrementalPredicates: Option[String] = None,
    // snapshot-only: timestamp strategy column, or check-strategy columns
    snapshotUpdatedAt: Option[String] = None,
    snapshotCheckCols: Seq[String] = Nil,
    invalidateHardDeletes: Boolean = false,
    // dbt model contract (contract: enforced: true): declared columns
    // with data types and not-null constraints, validated before any
    // write — non-empty list turns enforcement on
    contract: Seq[ContractColumn] = Nil)

/** One column of an enforced dbt model contract: declared name, Spark
  * DDL data type (e.g. "bigint", "decimal(18,2)"), and whether dbt's
  * `not_null` constraint applies. */
final case class ContractColumn(name: String, dataType: String,
    notNull: Boolean = false)

/** A model node: named transformation producing a DataFrame, with dbt-style
  * dependency edges (`depends_on.nodes`). */
final case class ModelNode(
    name: String,
    uniqueId: String,
    config: ModelConfig,
    dependsOn: Seq[String],
    build: SparkSession => DataFrame)

object ModelNode {
  def apply(name: String, config: ModelConfig, dependsOn: Seq[String])(
      build: SparkSession => DataFrame): ModelNode =
    ModelNode(name, s"model.graft.$name", config, dependsOn, build)
}

/** Dependency DAG with Kahn topological ordering — port of the reference's
  * sync-orchestration order (reference `sync_manager.py:463-501`).
  * Deterministic: ready nodes are processed in sorted-name order. */
object Dag {

  /** Topologically order `nodes`; edges to unknown ids (sources) are
    * ignored, cycles raise. */
  def topoOrder(nodes: Seq[ModelNode]): Seq[ModelNode] = {
    val byId = nodes.map(n => n.uniqueId -> n).toMap
    val inDeg = scala.collection.mutable.Map[String, Int]()
    val out = scala.collection.mutable.Map[String, List[String]]()
      .withDefaultValue(Nil)
    nodes.foreach { n =>
      inDeg(n.uniqueId) = n.dependsOn.count(byId.contains)
      n.dependsOn.filter(byId.contains).foreach { d =>
        out(d) = n.uniqueId :: out(d)
      }
    }
    val ready = scala.collection.mutable.PriorityQueue[String]()(
      Ordering[String].reverse)
    inDeg.collect { case (id, 0) => id }.foreach(ready.enqueue(_))
    val order = scala.collection.mutable.ArrayBuffer[ModelNode]()
    while (ready.nonEmpty) {
      val id = ready.dequeue()
      order += byId(id)
      out(id).foreach { succ =>
        inDeg(succ) -= 1
        if (inDeg(succ) == 0) ready.enqueue(succ)
      }
    }
    if (order.length != nodes.length) {
      val stuck = nodes.map(_.uniqueId).diff(order.map(_.uniqueId).toSeq)
      throw new IllegalStateException(
        s"dependency cycle among: ${stuck.mkString(", ")}")
    }
    order.toSeq
  }

  /** dbt schema-name generation: `{target}_{custom}` when a custom schema
    * is set, else the target schema (reference `adapters.sql:9-16`). */
  def schemaName(targetSchema: String, custom: Option[String]): String =
    custom match {
      case Some(c) if c.nonEmpty => s"${targetSchema}_$c"
      case _                     => targetSchema
    }
}
