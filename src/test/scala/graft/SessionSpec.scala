package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.materialize.IcebergDdl
import graft.materialize.IcebergDdl.IcebergConfig
import graft.model.{ModelConfig, ModelNode}
import graft.planner.{RoutingReason, Venue}

class SessionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("facade runs a DAG with routing, WAL, savings, and health") {
    val gs = new GraftSession(spark,
      Files.createTempDirectory("graft_gs").toString)
    val base = ModelNode("big_orders", ModelConfig("table"), Nil)(
      s => Tables.load(s, sf, "orders").filter(col("o_totalprice") > 100000))
    val down = ModelNode("by_status", ModelConfig("table"),
      Seq("model.graft.big_orders"))(
      _ => gs.warehouse.read("main", "big_orders")
        .groupBy("o_orderstatus").count())
    val results = gs.run(Seq(down, base))
    assert(results.map(_.name) == Seq("big_orders", "by_status"))
    assert(results.forall(_.decision.venue == Venue.Local))
    assert(results.forall(_.rows > 0))
    assert(gs.savings.totalSavedUsd > 0)
    val health = gs.health(Some("big_orders"))
    assert(health.contains("[PASS] warehouse"))
    assert(!health.contains("[FAIL]"))
  }

  test("dev target applies LIMIT sampling (impl.py:403-415)") {
    val gs = new GraftSession(spark,
      Files.createTempDirectory("graft_dev").toString, target = "dev")
    val node = ModelNode("sampled",
      ModelConfig("table", devSampleSize = 7), Nil)(
      s => Tables.load(s, sf, "lineitem"))
    val r = gs.run(Seq(node))
    assert(r.head.rows == 7)
  }

  test("facade SQL entry point accepts Snowflake dialect") {
    val gs = new GraftSession(spark,
      Files.createTempDirectory("graft_sql").toString)
    Tables.registerAll(spark, sf)
    val out = gs.sql(
      "SELECT IFF(o_totalprice > 100000, 'big', 'small') AS t, " +
        "o_orderkey::VARIANT AS v FROM orders QUALIFY " +
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1")
    assert(out.columns.toSeq == Seq("t", "v"))
    assert(out.count() > 0)
  }

  test("seed loads a CSV into the warehouse") {
    val gs = new GraftSession(spark,
      Files.createTempDirectory("graft_seed").toString)
    val csv = Files.createTempDirectory("seed").resolve("countries.csv")
    Files.writeString(csv,
      "code,name,population\nUS,United States,331\nIS,Iceland,0.37\n")
    val df = gs.seed(csv.toString, "countries")
    assert(df.count() == 2)
    assert(df.schema("population").dataType.typeName == "double")
  }

  test("failed model records a crash in the WAL") {
    val root = Files.createTempDirectory("graft_crash").toString
    val gs = new GraftSession(spark, root)
    val bad = ModelNode("explodes", ModelConfig("table"), Nil)(
      _ => throw new RuntimeException("boom"))
    assertThrows[RuntimeException](gs.run(Seq(bad)))
    assert(gs.state.crashCount("model.graft.explodes") == 1)
  }

  // Iceberg DDL — mirrors reference tests/test_bridge.py:16-99
  test("iceberg DDL per cloud dialect") {
    val cfg = IcebergConfig("analytics", "orders",
      catalogIntegration = Some("POLARIS_INT"),
      externalVolume = Some("S3_VOL"), partitionBy = Some("date"),
      location = Some("s3://bucket/path"),
      connection = Some("project-connection"))
    val sql = "SELECT * FROM stg"
    val sf = IcebergDdl.construct(IcebergDdl.Snowflake, sql, cfg)
    assert(sf.contains("CREATE OR REPLACE ICEBERG TABLE analytics.orders"))
    assert(sf.contains("CATALOG_INTEGRATION = 'POLARIS_INT'"))
    assert(sf.contains("EXTERNAL_VOLUME = 'S3_VOL'"))
    assert(sf.contains("PARTITION BY (date)"))
    val db = IcebergDdl.construct(IcebergDdl.Databricks, sql, cfg)
    assert(db.contains("USING ICEBERG") &&
      db.contains("LOCATION 's3://bucket/path'") &&
      db.contains("PARTITIONED BY (date)"))
    val bq = IcebergDdl.construct(IcebergDdl.BigQuery, sql, cfg)
    assert(bq.contains("EXTERNAL TABLE `analytics.orders`") &&
      bq.contains("WITH CONNECTION `project-connection`") &&
      bq.contains("format = 'ICEBERG'"))
    val at = IcebergDdl.construct(IcebergDdl.Athena, sql, cfg)
    assert(at.contains("table_type = 'ICEBERG'") &&
      at.contains("location = 's3://bucket/path'") &&
      !at.contains("OR REPLACE"))
  }

  test("run summary records sessions and persists JSON") {
    val root = Files.createTempDirectory("graft_rs").toString
    val gs = new GraftSession(spark, root)
    val node = ModelNode("regions", ModelConfig("table"), Nil)(
      s => Tables.load(s, sf, "region"))
    gs.run(Seq(node))
    assert(gs.runSummary.render.contains("1 models (1 ok, 0 failed)"))
    assert(gs.runSummary.render.contains("5 rows produced"))
    // persisted JSON readable by a fresh reader
    val reader = new graft.telemetry.RunSummary(
      s"$root/_graft/run_summary.json")
    assert(reader.loadModelCount() == 1)
    // failures recorded too
    val bad = ModelNode("boom", ModelConfig("table"), Nil)(
      _ => throw new RuntimeException("x"))
    assertThrows[RuntimeException](gs.run(Seq(bad)))
    assert(gs.runSummary.render.contains("1 failed"))
  }
}
