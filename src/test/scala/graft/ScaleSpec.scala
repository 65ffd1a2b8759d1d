package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinRollingHash.minRollingHash
import graft.ops.Skew
import graft.warehouse.Warehouse

/** Scale-mechanism tests: salted joins preserve results while spreading
  * keys; bucketed tables join without exchanges; the native rolling-hash
  * expression matches its spec under codegen. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffles
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain join's rows") {
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = o.join(c, Seq("o_custkey")).collect().toSet
    val salted = Skew.saltedJoin(o, c, Seq("o_custkey"), 8).collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = new Warehouse(spark,
      Files.createTempDirectory("graft_bkt").toString)
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val l = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    wh.createBucketedTable(o, "main", "orders_b", Seq("o_orderkey"), 4)
    wh.createBucketedTable(l, "main", "lines_b", Seq("o_orderkey"), 4)
    val joined = wh.readBucketed("main", "orders_b")
      .join(wh.readBucketed("main", "lines_b"), Seq("o_orderkey"))
    assert(joined.count() > 0)
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"expected no exchanges, got ${shuffles.length}")
  }

  test("min rolling hash: known value, null under k, codegen path") {
    import spark.implicits._
    // "abcd" windows of 2: ab=97*257+98=25027, bc=98*257+99=25285,
    // cd=99*257+100=25543 -> min 25027
    val df = Seq("abcd", "x", "aaaa").toDF("s")
      .select(col("s"), minRollingHash(col("s"), 2).as("h"))
    val rows = df.collect().map(r => r.getString(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(rows("abcd") == 97L * 257 + 98)
    assert(rows("x") == -1L) // shorter than k -> null
    assert(rows("aaaa") == 97L * 257 + 97)
    // against a parquet scan the expression stays inside whole-stage
    // codegen (the local Seq above constant-folds to a LocalTableScan,
    // which exercised the interpreted eval path instead)
    val onTable = Tables.load(spark, sf, "documents")
      .select(minRollingHash(lower(col("text")), 8).as("h"))
    // the `*(n)` prefix marks whole-stage-codegen'd operators
    assert(onTable.queryExecution.executedPlan.toString
      .contains("*(1) Project [min_rolling_hash"))
    assert(onTable.filter(col("h").isNotNull).count() > 0)
  }
}
