package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.Tables
import graft.ops.DataTests

/** dbt generic data tests ([[graft.ops.DataTests]]) run as
  * oracle-checked queries over the test tables — the `dbt test`
  * workload the reference adapter executes for its users (compiled
  * violation SELECTs routed through the same connection path as
  * models). Each query's result is the violation set (or the run
  * summary), differentially checked against DuckDB running dbt-core's
  * compiled SQL form.
  */
object TestQueries {
  type Q = (SparkSession, String) => DataFrame

  /** A staging model with a genuinely nullable column: customer
    * enriched from a nation dimension that only covers nationkey < 20
    * — the classic left-join staging shape whose not_null test
    * catches the uncovered keys. */
  private def stagedCust(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
      .filter(col("n_nationkey") < 20)
      .select(col("n_nationkey"), col("n_name"))
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
  }

  /** A parent dimension with deliberate gaps (every third key
    * removed), so the relationships test has real orphans to find. */
  private def gappedCustomer(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer").filter(col("c_custkey") % 3 =!= 0)

  private def suiteTests(s: SparkSession,
      dir: String): Seq[(String, DataFrame)] = Seq(
    "unique_lineitem_l_orderkey" ->
      DataTests.unique(Tables.load(s, dir, "lineitem"), "l_orderkey"),
    "not_null_staged_cust_n_name" ->
      DataTests.notNull(stagedCust(s, dir), "n_name"),
    "accepted_values_orders_o_orderstatus" ->
      DataTests.acceptedValues(Tables.load(s, dir, "orders"),
        "o_orderstatus", Seq("O", "F")),
    "relationships_orders_o_custkey" ->
      DataTests.relationships(Tables.load(s, dir, "orders"), "o_custkey",
        gappedCustomer(s, dir), "c_custkey"),
    "expression_lineitem_discount_cap" ->
      DataTests.expressionIsTrue(Tables.load(s, dir, "lineitem"),
        col("l_discount") <= lit(0.08)))

  val defs: Map[String, Q] = Map(
    // dbt `unique` on a key that is NOT unique in the fact table:
    // every violating key with its multiplicity
    "dt_unique" -> ((s, dir) =>
      DataTests.unique(Tables.load(s, dir, "lineitem"), "l_orderkey")),

    // dbt-utils `unique_combination_of_columns`
    "dt_unique_combo" -> ((s, dir) =>
      DataTests.uniqueCombination(Tables.load(s, dir, "orders"),
        Seq("o_custkey", "o_orderstatus"))),

    // dbt `not_null` over the left-join staging model
    "dt_not_null" -> ((s, dir) =>
      DataTests.notNull(stagedCust(s, dir), "n_name")
        .select(col("c_custkey"), col("c_nationkey"))),

    // dbt `accepted_values`: 'P' is outside the declared domain
    "dt_accepted_values" -> ((s, dir) =>
      DataTests.acceptedValues(Tables.load(s, dir, "orders"),
        "o_orderstatus", Seq("O", "F"))),

    // dbt `relationships`: orphaned order FKs vs the gapped dimension
    "dt_relationships" -> ((s, dir) =>
      DataTests.relationships(Tables.load(s, dir, "orders"), "o_custkey",
        gappedCustomer(s, dir), "c_custkey")),

    // dbt-utils `expression_is_true`: rows breaking the business rule
    "dt_expression" -> ((s, dir) =>
      DataTests.expressionIsTrue(Tables.load(s, dir, "lineitem"),
        col("l_discount") <= lit(0.08))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_discount"))),

    // the `dbt test` console summary: one row per test
    "dt_suite" -> ((s, dir) => DataTests.suite(suiteTests(s, dir))),

    // `dbt source freshness` over the five event feeds, pinned clock
    "dt_freshness" -> ((s, dir) =>
      DataTests.sourceFreshness(Tables.load(s, dir, "events"),
        "event_type", "ts",
        lit("2024-01-31 00:30:00").cast(TimestampType),
        warnAfterSec = 2700L, errorAfterSec = 3600L))
  )

  private val stagedCustSql =
    """SELECT c.c_custkey, c.c_nationkey, n.n_name
      |FROM customer c LEFT JOIN
      |  (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20) n
      |  ON c.c_nationkey = n.n_nationkey""".stripMargin

  private val uniqueSql =
    """SELECT l_orderkey, count(*) AS n_records FROM lineitem
      |GROUP BY l_orderkey HAVING count(*) > 1""".stripMargin

  private val notNullSql =
    s"""SELECT c_custkey, c_nationkey FROM ($stagedCustSql)
       |WHERE n_name IS NULL""".stripMargin

  private val acceptedSql =
    """SELECT o_orderstatus AS value_field, count(*) AS n_records
      |FROM orders
      |WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O', 'F')
      |GROUP BY o_orderstatus""".stripMargin

  private val relationshipsSql =
    """SELECT o_custkey, count(*) AS n_records FROM orders o
      |WHERE o_custkey IS NOT NULL AND NOT EXISTS
      |  (SELECT 1 FROM customer c
      |   WHERE c.c_custkey % 3 <> 0 AND c.c_custkey = o.o_custkey)
      |GROUP BY o_custkey""".stripMargin

  private val expressionSql =
    """SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
      |WHERE NOT coalesce(l_discount <= CAST(0.08 AS DOUBLE), FALSE)"""
      .stripMargin

  val oracle: Map[String, String] = Map(
    "dt_unique" -> uniqueSql,

    "dt_unique_combo" ->
      """SELECT o_custkey, o_orderstatus, count(*) AS n_records
        |FROM orders GROUP BY o_custkey, o_orderstatus
        |HAVING count(*) > 1""".stripMargin,

    "dt_not_null" -> notNullSql,

    "dt_accepted_values" -> acceptedSql,

    "dt_relationships" -> relationshipsSql,

    "dt_expression" -> expressionSql,

    "dt_freshness" ->
      """WITH m AS (
        |  SELECT event_type AS source_name, max(ts) AS max_loaded_at
        |  FROM events GROUP BY event_type),
        |a AS (
        |  SELECT source_name, max_loaded_at,
        |    CAST(floor(epoch(TIMESTAMP '2024-01-31 00:30:00')) AS BIGINT)
        |      - CAST(floor(epoch(max_loaded_at)) AS BIGINT) AS age_sec
        |  FROM m)
        |SELECT source_name, max_loaded_at, age_sec,
        |  CASE WHEN age_sec > 3600 THEN 'error'
        |       WHEN age_sec > 2700 THEN 'warn'
        |       ELSE 'pass' END AS status
        |FROM a""".stripMargin,

    "dt_suite" ->
      s"""WITH counts AS (
         |  SELECT 'unique_lineitem_l_orderkey' AS test_name,
         |    (SELECT count(*) FROM ($uniqueSql)) AS fail_count
         |  UNION ALL SELECT 'not_null_staged_cust_n_name',
         |    (SELECT count(*) FROM ($notNullSql))
         |  UNION ALL SELECT 'accepted_values_orders_o_orderstatus',
         |    (SELECT count(*) FROM ($acceptedSql))
         |  UNION ALL SELECT 'relationships_orders_o_custkey',
         |    (SELECT count(*) FROM ($relationshipsSql))
         |  UNION ALL SELECT 'expression_lineitem_discount_cap',
         |    (SELECT count(*) FROM ($expressionSql)))
         |SELECT test_name, fail_count,
         |  CASE WHEN fail_count = 0 THEN 'pass' ELSE 'fail' END AS status
         |FROM counts""".stripMargin
  )
}
