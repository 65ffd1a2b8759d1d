package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, DataOpsQueries, EventQueries,
  ExtraQueries, FunctionQueries, MaterializeQueries, PipelineQueries,
  SkewQueries, SqlCorpus, SqlTpchQueries, TestQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the oracle-verified query inventory from the per-area
  * modules under [[graft.queries]]. Every entry in [[queries]] with a
  * matching [[oracleSql]] entry is differentially checked against DuckDB
  * by the driver (Verify at sf0.01); entries without oracle SQL get a
  * rows-only check.
  */
object SparkEntry {
  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (CoreQueries.defs, CoreQueries.oracle),
    (FunctionQueries.defs, FunctionQueries.oracle),
    (MaterializeQueries.defs, MaterializeQueries.oracle),
    (DataOpsQueries.defs, DataOpsQueries.oracle),
    (EventQueries.defs, EventQueries.oracle),
    (ExtraQueries.defs, ExtraQueries.oracle),
    (PipelineQueries.defs, PipelineQueries.oracle),
    (TestQueries.defs, TestQueries.oracle),
    (SqlCorpus.defs, SqlCorpus.oracle),
    (TpchQueries.defs, TpchQueries.oracle),
    (SqlTpchQueries.defs, SqlTpchQueries.oracle),
    (SkewQueries.defs, SkewQueries.oracle)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's router-test flagship: window dedup — latest completed
    * order per customer (reference tests/test_auto_router.py:192-211). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.defs("q_window_dedup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_._2).toMap
}
