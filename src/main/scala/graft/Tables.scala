package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader over the driver-generated parquet dirs
  * (`/root/testdata/sf*`, see TESTDATA.md). One parquet file per table.
  *
  * Mirrors the reference's cached-source registration
  * (reference `source_cache.py:389-426`: `CREATE VIEW s.t AS SELECT * FROM
  * read_parquet(path)`) — here a plain `spark.read.parquet`, which keeps
  * predicate pushdown and column pruning available to Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view named after the table, so SQL-text
    * entry points (`spark.sql`) resolve the same names the DuckDB oracle
    * sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
