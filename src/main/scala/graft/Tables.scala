package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

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
    if (name == "events") {
      // driver-generated events.ts is parquet TIMESTAMP(NANOS) — Spark
      // has no nanosecond timestamp type, so read the raw int64 and
      // truncate to micros (the generator writes micro-resolution
      // values, so truncation is lossless and matches DuckDB's value).
      // Rewritten tables (e.g. the GenScale sf1 scale-up) store micros
      // directly and pass through.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val withTs =
        if (raw.schema("ts").dataType ==
            org.apache.spark.sql.types.LongType)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else raw
      withTs.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view named after the table, so SQL-text
    * entry points (`spark.sql`) resolve the same names the DuckDB oracle
    * sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
