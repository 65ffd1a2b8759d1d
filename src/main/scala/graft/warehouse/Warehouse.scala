package graft.warehouse

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Filesystem warehouse: one directory per schema, one Parquet dir per
  * table — the local stand-in for the reference's DuckDB database file +
  * schemas (reference `macros/adapters.sql:18-47`). Views are kept as a
  * session-level registry of DataFrames (CREATE OR REPLACE VIEW —
  * `adapters.sql:49-53`).
  *
  * At cluster scale the root becomes an object-store prefix and
  * `saveAsTable`/Iceberg replace the raw Parquet dirs; the API is kept at
  * that altitude so swapping the backend does not touch callers.
  */
class Warehouse(val spark: SparkSession, val root: String) {
  private val views =
    scala.collection.mutable.Map[(String, String), DataFrame]()

  def tablePath(schema: String, name: String): String =
    s"$root/$schema/$name"

  def createSchema(schema: String): Unit =
    Files.createDirectories(Paths.get(root, schema))

  def tableExists(schema: String, name: String): Boolean =
    Files.exists(Paths.get(tablePath(schema, name), "_SUCCESS"))

  def viewExists(schema: String, name: String): Boolean =
    views.contains((schema, name))

  def relationExists(schema: String, name: String): Boolean =
    tableExists(schema, name) || viewExists(schema, name)

  def read(schema: String, name: String): DataFrame =
    views.getOrElse((schema, name),
      spark.read.parquet(tablePath(schema, name)))

  /** CTAS — CREATE OR REPLACE TABLE (adapters.sql:32-47). Overwrite is
    * atomic-enough locally (Spark writes to a staging dir then renames);
    * partitionBy columns become physical partition dirs so partition-wise
    * incremental rewrites prune. */
  def createTableAs(df: DataFrame, schema: String, name: String,
      partitionBy: Seq[String] = Nil, mode: SaveMode = SaveMode.Overwrite)
      : Unit = {
    createSchema(schema)
    views.remove((schema, name))
    val w = df.write.mode(mode)
    val withParts = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    withParts.parquet(tablePath(schema, name))
  }

  def append(df: DataFrame, schema: String, name: String): Unit =
    createTableAs(df, schema, name, mode = SaveMode.Append)

  /** CREATE OR REPLACE VIEW — lazily re-evaluated on each read. */
  def createView(df: DataFrame, schema: String, name: String): Unit =
    views((schema, name)) = df

  /** Bucketed table: pre-shuffled on `bucketCols` so equi-joins and
    * aggregations on those columns skip the exchange entirely — the
    * co-located-join strategy for repeatedly-joined big tables.
    * Registered in the session catalog (bucket metadata lives there);
    * read back with [[readBucketed]]. */
  def createBucketedTable(df: DataFrame, schema: String, name: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    createSchema(schema)
    val catalogName = s"graft_${schema}_$name"
    spark.sql(s"DROP TABLE IF EXISTS $catalogName")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", tablePath(schema, name))
      .saveAsTable(catalogName)
  }

  def readBucketed(schema: String, name: String): DataFrame =
    spark.table(s"graft_${schema}_$name")

  /** Promote a staged table directory to its final name by filesystem
    * rename — the reference's tmp-then-swap is a rename too
    * (incremental.sql:110-123). One data write per rewrite; on an
    * object store this becomes the catalog pointer swap. */
  def promote(schema: String, tmpName: String, name: String): Unit = {
    drop(schema, name)
    Files.move(Paths.get(tablePath(schema, tmpName)),
      Paths.get(tablePath(schema, name)))
  }

  def drop(schema: String, name: String): Unit = {
    views.remove((schema, name))
    val p = Paths.get(tablePath(schema, name))
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
  }

  def rowCount(schema: String, name: String): Long = read(schema, name).count()
}
