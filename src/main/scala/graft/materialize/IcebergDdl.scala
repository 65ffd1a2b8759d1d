package graft.materialize

/** Iceberg DDL generation for the four cloud dialects — port of the
  * reference's bridge (reference `bridge.py:69-232`): wraps a SELECT in
  * the engine-specific CREATE ICEBERG TABLE form. On a real Spark
  * cluster the native path is `df.writeTo(t).using("iceberg")
  * .partitionedBy(...).createOrReplace()`; these DDL builders cover the
  * cross-engine handoff the reference does (publishing tables a cloud
  * warehouse can register).
  */
object IcebergDdl {

  final case class IcebergConfig(
      schema: String,
      table: String,
      catalogIntegration: Option[String] = None,
      externalVolume: Option[String] = None,
      partitionBy: Option[String] = None,
      location: Option[String] = None,
      connection: Option[String] = None)

  sealed trait Provider
  case object Snowflake extends Provider
  case object Databricks extends Provider
  case object BigQuery extends Provider
  case object Athena extends Provider

  def construct(provider: Provider, sql: String, config: IcebergConfig,
      isReplace: Boolean = true): String = provider match {
    case Snowflake  => snowflake(sql, config, isReplace)
    case Databricks => databricks(sql, config, isReplace)
    case BigQuery   => bigquery(sql, config, isReplace)
    case Athena     => athena(sql, config)
  }

  /** bridge.py:97-133: CATALOG_INTEGRATION + EXTERNAL_VOLUME. */
  private def snowflake(sql: String, c: IcebergConfig,
      isReplace: Boolean): String = {
    val create = if (isReplace) "CREATE OR REPLACE" else "CREATE"
    val part = c.partitionBy.map(p => s"\nPARTITION BY ($p)").getOrElse("")
    s"""$create ICEBERG TABLE ${c.schema}.${c.table}
       |CATALOG_INTEGRATION = '${c.catalogIntegration.getOrElse("")}'
       |EXTERNAL_VOLUME = '${c.externalVolume.getOrElse("")}'$part
       |AS
       |${sql.trim}""".stripMargin
  }

  /** bridge.py:135-166: USING ICEBERG + LOCATION. */
  private def databricks(sql: String, c: IcebergConfig,
      isReplace: Boolean): String = {
    val create = if (isReplace) "CREATE OR REPLACE" else "CREATE"
    val loc = c.location.map(l => s"\nLOCATION '$l'").getOrElse("")
    val part = c.partitionBy.map(p => s"\nPARTITIONED BY ($p)").getOrElse("")
    s"""$create TABLE ${c.schema}.${c.table}
       |USING ICEBERG$loc$part
       |AS
       |${sql.trim}""".stripMargin
  }

  /** bridge.py:168-201: EXTERNAL TABLE + OPTIONS(format='ICEBERG'). */
  private def bigquery(sql: String, c: IcebergConfig,
      isReplace: Boolean): String = {
    val create = if (isReplace) "CREATE OR REPLACE" else "CREATE"
    val conn = c.connection.map(x => s"\nWITH CONNECTION `$x`").getOrElse("")
    s"""$create EXTERNAL TABLE `${c.schema}.${c.table}`$conn
       |OPTIONS (
       |  format = 'ICEBERG'
       |)
       |AS
       |${sql.trim}""".stripMargin
  }

  /** bridge.py:203-232: WITH (table_type='ICEBERG'); Athena CTAS has no
    * OR REPLACE. */
  private def athena(sql: String, c: IcebergConfig): String = {
    val loc = c.location
      .getOrElse(s"s3://warehouse/${c.schema}/${c.table}")
    s"""CREATE TABLE ${c.schema}.${c.table}
       |WITH (
       |  table_type = 'ICEBERG',
       |  location = '$loc',
       |  format = 'PARQUET'
       |)
       |AS
       |${sql.trim}""".stripMargin
  }
}
