package graft.materialize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.Dialect

/** SCD Type 2 snapshots as pure DataFrame programs — the reference's
  * snapshot materialization (reference
  * `macros/materializations/snapshot.sql:18-232`) re-expressed as joins
  * over immutable tables: UPDATE-close-changed and NOT-EXISTS-hard-delete
  * become recompute-and-rewrite (SURVEY.md §2.3), since Parquet tables
  * don't mutate in place.
  *
  * Audit columns match the reference exactly: `dbt_scd_id`
  * (MD5 of '-'-joined keys + change marker, snapshot.sql:99-107),
  * `dbt_updated_at`, `dbt_valid_from`, `dbt_valid_to`.
  *
  * Determinism: `now` is always an explicit parameter — operators never
  * read the wall clock (SURVEY.md §7 "Nondeterminism").
  *
  * Scale notes: one shuffle on the snapshot keys joins current-vs-staging;
  * history rows (`dbt_valid_to IS NOT NULL`) are unioned back untouched,
  * so with the target partitioned by `dbt_valid_to IS NULL` the closed
  * history never re-shuffles. The staging side is typically much smaller
  * than accumulated history — Catalyst broadcasts it under the threshold.
  */
object Snapshot {

  /** Change-detection strategy. */
  sealed trait Strategy {
    /** Marker column whose change produces a new version. */
    def marker(df: DataFrame): Column
    /** Value for dbt_updated_at / dbt_valid_from on new rows. */
    def updatedAt(df: DataFrame, now: Column): Column
  }

  /** `strategy='timestamp'`: a monotone updated-at column. */
  final case class TimestampStrategy(updatedAtCol: String) extends Strategy {
    def marker(df: DataFrame): Column = col(updatedAtCol).cast(StringType)
    def updatedAt(df: DataFrame, now: Column): Column = col(updatedAtCol)
  }

  /** `strategy='check'`: watch a column list (snapshot.sql check_cols). */
  final case class CheckStrategy(checkCols: Seq[String]) extends Strategy {
    def marker(df: DataFrame): Column =
      concat_ws("|", checkCols.map(c => col(c).cast(StringType)): _*)
    def updatedAt(df: DataFrame, now: Column): Column = now
  }

  val auditCols: Seq[String] =
    Seq("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to")

  /** Staging projection: source + the 4 audit columns
    * (snapshot.sql:89-111). */
  def stage(source: DataFrame, keys: Seq[String], strategy: Strategy,
      now: Column): DataFrame = {
    val upd = strategy.updatedAt(source, now)
    source
      .withColumn("dbt_scd_id",
        md5(concat_ws("-",
          keys.map(k => col(k).cast(StringType)) :+ strategy.marker(source): _*)))
      .withColumn("dbt_updated_at", upd)
      .withColumn("dbt_valid_from", upd)
      .withColumn("dbt_valid_to",
        lit(null).cast(org.apache.spark.sql.types.TimestampType))
  }

  /** First snapshot run: CTAS of the staged source (snapshot.sql:120-131). */
  def firstRun(source: DataFrame, keys: Seq[String], strategy: Strategy,
      now: Column): DataFrame = stage(source, keys, strategy, now)

  /** Subsequent run: close changed/deleted versions, insert new ones.
    *
    * @param hardDelete invalidate_hard_deletes: close rows whose keys
    *   vanished from the source (snapshot.sql:195-206)
    */
  def update(target: DataFrame, source: DataFrame, keys: Seq[String],
      strategy: Strategy, now: Column, hardDelete: Boolean = false)
      : DataFrame = {
    val staging = stage(source, keys, strategy, now)
    val history = target.filter(col("dbt_valid_to").isNotNull)
    val current = target.filter(col("dbt_valid_to").isNull)

    val sKeyed = staging.select(
      (keys.map(col) :+ col("dbt_scd_id").as("__s_scd_id")
        :+ col("dbt_valid_from").as("__s_valid_from")): _*)

    // UPDATE ... FROM (snapshot.sql:163-172) as a left join + conditional
    // rewrite of dbt_valid_to
    val joined = current.join(sKeyed, keys, "left")
    val changed = col("__s_scd_id").isNotNull &&
      col("__s_scd_id") =!= col("dbt_scd_id")
    val deleted = col("__s_scd_id").isNull
    val closedCurrent = joined
      .withColumn("dbt_valid_to",
        when(changed, col("__s_valid_from"))
          .when(deleted && lit(hardDelete), now)
          .otherwise(col("dbt_valid_to")))
      .drop("__s_scd_id", "__s_valid_from")

    // LEFT JOIN insert of new + changed rows (snapshot.sql:175-190)
    val cKeyed = current.select(
      (keys.map(col) :+ col("dbt_scd_id").as("__t_scd_id")): _*)
    val inserts = staging.join(cKeyed, keys, "left")
      .filter(col("__t_scd_id").isNull ||
        col("__t_scd_id") =!= col("dbt_scd_id"))
      .drop("__t_scd_id")

    history.unionByName(closedCurrent).unionByName(inserts)
  }
}
