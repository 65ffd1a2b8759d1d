package graft.materialize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Incremental-materialization strategies as pure DataFrame programs —
  * the relational core of the reference's incremental macros
  * (reference `macros/materializations/incremental.sql:110-190`). The
  * storage layer ([[Materializer]]) wires these to table rewrites; the
  * programs themselves are side-effect-free so they can be oracle-checked
  * directly.
  *
  * Scale notes: `merge`/`deleteInsert` shuffle both sides on the unique
  * key — at 100 TB the target table should be bucketed/partitioned on the
  * same key so only matching partitions rewrite (the partition variant
  * does exactly that and is preferred when a partition column exists).
  * Spark plans the anti-join as broadcast automatically when the staging
  * side is small, which is the common incremental case.
  */
object Incremental {

  /** `append`: INSERT INTO target SELECT * FROM staging
    * (incremental.sql:110-128). `evolveSchema` is dbt's
    * on_schema_change='append_new_columns': new staging columns join the
    * table, old rows null-filled. */
  def append(target: DataFrame, staging: DataFrame,
      evolveSchema: Boolean = false): DataFrame =
    target.unionByName(staging, allowMissingColumns = evolveSchema)

  /** dbt `on_schema_change='sync_all_columns'`, the removal half:
    * project the target down to the columns the staging batch still
    * carries (the add half is `allowMissingColumns` on the union, same
    * as append_new_columns). Callers compose:
    * `syncColumns(target, staging)` then union with evolve. */
  def syncColumns(target: DataFrame, staging: DataFrame): DataFrame = {
    val stagingCols = staging.columns.toSet
    target.select(
      target.columns.filter(stagingCols.contains).map(col).toIndexedSeq: _*)
  }

  /** `delete+insert` / `merge` on unique keys. The reference implements
    * BOTH as delete-matching-then-insert (merge is "implemented as
    * DELETE+INSERT" — incremental.sql:161-190): rows in the target whose
    * key appears in staging are replaced wholesale. */
  def merge(target: DataFrame, staging: DataFrame, keys: Seq[String],
      evolveSchema: Boolean = false): DataFrame =
    target.join(staging, keys, "left_anti")
      .unionByName(staging, allowMissingColumns = evolveSchema)

  /** `merge` with dbt `incremental_predicates`: the predicates bound
    * the REPLACEABLE slice of the target, so only rows satisfying them
    * are eligible for key-matched deletion — rows outside the slice
    * are kept verbatim and never enter the join. This is dbt's scale
    * lever for huge incremental targets ("only consider the last 7
    * days"): the anti-join's target side shrinks from the whole table
    * to the predicate slice, and with a partition-aligned predicate
    * the kept remainder is a pruned pass-through scan. Same
    * caller-beware semantics as dbt: a staging row whose target match
    * lies OUTSIDE the slice still inserts (the predicate is a promise
    * that such rows don't exist). */
  def mergeWithPredicates(target: DataFrame, staging: DataFrame,
      keys: Seq[String], predicate: org.apache.spark.sql.Column,
      evolveSchema: Boolean = false): DataFrame = {
    val outside = target.filter(!predicate ||
      predicate.isNull) // NULL predicate rows are not replaceable
    val inside = target.filter(predicate)
    outside
      .unionByName(inside.join(staging, keys, "left_anti"))
      .unionByName(staging, allowMissingColumns = evolveSchema)
  }

  /** `delete+insert` partition variant: DELETE WHERE partition IN
    * (SELECT DISTINCT partition FROM staging) then insert
    * (incremental.sql:137-154). With a partitioned target table this is a
    * metadata-only dynamic partition overwrite — no anti-join shuffle. */
  def deleteInsertByPartition(target: DataFrame, staging: DataFrame,
      partitionCol: String, evolveSchema: Boolean = false): DataFrame = {
    val parts = staging.select(col(partitionCol)).distinct()
    target.join(parts, Seq(partitionCol), "left_anti")
      .unionByName(staging, allowMissingColumns = evolveSchema)
  }
}
