package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt generic data tests as DataFrame programs.
  *
  * The reference is a dbt adapter, so its users' daily workload includes
  * `dbt test`: dbt compiles each generic test (unique / not_null /
  * accepted_values / relationships, plus the dbt-utils staples) into a
  * SELECT returning VIOLATING rows and routes it through the adapter's
  * connection path exactly like a model query (reference
  * `dbt/adapters/icebreaker/connections.py` executes compiled test SQL
  * verbatim; the macros themselves live upstream in dbt-core). Here each
  * test is the equivalent declarative DataFrame program — empty result =
  * pass — so Catalyst plans them like any other query.
  *
  * Scale shapes (100 TB audit):
  *  - unique / uniqueCombination: one hash-aggregate shuffle on the key
  *    with map-side partial counts; HAVING is applied post-agg, so only
  *    per-key counts move, never rows.
  *  - notNull / expressionIsTrue: narrow codegen'd filters, zero shuffle.
  *  - acceptedValues: narrow filter then a tiny groupBy over (few)
  *    violating values.
  *  - relationships: LEFT ANTI join child→parent keys; Spark broadcasts
  *    the deduped parent-key side when small (dimension FKs — the common
  *    dbt case) and falls back to a shuffled anti-join for fact-to-fact.
  *  - suite: each member test reduces to a 1-row count before the union,
  *    so the summary is a union of partial-aggregated scalars.
  */
object DataTests {

  /** `unique`: key values that occur more than once, with their
    * multiplicity — dbt-core's compiled form
    * `SELECT k, count(*) FROM m GROUP BY k HAVING count(*) > 1`. */
  def unique(df: DataFrame, keyCol: String): DataFrame =
    uniqueCombination(df, Seq(keyCol))

  /** dbt-utils `unique_combination_of_columns`. */
  def uniqueCombination(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > 1)

  /** `not_null`: the rows whose column is NULL (caller projects the
    * columns it wants reported). */
  def notNull(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  /** `accepted_values`: distinct out-of-domain values with counts —
    * dbt-core's compiled form groups violations by value. */
  def acceptedValues(df: DataFrame, c: String,
      allowed: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(allowed: _*))
      .groupBy(col(c).as("value_field"))
      .agg(count(lit(1)).as("n_records"))

  /** `relationships`: child foreign-key values with no matching parent
    * key (referential-integrity orphans), grouped with counts. NULL FKs
    * are not violations (dbt semantics: relationships skips NULLs). */
  def relationships(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame = {
    val parentKeys = parent.select(col(pkCol)).distinct()
    child.filter(col(fkCol).isNotNull)
      .join(parentKeys, child(fkCol) === parentKeys(pkCol), "left_anti")
      .groupBy(col(fkCol))
      .agg(count(lit(1)).as("n_records"))
  }

  /** dbt-utils `expression_is_true`: rows where the expression is not
    * TRUE. Deliberate strictness deviation from the macro: dbt-utils'
    * `WHERE NOT (expr)` drops NULL-valued expressions (NOT NULL is
    * NULL → filtered out); here NULL counts as a violation, because a
    * data test that silently passes rows where the asserted expression
    * can't even be evaluated hides exactly the rows most likely to be
    * broken. The oracle encodes the same NULL-as-violation semantics. */
  def expressionIsTrue(df: DataFrame, predicate: Column): DataFrame =
    df.filter(!coalesce(predicate, lit(false)))

  /** `dbt source freshness`: per-source max(loaded_at), age at `now`,
    * and pass/warn/error status against the declared thresholds — the
    * other daily dbt workload the adapter executes (dbt-core compiles
    * it to exactly this max-timestamp SELECT per source). `now` is
    * caller-pinned (library determinism convention — never
    * wall-clock). Age is integer seconds (second-truncated epochs), so
    * the classification is engine-exact. One tiny aggregate per
    * source; the scan prunes to the timestamp (+ grouping) columns. */
  def sourceFreshness(df: DataFrame, sourceCol: String, tsCol: String,
      now: Column, warnAfterSec: Long, errorAfterSec: Long): DataFrame =
    df.groupBy(col(sourceCol).as("source_name"))
      .agg(max(col(tsCol)).as("max_loaded_at"))
      .select(col("source_name"), col("max_loaded_at"),
        (unix_timestamp(now) - unix_timestamp(col("max_loaded_at")))
          .as("age_sec"))
      .withColumn("status",
        when(col("age_sec") > errorAfterSec, lit("error"))
          .when(col("age_sec") > warnAfterSec, lit("warn"))
          .otherwise(lit("pass")))

  /** A `dbt test` run summary: one row per named test with its failure
    * count and status — the console table dbt prints after a run. Each
    * member DataFrame must be the test's violation set. */
  def suite(tests: Seq[(String, DataFrame)]): DataFrame =
    tests.map { case (name, violations) =>
      violations.agg(count(lit(1)).as("fail_count"))
        .select(lit(name).as("test_name"), col("fail_count"),
          when(col("fail_count") === 0, lit("pass"))
            .otherwise(lit("fail")).as("status"))
    }.reduce(_.unionByName(_))

  /** dbt `--store-failures`: persist every member test's violation set
    * as a queryable table in the audit schema (dbt's
    * `dbt_test__audit` convention) plus the run summary, and return
    * the summary. Each violation table is one independent write of an
    * already-bounded result; failed-row tables are the artifact an
    * on-call debugs from without re-running the test. */
  def storeFailures(wh: graft.warehouse.Warehouse,
      tests: Seq[(String, DataFrame)],
      auditSchema: String = "dbt_test__audit"): DataFrame = {
    tests.foreach { case (name, violations) =>
      wh.createTableAs(violations, auditSchema, name)
    }
    wh.createTableAs(suite(tests), auditSchema, "run_summary")
    wh.read(auditSchema, "run_summary")
  }
}
