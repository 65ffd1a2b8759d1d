package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.materialize.{Incremental, IcebergTable, IcebergWriter, Snapshot}

/** The materialization semantics of SURVEY.md §2.11 — incremental
  * append / delete+insert / merge and SCD2 snapshots — run as the same
  * pure DataFrame programs the [[graft.materialize.Materializer]] wires
  * to storage, on deterministic slices of the test tables, with full SQL
  * oracles. */
object MaterializeQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic "existing target" slice: orders before 1998. */
  private def target(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))

  /** Deterministic "new batch" slice: orders of H2-1997 onward, with
    * re-priced rows (so merge visibly replaces). */
  private def staging(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-07-01"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice") * 2.0).cast(DecimalType(18, 2)).as("price"))

  private val targetSql =
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'""".stripMargin
  private val stagingSql =
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(o_totalprice * 2.0 AS DECIMAL(18,2)) AS price
      |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-07-01'""".stripMargin

  // ------------------------------------------------------------ snapshot
  private val T1 = "2024-01-01 00:00:00"
  private val T2 = "2024-02-01 00:00:00"
  private val NOW2 = "2024-02-15 00:00:00"

  /** Snapshot source v1: every customer, pinned updated_at. */
  private def custV1(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"),
        col("c_acctbal").cast(DecimalType(12, 2)).as("bal"),
        lit(T1).cast(TimestampType).as("updated_at"))

  /** v2: nationkey<5 rows changed, custkey%97==0 rows hard-deleted,
    * 20 brand-new keys appended. */
  private def custV2(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val changedOrSame = c.filter(col("c_custkey") % 97 =!= 0)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"),
        when(col("c_nationkey") < 5,
          (col("c_acctbal") + 100.0).cast(DecimalType(12, 2)))
          .otherwise(col("c_acctbal").cast(DecimalType(12, 2))).as("bal"),
        when(col("c_nationkey") < 5, lit(T2)).otherwise(lit(T1))
          .cast(TimestampType).as("updated_at"))
    val fresh = c.filter(col("c_custkey") < 20)
      .select((col("c_custkey") + 1000000).as("c_custkey"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").cast(DecimalType(12, 2)).as("bal"),
        lit(T2).cast(TimestampType).as("updated_at"))
    changedOrSame.unionByName(fresh)
  }

  private val custV1Sql =
    s"""SELECT c_custkey, c_mktsegment AS segment,
       |  CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
       |  TIMESTAMP '$T1' AS updated_at
       |FROM customer""".stripMargin
  private val custV2Sql =
    s"""SELECT c_custkey, c_mktsegment AS segment,
       |  CASE WHEN c_nationkey < 5 THEN CAST(c_acctbal + 100.0 AS DECIMAL(12,2))
       |       ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS bal,
       |  CASE WHEN c_nationkey < 5 THEN TIMESTAMP '$T2'
       |       ELSE TIMESTAMP '$T1' END AS updated_at
       |FROM customer WHERE c_custkey % 97 <> 0
       |UNION ALL
       |SELECT c_custkey + 1000000 AS c_custkey, c_mktsegment AS segment,
       |  CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
       |  TIMESTAMP '$T2' AS updated_at
       |FROM customer WHERE c_custkey < 20""".stripMargin

  /** The audit projection of [[Snapshot.stage]] in SQL. */
  private def stageSql(src: String): String =
    s"""SELECT *,
       |  md5(concat_ws('-', CAST(c_custkey AS VARCHAR),
       |    CAST(updated_at AS VARCHAR))) AS dbt_scd_id,
       |  updated_at AS dbt_updated_at,
       |  updated_at AS dbt_valid_from,
       |  CAST(NULL AS TIMESTAMP) AS dbt_valid_to
       |FROM ($src)""".stripMargin

  val defs: Map[String, Q] = Map(
    // incremental/append (incremental.sql:110-128)
    "m_incr_append" -> ((s, dir) => {
      val t = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_orderstatus"))
      val n = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_orderstatus"))
      Incremental.append(t, n)
    }),

    // incremental/merge == delete+insert on unique key
    // (incremental.sql:161-190)
    // final projection re-casts the DECIMAL payload to DOUBLE: raw
    // DECIMAL result columns canonicalize differently across engines in
    // the driver's pandas-based hasher (Decimal('1.50') vs float 1.5)
    "m_incr_merge" -> ((s, dir) =>
      Incremental.merge(target(s, dir), staging(s, dir), Seq("o_orderkey"))
        .withColumn("price", col("price").cast(DoubleType))),

    // incremental/delete+insert partition variant (incremental.sql:137-154)
    "m_incr_delete_insert_part" -> ((s, dir) => {
      val t = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      val n = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01"))
        .select(col("o_orderkey"), (col("o_totalprice") * 2.0).as("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      Incremental.deleteInsertByPartition(t, n, "ym")
    }),

    // snapshot first run (snapshot.sql:120-131)
    "m_snapshot_first" -> ((s, dir) =>
      Snapshot.firstRun(custV1(s, dir), Seq("c_custkey"),
        Snapshot.TimestampStrategy("updated_at"),
        lit(T1).cast(TimestampType))
        .withColumn("bal", col("bal").cast(DoubleType))),

    // merge bounded by dbt incremental_predicates: only the ym >=
    // 1997-10 slice of the target is replaceable; earlier rows are
    // kept verbatim even when their key appears in staging (and the
    // staging row still inserts — dbt's documented caller-beware
    // semantics, locked here by the oracle)
    "m_incr_merge_pred" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders")
      def shaped(df: DataFrame, priced: org.apache.spark.sql.Column)
          : DataFrame =
        df.select(col("o_orderkey"), col("o_orderstatus"),
          priced.cast(DecimalType(18, 2)).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      val t = shaped(base.filter(col("o_orderdate") < lit("1998-01-01")),
        col("o_totalprice"))
      val st = shaped(
        base.filter(col("o_orderdate") >= lit("1997-07-01")),
        col("o_totalprice") * 2.0)
      Incremental.mergeWithPredicates(t, st, Seq("o_orderkey"),
        col("ym") >= lit("1997-10"))
        .withColumn("price", col("price").cast(DoubleType))
    }),

    // change-data-feed between two table states (Warehouse.diff — the
    // engine of diffVersions): inserts + deletes + update pre/post
    // images over an orders rewrite, Delta-CDF style
    "m_cdc_diff" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders")
      def shaped(df: DataFrame): DataFrame =
        df.select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      val from = shaped(base.filter(col("o_orderdate") < lit("1998-01-01")))
      val kept = from.filter(col("o_orderkey") % 100 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderstatus") === "F" && col("o_orderkey") % 7 === 0,
            (col("price") + 50).cast(DecimalType(18, 2)))
            .otherwise(col("price")).as("price"))
      val to = kept.unionByName(
        shaped(base.filter(col("o_orderdate") >= lit("1998-01-01"))))
      graft.warehouse.Warehouse.diff(from, to, Seq("o_orderkey"))
        .withColumn("price", col("price").cast(DoubleType))
    }),

    // snapshot update: changed + hard-deleted + new keys, SCD2 history
    // (snapshot.sql:133-232)
    "m_snapshot_scd2" -> ((s, dir) => {
      val first = Snapshot.firstRun(custV1(s, dir), Seq("c_custkey"),
        Snapshot.TimestampStrategy("updated_at"), lit(T1).cast(TimestampType))
      Snapshot.update(first, custV2(s, dir), Seq("c_custkey"),
        Snapshot.TimestampStrategy("updated_at"),
        lit(NOW2).cast(TimestampType), hardDelete = true)
        .withColumn("bal", col("bal").cast(DoubleType))
    }),

    // Full Iceberg v2 lifecycle through the offline writer+reader
    // (the reference's core purpose — models materialized INTO Iceberg,
    // impl.py:222-303 / bridge.py:69-232): create (snapshot 1), append
    // (2), positional-tombstone delete (3), and the incremental
    // delete+insert strategy as ONE snapshot (4), then the final state
    // read back through the manifest chain and aggregated. The file
    // layout is nondeterministic; the LIVE ROW SET is exact.
    "m_iceberg_roundtrip" -> ((s, dir) => {
      val tdir = java.nio.file.Files
        .createTempDirectory("graft_iceq").toFile.getPath
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      val b = col("o_orderkey") % 10
      IcebergWriter.create(s, tdir, o.filter(b <= 4))
      IcebergWriter.append(s, tdir, o.filter(b === 5 || b === 6))
      IcebergWriter.deleteWhere(s, tdir, col("price") < 50000)
      IcebergWriter.deleteInsert(s, tdir,
        o.filter(b === 6 || b === 7)
          .withColumn("price", (col("price") * 2).cast(DecimalType(18, 2))),
        Seq("o_orderkey"))
      // compaction (snapshot 5, replace) materializes the tombstones;
      // the aggregate below must be invariant across the boundary
      IcebergWriter.compact(s, tdir)
      IcebergTable.read(s, tdir)
        .groupBy((col("o_orderkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast(DoubleType).as("total"))
    }),

    // Manifest COLUMN BOUNDS pruning: files land range-partitioned on
    // o_orderdate, so each file's manifest-recorded
    // lower_bounds/upper_bounds interval is tight; readPruned opens
    // only the files a `>= 1998-01-01` predicate can touch (the
    // metadata-only skip channel every Iceberg engine plans with — at
    // 100 TB this is the difference between scanning a table and
    // scanning a week), then re-applies the predicate row-level, so
    // the aggregate is oracle-exact regardless of sampling boundaries.
    "m_iceberg_pruned_bounds" -> ((s, dir) => {
      val tdir = java.nio.file.Files
        .createTempDirectory("graft_iceb").toFile.getPath
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
        .repartitionByRange(8, col("o_orderdate"))
      IcebergWriter.create(s, tdir, o)
      IcebergTable.readPruned(s, tdir, Seq(IcebergTable.ScanPred(
          "o_orderdate", ">=", "1998-01-01 00:00:00")))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast(DoubleType).as("total"))
    }),

    // Non-identity partition TRANSFORMS end-to-end: bucket[4] on the
    // key (spec murmur3) + year on the date derive the layout at
    // write; readPruned evaluates the same transforms over the
    // predicate and skips every year partition before the range — the
    // tuple, not data, decides which files open, and the mid-year
    // boundary shows the row-level residual staying exact. The input
    // is range-laid on the date so each write task touches few
    // partition dirs (a thousand-tiny-file layout is a write
    // anti-pattern at ANY scale — year × bucket keeps it bounded).
    "m_iceberg_transforms" -> ((s, dir) => {
      val tdir = java.nio.file.Files
        .createTempDirectory("graft_icet").toFile.getPath
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderdate"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
        .repartitionByRange(4, col("o_orderdate"))
      IcebergWriter.createPartitioned(s, tdir, o,
        Seq(("o_orderkey", "bucket[4]"), ("o_orderdate", "year")))
      IcebergTable.readPruned(s, tdir, Seq(IcebergTable.ScanPred(
          "o_orderdate", ">=", "1999-07-01 00:00:00")))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast(DoubleType).as("total"))
    }),

    // Manifest-LIST-level pruning: three era appends leave three data
    // manifests whose list rows carry disjoint year-transform
    // summaries; a late-date predicate skips the early manifests
    // WITHOUT OPENING THEIR AVRO — the metadata tier above per-file
    // bounds. At 100 TB a table accretes thousands of manifests; a
    // selective scan must touch the few its summaries admit, not
    // parse them all. The row-level residual keeps results exact.
    // (year, not month: same list-tier semantics at a tenth of the
    // data files — a bench query should not pay for write fan-out the
    // pruning claim doesn't need; month-transform summaries are
    // covered by IcebergWriterSpec's bucket+day ranges.)
    "m_iceberg_manifest_prune" -> ((s, dir) => {
      val tdir = java.nio.file.Files
        .createTempDirectory("graft_icem").toFile.getPath
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
        .repartitionByRange(4, col("o_orderdate"))
      // era cuts are open-ended on both sides so the three appends
      // cover every row no matter the synthetic date range
      IcebergWriter.createPartitioned(s, tdir,
        o.filter(col("o_orderdate") < lit("1998-01-01")),
        Seq(("o_orderdate", "year")))
      IcebergWriter.append(s, tdir,
        o.filter(col("o_orderdate") >= lit("1998-01-01") &&
          col("o_orderdate") < lit("2000-01-01")))
      IcebergWriter.append(s, tdir,
        o.filter(col("o_orderdate") >= lit("2000-01-01")))
      IcebergTable.readPruned(s, tdir, Seq(IcebergTable.ScanPred(
          "o_orderdate", ">=", "2000-06-01 00:00:00")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast(DoubleType).as("total"))
    }),

    // NULL-aware pruning: identity partitioning on a nullable key
    // lands the NULL rows in the null partition; an IS NULL scan
    // opens only those files (the null tuple + contains_null summary
    // channels — spec transforms map null to null, so a null-free
    // partition field proves a null-free source). DuckDB re-derives
    // the same nullable key and filters IS NULL — null semantics are
    // where engines diverge most, so this is oracle-gated, not just
    // spec-tested.
    "m_iceberg_prune_nulls" -> ((s, dir) => {
      val tdir = java.nio.file.Files
        .createTempDirectory("graft_icen").toFile.getPath
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          when(col("o_orderkey") % 7 === 0, lit(null))
            .otherwise(col("o_orderpriority")).as("prio_nn"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      IcebergWriter.createPartitioned(s, tdir, o,
        Seq(("prio_nn", "identity")))
      IcebergTable.readPruned(s, tdir,
          Seq(IcebergTable.ScanPred("prio_nn", "is_null", "")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast(DoubleType).as("total"))
    }),

    // Writer-side EQUALITY deletes (spec v2 content=2) — the
    // CDC-upsert lifecycle real pipelines commit: create, two keyed
    // upserts (each ONE commit: new data + an equality-delete file
    // whose `equality_ids` hide every OLDER row of the key — cost
    // O(batch), never O(table)), then compaction materializing the
    // deletes away. The reader's strictly-greater sequence rule is
    // what keeps each upsert's own rows alive, and the aggregate must
    // be invariant across the compaction boundary.
    "m_iceberg_eq_delete" -> ((s, dir) => {
      val tdir = java.nio.file.Files
        .createTempDirectory("graft_icee").toFile.getPath
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      val b = col("o_orderkey") % 10
      IcebergWriter.create(s, tdir, o.filter(b <= 5))
      IcebergWriter.upsertKeys(s, tdir,
        o.filter(b === 4 || b === 5 || b === 6)
          .withColumn("price", (col("price") * 3).cast(DecimalType(18, 2))),
        Seq("o_orderkey"))
      IcebergWriter.upsertKeys(s, tdir,
        o.filter(b === 5)
          .withColumn("price", (col("price") * 5).cast(DecimalType(18, 2))),
        Seq("o_orderkey"))
      IcebergWriter.compact(s, tdir)
      IcebergTable.read(s, tdir)
        .groupBy((col("o_orderkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast(DoubleType).as("total"))
    }),

    // OR-of-conjunctions pruning: a year-partitioned table served a
    // disjunction — an early era OR a BETWEEN window — where a file
    // (or unopened manifest) skips only when EVERY branch excludes it.
    // Without a disjunction planner a scan like this falls back to
    // reading the whole table; here both metadata tiers keep exactly
    // the two slices and the row-level residual keeps results exact.
    "m_iceberg_prune_or" -> ((s, dir) => {
      val tdir = java.nio.file.Files
        .createTempDirectory("graft_iceo").toFile.getPath
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
        .repartitionByRange(4, col("o_orderdate"))
      IcebergWriter.createPartitioned(s, tdir, o,
        Seq(("o_orderdate", "year")))
      IcebergTable.readPrunedOr(s, tdir, Seq(
        Seq(IcebergTable.ScanPred(
          "o_orderdate", "<", "1995-01-01 00:00:00")),
        IcebergTable.between("o_orderdate",
          "2000-06-01 00:00:00", "2000-09-30 23:59:59")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast(DoubleType).as("total"))
    }),

    // Partitioned create + manifest-level file pruning: only the F
    // partition's files are opened (readWhere consults manifests, not
    // data); the injected partition column aggregates oracle-exact
    "m_iceberg_partitioned" -> ((s, dir) => {
      val tdir = java.nio.file.Files
        .createTempDirectory("graft_icep").toFile.getPath
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      IcebergWriter.create(s, tdir, o, partitionBy = Seq("o_orderstatus"))
      IcebergTable.readWhere(s, tdir,
          pv => pv.get("o_orderstatus").contains("F"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast(DoubleType).as("total"))
    })
  )

  val oracle: Map[String, String] = Map(
    "m_incr_append" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01'""".stripMargin,

    "m_incr_merge" ->
      s"""WITH t AS ($targetSql), s AS ($stagingSql),
         |m AS (SELECT * FROM t WHERE NOT EXISTS
         |  (SELECT 1 FROM s WHERE s.o_orderkey = t.o_orderkey)
         |UNION ALL SELECT * FROM s)
         |SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price
         |FROM m""".stripMargin,

    "m_incr_delete_insert_part" ->
      """WITH t AS (SELECT o_orderkey, o_totalprice,
        |    strftime(o_orderdate, '%Y-%m') AS ym FROM orders),
        |  s AS (SELECT o_orderkey, o_totalprice * 2.0 AS o_totalprice,
        |    strftime(o_orderdate, '%Y-%m') AS ym FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '2001-01-01')
        |SELECT * FROM t WHERE ym NOT IN (SELECT DISTINCT ym FROM s)
        |UNION ALL SELECT * FROM s""".stripMargin,

    "m_incr_merge_pred" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |    strftime(o_orderdate, '%Y-%m') AS ym
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        |s AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice * 2.0 AS DECIMAL(18,2)) AS price,
        |    strftime(o_orderdate, '%Y-%m') AS ym
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-07-01'),
        |outside AS (SELECT * FROM t WHERE NOT (ym >= '1997-10')),
        |inside AS (
        |  SELECT * FROM (SELECT * FROM t WHERE ym >= '1997-10') ti
        |  WHERE NOT EXISTS
        |    (SELECT 1 FROM s WHERE s.o_orderkey = ti.o_orderkey))
        |SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price,
        |  ym
        |FROM (SELECT * FROM outside UNION ALL SELECT * FROM inside
        |  UNION ALL SELECT * FROM s)""".stripMargin,

    "m_cdc_diff" ->
      """WITH f AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        |t AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0
        |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 50
        |        AS DECIMAL(18,2))
        |      ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
        |  FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_orderkey % 100 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(18,2))
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
        |j AS (
        |  SELECT f.o_orderkey AS fk, f.o_orderstatus AS fs, f.price AS fp,
        |    t.o_orderkey AS tk, t.o_orderstatus AS ts, t.price AS tp
        |  FROM f FULL OUTER JOIN t ON f.o_orderkey = t.o_orderkey),
        |chg AS (
        |  SELECT * FROM j WHERE fk IS NOT NULL AND tk IS NOT NULL
        |    AND (fs IS DISTINCT FROM ts OR fp IS DISTINCT FROM tp))
        |SELECT tk AS o_orderkey, ts AS o_orderstatus,
        |  CAST(tp AS DOUBLE) AS price, 'insert' AS _change_type
        |FROM j WHERE fk IS NULL
        |UNION ALL SELECT fk, fs, CAST(fp AS DOUBLE), 'delete'
        |FROM j WHERE tk IS NULL
        |UNION ALL SELECT fk, fs, CAST(fp AS DOUBLE), 'update_preimage'
        |FROM chg
        |UNION ALL SELECT tk, ts, CAST(tp AS DOUBLE), 'update_postimage'
        |FROM chg""".stripMargin,

    "m_snapshot_first" ->
      s"""SELECT c_custkey, segment, CAST(bal AS DOUBLE) AS bal, updated_at,
         |  dbt_scd_id, dbt_updated_at, dbt_valid_from, dbt_valid_to
         |FROM (${stageSql(custV1Sql)})""".stripMargin,

    "m_snapshot_scd2" ->
      s"""WITH t0 AS (${stageSql(custV1Sql)}),
         |  s2 AS (${stageSql(custV2Sql)}),
         |  closed AS (
         |    SELECT t.c_custkey, t.segment, t.bal, t.updated_at,
         |      t.dbt_scd_id, t.dbt_updated_at, t.dbt_valid_from,
         |      CASE WHEN s.dbt_scd_id IS NOT NULL
         |             AND s.dbt_scd_id <> t.dbt_scd_id THEN s.dbt_valid_from
         |           WHEN s.dbt_scd_id IS NULL THEN TIMESTAMP '$NOW2'
         |           ELSE t.dbt_valid_to END AS dbt_valid_to
         |    FROM t0 t LEFT JOIN s2 s ON t.c_custkey = s.c_custkey),
         |  ins AS (
         |    SELECT s.* FROM s2 s LEFT JOIN t0 t ON s.c_custkey = t.c_custkey
         |    WHERE t.dbt_scd_id IS NULL OR t.dbt_scd_id <> s.dbt_scd_id)
         |SELECT c_custkey, segment, CAST(bal AS DOUBLE) AS bal, updated_at,
         |  dbt_scd_id, dbt_updated_at, dbt_valid_from, dbt_valid_to
         |FROM (SELECT * FROM closed UNION ALL SELECT * FROM ins)""".stripMargin,

    // executable spec of the 4-snapshot lifecycle's final live row set:
    // buckets 0-5 keep the deleteWhere survivors at original price;
    // bucket-6 originals are all tombstoned by the delete+insert key
    // match; buckets 6-7 carry the re-priced batch
    "m_iceberg_roundtrip" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
        |f AS (
        |  SELECT o_orderkey, price FROM o
        |  WHERE o_orderkey % 10 <= 5 AND NOT (price < 50000)
        |  UNION ALL
        |  SELECT o_orderkey, CAST(price * 2 AS DECIMAL(18,2)) AS price
        |  FROM o WHERE o_orderkey % 10 IN (6, 7))
        |SELECT o_orderkey % 10 AS bucket, count(*) AS n_orders,
        |  CAST(SUM(price) AS DOUBLE) AS total
        |FROM f GROUP BY 1""".stripMargin,

    "m_iceberg_partitioned" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders WHERE o_orderstatus = 'F' GROUP BY 1""".stripMargin,

    "m_iceberg_pruned_bounds" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,

    "m_iceberg_transforms" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1999-07-01'
        |GROUP BY 1""".stripMargin,

    "m_iceberg_manifest_prune" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders WHERE o_orderdate >= TIMESTAMP '2000-06-01'
        |GROUP BY 1""".stripMargin,

    // executable spec of the upsert lifecycle's live row set: buckets
    // 0-3 original; 4 and 6 from the first upsert (×3 — the equality
    // delete hid every older bucket-4 row; bucket 6 had no original);
    // 5 from the second (×5, hiding both earlier versions)
    "m_iceberg_eq_delete" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
        |f AS (
        |  SELECT o_orderkey, price FROM o WHERE o_orderkey % 10 <= 3
        |  UNION ALL
        |  SELECT o_orderkey, CAST(price * 3 AS DECIMAL(18,2))
        |  FROM o WHERE o_orderkey % 10 IN (4, 6)
        |  UNION ALL
        |  SELECT o_orderkey, CAST(price * 5 AS DECIMAL(18,2))
        |  FROM o WHERE o_orderkey % 10 = 5)
        |SELECT o_orderkey % 10 AS bucket, count(*) AS n_orders,
        |  CAST(SUM(price) AS DOUBLE) AS total
        |FROM f GROUP BY 1""".stripMargin,

    "m_iceberg_prune_or" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders
        |WHERE o_orderdate < TIMESTAMP '1995-01-01'
        |   OR (o_orderdate >= TIMESTAMP '2000-06-01'
        |       AND o_orderdate <= TIMESTAMP '2000-09-30 23:59:59')
        |GROUP BY 1""".stripMargin,

    "m_iceberg_prune_nulls" ->
      """WITH t AS (SELECT o_orderkey, o_orderpriority,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |       ELSE o_orderpriority END AS prio_nn,
        |  o_totalprice FROM orders)
        |SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM t WHERE prio_nn IS NULL GROUP BY 1""".stripMargin
  )
}
