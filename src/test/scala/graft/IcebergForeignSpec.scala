package graft

import java.io.File
import java.nio.ByteBuffer
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.materialize.{IcebergMetadata, IcebergSingleValue, IcebergTable, IcebergWriter}

/** FOREIGN-written Iceberg tables: manifests and manifest lists laid
  * out exactly as real engines (Spark+Iceberg, Flink, Trino) write
  * them per the public spec — field-id-keyed stats maps whose values
  * are Appendix D binary single-value serializations, r102 typed
  * partition structs, binary field-summary bounds — hand-built here
  * with the same avro layer the reader parses. This is the read path
  * the reference's adapter actually serves (connections.py:990-1055
  * ATTACHes catalogs of tables OTHER systems wrote), and what the
  * pruning tiers must fire on without this repo's writer in the loop.
  * Also locks the advisor's round-14 safety items: `void` transforms
  * never let null-tuple inference skip live files, summaries from a
  * non-default partition_spec_id never prune, and nested partition
  * sources resolve to dotted paths (never a wrong top-level match). */
class IcebergForeignSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---------------------------------------------------------------- //
  //  Appendix D codec round-trip
  // ---------------------------------------------------------------- //

  test("Appendix D codec: encode/decode round-trips every primitive type") {
    val cases: Seq[(DataType, Seq[String])] = Seq(
      BooleanType -> Seq("true", "false"),
      IntegerType -> Seq("0", "42", "-7", "2147483647"),
      LongType -> Seq("0", "9131", "-123456789012345"),
      FloatType -> Seq("1.5", "-0.25"),
      DoubleType -> Seq("3.141592653589793", "-1.0E-7"),
      DateType -> Seq("1970-01-01", "1995-03-15", "1969-12-31"),
      TimestampType -> Seq("1995-03-15 00:00:00.000000",
        "2001-07-04 12:30:45.123456"),
      TimestampNTZType -> Seq("1969-12-31 23:59:59.999999"),
      StringType -> Seq("", "alpha", "naïve — δ"),
      DecimalType(9, 2) -> Seq("12345.67", "-0.01", "0.00"))
    cases.foreach { case (dt, vals) =>
      vals.foreach { v =>
        val enc = IcebergSingleValue.encode(dt, v)
        assert(enc.isDefined, s"$dt: $v failed to encode")
        assert(IcebergSingleValue.decode(dt, enc.get).contains(v),
          s"$dt: $v did not round-trip")
      }
    }
    // spec byte-layout pins (not just self-consistency): int 4-byte LE,
    // date = days-from-epoch int, decimal = minimal big-endian unscaled
    assert(IcebergSingleValue.encode(IntegerType, "1").get.toSeq ==
      Seq[Byte](1, 0, 0, 0))
    assert(IcebergSingleValue.encode(DateType, "1970-01-02").get.toSeq ==
      Seq[Byte](1, 0, 0, 0))
    assert(IcebergSingleValue.encode(DecimalType(9, 2), "2.56").get.toSeq ==
      Seq[Byte](1, 0)) // unscaled 256 = 0x0100
    // undecodable shapes keep conservative: wrong length, raw binary
    assert(IcebergSingleValue.decode(IntegerType, Array[Byte](1, 2)).isEmpty)
    assert(IcebergSingleValue.decode(BinaryType, Array[Byte](1)).isEmpty)
  }

  // ---------------------------------------------------------------- //
  //  Foreign table fixture: binary stats, r102 tuples, binary summaries
  // ---------------------------------------------------------------- //

  // the spec's manifest layout as real writers emit it: stats maps are
  // avro logical maps = arrays of (key int, value bytes) records
  private val kvBytes =
    """{"type":"array","items":{"type":"record","name":"kvb","fields":[
      |{"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}"""
      .stripMargin
  private val kvLong =
    """{"type":"array","items":{"type":"record","name":"kvl","fields":[
      |{"name":"key","type":"int"},{"name":"value","type":"long"}]}}"""
      .stripMargin
  private val foreignManifestSchema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int"},
       |{"name":"sequence_number","type":["null","long"],"default":null},
       |{"name":"data_file","type":{"type":"record","name":"df","fields":[
       |{"name":"content","type":"int"},
       |{"name":"file_path","type":"string"},
       |{"name":"record_count","type":"long"},
       |{"name":"partition","type":{"type":"record","name":"r102","fields":[
       |{"name":"ds_day","type":["null","int"],"default":null}]}},
       |{"name":"lower_bounds","type":["null",$kvBytes],"default":null},
       |{"name":"upper_bounds","type":["null",$kvBytes],"default":null},
       |{"name":"null_value_counts","type":["null",$kvLong],"default":null}
       |]}}]}""".stripMargin)
  private val foreignListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"partitions","type":["null",{"type":"array","items":
      |{"type":"record","name":"field_summary","fields":[
      |{"name":"contains_null","type":"boolean"},
      |{"name":"lower_bound","type":["null","bytes"],"default":null},
      |{"name":"upper_bound","type":["null","bytes"],"default":null}
      |]}}],"default":null}]}""".stripMargin)

  private def writeAvro(path: File, schema: Schema,
      rows: Seq[GenericRecord]): Unit = {
    path.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    rows.foreach(w.append)
    w.close()
  }

  private def kvRow(schema: Schema, key: Int, value: Any): GenericRecord = {
    val r = new GenericData.Record(schema)
    r.put("key", key)
    r.put("value", value)
    r
  }

  private def bb(dt: DataType, v: String): ByteBuffer =
    ByteBuffer.wrap(IcebergSingleValue.encode(dt, v).get)

  /** One spec-conformant data-file manifest row: binary bounds keyed by
    * FIELD ID (1=id long, 2=ds date, 3=price decimal(9,2), 4=name
    * string), r102 typed tuple carrying day(ds). */
  private def foreignRow(filePath: String, rows: Long, dayVal: Int,
      idLo: String, idHi: String, dsLo: String, dsHi: String,
      priceLo: String, priceHi: String,
      nameNulls: Long): GenericRecord = {
    val dfS = foreignManifestSchema.getField("data_file").schema()
    val itemB = dfS.getField("lower_bounds").schema()
      .getTypes.get(1).getElementType
    val itemL = dfS.getField("null_value_counts").schema()
      .getTypes.get(1).getElementType
    def bounds(id: String, ds: String, price: String) = {
      val a = new java.util.ArrayList[GenericRecord]()
      a.add(kvRow(itemB, 1, bb(LongType, id)))
      a.add(kvRow(itemB, 2, bb(DateType, ds)))
      a.add(kvRow(itemB, 3, bb(DecimalType(9, 2), price)))
      a
    }
    val pr = new GenericData.Record(dfS.getField("partition").schema())
    pr.put("ds_day", Int.box(dayVal))
    val nulls = new java.util.ArrayList[GenericRecord]()
    nulls.add(kvRow(itemL, 1, Long.box(0L)))
    nulls.add(kvRow(itemL, 2, Long.box(0L)))
    nulls.add(kvRow(itemL, 4, Long.box(nameNulls)))
    val df = new GenericData.Record(dfS)
    df.put("content", 0)
    df.put("file_path", filePath)
    df.put("record_count", rows)
    df.put("partition", pr)
    df.put("lower_bounds", bounds(idLo, dsLo, priceLo))
    df.put("upper_bounds", bounds(idHi, dsHi, priceHi))
    df.put("null_value_counts", nulls)
    val r = new GenericData.Record(foreignManifestSchema)
    r.put("status", 1)
    r.put("data_file", df)
    r
  }

  private def foreignListRow(path: String, seq: Long, specId: Int,
      summary: Option[(Boolean, String, String)]): GenericRecord = {
    val r = new GenericData.Record(foreignListSchema)
    r.put("manifest_path", path)
    r.put("content", 0)
    r.put("sequence_number", seq)
    r.put("partition_spec_id", specId)
    summary.foreach { case (cn, lo, hi) =>
      val itemS = foreignListSchema.getField("partitions").schema()
        .getTypes.get(1).getElementType
      val g = new GenericData.Record(itemS)
      g.put("contains_null", cn)
      // day-transform summary bounds: the spec `date` value domain —
      // 4-byte LE day ordinals, here built from the ordinal itself
      g.put("lower_bound", bb(IntegerType, lo))
      g.put("upper_bound", bb(IntegerType, hi))
      val arr = new java.util.ArrayList[GenericRecord]()
      arr.add(g)
      r.put("partitions", arr)
    }
    r
  }

  private def onePart(dir: File, df: org.apache.spark.sql.DataFrame,
      name: String): Unit = {
    val tmp = new File(dir, s"__tmp_${name.replace('/', '_')}")
    df.coalesce(1).write.parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dst = new File(dir, name)
    dst.getParentFile.mkdirs()
    java.nio.file.Files.move(part.toPath, dst.toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
  }

  /** Three-file day-partitioned foreign table: eras 1995 / 1998 / 2000,
    * each file one manifest, every stats structure in the spec's
    * binary layout. `m2SpecId` lets the spec-id test mark the middle
    * manifest as written under a different (evolved-away) spec. */
  private def buildForeign(m2SpecId: Int = 0): String = {
    val dir = Files.createTempDirectory("graft_iceforeign").toFile
    val loc = dir.getPath
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, lit}
    def slice(ids: Seq[Long], day0: String, name: (Long => String))
        : org.apache.spark.sql.DataFrame =
      ids.map(i => (i, java.sql.Date.valueOf(day0),
        new java.math.BigDecimal(i).multiply(new java.math.BigDecimal("1.50")),
        name(i)))
        .toDF("id", "ds", "price", "name")
        .select(col("id"), col("ds"),
          col("price").cast(DecimalType(9, 2)).as("price"), col("name"))
    onePart(dir, slice(Seq(1L, 2L, 3L), "1995-01-05", i => s"a$i"),
      "data/f1.parquet")
    onePart(dir, slice(Seq(4L, 5L, 6L), "1998-06-10", i => s"b$i"),
      "data/f2.parquet")
    onePart(dir, slice(Seq(7L, 8L, 9L), "2000-12-20", i => s"c$i"),
      "data/f3.parquet")
    val day95 = java.time.LocalDate.parse("1995-01-05").toEpochDay.toInt
    val day98 = java.time.LocalDate.parse("1998-06-10").toEpochDay.toInt
    val day00 = java.time.LocalDate.parse("2000-12-20").toEpochDay.toInt
    writeAvro(new File(dir, "metadata/m1.avro"), foreignManifestSchema,
      Seq(foreignRow(s"$loc/data/f1.parquet", 3, day95,
        "1", "3", "1995-01-05", "1995-01-05", "1.50", "4.50", 0)))
    writeAvro(new File(dir, "metadata/m2.avro"), foreignManifestSchema,
      Seq(foreignRow(s"$loc/data/f2.parquet", 3, day98,
        "4", "6", "1998-06-10", "1998-06-10", "6.00", "9.00", 0)))
    writeAvro(new File(dir, "metadata/m3.avro"), foreignManifestSchema,
      Seq(foreignRow(s"$loc/data/f3.parquet", 3, day00,
        "7", "9", "2000-12-20", "2000-12-20", "10.50", "13.50", 0)))
    writeAvro(new File(dir, "metadata/ml1.avro"), foreignListSchema, Seq(
      foreignListRow(s"$loc/metadata/m1.avro", 1L, 0,
        Some((false, day95.toString, day95.toString))),
      foreignListRow(s"$loc/metadata/m2.avro", 2L, m2SpecId,
        Some((false, day98.toString, day98.toString))),
      foreignListRow(s"$loc/metadata/m3.avro", 3L, 0,
        Some((false, day00.toString, day00.toString)))))
    val metadata =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "0000-foreign",
         |  "location": "$loc",
         |  "last-updated-ms": 3000,
         |  "current-snapshot-id": 300,
         |  "current-schema-id": 0,
         |  "schemas": [{
         |    "schema-id": 0, "type": "struct", "fields": [
         |      {"id": 1, "name": "id", "required": true, "type": "long"},
         |      {"id": 2, "name": "ds", "required": false, "type": "date"},
         |      {"id": 3, "name": "price", "required": false,
         |       "type": "decimal(9, 2)"},
         |      {"id": 4, "name": "name", "required": false, "type": "string"}
         |    ]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "ds_day", "transform": "day",
         |     "source-id": 2, "field-id": 1000}]}],
         |  "snapshots": [
         |    {"snapshot-id": 300, "timestamp-ms": 3000,
         |     "manifest-list": "$loc/metadata/ml1.avro",
         |     "summary": {"operation": "append"}}
         |  ]
         |}""".stripMargin
    java.nio.file.Files.writeString(
      new File(dir, "metadata/00001-foreign.metadata.json").toPath, metadata)
    dir.getPath
  }

  test("foreign binary file bounds prune at the FILE tier; results exact") {
    val dir = buildForeign()
    val md = IcebergTable.loadMetadata(dir)
    val entries = IcebergTable.snapshotFiles(md,
      md.currentSnapshot.get, dir).filter(_.content == 0)
    assert(entries.size == 3)
    // decoded binary bounds are canonical strings for every column
    assert(entries.flatMap(_.lowerBounds.get("ds")).sorted ==
      Seq("1995-01-05", "1998-06-10", "2000-12-20"))
    assert(entries.flatMap(_.upperBounds.get("price")).sorted ==
      Seq("13.50", "4.50", "9.00"))
    assert(entries.forall(_.nullCounts.get("id").contains(0L)))
    // long bounds: id = 8 touches only f3
    val byId = IcebergTable.pruneEntries(md, entries,
      Seq(IcebergTable.ScanPred("id", "=", "8")))
    assert(byId.map(_.path).map(p => new File(p).getName) ==
      Seq("f3.parquet"))
    // decimal bounds: price > 9.00 excludes f1 and f2
    val byPrice = IcebergTable.pruneEntries(md, entries,
      Seq(IcebergTable.ScanPred("price", ">", "9.00")))
    assert(byPrice.map(p => new File(p.path).getName) == Seq("f3.parquet"))
    // date bounds: ds <= 1995-12-31 keeps only f1
    val byDs = IcebergTable.pruneEntries(md, entries,
      Seq(IcebergTable.ScanPred("ds", "<=", "1995-12-31")))
    assert(byDs.map(p => new File(p.path).getName) == Seq("f1.parquet"))
    // null counts: name IS NULL provably empty → every file skipped
    assert(IcebergTable.pruneEntries(md, entries,
      Seq(IcebergTable.ScanPred("name", "is_null", ""))).isEmpty)
    // end-to-end exactness through readPruned
    assert(IcebergTable.readPruned(spark, dir,
      Seq(IcebergTable.ScanPred("price", ">", "9.00")))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(7L, 8L, 9L))
    assert(IcebergTable.readPruned(spark, dir,
      Seq(IcebergTable.ScanPred("id", "=", "8")))
      .select("name").collect().map(_.getString(0)).toSeq == Seq("c8"))
  }

  test("foreign binary field summaries prune whole manifests unopened") {
    val dir = buildForeign()
    val md = IcebergTable.loadMetadata(dir)
    val rows = IcebergTable.manifestRows(md, md.currentSnapshot.get, dir)
    assert(rows.size == 3 && rows.forall(_.summaries.isDefined))
    // binary day-ordinal bounds decoded positionally against the spec
    val pred2000 = Seq(IcebergTable.ScanPred(
      "ds", ">=", "2000-01-01"))
    assert(rows.map(IcebergTable.manifestMayMatch(md, _, pred2000)) ==
      Seq(false, false, true))
    val pred9598 = IcebergTable.between("ds", "1995-01-01", "1998-12-31")
    assert(rows.map(IcebergTable.manifestMayMatch(md, _, pred9598)) ==
      Seq(true, true, false))
    // r102 typed tuples flow into the file entries (day ordinals)
    val entries = IcebergTable.snapshotFiles(md,
      md.currentSnapshot.get, dir)
    assert(entries.flatMap(_.partitionValues.get("ds_day")).toSet ==
      Set("1995-01-05", "1998-06-10", "2000-12-20")
        .map(d => java.time.LocalDate.parse(d).toEpochDay.toString))
    // day-tuple pruning composes with the bounds: full read is exact
    assert(IcebergTable.readPruned(spark, dir, pred2000)
      .count() == 3)
    assert(IcebergTable.readPruned(spark, dir, pred9598)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("summaries from a non-default partition_spec_id never prune (kept)") {
    val dir = buildForeign(m2SpecId = 7)
    val md = IcebergTable.loadMetadata(dir)
    val rows = IcebergTable.manifestRows(md, md.currentSnapshot.get, dir)
    val pred2000 = Seq(IcebergTable.ScanPred("ds", ">=", "2000-01-01"))
    // m2's summary excludes year 2000 — but its spec id (7) is not the
    // default spec, so positional interpretation would be a guess: the
    // manifest must be KEPT (m1 still prunes; exactness via row filter)
    assert(rows.map(IcebergTable.manifestMayMatch(md, _, pred2000)) ==
      Seq(false, true, true))
    assert(IcebergTable.readPruned(spark, dir, pred2000).count() == 3)
  }

  test("!= prunes point-interval files and identity tuples, keeps the rest") {
    val dir = buildForeign()
    val md = IcebergTable.loadMetadata(dir)
    val entries = IcebergTable.snapshotFiles(md,
      md.currentSnapshot.get, dir).filter(_.content == 0)
    // every file's ds bounds are a point interval [d, d]: ds !=
    // 1998-06-10 proves f2 empty of matches, keeps f1/f3
    val kept = IcebergTable.pruneEntries(md, entries,
      Seq(IcebergTable.ScanPred("ds", "!=", "1998-06-10")))
    assert(kept.map(p => new File(p.path).getName).sorted ==
      Seq("f1.parquet", "f3.parquet"))
    // non-point interval: id != 5 can't skip f2 (ids 4..6)
    assert(IcebergTable.pruneEntries(md, entries,
      Seq(IcebergTable.ScanPred("id", "!=", "5"))).size == 3)
    assert(IcebergTable.readPruned(spark, dir,
      Seq(IcebergTable.ScanPred("ds", "!=", "1998-06-10")))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 7L, 8L, 9L))
  }

  // ---------------------------------------------------------------- //
  //  void transform: null tuples must never skip live files
  // ---------------------------------------------------------------- //

  private val voidManifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"df","fields":[
      |{"name":"content","type":"int"},
      |{"name":"file_path","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"partition","type":{"type":"record","name":"r102","fields":[
      |{"name":"legacy","type":["null","int"],"default":null}]}}
      |]}}]}""".stripMargin)

  /** A table whose spec carries a `void` field (the spec's way of
    * dropping a partition field without renumbering): every tuple is
    * NULL while the source rows are NOT. */
  private def buildVoid(): String = {
    val dir = Files.createTempDirectory("graft_icevoid").toFile
    val loc = dir.getPath
    import spark.implicits._
    onePart(dir, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"),
      "data/f1.parquet")
    val dfS = voidManifestSchema.getField("data_file").schema()
    val pr = new GenericData.Record(dfS.getField("partition").schema())
    pr.put("legacy", null) // void: always null
    val df = new GenericData.Record(dfS)
    df.put("content", 0)
    df.put("file_path", s"$loc/data/f1.parquet")
    df.put("record_count", 3L)
    df.put("partition", pr)
    val row = new GenericData.Record(voidManifestSchema)
    row.put("status", 1)
    row.put("data_file", df)
    writeAvro(new File(dir, "metadata/m1.avro"), voidManifestSchema, Seq(row))
    writeAvro(new File(dir, "metadata/ml1.avro"), foreignListSchema, Seq(
      foreignListRow(s"$loc/metadata/m1.avro", 1L, 0, None)))
    java.nio.file.Files.writeString(
      new File(dir, "metadata/00001-void.metadata.json").toPath,
      s"""{
         |  "format-version": 2, "table-uuid": "0000-void",
         |  "location": "$loc", "last-updated-ms": 1000,
         |  "current-snapshot-id": 100, "current-schema-id": 0,
         |  "schemas": [{
         |    "schema-id": 0, "type": "struct", "fields": [
         |      {"id": 1, "name": "id", "required": true, "type": "long"},
         |      {"id": 2, "name": "name", "required": false, "type": "string"}
         |    ]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "legacy", "transform": "void",
         |     "source-id": 2, "field-id": 1000}]}],
         |  "snapshots": [
         |    {"snapshot-id": 100, "timestamp-ms": 1000,
         |     "manifest-list": "$loc/metadata/ml1.avro",
         |     "summary": {"operation": "append"}}
         |  ]
         |}""".stripMargin)
    dir.getPath
  }

  test("void transform: null tuples never skip live files (advisor r14 medium)") {
    val dir = buildVoid()
    // value op on the void-partitioned source: the null tuple proves
    // NOTHING (void maps every value to null) — the file must open
    assert(IcebergTable.readPruned(spark, dir,
      Seq(IcebergTable.ScanPred("name", "=", "b")))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // is_not_null: the rows are all non-null; a null-tuple skip here
    // would silently read the table as empty
    assert(IcebergTable.readPruned(spark, dir,
      Seq(IcebergTable.ScanPred("name", "is_not_null", "")))
      .count() == 3)
    // is_null stays correct too (row-level filter finds nothing)
    assert(IcebergTable.readPruned(spark, dir,
      Seq(IcebergTable.ScanPred("name", "is_null", ""))).count() == 0)
  }

  // ---------------------------------------------------------------- //
  //  nested partition sources
  // ---------------------------------------------------------------- //

  test("nested partition sources resolve to dotted paths; never a top-level guess") {
    val md = IcebergMetadata.parse(
      """{"format-version": 2, "table-uuid": "x", "location": "",
        |"last-updated-ms": 0, "current-snapshot-id": null,
        |"current-schema-id": 0,
        |"schemas": [{"schema-id": 0, "type": "struct", "fields": [
        |  {"id": 1, "name": "id", "required": true, "type": "long"},
        |  {"id": 2, "name": "addr", "required": false, "type": {
        |    "type": "struct", "fields": [
        |      {"id": 3, "name": "city", "required": false,
        |       "type": "string"},
        |      {"id": 4, "name": "geo", "required": false, "type": {
        |        "type": "struct", "fields": [
        |          {"id": 5, "name": "lat", "required": false,
        |           "type": "double"}]}}]}}]}],
        |"default-spec-id": 0,
        |"partition-specs": [{"spec-id": 0, "fields": [
        |  {"name": "city", "transform": "identity", "source-id": 3,
        |   "field-id": 1000},
        |  {"name": "lat_b", "transform": "bucket[4]", "source-id": 5,
        |   "field-id": 1001},
        |  {"name": "gone", "transform": "identity", "source-id": 99,
        |   "field-id": 1002}]}],
        |"snapshots": []}""".stripMargin)
    // nested sources resolve to their DOTTED paths — distinguishable
    // from unknown ids, and never colliding with a top-level column
    assert(md.partitionSource(md.specFields(0)).contains("addr.city"))
    assert(md.partitionSource(md.specFields(1)).contains("addr.geo.lat"))
    // a dropped/unknown source id is genuinely None
    assert(md.partitionSource(md.specFields(2)).isEmpty)
    // equality deletes on nested ids fail loudly, top-level still works
    assert(md.fieldName(1) == "id")
    val e = intercept[RuntimeException] { md.fieldName(3) }
    assert(e.getMessage.contains("NESTED"))
  }

  // ---------------------------------------------------------------- //
  //  NaN-aware float/double pruning (r15 verdict wrong-answer edge #1)
  // ---------------------------------------------------------------- //

  private val nanManifestSchema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int"},
       |{"name":"sequence_number","type":["null","long"],"default":null},
       |{"name":"data_file","type":{"type":"record","name":"df","fields":[
       |{"name":"content","type":"int"},
       |{"name":"file_path","type":"string"},
       |{"name":"record_count","type":"long"},
       |{"name":"lower_bounds","type":["null",$kvBytes],"default":null},
       |{"name":"upper_bounds","type":["null",$kvBytes],"default":null},
       |{"name":"null_value_counts","type":["null",$kvLong],"default":null},
       |{"name":"nan_value_counts","type":["null",$kvLong],"default":null}
       |]}}]}""".stripMargin)

  /** Unpartitioned foreign table of (id long #1, v double #2): three
    * files whose spec-conformant bounds EXCLUDE NaN (the spec's
    * "Metrics" rule) — f1 holds a NaN row with nan_value_counts=1, f2
    * is recorded NaN-free (nan=0), f3 carries bounds but NO nan entry
    * (an older writer). */
  private def buildNanForeign(): String = {
    val dir = Files.createTempDirectory("graft_icenan").toFile
    val loc = dir.getPath
    import spark.implicits._
    onePart(dir, Seq((1L, 1.0), (2L, Double.NaN)).toDF("id", "v"),
      "data/f1.parquet")
    onePart(dir, Seq((3L, 5.0), (4L, 7.0)).toDF("id", "v"),
      "data/f2.parquet")
    onePart(dir, Seq((5L, 9.0), (6L, 11.0)).toDF("id", "v"),
      "data/f3.parquet")
    val dfS = nanManifestSchema.getField("data_file").schema()
    val itemB = dfS.getField("lower_bounds").schema()
      .getTypes.get(1).getElementType
    val itemL = dfS.getField("null_value_counts").schema()
      .getTypes.get(1).getElementType
    def row(path: String, rows: Long, idLo: String, idHi: String,
        vLo: String, vHi: String, nan: Option[Long]): GenericRecord = {
      def bounds(id: String, v: String) = {
        val a = new java.util.ArrayList[GenericRecord]()
        a.add(kvRow(itemB, 1, bb(LongType, id)))
        a.add(kvRow(itemB, 2, bb(DoubleType, v)))
        a
      }
      val df = new GenericData.Record(dfS)
      df.put("content", 0)
      df.put("file_path", path)
      df.put("record_count", rows)
      df.put("lower_bounds", bounds(idLo, vLo))
      df.put("upper_bounds", bounds(idHi, vHi))
      nan.foreach { n =>
        val a = new java.util.ArrayList[GenericRecord]()
        a.add(kvRow(itemL, 2, Long.box(n)))
        df.put("nan_value_counts", a)
      }
      val r = new GenericData.Record(nanManifestSchema)
      r.put("status", 1)
      r.put("data_file", df)
      r
    }
    writeAvro(new File(dir, "metadata/m1.avro"), nanManifestSchema, Seq(
      // f1's non-NaN values are all 1.0: bounds [1.0, 1.0], one NaN row
      row(s"$loc/data/f1.parquet", 2, "1", "2", "1.0", "1.0", Some(1L)),
      row(s"$loc/data/f2.parquet", 2, "3", "4", "5.0", "7.0", Some(0L)),
      row(s"$loc/data/f3.parquet", 2, "5", "6", "9.0", "11.0", None)))
    val lr = new GenericData.Record(foreignListSchema)
    lr.put("manifest_path", s"$loc/metadata/m1.avro")
    lr.put("content", 0)
    lr.put("sequence_number", 1L)
    lr.put("partition_spec_id", 0)
    writeAvro(new File(dir, "metadata/ml1.avro"), foreignListSchema, Seq(lr))
    java.nio.file.Files.writeString(
      new File(dir, "metadata/00001-nan.metadata.json").toPath,
      s"""{
         |  "format-version": 2, "table-uuid": "0000-nan",
         |  "location": "$loc", "last-updated-ms": 1000,
         |  "current-snapshot-id": 100, "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "required": true, "type": "long"},
         |    {"id": 2, "name": "v", "required": false, "type": "double"}
         |  ]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "snapshots": [
         |    {"snapshot-id": 100, "timestamp-ms": 1000,
         |     "manifest-list": "$loc/metadata/ml1.avro",
         |     "summary": {"operation": "append"}}]
         |}""".stripMargin)
    dir.getPath
  }

  test("NaN rows survive upper-bound pruning on float/double (Spark orders NaN largest)") {
    val dir = buildNanForeign()
    val md = IcebergTable.loadMetadata(dir)
    val entries = IcebergTable.snapshotFiles(md,
      md.currentSnapshot.get, dir).filter(_.content == 0)
    assert(entries.size == 3)
    assert(entries.find(_.path.endsWith("f1.parquet"))
      .exists(_.nanCounts.get("v").contains(1L)))
    def names(preds: Seq[IcebergTable.ScanPred]): Seq[String] =
      IcebergTable.pruneEntries(md, entries, preds)
        .map(e => new File(e.path).getName).sorted
    // v > 100: every file's upper bound is < 100, but f1 holds a NaN
    // row (NaN > 100 under Spark SQL ordering) and f3's NaN state is
    // unknown — only f2 (proven nan=0) may skip
    assert(names(Seq(IcebergTable.ScanPred("v", ">", "100.0"))) ==
      Seq("f1.parquet", "f3.parquet"))
    assert(names(Seq(IcebergTable.ScanPred("v", ">=", "100.0"))) ==
      Seq("f1.parquet", "f3.parquet"))
    // != 1.0 with f1's point interval [1.0, 1.0]: the NaN row satisfies
    // != — f1 must be KEPT despite the point bounds
    assert(names(Seq(IcebergTable.ScanPred("v", "!=", "1.0")))
      .contains("f1.parquet"))
    // NaN-insensitive ops still prune: < 2.0 skips f2/f3 via lower
    // bounds (a NaN row never satisfies <), = 5.0 touches only f2
    assert(names(Seq(IcebergTable.ScanPred("v", "<", "2.0"))) ==
      Seq("f1.parquet"))
    assert(names(Seq(IcebergTable.ScanPred("v", "=", "5.0"))) ==
      Seq("f2.parquet"))
    // end-to-end exactness: the NaN row comes back from a pruned scan
    val got = IcebergTable.readPruned(spark, dir,
      Seq(IcebergTable.ScanPred("v", ">", "100.0")))
      .select("id", "v").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L))
    assert(got.head.getDouble(1).isNaN)
  }

  test("manifest summaries: contains_nan gates float/double range pruning") {
    val md = IcebergMetadata.parse(
      """{"format-version": 2, "table-uuid": "x", "location": "",
        |"last-updated-ms": 0, "current-snapshot-id": null,
        |"current-schema-id": 0,
        |"schemas": [{"schema-id": 0, "type": "struct", "fields": [
        |  {"id": 1, "name": "v", "required": false, "type": "double"}]}],
        |"default-spec-id": 0,
        |"partition-specs": [{"spec-id": 0, "fields": [
        |  {"name": "v", "transform": "identity", "source-id": 1,
        |   "field-id": 1000}]}],
        |"snapshots": []}""".stripMargin)
    def row(nan: Option[Boolean]) = IcebergTable.ManifestListRow(
      "m.avro", 1L, 0, 0, Some(Seq(graft.materialize.IcebergFieldSummary(
        containsNull = false, Some("1.0"), Some("2.0"),
        containsNan = nan))))
    val gt = Seq(IcebergTable.ScanPred("v", ">", "100.0"))
    // recorded NaN-free: the [1.0, 2.0] summary proves no row > 100
    assert(!IcebergTable.manifestMayMatch(md, row(Some(false)), gt))
    // NaN present or unknown: a NaN row would satisfy > 100 — keep
    assert(IcebergTable.manifestMayMatch(md, row(Some(true)), gt))
    assert(IcebergTable.manifestMayMatch(md, row(None), gt))
    // NaN-insensitive ops prune regardless of contains_nan
    val lt = Seq(IcebergTable.ScanPred("v", "<", "0.5"))
    assert(!IcebergTable.manifestMayMatch(md, row(None), lt))
  }

  // ---------------------------------------------------------------- //
  //  Field-id column resolution (r15 verdict wrong-answer edge #2)
  // ---------------------------------------------------------------- //

  private def withId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong("parquet.field.id", id).build())

  /** Foreign table whose column #2 was RENAMED `val_old` → `val_new`
    * after file f1 was written: f1's parquet carries field ids (what
    * real engines stamp) under the OLD name; f2 was written post-rename
    * without ids (a writer that resolves by name). Current schema also
    * carries a column #3 added after both files. */
  private def buildRenamedForeign(): String = {
    val dir = Files.createTempDirectory("graft_icerename").toFile
    val loc = dir.getPath
    import spark.implicits._
    val oldDf = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "val_old")
    val oldSchema = StructType(Seq(
      withId(StructField("id", LongType), 1),
      withId(StructField("val_old", StringType), 2)))
    onePart(dir, spark.createDataFrame(oldDf.rdd, oldSchema),
      "data/f1.parquet")
    onePart(dir, Seq((3L, "gamma")).toDF("id", "val_new"),
      "data/f2.parquet")
    val dfS = nanManifestSchema.getField("data_file").schema()
    def row(path: String, rows: Long): GenericRecord = {
      val df = new GenericData.Record(dfS)
      df.put("content", 0)
      df.put("file_path", path)
      df.put("record_count", rows)
      val r = new GenericData.Record(nanManifestSchema)
      r.put("status", 1)
      r.put("data_file", df)
      r
    }
    writeAvro(new File(dir, "metadata/m1.avro"), nanManifestSchema, Seq(
      row(s"$loc/data/f1.parquet", 2), row(s"$loc/data/f2.parquet", 1)))
    val lr = new GenericData.Record(foreignListSchema)
    lr.put("manifest_path", s"$loc/metadata/m1.avro")
    lr.put("content", 0)
    lr.put("sequence_number", 1L)
    lr.put("partition_spec_id", 0)
    writeAvro(new File(dir, "metadata/ml1.avro"), foreignListSchema, Seq(lr))
    java.nio.file.Files.writeString(
      new File(dir, "metadata/00002-rename.metadata.json").toPath,
      s"""{
         |  "format-version": 2, "table-uuid": "0000-rename",
         |  "location": "$loc", "last-updated-ms": 2000,
         |  "current-snapshot-id": 200, "current-schema-id": 1,
         |  "schemas": [
         |    {"schema-id": 0, "type": "struct", "fields": [
         |      {"id": 1, "name": "id", "required": true, "type": "long"},
         |      {"id": 2, "name": "val_old", "required": false,
         |       "type": "string"}]},
         |    {"schema-id": 1, "type": "struct", "fields": [
         |      {"id": 1, "name": "id", "required": true, "type": "long"},
         |      {"id": 2, "name": "val_new", "required": false,
         |       "type": "string"},
         |      {"id": 3, "name": "extra", "required": false,
         |       "type": "long"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "snapshots": [
         |    {"snapshot-id": 200, "timestamp-ms": 2000,
         |     "manifest-list": "$loc/metadata/ml1.avro",
         |     "summary": {"operation": "append"}}]
         |}""".stripMargin)
    dir.getPath
  }

  test("renamed foreign column resolves by parquet field id, not silent NULLs") {
    val dir = buildRenamedForeign()
    val got = IcebergTable.read(spark, dir)
      .select("id", "val_new", "extra").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1).toSeq
    // f1 (old name, field ids) resolves val_new -> val_old BY ID and
    // reads the real values; f2 (new name, no ids) resolves by name;
    // `extra` (added after both files) reads as NULL per the spec
    assert(got == Seq((1L, "alpha", -1L), (2L, "beta", -1L),
      (3L, "gamma", -1L)))
  }

  // ---------------------------------------------------------------- //
  //  Partition-scoped equality deletes (spec scoping rule)
  // ---------------------------------------------------------------- //

  private val eqManifestSchema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int"},
       |{"name":"sequence_number","type":["null","long"],"default":null},
       |{"name":"data_file","type":{"type":"record","name":"df","fields":[
       |{"name":"content","type":"int"},
       |{"name":"file_path","type":"string"},
       |{"name":"record_count","type":"long"},
       |{"name":"partition","type":["null",
       |{"type":"record","name":"r102","fields":[
       |{"name":"k","type":["null","string"],"default":null}]}],
       |"default":null},
       |{"name":"equality_ids","type":["null",
       |{"type":"array","items":"int"}],"default":null}
       |]}}]}""".stripMargin)

  /** Identity-partitioned (k ∈ A/B) foreign table where id=1 exists in
    * BOTH partitions, plus one equality delete file keyed on id=1.
    * `scoped=true` stores the delete WITH partition tuple k=A (the
    * spec's partition-scoped form — it must hide only A's row);
    * `scoped=false` stores it unpartitioned (global — hides both). */
  private def buildEqScopedForeign(scoped: Boolean): String = {
    val dir = Files.createTempDirectory("graft_iceeqscope").toFile
    val loc = dir.getPath
    import spark.implicits._
    // identity-partitioned data files physically lack the k column
    onePart(dir, Seq(1L, 2L).toDF("id"), "data/a.parquet")
    onePart(dir, Seq(1L, 3L).toDF("id"), "data/b.parquet")
    onePart(dir, Seq(1L).toDF("id"), "data/del1.parquet")
    val dfS = eqManifestSchema.getField("data_file").schema()
    val r102 = dfS.getField("partition").schema().getTypes.get(1)
    def row(path: String, rows: Long, content: Int, k: Option[String],
        eqIds: Seq[Int]): GenericRecord = {
      val df = new GenericData.Record(dfS)
      df.put("content", content)
      df.put("file_path", path)
      df.put("record_count", rows)
      k.foreach { v =>
        val pr = new GenericData.Record(r102)
        pr.put("k", v)
        df.put("partition", pr)
      }
      if (eqIds.nonEmpty) {
        val l = new java.util.ArrayList[Integer]()
        eqIds.foreach(i => l.add(Int.box(i)))
        df.put("equality_ids", l)
      }
      val r = new GenericData.Record(eqManifestSchema)
      r.put("status", 1)
      r.put("data_file", df)
      r
    }
    writeAvro(new File(dir, "metadata/m1.avro"), eqManifestSchema,
      Seq(row(s"$loc/data/a.parquet", 2, 0, Some("A"), Nil)))
    writeAvro(new File(dir, "metadata/m2.avro"), eqManifestSchema,
      Seq(row(s"$loc/data/b.parquet", 2, 0, Some("B"), Nil)))
    writeAvro(new File(dir, "metadata/m3.avro"), eqManifestSchema,
      Seq(row(s"$loc/data/del1.parquet", 1, 2,
        if (scoped) Some("A") else None, Seq(1))))
    def lr(path: String, seq: Long, content: Int): GenericRecord = {
      val r = new GenericData.Record(foreignListSchema)
      r.put("manifest_path", path)
      r.put("content", content)
      r.put("sequence_number", seq)
      r.put("partition_spec_id", 0)
      r
    }
    writeAvro(new File(dir, "metadata/ml1.avro"), foreignListSchema, Seq(
      lr(s"$loc/metadata/m1.avro", 1L, 0),
      lr(s"$loc/metadata/m2.avro", 1L, 0),
      lr(s"$loc/metadata/m3.avro", 2L, 1)))
    java.nio.file.Files.writeString(
      new File(dir, "metadata/00001-eqscope.metadata.json").toPath,
      s"""{
         |  "format-version": 2, "table-uuid": "0000-eqscope",
         |  "location": "$loc", "last-updated-ms": 1000,
         |  "current-snapshot-id": 100, "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "required": true, "type": "long"},
         |    {"id": 2, "name": "k", "required": false, "type": "string"}
         |  ]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "k", "transform": "identity",
         |     "source-id": 2, "field-id": 1000}]}],
         |  "snapshots": [
         |    {"snapshot-id": 100, "timestamp-ms": 1000,
         |     "manifest-list": "$loc/metadata/ml1.avro",
         |     "summary": {"operation": "append"}}]
         |}""".stripMargin)
    dir.getPath
  }

  test("partition-scoped equality deletes hide only their own partition's rows") {
    // scoped: the delete (k=A, id=1) must NOT touch partition B's id=1
    val scoped = IcebergTable.read(spark, buildEqScopedForeign(true))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(scoped == Seq((1L, "B"), (2L, "A"), (3L, "B")))
    // global (unpartitioned delete): id=1 disappears from BOTH
    val global = IcebergTable.read(spark, buildEqScopedForeign(false))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(global == Seq((2L, "A"), (3L, "B")))
  }

  // ---------------------------------------------------------------- //
  //  Foreign write-after-read guard (advisor r15 medium)
  // ---------------------------------------------------------------- //

  /** Rewrite the NaN fixture's metadata with a regex substitution and
    * bump the version so loadMetadata serves the mutated document. */
  private def mutateMetadata(dir: String,
      edit: String => String): Unit = {
    val mdir = new File(dir, "metadata")
    val src = new File(mdir, "00001-nan.metadata.json")
    val doc = java.nio.file.Files.readString(src.toPath)
    java.nio.file.Files.writeString(
      new File(mdir, "00002-mut.metadata.json").toPath, edit(doc))
  }

  test("appends onto foreign-layout tables preserve the original metadata layout") {
    import spark.implicits._
    def appendOne(dir: String): Unit =
      IcebergWriter.append(spark, dir,
        Seq((99L, 0.5)).toDF("id", "v"))
    // non-positional field ids (v carries id 5): the commit must key
    // new stats under id 5 and amend the document without renumbering
    val d1 = buildNanForeign()
    mutateMetadata(d1, _.replace("{\"id\": 2, \"name\": \"v\"",
      "{\"id\": 5, \"name\": \"v\""))
    appendOne(d1)
    assert(IcebergTable.read(spark, d1).count() == 7)
    val md1 = IcebergTable.loadMetadata(d1)
    assert(md1.fieldIds(md1.currentSchemaId).get(5).contains("v"))
    assert(md1.fieldIds(md1.currentSchemaId).get(1).contains("id"))
    // the NEW data manifest keys its stats under the ORIGINAL ids: a
    // v-bounds prune must still see the appended file's bounds
    val entries = IcebergTable.snapshotFiles(md1,
      md1.currentSnapshot.get, d1).filter(_.content == 0)
    val appended = entries.filter(_.path.contains("snap-"))
    assert(appended.nonEmpty)
    assert(appended.forall(e => e.lowerBounds.get("v").contains("0.5") &&
      e.upperBounds.get("v").contains("0.5")))
    // evolved default spec id: the new manifest is stamped with the
    // table's ACTUAL default spec id, and the doc keeps it
    val d2 = buildNanForeign()
    mutateMetadata(d2, _.replace("\"default-spec-id\": 0",
      "\"default-spec-id\": 2")
      .replace("{\"spec-id\": 0,", "{\"spec-id\": 2,"))
    appendOne(d2)
    assert(IcebergTable.read(spark, d2).count() == 7)
    assert(IcebergTable.loadMetadata(d2).defaultSpecId == 2)
    // multiple partition specs survive the commit verbatim
    val d3 = buildNanForeign()
    mutateMetadata(d3, _.replace(
      "\"partition-specs\": [{\"spec-id\": 0, \"fields\": []}]",
      "\"partition-specs\": [{\"spec-id\": 0, \"fields\": []}, " +
        "{\"spec-id\": 1, \"fields\": []}]"))
    appendOne(d3)
    assert(IcebergTable.read(spark, d3).count() == 7)
    assert(IcebergTable.loadMetadata(d3).specCount == 2)
    // still refused loudly: v1 tables (sequence-number semantics)
    val d4 = buildNanForeign()
    mutateMetadata(d4, _.replace("\"format-version\": 2",
      "\"format-version\": 1"))
    val e4 = intercept[IllegalArgumentException](appendOne(d4))
    assert(e4.getMessage.contains("format-version"))
  }

  test("schema evolution onto a foreign layout keeps original ids and " +
      "allocates past every id the document ever used") {
    import spark.implicits._
    // v carries id 5 (non-positional, and HIGHER than last-column-id
    // would suggest): the evolved schema must keep id=1/v=5 verbatim
    // and give the new column an id past 5, never 3
    val d = buildNanForeign()
    mutateMetadata(d, _.replace("{\"id\": 2, \"name\": \"v\"",
      "{\"id\": 5, \"name\": \"v\""))
    IcebergWriter.appendEvolved(spark, d,
      Seq((100L, 1.0, "x")).toDF("id", "v", "extra"))
    val md = IcebergTable.loadMetadata(d)
    val ids = md.fieldIds(md.currentSchemaId)
    assert(ids.get(1).contains("id") && ids.get(5).contains("v"))
    val extraId = ids.collectFirst { case (i, "extra") => i }.get
    assert(extraId == 6, s"new column must take id 6 (past 5), got $extraId")
    // pre-evolution rows read the new column as NULL; the appended row
    // carries its value — and the OLD schema node survives in the doc
    val rows = IcebergTable.read(spark, d)
      .collect().map(r => (r.getLong(0), r.isNullAt(2))).toSeq
    assert(rows.count(!_._2) == 1 && rows.size == 7)
    val hint = java.nio.file.Files.readString(
      new File(d, "metadata/version-hint.text").toPath).trim
    val doc = java.nio.file.Files.readString(
      new File(d, s"metadata/v$hint.metadata.json").toPath)
    assert(doc.replaceAll("\\s", "").contains("\"schema-id\":0"))
    // the appended file's stats key the new column under ITS id: a
    // bounds prune on `extra` sees exactly the new file
    val entries = IcebergTable.snapshotFiles(md,
      md.currentSnapshot.get, d).filter(_.content == 0)
    val withExtra = entries.filter(_.lowerBounds.contains("extra"))
    assert(withExtra.size == 1 &&
      withExtra.head.lowerBounds("extra") == "x")
  }

  test("equality-delete upserts onto foreign layouts use the table's own field ids") {
    import spark.implicits._
    // v carries id 7: the upsert's equality_ids must say 1 (id) — the
    // key column's REAL id — and the delete must still apply on read
    val d = buildNanForeign()
    mutateMetadata(d, _.replace("{\"id\": 2, \"name\": \"v\"",
      "{\"id\": 7, \"name\": \"v\""))
    IcebergWriter.upsertKeys(spark, d,
      Seq((1L, 111.0)).toDF("id", "v"), Seq("id"))
    val got = IcebergTable.read(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter(_._1 == 1L)
    assert(got.toSeq == Seq((1L, 111.0)))
    val md = IcebergTable.loadMetadata(d)
    val eqs = IcebergTable.snapshotFiles(md,
      md.currentSnapshot.get, d).filter(_.content == 2)
    assert(eqs.nonEmpty && eqs.forall(_.equalityIds == Seq(1)))
    // a key on the remapped column resolves to ITS id
    IcebergWriter.upsertKeys(spark, d,
      Seq((50L, 5.5)).toDF("id", "v"), Seq("v"))
    val md2 = IcebergTable.loadMetadata(d)
    val eqs2 = IcebergTable.snapshotFiles(md2,
      md2.currentSnapshot.get, d).filter(_.content == 2)
    assert(eqs2.exists(_.equalityIds == Seq(7)))
  }

  // ---------------------------------------------------------------- //
  //  Eq-delete pruning: non-key stats are not evidence (advisor r16)
  // ---------------------------------------------------------------- //

  test("eq-delete pruning ignores stats on NON-KEY columns, keeps stats on keys") {
    // a full-row CDC delete file keyed on id ONLY: its v column is
    // all-NULL (bounds absent, null count = record count) — matching
    // ignores v entirely, so v's stats must never skip the delete
    val md = IcebergMetadata.parse(
      """{"format-version": 2, "table-uuid": "x", "location": "",
        |"last-updated-ms": 0, "current-snapshot-id": null,
        |"current-schema-id": 0,
        |"schemas": [{"schema-id": 0, "type": "struct", "fields": [
        |  {"id": 1, "name": "id", "required": true, "type": "long"},
        |  {"id": 2, "name": "v", "required": false, "type": "double"}]}],
        |"default-spec-id": 0,
        |"partition-specs": [{"spec-id": 0, "fields": []}],
        |"snapshots": []}""".stripMargin)
    val kept = Seq(IcebergTable.FileEntry("data/f.parquet", 0, 1L, Nil))
    val del = IcebergTable.FileEntry("data/d.parquet", 2, 2L, Seq(1),
      lowerBounds = Map("id" -> "10"), upperBounds = Map("id" -> "20"),
      nullCounts = Map("v" -> 5L), recordCount = 5L)
    def eqKept(p: IcebergTable.ScanPred) =
      IcebergTable.pruneDeletes(md, kept, Nil, Seq(del), Seq(Seq(p)))._2
    // predicates on NON-KEY v: the all-NULL v column proves nothing
    // about the rows this delete HIDES — the delete must be KEPT
    assert(eqKept(IcebergTable.ScanPred("v", "=", "5.0")).nonEmpty)
    assert(eqKept(IcebergTable.ScanPred("v", "is_not_null", "")).nonEmpty)
    // predicates on the KEY column still prune via the delete's bounds
    assert(eqKept(IcebergTable.ScanPred("id", "=", "99")).isEmpty)
    assert(eqKept(IcebergTable.ScanPred("id", "=", "15")).nonEmpty)
  }

  test("eq-delete pruning: partition tuple still disproves on NON-KEY columns") {
    // partition-scoped deletes only hide rows OF that partition, so a
    // tuple excluding the predicate is valid evidence for any column
    val md = IcebergMetadata.parse(
      """{"format-version": 2, "table-uuid": "x", "location": "",
        |"last-updated-ms": 0, "current-snapshot-id": null,
        |"current-schema-id": 0,
        |"schemas": [{"schema-id": 0, "type": "struct", "fields": [
        |  {"id": 1, "name": "id", "required": true, "type": "long"},
        |  {"id": 2, "name": "k", "required": false, "type": "string"}]}],
        |"default-spec-id": 0,
        |"partition-specs": [{"spec-id": 0, "fields": [
        |  {"name": "k", "transform": "identity", "source-id": 2,
        |   "field-id": 1000}]}],
        |"snapshots": []}""".stripMargin)
    val kept = Seq(IcebergTable.FileEntry("data/f.parquet", 0, 1L, Nil,
      partitionValues = Map("k" -> "A")))
    val del = IcebergTable.FileEntry("data/d.parquet", 2, 2L, Seq(1),
      partitionValues = Map("k" -> "B"), recordCount = 5L)
    def eqKept(p: IcebergTable.ScanPred) =
      IcebergTable.pruneDeletes(md, kept, Nil, Seq(del), Seq(Seq(p)))._2
    // k is NOT a key column, but the delete is scoped to partition B:
    // a k="A" scan can't lose rows by skipping it
    assert(eqKept(IcebergTable.ScanPred("k", "=", "A")).isEmpty)
    assert(eqKept(IcebergTable.ScanPred("k", "=", "B")).nonEmpty)
  }

  // ---------------------------------------------------------------- //
  //  Partition tuple-key rendering is injective (advisor r16 medium)
  // ---------------------------------------------------------------- //

  private val eq2ManifestSchema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
       |{"name":"status","type":"int"},
       |{"name":"sequence_number","type":["null","long"],"default":null},
       |{"name":"data_file","type":{"type":"record","name":"df","fields":[
       |{"name":"content","type":"int"},
       |{"name":"file_path","type":"string"},
       |{"name":"record_count","type":"long"},
       |{"name":"partition","type":["null",
       |{"type":"record","name":"r102","fields":[
       |{"name":"a","type":["null","string"],"default":null},
       |{"name":"b","type":["null","string"],"default":null}]}],
       |"default":null},
       |{"name":"equality_ids","type":["null",
       |{"type":"array","items":"int"}],"default":null}
       |]}}]}""".stripMargin)

  test("partition tuple keys with '/' and '=' in values never collide across partitions") {
    // under a k=v-joined rendering, tuples {a:"1/b=2", b:"3"} and
    // {a:"1", b:"2/b=3"} both print "a=1/b=2/b=3": a delete scoped to
    // the SECOND partition would also hide the first partition's rows
    val dir = Files.createTempDirectory("graft_icetuplekey").toFile
    val loc = dir.getPath
    import spark.implicits._
    onePart(dir, Seq(1L).toDF("id"), "data/f1.parquet")
    onePart(dir, Seq(1L).toDF("id"), "data/f2.parquet")
    onePart(dir, Seq(1L).toDF("id"), "data/del1.parquet")
    val dfS = eq2ManifestSchema.getField("data_file").schema()
    val r102 = dfS.getField("partition").schema().getTypes.get(1)
    def row(path: String, content: Int, a: String, b: String,
        eqIds: Seq[Int]): GenericRecord = {
      val df = new GenericData.Record(dfS)
      df.put("content", content)
      df.put("file_path", path)
      df.put("record_count", 1L)
      val pr = new GenericData.Record(r102)
      pr.put("a", a)
      pr.put("b", b)
      df.put("partition", pr)
      if (eqIds.nonEmpty) {
        val l = new java.util.ArrayList[Integer]()
        eqIds.foreach(i => l.add(Int.box(i)))
        df.put("equality_ids", l)
      }
      val r = new GenericData.Record(eq2ManifestSchema)
      r.put("status", 1)
      r.put("data_file", df)
      r
    }
    writeAvro(new File(dir, "metadata/m1.avro"), eq2ManifestSchema,
      Seq(row(s"$loc/data/f1.parquet", 0, "1/b=2", "3", Nil)))
    writeAvro(new File(dir, "metadata/m2.avro"), eq2ManifestSchema,
      Seq(row(s"$loc/data/f2.parquet", 0, "1", "2/b=3", Nil)))
    writeAvro(new File(dir, "metadata/m3.avro"), eq2ManifestSchema,
      Seq(row(s"$loc/data/del1.parquet", 2, "1", "2/b=3", Seq(1))))
    def lr(path: String, seq: Long, content: Int): GenericRecord = {
      val r = new GenericData.Record(foreignListSchema)
      r.put("manifest_path", path)
      r.put("content", content)
      r.put("sequence_number", seq)
      r.put("partition_spec_id", 0)
      r
    }
    writeAvro(new File(dir, "metadata/ml1.avro"), foreignListSchema, Seq(
      lr(s"$loc/metadata/m1.avro", 1L, 0),
      lr(s"$loc/metadata/m2.avro", 1L, 0),
      lr(s"$loc/metadata/m3.avro", 2L, 1)))
    java.nio.file.Files.writeString(
      new File(dir, "metadata/00001-tk.metadata.json").toPath,
      s"""{
         |  "format-version": 2, "table-uuid": "0000-tk",
         |  "location": "$loc", "last-updated-ms": 1000,
         |  "current-snapshot-id": 100, "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "required": true, "type": "long"},
         |    {"id": 2, "name": "a", "required": false, "type": "string"},
         |    {"id": 3, "name": "b", "required": false, "type": "string"}
         |  ]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "a", "transform": "identity",
         |     "source-id": 2, "field-id": 1000},
         |    {"name": "b", "transform": "identity",
         |     "source-id": 3, "field-id": 1001}
         |  ]}],
         |  "snapshots": [
         |    {"snapshot-id": 100, "timestamp-ms": 1000,
         |     "manifest-list": "$loc/metadata/ml1.avro",
         |     "summary": {"operation": "append"}}]
         |}""".stripMargin)
    val got = IcebergTable.read(spark, dir.getPath)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    // the delete (scoped to {a:"1", b:"2/b=3"}) hides ONLY f2's row;
    // f1's row in the colliding-rendering partition stays live
    assert(got == Seq((1L, "1/b=2", "3")))
  }

  // ---------------------------------------------------------------- //
  //  Mixed-id footers: per-FIELD name fallback (advisor r16 low)
  // ---------------------------------------------------------------- //

  test("a footer with SOME field ids still resolves unlabeled columns by name") {
    val dir = Files.createTempDirectory("graft_icemixid").toFile
    val loc = dir.getPath
    import spark.implicits._
    // id carries its field id; v is unlabeled (a writer that only
    // stamps some columns) — v must resolve BY NAME, not read NULL
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val mixedSchema = StructType(Seq(
      withId(StructField("id", LongType), 1),
      StructField("v", DoubleType)))
    onePart(dir, spark.createDataFrame(df.rdd, mixedSchema),
      "data/f1.parquet")
    val dfS = nanManifestSchema.getField("data_file").schema()
    val d = new GenericData.Record(dfS)
    d.put("content", 0)
    d.put("file_path", s"$loc/data/f1.parquet")
    d.put("record_count", 2L)
    val me = new GenericData.Record(nanManifestSchema)
    me.put("status", 1)
    me.put("data_file", d)
    writeAvro(new File(dir, "metadata/m1.avro"), nanManifestSchema, Seq(me))
    val lr = new GenericData.Record(foreignListSchema)
    lr.put("manifest_path", s"$loc/metadata/m1.avro")
    lr.put("content", 0)
    lr.put("sequence_number", 1L)
    lr.put("partition_spec_id", 0)
    writeAvro(new File(dir, "metadata/ml1.avro"), foreignListSchema, Seq(lr))
    java.nio.file.Files.writeString(
      new File(dir, "metadata/00001-mix.metadata.json").toPath,
      s"""{
         |  "format-version": 2, "table-uuid": "0000-mix",
         |  "location": "$loc", "last-updated-ms": 1000,
         |  "current-snapshot-id": 100, "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "required": true, "type": "long"},
         |    {"id": 2, "name": "v", "required": false, "type": "double"}
         |  ]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "snapshots": [
         |    {"snapshot-id": 100, "timestamp-ms": 1000,
         |     "manifest-list": "$loc/metadata/ml1.avro",
         |     "summary": {"operation": "append"}}]
         |}""".stripMargin)
    val got = IcebergTable.read(spark, dir.getPath)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(got == Seq((1L, 10.0), (2L, 20.0)))
  }
}
