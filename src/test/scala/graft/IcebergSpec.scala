package graft

import java.io.File
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.materialize.{IcebergMetadata, IcebergTable}

/** Offline Iceberg reader round-trip over a hand-built v2 table laid
  * out per the public Iceberg spec: two snapshots (append, then a
  * second append), metadata.json + avro manifest-list/manifest chain +
  * parquet data files, with internal paths anchored at the ORIGINAL
  * table location so the reader's relocation rule is exercised
  * (reference capability: connections.py:990-1055). */
class IcebergSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":"int"}]}""".stripMargin)
  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"df","fields":[
      |{"name":"content","type":"int"},
      |{"name":"file_path","type":"string"}]}}]}""".stripMargin)

  private def writeAvro(path: File, schema: Schema,
      rows: Seq[GenericRecord]): Unit = {
    path.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path)
    rows.foreach(w.append)
    w.close()
  }

  private def manifestListRow(path: String, content: Int): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path)
    r.put("content", content)
    r
  }

  private def manifestRow(status: Int, fileContent: Int,
      filePath: String): GenericRecord = {
    val df = new GenericData.Record(
      manifestSchema.getField("data_file").schema())
    df.put("content", fileContent)
    df.put("file_path", filePath)
    val r = new GenericData.Record(manifestSchema)
    r.put("status", status)
    r.put("data_file", df)
    r
  }

  /** Build the fixture table; returns its directory. Layout mirrors a
    * relocated table: metadata paths point at `file:///warehouse/db/t`
    * while the files live under the returned temp dir. */
  private def buildTable(withDeleteManifest: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft_iceberg").toFile
    val origLoc = "file:///warehouse/db/t"
    // two single-file parquet data files, 3 + 2 rows
    import spark.implicits._
    def oneParquet(rows: Seq[(Long, String)], name: String): Unit = {
      val tmp = new File(dir, s"__tmp_$name")
      rows.toDF("id", "name").coalesce(1).write.parquet(tmp.getPath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new File(dir, s"data/$name")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
    oneParquet(Seq((1L, "a"), (2L, "b"), (3L, "c")), "f1.parquet")
    oneParquet(Seq((4L, "d"), (5L, "e")), "f2.parquet")
    // manifests: m1 → f1; m2 → f2
    writeAvro(new File(dir, "metadata/m1.avro"), manifestSchema,
      Seq(manifestRow(1, 0, s"$origLoc/data/f1.parquet")))
    writeAvro(new File(dir, "metadata/m2.avro"), manifestSchema,
      Seq(manifestRow(1, 0, s"$origLoc/data/f2.parquet")))
    // manifest lists: snapshot 1 = {m1}; snapshot 2 = {m1, m2}
    writeAvro(new File(dir, "metadata/ml1.avro"), manifestListSchema,
      Seq(manifestListRow(s"$origLoc/metadata/m1.avro", 0)))
    writeAvro(new File(dir, "metadata/ml2.avro"), manifestListSchema,
      Seq(manifestListRow(s"$origLoc/metadata/m1.avro", 0),
        manifestListRow(s"$origLoc/metadata/m2.avro", 0)) ++
        (if (withDeleteManifest)
          Seq(manifestListRow(s"$origLoc/metadata/m2.avro", 1))
        else Nil))
    val metadata =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "0000-fixture",
         |  "location": "$origLoc",
         |  "last-updated-ms": 2000,
         |  "current-snapshot-id": 200,
         |  "current-schema-id": 0,
         |  "schemas": [{
         |    "schema-id": 0, "type": "struct", "fields": [
         |      {"id": 1, "name": "id", "required": true, "type": "long"},
         |      {"id": 2, "name": "name", "required": false, "type": "string"}
         |    ]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "id_bucket", "transform": "bucket[4]",
         |     "source-id": 1, "field-id": 1000}]}],
         |  "snapshots": [
         |    {"snapshot-id": 100, "timestamp-ms": 1000,
         |     "manifest-list": "$origLoc/metadata/ml1.avro",
         |     "summary": {"operation": "append"}},
         |    {"snapshot-id": 200, "parent-snapshot-id": 100,
         |     "timestamp-ms": 2000,
         |     "manifest-list": "$origLoc/metadata/ml2.avro",
         |     "summary": {"operation": "append"}}
         |  ]
         |}""".stripMargin
    java.nio.file.Files.writeString(
      new File(dir, "metadata/00002-fixture.metadata.json").toPath, metadata)
    dir.getPath
  }

  test("metadata.json parses: snapshots, schema map, partition spec") {
    val md = IcebergTable.loadMetadata(buildTable())
    assert(md.formatVersion == 2)
    assert(md.snapshots.map(_.snapshotId) == Seq(100L, 200L))
    assert(md.currentSnapshot.map(_.snapshotId).contains(200L))
    assert(md.schema == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true))))
    assert(md.partitionFields == Seq(("id_bucket", "bucket[4]")))
    // as-of covering rule: between commits resolves to the older one
    assert(md.snapshotAsOf(1500).map(_.snapshotId).contains(100L))
    assert(md.snapshotAsOf(2000).map(_.snapshotId).contains(200L))
    assert(md.snapshotAsOf(999).isEmpty)
  }

  test("reads current snapshot, snapshot by id, and AS-OF through the avro chain") {
    val dir = buildTable()
    assert(IcebergTable.read(spark, dir).count() == 5)
    assert(IcebergTable.readVersion(spark, dir, 100L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(IcebergTable.readAsOf(spark, dir, 1500L).count() == 3)
    assert(IcebergTable.read(spark, dir).schema("id").dataType == LongType)
  }

  test("delete manifests raise instead of returning undeleted rows") {
    val dir = buildTable(withDeleteManifest = true)
    val e = intercept[Exception](IcebergTable.read(spark, dir).count())
    assert(e.getMessage.contains("DELETE manifests"))
    // the pre-delete snapshot stays readable
    assert(IcebergTable.readVersion(spark, dir, 100L).count() == 3)
  }

  test("iceberg type lattice maps to Spark types") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def t(s: String) = IcebergMetadata.typeOf(m.readTree(s))
    assert(t("\"int\"") == IntegerType)
    assert(t("\"timestamptz\"") == TimestampType)
    assert(t("\"timestamp\"") == TimestampNTZType)
    assert(t("\"decimal(18, 4)\"") == DecimalType(18, 4))
    assert(t("\"fixed[16]\"") == BinaryType)
    assert(t("""{"type":"list","element":"long","element-required":true}""")
      == ArrayType(LongType, containsNull = false))
    assert(t("""{"type":"map","key":"string","value":"double"}""")
      == MapType(StringType, DoubleType, valueContainsNull = true))
    assert(t("""{"type":"struct","fields":[
        {"id":1,"name":"x","required":true,"type":"int"}]}""")
      == StructType(Seq(StructField("x", IntegerType, nullable = false))))
  }
}
