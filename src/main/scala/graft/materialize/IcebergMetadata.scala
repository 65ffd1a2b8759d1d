package graft.materialize

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** Pure-Scala reader for Apache Iceberg v1/v2 table METADATA — the
  * offline half of the reference's Iceberg catalog attach (reference
  * `connections.py:990-1055` ATTACHes a REST catalog; the catalog's
  * network protocol is environment-blocked here, but everything a
  * catalog ultimately points at — `metadata.json`, the snapshot log,
  * schemas, partition specs — is plain JSON on storage, parsed with the
  * Jackson already on Spark's classpath, per the public Iceberg table
  * spec <https://iceberg.apache.org/spec/>).
  *
  * Gives [[graft.warehouse.Warehouse]]-style resolution over a real
  * Iceberg table directory: snapshot list, current snapshot, snapshot
  * as-of a timestamp (the DuckDB `snapshot_from_timestamp` semantics),
  * and the Iceberg schema mapped to a Spark [[StructType]].
  * [[IcebergTable]] continues from here through the avro manifest
  * chain down to the parquet data files.
  */
final case class IcebergSnapshot(
    snapshotId: Long,
    parentId: Option[Long],
    timestampMs: Long,
    manifestList: String,
    operation: String)

/** One field of the default partition spec (spec "Partition Specs"):
  * the derived field's name, its transform (`identity`, `bucket[N]`,
  * `truncate[W]`, `year`/`month`/`day`/`hour`), and the source column's
  * Iceberg field id. */
final case class IcebergPartField(name: String, transform: String,
    sourceId: Int)

/** Manifest-list `field_summary` (spec "Manifest Lists", field 507
  * `partitions`): the range of one partition field's TRANSFORM values
  * across every live file in a manifest. Bounds are held as canonical
  * STRING forms IN MEMORY; on storage they are the spec's Appendix D
  * binary single-values — the writer serializes them
  * ([[IcebergWriter]]) and the reader decodes both that layout and
  * the string layout earlier rounds wrote ([[IcebergSingleValue]]).
  * `None` bounds mean "unknown here" and callers must keep the
  * manifest. Lets a reader skip an entire manifest — thousands of file
  * entries — without opening its avro, the second metadata tier of
  * Iceberg scan planning at 100 TB.
  *
  * `containsNan` mirrors the spec's optional field 518 `contains_nan`:
  * float/double bounds EXCLUDE NaN by spec, and under Spark SQL
  * ordering NaN is LARGER than every number, so an upper-bound-driven
  * skip (`>`, `>=`, the `!=` point interval) on a float/double
  * partition field is sound only when NaN is proven absent —
  * `Some(false)`. `None` (field absent — older writers) and
  * `Some(true)` both keep the manifest for those ops. */
final case class IcebergFieldSummary(containsNull: Boolean,
    lower: Option[String], upper: Option[String],
    containsNan: Option[Boolean] = None)

final case class IcebergMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastUpdatedMs: Long,
    currentSnapshotId: Option[Long],
    lastSequenceNumber: Long,
    snapshots: Seq[IcebergSnapshot],
    currentSchemaId: Int,
    schemas: Map[Int, StructType],
    fieldIds: Map[Int, Map[Int, String]], // schema-id -> field-id -> name
    defaultSpecId: Int,
    specFields: Seq[IcebergPartField],
    properties: Map[String, String] = Map.empty,
    specCount: Int = 1) {

  /** (name, transform) view of the default spec — the shape most
    * callers key pruning decisions on. */
  def partitionFields: Seq[(String, String)] =
    specFields.map(f => (f.name, f.transform))

  /** Source COLUMN NAME of a partition field, resolved through the
    * current schema's field-id table — the index descends struct
    * nesting, so a nested source resolves to its dotted path (e.g.
    * `addr.city`; the pruning comparators look columns up by TOP-LEVEL
    * name, so dotted sources simply never prune — conservative, and
    * now distinguishable from "unknown id"). None means genuinely
    * unresolvable: a foreign spec's absent/unknown source id, or a
    * source dropped by schema evolution. */
  def partitionSource(f: IcebergPartField): Option[String] =
    fieldIds.getOrElse(currentSchemaId, Map.empty).get(f.sourceId)

  def schema: StructType = schemas(currentSchemaId)

  /** Top-level column name for an Iceberg field id in the current
    * schema — how v2 equality-delete files (`equality_ids`) name the
    * columns they match on. Nested field ids (dotted paths in the
    * index) raise: equality deletes on nested fields have no offline
    * application here. */
  def fieldName(id: Int): String = {
    val name = fieldIds.getOrElse(currentSchemaId, Map.empty).getOrElse(id,
      sys.error(s"equality field id $id is not a column of " +
        s"schema $currentSchemaId"))
    if (name.contains('.'))
      sys.error(s"equality field id $id names NESTED column $name — " +
        "equality deletes on nested fields are not applied offline")
    name
  }

  def currentSnapshot: Option[IcebergSnapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))

  def snapshotById(id: Long): Option[IcebergSnapshot] =
    snapshots.find(_.snapshotId == id)

  /** Latest snapshot whose commit time is <= `tsMs` — the covering-
    * version rule Warehouse.readAsOf uses, and what AS OF time travel
    * means in every engine reading Iceberg. */
  def snapshotAsOf(tsMs: Long): Option[IcebergSnapshot] =
    snapshots.filter(_.timestampMs <= tsMs)
      .sortBy(s => (s.timestampMs, s.snapshotId)).lastOption
}

object IcebergMetadata {

  /** Parse an Iceberg `*.metadata.json` document (spec "Table
    * Metadata"; v1 single-`schema` and v2 `schemas`+`current-schema-id`
    * layouts both accepted). */
  def parse(json: String): IcebergMetadata = {
    val root = new ObjectMapper().readTree(json)
    val formatVersion = root.path("format-version").asInt(1)
    val snaps = root.path("snapshots").elements().asScala.map { s =>
      IcebergSnapshot(
        snapshotId = s.path("snapshot-id").asLong(),
        parentId = Option(s.get("parent-snapshot-id")).map(_.asLong()),
        timestampMs = s.path("timestamp-ms").asLong(),
        manifestList = s.path("manifest-list").asText(""),
        operation = s.path("summary").path("operation").asText(""))
    }.toSeq
    val schemaNodes: Map[Int, JsonNode] =
      if (root.has("schemas"))
        root.path("schemas").elements().asScala.map { sch =>
          sch.path("schema-id").asInt(0) -> sch
        }.toMap
      else // v1: single top-level "schema"
        Map(0 -> root.path("schema"))
    val schemas = schemaNodes.map { case (id, n) => id -> structOf(n) }
    // field-id index DESCENDS into struct nesting (dotted paths), so a
    // partition spec sourced on a nested column resolves to its real
    // path instead of silently reading as "unknown id". List/map
    // element ids are not indexed: the spec forbids partitioning on
    // them and no stats bound addresses them.
    def idsOf(n: JsonNode, prefix: String): Seq[(Int, String)] =
      n.path("fields").elements().asScala.toSeq.flatMap { f =>
        val name = prefix + f.path("name").asText()
        val t = f.path("type")
        Seq(f.path("id").asInt(-1) -> name) ++
          (if (t.isObject && t.path("type").asText() == "struct")
            idsOf(t, name + ".")
          else Nil)
      }
    val fieldIds = schemaNodes.map { case (id, n) =>
      id -> idsOf(n, "").toMap
    }
    def partFieldsOf(n: JsonNode): Seq[IcebergPartField] =
      n.elements().asScala.map(f =>
        IcebergPartField(f.path("name").asText(),
          f.path("transform").asText(),
          f.path("source-id").asInt(-1))).toSeq
    val specFields = root.path("partition-specs").elements().asScala
      .find(_.path("spec-id").asInt(-1) == root.path("default-spec-id").asInt(0))
      .map(s => partFieldsOf(s.path("fields")))
      // v1 layout: the REQUIRED singular `partition-spec` array of
      // fields (mirrors the single-`schema` fallback above)
      .orElse(Option(root.get("partition-spec")).map(partFieldsOf))
      .getOrElse(Seq.empty)
    IcebergMetadata(
      formatVersion = formatVersion,
      tableUuid = root.path("table-uuid").asText(""),
      location = root.path("location").asText(""),
      lastUpdatedMs = root.path("last-updated-ms").asLong(),
      currentSnapshotId =
        // an explicit JSON null (valid: a table with no snapshots)
        // parses as Jackson's NullNode, not Java null — filter it
        // before asLong() or it would read as Some(0L) and turn an
        // empty table into a "no matching snapshot" error
        Option(root.get("current-snapshot-id")).filterNot(_.isNull)
          .map(_.asLong()).filter(_ != -1L),
      lastSequenceNumber = root.path("last-sequence-number").asLong(0L),
      snapshots = snaps,
      currentSchemaId = root.path("current-schema-id").asInt(0),
      schemas = schemas,
      fieldIds = fieldIds,
      defaultSpecId = root.path("default-spec-id").asInt(0),
      specFields = specFields,
      properties = Option(root.get("properties")).map(p =>
        p.fields().asScala.map(e =>
          e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty),
      // how many partition specs the document carries (evolved-away
      // specs included) — the writer's rewrite-safety guard refuses
      // tables with more than the single spec it regenerates
      specCount = math.max(1, root.path("partition-specs").size()))
  }

  private def structOf(node: JsonNode): StructType =
    StructType(node.path("fields").elements().asScala.map { f =>
      StructField(f.path("name").asText(),
        typeOf(f.path("type")),
        nullable = !f.path("required").asBoolean(false))
    }.toSeq)

  /** Iceberg type (spec "Schemas and Data Types") → Spark type.
    * `time` has no Spark analog and maps to LongType (micros since
    * midnight — the Iceberg physical representation). */
  private[graft] def typeOf(t: JsonNode): DataType =
    if (t.isTextual) t.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "time" => LongType
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "string" => StringType
      case "uuid" => StringType
      case "binary" => BinaryType
      case s if s.startsWith("fixed") => BinaryType
      case s if s.startsWith("decimal") =>
        val ps = s.stripPrefix("decimal(").stripSuffix(")").split(",")
        DecimalType(ps(0).trim.toInt, ps(1).trim.toInt)
      case other =>
        throw new IllegalArgumentException(s"iceberg type: $other")
    } else t.path("type").asText() match {
      case "struct" => structOf(t)
      case "list" =>
        ArrayType(typeOf(t.path("element")),
          containsNull = !t.path("element-required").asBoolean(false))
      case "map" =>
        MapType(typeOf(t.path("key")), typeOf(t.path("value")),
          valueContainsNull = !t.path("value-required").asBoolean(false))
      case other =>
        throw new IllegalArgumentException(s"iceberg nested type: $other")
    }
}
