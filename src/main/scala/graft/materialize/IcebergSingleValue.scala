package graft.materialize

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._

/** Iceberg spec Appendix D "Single-value serialization", binary form —
  * <https://iceberg.apache.org/spec/#binary-single-value-serialization>.
  * This is the byte layout REAL engines (Spark+Iceberg, Flink, Trino)
  * store in manifest `lower_bounds`/`upper_bounds` maps, manifest-list
  * `field_summary` bounds, and default values; decoding it is what
  * makes the three pruning tiers fire on tables this repo did NOT
  * write (the reference's actual read path — its adapter ATTACHes
  * catalogs of foreign-written tables, connections.py:990-1055).
  *
  * Layout per the spec:
  *  - boolean: 1 byte, 0x00 false / non-zero true
  *  - int: 4 bytes little-endian; long/time/timestamp(tz): 8 bytes LE
  *  - float: 4 bytes LE IEEE-754; double: 8 bytes LE
  *  - date: 4 bytes LE (days from 1970-01-01)
  *  - timestamp(tz): 8 bytes LE (micros from epoch)
  *  - string: UTF-8 bytes (bounds may be spec-truncated — a truncated
  *    lower/upper is still a valid lower/upper, so pruning on it stays
  *    conservative)
  *  - decimal(P,S): minimal two's-complement BIG-endian unscaled value
  *  - uuid: 16 bytes big-endian; fixed/binary: raw bytes — neither has
  *    an orderable canonical string form here, so both decode to None
  *    (callers keep the file/manifest: pruning never loses rows).
  *
  * `decode` renders the CANONICAL STRING forms the reader's typed
  * comparators parse ([[IcebergTable.cmpTyped]]): dates `1995-03-15`,
  * timestamps `1995-03-15 00:00:00.000000`, numerics plain, decimals
  * plain-scaled. `encode` is the exact inverse over those same string
  * forms (used by the foreign-format spec fixtures and property-tested
  * round-trip). Any length/parse mismatch decodes to None — a skipped
  * bound, never a wrong one. */
object IcebergSingleValue {

  /** Decode an Appendix D buffer into the canonical string form for
    * `dt`, or None when the bytes don't carry an orderable value of
    * that type (callers must keep the file — conservative). */
  def decode(dt: DataType, bytes: Array[Byte]): Option[String] = dt match {
    case BooleanType if bytes.length == 1 =>
      Some((bytes(0) != 0).toString)
    case IntegerType | ShortType | ByteType if bytes.length == 4 =>
      Some(le(bytes).getInt.toString)
    case LongType if bytes.length == 8 =>
      Some(le(bytes).getLong.toString)
    // some writers widen int-family bounds to long — accept 8 bytes
    case IntegerType | ShortType | ByteType if bytes.length == 8 =>
      Some(le(bytes).getLong.toString)
    case FloatType if bytes.length == 4 =>
      Some(le(bytes).getFloat.toString)
    case DoubleType if bytes.length == 8 =>
      Some(le(bytes).getDouble.toString)
    case DateType if bytes.length == 4 =>
      Some(java.time.LocalDate.ofEpochDay(le(bytes).getInt.toLong).toString)
    case TimestampType | TimestampNTZType if bytes.length == 8 =>
      Some(renderMicros(le(bytes).getLong))
    case StringType =>
      val s = new String(bytes, StandardCharsets.UTF_8)
      // reject byte sequences that were not valid UTF-8 (the charset
      // decoder substitutes U+FFFD — comparing on a mangled bound
      // could mis-order against real data)
      if (s.contains('�')) None else Some(s)
    case d: DecimalType if bytes.nonEmpty =>
      Some(new java.math.BigDecimal(
        new java.math.BigInteger(bytes), d.scale).toPlainString)
    case _ => None
  }

  /** Encode a canonical string form into the Appendix D bytes for
    * `dt` — the exact inverse of [[decode]]. None when the string does
    * not parse in `dt`'s canonical form or the type has no binary
    * single-value layout here. */
  def encode(dt: DataType, value: String): Option[Array[Byte]] = dt match {
    case BooleanType =>
      scala.util.Try(value.toBoolean).toOption
        .map(b => Array[Byte](if (b) 1 else 0))
    case IntegerType | ShortType | ByteType =>
      scala.util.Try(value.toInt).toOption.map(i =>
        ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(i).array())
    case LongType =>
      scala.util.Try(value.toLong).toOption.map(l =>
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          .putLong(l).array())
    case FloatType =>
      scala.util.Try(value.toFloat).toOption.map(f =>
        ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putFloat(f).array())
    case DoubleType =>
      scala.util.Try(value.toDouble).toOption.map(d =>
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          .putDouble(d).array())
    case DateType =>
      scala.util.Try(java.time.LocalDate.parse(value.take(10))).toOption
        .map(d => ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(d.toEpochDay.toInt).array())
    case TimestampType | TimestampNTZType =>
      parseMicros(value).map(us =>
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          .putLong(us).array())
    case StringType => Some(value.getBytes(StandardCharsets.UTF_8))
    case d: DecimalType =>
      scala.util.Try(new java.math.BigDecimal(value)
        .setScale(d.scale).unscaledValue().toByteArray).toOption
    case _ => None
  }

  private def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  /** Micros since epoch → the `uuuu-MM-dd HH:mm:ss.SSSSSS` form
    * [[IcebergTable]]'s timestamp comparator parses (naive UTC — the
    * session timezone is pinned UTC throughout). */
  private def renderMicros(us: Long): String = {
    val secs = Math.floorDiv(us, 1000000L)
    val nanos = Math.floorMod(us, 1000000L) * 1000L
    java.time.LocalDateTime.ofEpochSecond(secs, nanos.toInt,
      java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS"))
  }

  /** Canonical timestamp string → micros since epoch (shared with the
    * writer's typed r102 tuple emission). */
  def micros(s: String): Option[Long] = parseMicros(s)

  private def parseMicros(s: String): Option[Long] = {
    val norm = s.trim.replace("T", " ")
    val ldt = scala.util.Try(java.time.LocalDateTime.parse(norm,
      java.time.format.DateTimeFormatter
        .ofPattern("uuuu-MM-dd HH:mm:ss[.SSSSSS][.SSS]"))).toOption
      .orElse(scala.util.Try(
        java.time.LocalDate.parse(norm.take(10)).atStartOfDay()).toOption)
    ldt.map(t => t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
      t.getNano / 1000L)
  }

  /** Raw bytes of an avro-decoded value that may carry binary: avro
    * `bytes` arrive as ByteBuffer, `fixed` as GenericFixed. None for
    * anything else. */
  def bytesOf(v: Any): Option[Array[Byte]] = v match {
    case b: ByteBuffer =>
      val dup = b.duplicate()
      val arr = new Array[Byte](dup.remaining())
      dup.get(arr)
      Some(arr)
    case f: org.apache.avro.generic.GenericFixed => Some(f.bytes())
    case a: Array[Byte] => Some(a)
    case _ => None
  }
}
