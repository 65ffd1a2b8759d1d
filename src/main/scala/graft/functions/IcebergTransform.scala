package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg partition-transform kernels per the PUBLIC Iceberg table
  * spec <https://iceberg.apache.org/spec/#partition-transforms> and its
  * Appendix B "32-bit Hash Requirements": `bucket[N](v) =
  * (murmur3_x86_32(bytes(v)) & Int.MaxValue) % N`, where bytes(v) is
  *
  *  - int/long/date/time/timestamp: the value widened to long,
  *    little-endian 8 bytes (ints hash IDENTICALLY to their long
  *    widening — the spec's cross-type bucket stability rule),
  *  - string: UTF-8 bytes,
  *  - decimal: minimal two's-complement BIG-endian of the unscaled
  *    value.
  *
  * Used on the write path ([[IcebergBucket]], a codegen'd Catalyst
  * expression deriving the partition column) and on the read path
  * (driver-side evaluation of a pruning predicate's bucket — both
  * sides MUST agree bit-for-bit, which the spec's Appendix B test
  * vectors pin down in `IcebergWriterSpec`).
  */
object IcebergTransforms {

  /** murmur3_x86_32, seed 0 (the public algorithm the Iceberg spec
    * mandates for bucketing). */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h = 0
    var i = 0
    while (i + 4 <= len) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    if ((len & 3) >= 3) k ^= (data(i + 2) & 0xff) << 16
    if ((len & 3) >= 2) k ^= (data(i + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k ^= data(i) & 0xff
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k
    }
    h ^= len
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  private def longBytesLE(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  def hashLong(v: Long): Int = murmur3(longBytesLE(v))

  def bucketLong(v: Long, n: Int): Int =
    (hashLong(v) & Int.MaxValue) % n

  def bucketString(s: UTF8String, n: Int): Int =
    (murmur3(s.getBytes) & Int.MaxValue) % n

  def bucketStringJvm(s: String, n: Int): Int =
    (murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      & Int.MaxValue) % n

  def bucketDecimal(unscaled: java.math.BigInteger, n: Int): Int =
    (murmur3(unscaled.toByteArray) & Int.MaxValue) % n
}

/** `bucket[N]` over a long-representable column (int/long/date as epoch
  * days/timestamp as epoch micros) or a string column — the Iceberg
  * partition transform as a native codegen'd expression (no UDF). The
  * child must already be the Iceberg PHYSICAL representation: the
  * writer passes date columns as `datediff` days and timestamps as
  * epoch micros. */
case class IcebergBucket(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"bucket[N] needs N > 0, got $n")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = s"iceberg_bucket_$n"
  // def, not val: the constructor also runs on UNRESOLVED children
  // (withNewChildInternal during analysis), where dataType throws
  private def isString = child.dataType == StringType
  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => IcebergTransforms.bucketString(s, n)
    case v: Long => IcebergTransforms.bucketLong(v, n)
    case v: Int => IcebergTransforms.bucketLong(v.toLong, n)
    case other => sys.error(s"iceberg bucket over ${other.getClass}")
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      if (isString)
        s"${ev.value} = graft.functions.IcebergTransforms.bucketString($input, $n);"
      else
        s"${ev.value} = graft.functions.IcebergTransforms.bucketLong((long) $input, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
