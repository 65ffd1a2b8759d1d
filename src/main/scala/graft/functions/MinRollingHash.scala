package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum polynomial rolling hash over all `k`-CODE-POINT windows of a
  * string — a native codegen'd Catalyst expression (the (b) tier of the
  * custom-operator preference order: built-ins genuinely can't express
  * this in one pass — `transform`+`substr` materializes every window and
  * is O(n·k), this is O(n)).
  *
  * Hash: h(w) = Σ cpⱼ·257^(k-1-j) mod 1_000_000_007 over the window's
  * code points, rolled left-to-right; result is the minimum across
  * windows (the 1-hash winnowing fingerprint). Null when the input has
  * fewer than `k` code points. Code-point windows and values match the
  * DuckDB oracle exactly (`ord()`-based `list_reduce` over char
  * `substr` windows) on ANY input, ASCII or not.
  */
case class MinRollingHash(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "min_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    MinRollingHash.minRollOrNull(
      input.asInstanceOf[UTF8String].getBytes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val h = ctx.freshName("h")
      s"""
         |java.lang.Long $h = graft.functions.MinRollingHash.minRollOrNull(
         |  $input.getBytes(), $k);
         |if ($h == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $h.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinRollingHash {
  private val P = 1000000007L
  private val B = 257L

  /** UTF-8 decode in one pass: code-point values into `cps` (sized
    * `bytes.length`, the upper bound), returning the count. Lead bytes
    * are any byte not matching 0b10xxxxxx; malformed sequences decode
    * byte-wise (garbage in, deterministic garbage out). */
  private[functions] def decode(bytes: Array[Byte], cps: Array[Int]): Int = {
    val n = bytes.length
    var i = 0
    var m = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      var cp = b
      var trail = 0
      if (b >= 0xF0) { cp = b & 0x07; trail = 3 }
      else if (b >= 0xE0) { cp = b & 0x0f; trail = 2 }
      else if (b >= 0xC0) { cp = b & 0x1f; trail = 1 }
      var t = 0
      while (t < trail && i + 1 < n && (bytes(i + 1) & 0xc0) == 0x80) {
        cp = (cp << 6) | (bytes(i + 1) & 0x3f)
        i += 1
        t += 1
      }
      cps(m) = cp
      m += 1
      i += 1
    }
    m
  }

  /** Shared interpreted/codegen kernel: min rolling hash over
    * k-code-point windows; null when fewer than k code points. */
  def minRollOrNull(bytes: Array[Byte], k: Int): java.lang.Long = {
    val cps = new Array[Int](bytes.length)
    val m = decode(bytes, cps)
    if (m < k) return null
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = pow * B % P; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cps(i)) % P; i += 1 }
    var min = h
    i = k
    while (i < m) {
      h = ((h - cps(i - k) * pow % P + P) % P * B + cps(i)) % P
      if (h < min) min = h
      i += 1
    }
    java.lang.Long.valueOf(min)
  }

  /** Column form. */
  def minRollingHash(c: Column, k: Int): Column =
    GraftBridge.column(MinRollingHash(GraftBridge.expression(c), k))
}

/** Minimum h32 over all `k`-code-point windows of a string, where h32 is
  * the repo-wide cross-engine hash convention ([[graft.ops.TextOps.h32]]):
  * the first 8 hex digits of the window's md5 as an unsigned 32-bit
  * value; md5 runs over the window's UTF-8 bytes, exactly the bytes
  * DuckDB's `md5(substr(s, i, k))` hashes. Semantically identical to
  * `array_min(transform(sequence(1, len-k+1), i => h32(substr(s,i,k))))`
  * — the char-k-gram MinHash fingerprint — but evaluated as ONE native
  * codegen'd pass: no per-window UTF8String materialization and no
  * interpreted higher-order evaluator (which is CodegenFallback and
  * degrades super-linearly under CPU contention). Null when the input
  * has fewer than `k` code points.
  */
case class MinShingleH32(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "min_shingle_h32"

  override def nullSafeEval(input: Any): Any =
    MinShingleH32.minH32OrNull(input.asInstanceOf[UTF8String].getBytes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val h = ctx.freshName("h")
      s"""
         |java.lang.Long $h = graft.functions.MinShingleH32.minH32OrNull(
         |  $input.getBytes(), $k);
         |if ($h == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $h.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinShingleH32 {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared interpreted/codegen kernel (also the specs' reference
    * implementation): min h32 over k-code-point windows, md5 over each
    * window's UTF-8 byte span; null when fewer than k code points. On
    * pure-ASCII input the offsets are the identity mapping, so byte
    * windows == char windows and historical hashes are unchanged. */
  def minH32OrNull(bytes: Array[Byte], k: Int): java.lang.Long = {
    val n = bytes.length
    // code-point start offsets + end sentinel
    var nChars = 0
    var i = 0
    while (i < n) { if ((bytes(i) & 0xc0) != 0x80) nChars += 1; i += 1 }
    if (nChars < k) return null
    val starts = new Array[Int](nChars + 1)
    var ci = 0
    i = 0
    while (i < n) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(ci) = i; ci += 1 }
      i += 1
    }
    starts(nChars) = n
    val md = mdLocal.get()
    var min = Long.MaxValue
    var w = 0
    while (w + k <= nChars) {
      md.reset()
      md.update(bytes, starts(w), starts(w + k) - starts(w))
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (h < min) min = h
      w += 1
    }
    java.lang.Long.valueOf(min)
  }

  /** Column form. */
  def minShingleH32(c: Column, k: Int): Column =
    GraftBridge.column(MinShingleH32(GraftBridge.expression(c), k))
}
