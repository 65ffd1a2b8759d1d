package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum polynomial rolling hash over all `k`-byte windows of a string
  * — a native codegen'd Catalyst expression (the (b) tier of the
  * custom-operator preference order: built-ins genuinely can't express
  * this in one pass — `transform`+`substr` materializes every window and
  * is O(n·k), this is O(n) inside whole-stage codegen).
  *
  * Hash: h(w) = Σ wⱼ·257^(k-1-j) mod 1_000_000_007 over window bytes,
  * rolled left-to-right; result is the minimum across windows (the
  * 1-hash winnowing fingerprint). Null when the input is shorter than
  * `k`. Bytes are raw UTF-8 — equal to code points for ASCII input, so
  * the DuckDB oracle (`ord()`-based `list_reduce`) reproduces it exactly
  * on normalized ASCII text.
  */
case class MinRollingHash(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "min_rolling_hash"

  private val P = 1000000007L
  private val B = 257L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.length < k) null
    else {
      var pow = 1L
      var i = 0
      while (i < k - 1) { pow = pow * B % P; i += 1 }
      var h = 0L
      i = 0
      while (i < k) { h = (h * B + (bytes(i) & 0xff)) % P; i += 1 }
      var min = h
      i = k
      while (i < bytes.length) {
        h = ((h - (bytes(i - k) & 0xff) * pow % P + P) % P * B +
          (bytes(i) & 0xff)) % P
        if (h < min) min = h
        i += 1
      }
      java.lang.Long.valueOf(min)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val bytes = ctx.freshName("bytes")
      val pow = ctx.freshName("pow")
      val h = ctx.freshName("h")
      val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $input.getBytes();
         |if ($bytes.length < $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $pow = 1L;
         |  for (int $i = 0; $i < $k - 1; $i++) $pow = $pow * ${B}L % ${P}L;
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++)
         |    $h = ($h * ${B}L + ($bytes[$i] & 0xff)) % ${P}L;
         |  long $min = $h;
         |  for (int $i = $k; $i < $bytes.length; $i++) {
         |    $h = (($h - ($bytes[$i - $k] & 0xff) * $pow % ${P}L + ${P}L)
         |      % ${P}L * ${B}L + ($bytes[$i] & 0xff)) % ${P}L;
         |    if ($h < $min) $min = $h;
         |  }
         |  ${ev.value} = $min;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinRollingHash {
  /** Column form. */
  def minRollingHash(c: Column, k: Int): Column =
    GraftBridge.column(MinRollingHash(GraftBridge.expression(c), k))
}

/** Minimum h32 over all `k`-byte windows of a string, where h32 is the
  * repo-wide cross-engine hash convention ([[graft.ops.TextOps.h32]]):
  * the first 8 hex digits of the window's md5 as an unsigned 32-bit
  * value. Semantically identical to
  * `array_min(transform(sequence(1, len-k+1), i => h32(substr(s,i,k))))`
  * — the char-k-gram MinHash fingerprint — but evaluated as ONE native
  * codegen'd pass: no per-window UTF8String materialization and no
  * interpreted higher-order evaluator (which is CodegenFallback and
  * degrades super-linearly under CPU contention). The existing DuckDB
  * oracles (`('0x'||substr(md5(s),1,8))::BIGINT` per window) stand
  * unchanged. Null when the input is shorter than `k`. Byte windows ==
  * char windows on ASCII input, the same convention [[MinRollingHash]]
  * documents.
  */
case class MinShingleH32(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "min_shingle_h32"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.length < k) null
    else java.lang.Long.valueOf(MinShingleH32.minH32(bytes, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one MessageDigest per generated-class instance, reset per window —
    // getInstance per call would dominate the loop
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, input => {
      val bytes = ctx.freshName("bytes")
      val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $input.getBytes();
         |if ($bytes.length < $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $min = Long.MAX_VALUE;
         |  for (int $i = 0; $i + $k <= $bytes.length; $i++) {
         |    $md.reset();
         |    $md.update($bytes, $i, $k);
         |    byte[] $d = $md.digest();
         |    // stepwise build: Janino misparses `(a & m) << s | …` chains
         |    long $h = $d[0] & 0xffL;
         |    $h = ($h << 8) | ($d[1] & 0xffL);
         |    $h = ($h << 8) | ($d[2] & 0xffL);
         |    $h = ($h << 8) | ($d[3] & 0xffL);
         |    if ($h < $min) $min = $h;
         |  }
         |  ${ev.value} = $min;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinShingleH32 {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Interpreted twin of the generated loop (also used by specs as the
    * reference implementation). */
  def minH32(bytes: Array[Byte], k: Int): Long = {
    val md = mdLocal.get()
    var min = Long.MaxValue
    var i = 0
    while (i + k <= bytes.length) {
      md.reset()
      md.update(bytes, i, k)
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column form. */
  def minShingleH32(c: Column, k: Int): Column =
    GraftBridge.column(MinShingleH32(GraftBridge.expression(c), k))
}
