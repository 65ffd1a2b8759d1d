package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the dedup family's hash pipeline. Each
  * replaces an interpreted higher-order-function chain with a one-pass
  * loop, semantically IDENTICAL to the Column formulation it supersedes
  * (shared DuckDB oracles stand unchanged):
  *
  *  - [[TokenHashes]]  ⇔ `transform(tokens(text), t => h32(t))`
  *  - [[HashedNgrams]] ⇔ [[graft.ops.TextOps.hashedWordShingles]]
  *  - [[MinHashSig]]   ⇔ [[graft.ops.Dedup.minhashSignature]]
  *  - [[SimHash32]]    ⇔ [[graft.ops.Dedup.simhash]]
  *
  * Besides skipping the CodegenFallback evaluator (which degrades
  * super-linearly under CPU contention), native kernels remove the need
  * for the repartition "HOF barriers" that pinned each interpreted pass
  * to one evaluation — CollapseProject already refuses to inline
  * non-cheap named producers, so the dedup operators become pure narrow
  * passes with no extra exchanges.
  */
object TextHash {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** h32 of one already-lowercased ASCII token: first 8 md5 hex digits
    * as an unsigned 32-bit value ([[graft.ops.TextOps.h32]]). */
  private def h32(md: java.security.MessageDigest): Long = {
    val d = md.digest()
    var h = d(0) & 0xffL
    h = (h << 8) | (d(1) & 0xffL)
    h = (h << 8) | (d(2) & 0xffL)
    h = (h << 8) | (d(3) & 0xffL)
    h
  }

  /** One pass over UTF-8 bytes: tokenize (maximal `[a-z0-9]` runs after
    * lowercasing — split-equivalent to the repo tokenizer, see
    * [[TokenLexMatcher]]; multi-byte UTF-8 sequences contain only bytes
    * ≥ 0x80 and act as separators, EXCEPT the two Unicode characters
    * whose `lower()` maps into the token alphabet, handled explicitly
    * below) and md5-h32 each token.
    *
    * LOCALE CONTRACT: equivalence to the `lower()`+regex Column spec
    * assumes a root-like default locale — Spark's UTF8String lowercasing
    * delegates to locale-sensitive String.toLowerCase for non-ASCII
    * strings (Turkish 'I' → dotless 'ı' would diverge from this
    * ASCII-table scan). The launchers pin `-Duser.language=en
    * -Duser.country=US` (build.sbt javaOptions); do the same on a
    * cluster via `spark.{driver,executor}.extraJavaOptions`. */
  def tokenHashes(bytes: Array[Byte]): ArrayData = {
    val md = mdLocal.get()
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    val n = bytes.length
    var i = 0
    var inTok = false
    while (i <= n) {
      var c = if (i < n) bytes(i) & 0xff else -1
      var closeAfter = false
      // probed against Spark's lower(): U+212A KELVIN SIGN (E2 84 AA)
      // lowercases to 'k'; U+0130 I-WITH-DOT (C4 B0) lowercases to
      // 'i' + U+0307 combining dot — the dot is a separator, so the
      // token closes right after the i
      if (c == 0xe2 && i + 2 < n && (bytes(i + 1) & 0xff) == 0x84 &&
          (bytes(i + 2) & 0xff) == 0xaa) { c = 'k'; i += 2 }
      else if (c == 0xc4 && i + 1 < n && (bytes(i + 1) & 0xff) == 0xb0) {
        c = 'i'; i += 1; closeAfter = true
      }
      if (c >= 'A' && c <= 'Z') c += 32
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (isTok) {
        if (!inTok) { md.reset(); inTok = true }
        md.update(c.toByte)
        if (closeAfter) { out += h32(md); inTok = false }
      } else if (inTok) {
        out += h32(md)
        inTok = false
      }
      i += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  private val M = 3037000493L // shingle-combine modulus (fits squared in a long)
  private val B = 1000003L

  /** Distinct hashed word n-grams combined arithmetically from token
    * hashes: `c₁ = h₁; cₖ₊₁ = (cₖ·1000003 + hₖ₊₁) mod 3037000493` —
    * empty when fewer than n tokens. Output is SORTED ascending (a set;
    * element order is unobservable downstream — minima and set algebra
    * only), which lets the pair-verify stage count intersections with
    * the O(m+n) merge scan [[SortedIntersectSize]]. */
  def hashedNgrams(hashes: ArrayData, n: Int): ArrayData = {
    val h = hashes.toLongArray()
    if (h.length < n) return ArrayData.toArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i + n <= h.length) {
      var c = h(i)
      var j = 1
      while (j < n) { c = (c * B + h(i + j)) % M; j += 1 }
      seen.add(c)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    ArrayData.toArrayData(out)
  }

  private val P = 4294967311L // universal-hash prime > 2^32

  /** k MinHash minima over the universal family
    * `((2p+1)·h + 12345p + 7) mod 4294967311`, one pass over the
    * shingle hashes. Null for an empty input (callers filter first). */
  def minHashSig(hashes: ArrayData, k: Int): ArrayData = {
    val h = hashes.toLongArray()
    if (h.length == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < h.length) {
      val x = h(i)
      var p = 0
      while (p < k) {
        val v = (x * (p * 2 + 1) + p * 12345L + 7L) % P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  /** 32-bit SimHash from token-hash bit votes, big-endian fold
    * `acc·2 + bit(i)` over i = 0…31 (bit 0 highest), exactly the
    * Column formulation's digit order. */
  def simHash32(hashes: ArrayData): Long = {
    val h = hashes.toLongArray()
    val votes = new Array[Int](32)
    var i = 0
    while (i < h.length) {
      val x = h(i)
      var b = 0
      while (b < 32) { votes(b) += (if (((x >> b) & 1L) == 1L) 1 else -1); b += 1 }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 32) { acc = acc * 2 + (if (votes(b) > 0) 1L else 0L); b += 1 }
    acc
  }

  /** Gopher-style repetition statistics in one pass over the token
    * hashes: token count, distinct-token count, the occurrence count of
    * the most frequent 2-gram, and the number of 3-gram positions whose
    * gram repeats within the document (Σ multiplicity over grams with
    * multiplicity ≥ 2). n-gram hashes use the [[hashedNgrams]]
    * arithmetic combine, so a DuckDB oracle reproduces them exactly.
    * Zero counts when the document is shorter than the gram. */
  def repetitionStats(hashes: ArrayData): InternalRow = {
    val h = hashes.toLongArray()
    val n = h.length
    val distinct = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < n) { distinct.add(h(i)); i += 1 }
    def gramCounts(g: Int): java.util.HashMap[java.lang.Long, Int] = {
      val m = new java.util.HashMap[java.lang.Long, Int]()
      var i = 0
      while (i + g <= n) {
        var c = h(i)
        var j = 1
        while (j < g) { c = (c * B + h(i + j)) % M; j += 1 }
        m.put(c, m.getOrDefault(c, 0) + 1)
        i += 1
      }
      m
    }
    var top2 = 0
    if (n >= 2) {
      val it = gramCounts(2).values().iterator()
      while (it.hasNext) { val c = it.next(); if (c > top2) top2 = c }
    }
    var dup3 = 0
    if (n >= 3) {
      val it = gramCounts(3).values().iterator()
      while (it.hasNext) { val c = it.next(); if (c > 1) dup3 += c }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, distinct.size, top2, dup3))
  }

  /** Σ ((h·1000003 + 12345) mod 2001 − 1000) over token hashes — the
    * hashed-feature linear scorer's accumulator
    * ([[graft.ops.TextAnalysis.modelScoreTable]]). Weights are exact
    * integers in [−1000, 1000] derived from the feature hash (h·1000003
    * < 2⁵² — no overflow), so the sum is engine-exact; the caller's
    * final division is the only float op. */
  def linearScoreSum(hashes: ArrayData): Long = {
    val h = hashes.toLongArray()
    var acc = 0L
    var i = 0
    while (i < h.length) {
      acc += (h(i) * 1000003L + 12345L) % 2001L - 1000L
      i += 1
    }
    acc
  }

  private val embedSuf0 = Array[Byte](':', '0')
  private val embedSuf1 = Array[Byte](':', '1')

  /** text → deterministic 16-dim hash embedding, one byte-scan pass —
    * the native twin of `Similarity.hashEmbedTokens(tokens(text))`
    * (which stays as the Column spec for the equivalence property
    * test). Tokenization is the [[tokenHashes]] scan (same locale
    * contract); per token the two md5 digests of `token ++ ":0"` /
    * `":1"` are read as eight 16-bit big-endian byte pairs each —
    * exactly the Column form's `conv(substr(hex, 4j+1, 4), 16, 10)`,
    * since 4 hex digits of a digest ARE 2 digest bytes — and each dim
    * accumulates `(v mod 2001) − 1000` as an exact integer; the single
    * final /1000.0 is the only float op, so the vector is bit-identical
    * to the interpreted formulation on any engine and partitioning. */
  def hashEmbed16(bytes: Array[Byte]): ArrayData = {
    val md = mdLocal.get()
    val acc = new Array[Long](16)
    var buf = new Array[Byte](64)
    var bl = 0
    def close(): Unit = {
      md.reset(); md.update(buf, 0, bl); md.update(embedSuf0)
      val d0 = md.digest()
      md.reset(); md.update(buf, 0, bl); md.update(embedSuf1)
      val d1 = md.digest()
      var j = 0
      while (j < 8) {
        acc(j) += (((d0(2 * j) & 0xff) << 8) |
          (d0(2 * j + 1) & 0xff)) % 2001 - 1000
        acc(j + 8) += (((d1(2 * j) & 0xff) << 8) |
          (d1(2 * j + 1) & 0xff)) % 2001 - 1000
        j += 1
      }
      bl = 0
    }
    val n = bytes.length
    var i = 0
    var inTok = false
    while (i <= n) {
      var c = if (i < n) bytes(i) & 0xff else -1
      var closeAfter = false
      if (c == 0xe2 && i + 2 < n && (bytes(i + 1) & 0xff) == 0x84 &&
          (bytes(i + 2) & 0xff) == 0xaa) { c = 'k'; i += 2 }
      else if (c == 0xc4 && i + 1 < n && (bytes(i + 1) & 0xff) == 0xb0) {
        c = 'i'; i += 1; closeAfter = true
      }
      if (c >= 'A' && c <= 'Z') c += 32
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (isTok) {
        inTok = true
        if (bl == buf.length) buf = java.util.Arrays.copyOf(buf, bl * 2)
        buf(bl) = c.toByte; bl += 1
        if (closeAfter) { close(); inTok = false }
      } else if (inTok) { close(); inTok = false }
      i += 1
    }
    val out = new Array[Double](16)
    var k = 0
    while (k < 16) { out(k) = acc(k) / 1000.0; k += 1 }
    ArrayData.toArrayData(out)
  }

  // ------------------------------------------------------ Column forms
  def tokenHashes(c: Column): Column =
    GraftBridge.column(TokenHashes(GraftBridge.expression(c)))
  def hashedNgrams(c: Column, n: Int): Column =
    GraftBridge.column(HashedNgrams(GraftBridge.expression(c), n))
  def minHashSig(c: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), k))
  def simHash32(c: Column): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(c)))
  def repetitionStats(c: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(c)))
  def linearScoreSum(c: Column): Column =
    GraftBridge.column(LinearScoreSum(GraftBridge.expression(c)))
  def hashEmbed16(c: Column): Column =
    GraftBridge.column(HashEmbed16(GraftBridge.expression(c)))
}

/** text → deterministic 16-dim hash embedding
  * (see [[TextHash.hashEmbed16]]). */
case class HashEmbed16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hash_embed16"
  override def nullSafeEval(input: Any): Any =
    TextHash.hashEmbed16(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.TextHash.hashEmbed16($input.getBytes());")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token-hash array → exact integer linear-model score sum
  * (see [[TextHash.linearScoreSum]]). */
case class LinearScoreSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "linear_score_sum"
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      TextHash.linearScoreSum(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.TextHash.linearScoreSum($input);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → array of per-token h32 hashes (see [[TextHash.tokenHashes]]). */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_hashes"
  override def nullSafeEval(input: Any): Any =
    TextHash.tokenHashes(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.TextHash.tokenHashes($input.getBytes());")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token-hash array → distinct combined n-gram hashes. */
case class HashedNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_ngrams"
  override def nullSafeEval(input: Any): Any =
    TextHash.hashedNgrams(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.TextHash.hashedNgrams($input, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingle-hash array → k universal-hash minima (null for empty). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    TextHash.minHashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => s"""
      |${ev.value} = graft.functions.TextHash.minHashSig($input, $k);
      |if (${ev.value} == null) ${ev.isNull} = true;
    """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token-hash array → one-pass repetition statistics
  * (see [[TextHash.repetitionStats]]). */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("distinct_tokens", IntegerType, nullable = false),
    StructField("top2gram_count", IntegerType, nullable = false),
    StructField("dup3gram_occurrences", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_stats"
  override def nullSafeEval(input: Any): Any =
    TextHash.repetitionStats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.TextHash.repetitionStats($input);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token-hash array → 32-bit SimHash signature. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash32"
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TextHash.simHash32(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.TextHash.simHash32($input);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
