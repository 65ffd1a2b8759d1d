package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass token statistics + multi-lexicon hit counts — a native
  * codegen'd Catalyst expression replacing what was previously 5+
  * interpreted higher-order folds per row (one `aggregate` lambda per
  * lexicon, plus the quality facets' extra folds), each of which
  * re-walked the token array in the CodegenFallback evaluator.
  *
  * Tokenization is split-identical to the repo-wide convention
  * ([[graft.ops.TextOps.tokens]] ⇔ DuckDB
  * `list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x<>'')`):
  * maximal runs of `[a-z0-9]` after lowercasing. Multi-byte UTF-8
  * sequences contain only bytes ≥ 0x80, which are never token bytes, so
  * byte-level scanning splits exactly where the character-level regex
  * does — except the two Unicode characters whose `lower()` maps INTO
  * the token alphabet (U+212A → k, U+0130 → i + combining dot), which
  * the scanner special-cases to match the regex spec (equivalence
  * asserted on exactly those characters in ScaleSpec).
  *
  * Returns `struct(n_tokens INT, sum_token_len BIGINT, hits ARRAY<BIGINT>)`
  * with `hits(i)` = number of tokens contained in `lexicons(i)`.
  */
case class TokenLexStats(child: Expression, lexicons: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "token_lex_stats"

  @transient private lazy val matcher = new TokenLexMatcher(lexicons)

  override def nullSafeEval(input: Any): Any =
    matcher.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("lexMatcher", matcher,
      classOf[TokenLexMatcher].getName)
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = $m.compute($input.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenLexStats {
  /** Column form. */
  def tokenLexStats(c: Column, lexicons: Seq[Seq[String]]): Column =
    GraftBridge.column(TokenLexStats(GraftBridge.expression(c), lexicons))
}

/** The shared scan kernel: one forward pass over the UTF-8 bytes,
  * counting tokens, total token length, and per-lexicon membership hits
  * (token → lexicon-index list prebuilt as a hash map; strings are only
  * materialized for tokens short enough to possibly be lexicon words).
  */
final class TokenLexMatcher(lexicons: Seq[Seq[String]]) extends Serializable {
  private val numLex = lexicons.length
  private val maxWordLen =
    if (lexicons.exists(_.nonEmpty)) lexicons.flatten.map(_.length).max else 0
  private val members: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    lexicons.zipWithIndex.foreach { case (lex, i) =>
      lex.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  def compute(bytes: Array[Byte]): InternalRow = {
    var nTokens = 0
    var sumLen = 0L
    val hits = new Array[Long](numLex)
    val n = bytes.length
    val sb = new java.lang.StringBuilder(16)
    var inTok = false
    def closeToken(): Unit = {
      nTokens += 1
      sumLen += sb.length
      if (sb.length <= maxWordLen) {
        val idx = members.get(sb.toString)
        if (idx != null) {
          var k = 0
          while (k < idx.length) { hits(idx(k)) += 1; k += 1 }
        }
      }
      inTok = false
    }
    var i = 0
    while (i <= n) {
      var c = if (i < n) bytes(i) & 0xff else -1
      var closeAfter = false
      // the two Unicode chars whose lower() maps into the token
      // alphabet (see TextHash.tokenHashes): U+212A -> 'k';
      // U+0130 -> 'i' + a combining-dot separator
      if (c == 0xe2 && i + 2 < n && (bytes(i + 1) & 0xff) == 0x84 &&
          (bytes(i + 2) & 0xff) == 0xaa) { c = 'k'; i += 2 }
      else if (c == 0xc4 && i + 1 < n && (bytes(i + 1) & 0xff) == 0xb0) {
        c = 'i'; i += 1; closeAfter = true
      }
      if (c >= 'A' && c <= 'Z') c += 32
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (isTok) {
        if (!inTok) { sb.setLength(0); inTok = true }
        sb.append(c.toChar)
        if (closeAfter) closeToken()
      } else if (inTok) closeToken()
      i += 1
    }
    new GenericInternalRow(Array[Any](nTokens, sumLen,
      ArrayData.toArrayData(hits)))
  }
}
