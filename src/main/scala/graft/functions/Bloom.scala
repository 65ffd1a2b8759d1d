package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Deterministic Bloom-filter probe over a SPARSE bitmask — the
  * broadcast-prefilter primitive for set-membership at corpus scale
  * (e.g. [[graft.ops.Decontam.overlapBloom]]: probe 10¹¹ train grams
  * against a 2²⁰-bit digest of the eval grams instead of shuffling
  * them). The bitmask is stored sparse as two parallel SORTED arrays —
  * 64-bit word indices and word values (only non-zero words) — built by
  * a plain DataFrame aggregation, so the whole filter is a deterministic
  * column program: no driver-side sketch objects, no RNG,
  * engine-reproducible.
  *
  * Hash family: a QUADRATIC (mid-square) family — with `g₁ = g mod
  * (2³¹−1)` and `q = g₁² mod 4294967311`, bit position i is
  * `(q·(2i+1) + g₁·(12345·i + 7) + 999331·i) mod 4294967311 mod bits`.
  * The quadratic term matters: a purely affine family (the MinHash
  * one) maps arithmetic-progression gram sets to clustered positions
  * and measured ~10× the theoretical false-positive rate on structured
  * probes; squaring first restores near-theory FPR (asserted in
  * KernelPropertySpec). Every intermediate stays < 2⁶² — overflow-free
  * under ANSI semantics in both the kernel and the Column form. No
  * false negatives; false positives only cost work in the exact verify
  * stage that follows, never correctness.
  */
object Bloom {
  private val P = 4294967311L
  private val M1 = 2147483647L // 2^31 − 1

  def bitPosition(g: Long, i: Int, bits: Int): Long = {
    val g1 = java.lang.Math.floorMod(g, M1)
    val q = (g1 * g1) % P
    java.lang.Math.floorMod(
      (q * (2 * i + 1) + g1 * (12345L * i + 7L) + 999331L * i) % P,
      bits.toLong)
  }

  /** All `k` positions for one gram — the build side's explode list
    * (same arithmetic as [[bitPosition]], as Column expressions). */
  def positions(g: Column, bits: Int, k: Int): Column = {
    import org.apache.spark.sql.functions.{array, lit, pmod}
    val g1 = pmod(g, lit(M1))
    val q = (g1 * g1) % P
    array((0 until k).map { i =>
      pmod((q * (2 * i + 1) + g1 * (12345L * i + 7L) + 999331L * i) % P,
        lit(bits.toLong))
    }: _*)
  }

  /** true iff every one of the gram's k bits is set (binary search per
    * word over the sorted sparse index). Reads the sorted word-index
    * array in place via `getLong` — no `toLongArray` copy, since this
    * runs once per probed gram and the mask is ~2^14 words. */
  def mayContain(wordIdx: ArrayData, wordVal: ArrayData, g: Long,
      bits: Int, k: Int): Boolean = {
    val n = wordIdx.numElements()
    var i = 0
    while (i < k) {
      val pos = bitPosition(g, i, bits)
      val w = pos >>> 6
      var lo = 0
      var hi = n - 1
      var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mk = wordIdx.getLong(mid)
        if (mk < w) lo = mid + 1
        else if (mk > w) hi = mid - 1
        else { found = mid; lo = hi + 1 }
      }
      if (found < 0) return false
      if (((wordVal.getLong(found) >>> (pos & 63L).toInt) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }

  def mayContain(wordIdx: Column, wordVal: Column, g: Column, bits: Int,
      k: Int): Column =
    GraftBridge.column(BloomMayContain(GraftBridge.expression(wordIdx),
      GraftBridge.expression(wordVal), GraftBridge.expression(g), bits, k))
}

/** (sorted word indices, word values, gram) → may-contain boolean. */
case class BloomMayContain(first: Expression, second: Expression,
    third: Expression, bits: Int, k: Int) extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_may_contain"
  override def nullSafeEval(w: Any, v: Any, g: Any): Any =
    Bloom.mayContain(w.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData],
      g.asInstanceOf[Long], bits, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, v, g) =>
      s"${ev.value} = graft.functions.Bloom.mayContain($w, $v, $g, $bits, $k);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}
