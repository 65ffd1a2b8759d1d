package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level text/hash primitives shared by the dedup, similarity and
  * text-analysis operators. Everything here is composed from codegen'd
  * built-ins (no UDFs) and has an exact DuckDB translation, so every
  * downstream operator can be differentially oracle-checked:
  *
  *   - [[h32]]      ⇔ `('0x' || substr(md5(x),1,8))::BIGINT`
  *   - [[tokens]]   ⇔ `list_filter(string_split_regex(lower(x),
  *                     '[^a-z0-9]+'), t -> t <> '')`
  *   - [[wordShingles]] ⇔ `list_distinct(list_transform(generate_series(...),
  *                     i -> array_to_string(list_slice(t, i, i+n-1), ' ')))`
  */
object TextOps {

  /** Deterministic 32-bit hash from the md5 hex prefix — identical in any
    * engine with md5, unlike murmur/xxhash whose seeds differ. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** Lowercase alnum tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Distinct word n-gram shingles; empty when fewer than n tokens. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Distinct character k-gram shingles of the normalized text. */
  def charShingles(text: Column, k: Int): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    when(length(norm) >= k,
      array_distinct(transform(sequence(lit(1), length(norm) - (k - 1)),
        i => norm.substr(i, lit(k)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Distinct hashed word n-grams combined ARITHMETICALLY from per-token
    * hashes: one md5 per token (not per shingle, and no n-word string
    * building) — `c₁ = h₁; cₖ₊₁ = (cₖ·1000003 + hₖ₊₁) mod 3037000493`.
    * `tokenHashes` must be a MATERIALIZED column (behind an exchange),
    * because the shifted slices reference it n times. */
  def hashedWordShingles(tokenHashes: Column, n: Int): Column = {
    val len = size(tokenHashes) - (n - 1)
    val combined = (1 until n).foldLeft(slice(tokenHashes, lit(1), len)) {
      (acc, k) =>
        zip_with(acc, slice(tokenHashes, lit(1 + k), len),
          (a, b) => (a * 1000003L + b) % 3037000493L)
    }
    when(size(tokenHashes) >= n, array_distinct(combined))
      .otherwise(array().cast(ArrayType(LongType)))
  }

  /** Jaccard similarity of two distinct-element arrays — one double
    * division, so engine-exact. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_distinct(concat(a, b)))
}
