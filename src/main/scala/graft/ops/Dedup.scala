package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import TextOps._

/** Deduplication operators for large-scale text corpora — the
  * training-data-pipeline extension (BASELINE.json north star). Every
  * operator is a shuffle-partitioned DataFrame program with no driver
  * collects and no N² stage:
  *
  *   - exact: hash-groupBy on normalized-text md5 — one shuffle on the
  *     hash, scales linearly.
  *   - MinHash+LSH: shingle → k minhashes → b bands → explode bands and
  *     shuffle by (band, hash) — candidate pairs only form inside LSH
  *     buckets, never across the full corpus; jaccard verification runs
  *     per candidate pair. At 100 TB the band shuffle is the only wide
  *     exchange, and bucket skew (boilerplate text) is handled by the
  *     verify-side threshold.
  *   - SimHash: 32-bit signature per doc from token-hash bit votes; a
  *     single narrow aggregation, pairs via signature-band blocking.
  *   - n-gram Jaccard within blocking keys (exact verify of any
  *     candidate generator).
  *   - embedding-cosine near-dup within blocks.
  */
object Dedup {

  /** Exact dedup: keep the lowest doc id per normalized-text hash
    * (hash-groupBy, no sort of the corpus). */
  def exact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("__th", md5(regexp_replace(lower(col(textCol)), "\\s+", " ")))
      .groupBy(col("__th"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .drop("__th")

  /** MinHash signatures: sig[p] = min over shingles of h32(p ':' s). */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), p =>
      array_min(transform(shingles,
        s => h32(concat(p.cast(StringType), lit(":"), s)))))

  /** LSH band hashes: md5 of the ','-joined signature slice per band. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws(",",
        transform(slice(sig, b * rowsPerBand + lit(1), lit(rowsPerBand)),
          v => v.cast(StringType)))))

  /** Near-duplicate pairs via MinHash-LSH candidates + exact jaccard
    * verification. Returns (id_a, id_b, jaccard) with id_a < id_b. */
  def minhashLsh(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleLen: Int = 3, numHashes: Int = 16,
      bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sh = docs
      .select(col(idCol), wordShingles(tokens(col(textCol)), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = sh
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col(idCol), col("sh"),
        posexplode(lshBands(col("sig"), bands, rowsPerBand))
          .as(Seq("band_idx", "band_hash")))
    val a = banded.select(col(idCol).as("id_a"), col("sh").as("sh_a"),
      col("band_idx"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("sh").as("sh_b"),
      col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash signature per document: bit i is the sign of the
    * token-hash bit votes. */
  def simhash(toks: Column): Column = {
    val bits = transform(sequence(lit(0), lit(31)), i =>
      when(aggregate(toks, lit(0),
        (acc, t) => acc + when(call_function("shiftright", h32(t), i) % 2 === 1, 1)
          .otherwise(-1)) > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, bit) => acc * 2 + bit)
  }

  def simhashTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), simhash(tokens(col(textCol))).as("simhash"))

  /** n-gram Jaccard near-dup pairs inside a blocking column (e.g. lang):
    * the exact-verification path, also usable standalone on blocked
    * corpora. */
  def ngramJaccardPairs(docs: DataFrame, blockCol: String,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol), col(blockCol),
      wordShingles(tokens(col(textCol)), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col(blockCol), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col(blockCol), col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs within a blocking column
    * (brute force inside blocks; LSH blocking in
    * [[Similarity.lshBuckets]] replaces the block column at scale). */
  def embeddingCosineDups(embs: DataFrame, blockCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.99): DataFrame = {
    val withVec = embs.select(col(blockCol), col(idCol),
      transform(col(vecCol), x => x.cast(DoubleType)).as("v"))
    val a = withVec.select(col(blockCol), col(idCol).as("id_a"), col("v").as("va"))
    val b = withVec.select(col(blockCol), col(idCol).as("id_b"), col("v").as("vb"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
