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

  /** MinHash signatures from a universal hash family over the base
    * shingle hashes ([[hashedShingles]]): sig[p] = min over shingles of
    * `((2p+1)·h + 12345p + 7) mod 4294967311` (prime > 2³²). One md5
    * per shingle total instead of k — the md5 pass dominates minhash
    * cost — with identical statistical behavior and exact DuckDB-oracle
    * reproducibility. */
  def minhashSignature(hashed: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), p =>
      array_min(transform(hashed,
        h => (h * (p * 2 + 1) + p * 12345 + 7) % 4294967311L)))

  /** LSH band hashes: md5 of the ','-joined signature slice per band. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws(",",
        transform(slice(sig, b * rowsPerBand + lit(1), lit(rowsPerBand)),
          v => v.cast(StringType)))))

  /** Distinct 32-bit shingle hashes — jaccard over these equals jaccard
    * over the string shingles (modulo engine-identical md5 collisions)
    * at a fraction of the per-pair cost. */
  def hashedShingles(shingles: Column): Column =
    array_distinct(transform(shingles, s => h32(s)))

  /** Near-duplicate pairs via MinHash-LSH candidates + exact jaccard
    * verification. Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Band geometry is the candidate-volume knob: match probability per
    * band is j^rowsPerBand. Corpora drawn from a small vocabulary have
    * correlated minima across documents, so short bands flood the
    * verify stage with j≈0.1 pairs — 4-row bands (default) keep
    * candidates ∝ true near-dups while catching j ≥ 0.8 pairs with
    * p ≈ 1-(1-j⁴)⁴ ≥ 0.97. */
  def minhashLsh(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleLen: Int = 3, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    // The repartitions are CollapseProject barriers, not distribution
    // choices: shingle/signature/band expressions are higher-order
    // functions (no whole-stage codegen), and letting the optimizer
    // inline them into every downstream reference re-evaluates the
    // expensive pass per reference (token hashes 3×, the 16 minhash
    // passes 4×). The exchanges pin each to one evaluation per row.
    val th = docs
      .select(col(idCol),
        transform(tokens(col(textCol)), t => h32(t)).as("th"))
      .repartition(col(idCol))
    val sh = th
      .select(col(idCol), hashedWordShingles(col("th"), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0)
    val sigDf = sh
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .repartition(col(idCol))
    val banded = sigDf
      .select(col(idCol), col("sh"),
        posexplode(lshBands(col("sig"), bands, rowsPerBand))
          .as(Seq("band_idx", "band_hash")))
    bucketPairs(banded, Seq("band_idx", "band_hash"), idCol, threshold,
      maxBucket)
      .distinct()
  }

  /** Emit verified (id_a, id_b, jaccard) pairs inside each bucket with a
    * single shuffle: group → collect members → explode the in-bucket
    * pair triangle. One pass over the bucketed rows — no self-join, so
    * the (expensive, non-codegen) shingle arrays are materialized once.
    *
    * Giant buckets (boilerplate clusters) are CAPPED: members are ranked
    * by id within the bucket and only the lowest `maxBucket` enter the
    * pair triangle, so one task's work is bounded by maxBucket²
    * regardless of key skew — a single all-identical cluster at 100 TB
    * cannot produce a B² straggler task. The row_number window and the
    * groupBy hash on the same keys, so they share one exchange. Dropped
    * volume is auditable via [[oversizedBuckets]]; pairs inside a
    * boilerplate cluster beyond the cap carry no curation signal. */
  private def bucketPairs(bucketed: DataFrame, bucketCols: Seq[String],
      idCol: String, threshold: Double, maxBucket: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(bucketCols.map(col): _*).orderBy(col(idCol))
    val capped = bucketed
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxBucket)
      .drop("__rk")
    val m = array_sort(collect_list(struct(col(idCol).as("id"),
      col("sh").as("sh"))))
    val buckets = capped.groupBy(bucketCols.map(col): _*)
      .agg(m.as("m")).filter(size(col("m")) > 1)
    val pairs = buckets.select(explode(flatten(
      transform(sequence(lit(0), size(col("m")) - 2), i =>
        transform(sequence(i + 1, size(col("m")) - 1), j =>
          struct(
            element_at(col("m"), i + 1).getField("id").as("id_a"),
            element_at(col("m"), j + 1).getField("id").as("id_b"),
            jaccard(element_at(col("m"), i + 1).getField("sh"),
              element_at(col("m"), j + 1).getField("sh")).as("jaccard"))))))
      .as("p"))
    pairs.select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
      col("p.jaccard").as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Audit of the [[bucketPairs]] cap: buckets whose member count
    * exceeds `maxBucket`, with how many members the pair triangle
    * dropped — the skip-with-counter ledger for curation reports. */
  def oversizedBuckets(bucketed: DataFrame, bucketCols: Seq[String],
      maxBucket: Int): DataFrame =
    bucketed.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("members"))
      .filter(col("members") > maxBucket)
      .withColumn("dropped_members", col("members") - maxBucket)

  /** 32-bit SimHash signature from PRE-HASHED tokens: bit i is the sign
    * of the token-hash bit votes. `hashes` must be a materialized column
    * (behind an exchange) — the 32-bit transform references it 32 times,
    * so an inlined expression would tokenize+md5 the document 32×. */
  def simhash(hashes: Column): Column = {
    val bits = transform(sequence(lit(0), lit(31)), i =>
      when(aggregate(hashes, lit(0),
        (acc, h) => acc + when(call_function("shiftright", h, i) % 2 === 1, 1)
          .otherwise(-1)) > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, bit) => acc * 2 + bit)
  }

  def simhashTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), transform(tokens(col(textCol)), t => h32(t)).as("__th"))
      .repartition(col(idCol)) // barrier: one tokenize + one md5 per token
      .select(col(idCol), simhash(col("__th")).as("simhash"))

  /** n-gram Jaccard near-dup pairs inside blocking columns: the exact
    * verification path for blocked corpora. Pairing is quadratic WITHIN
    * a block — the block key is the scale knob (finer keys keep blocks
    * small; corpus-wide discovery belongs to [[minhashLsh]], whose
    * candidates this same jaccard verifies). A cheap size-ratio
    * prefilter (`j ≥ t ⇒ min/max ≥ t`) skips the array intersection for
    * hopeless pairs. */
  def ngramJaccardPairs(docs: DataFrame, blockCols: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    val th = docs.select((col(idCol) +: blockCols.map(col)) :+
      transform(tokens(col(textCol)), t => h32(t)).as("th"): _*)
      .repartition(col(idCol)) // barrier — see minhashLsh
    val sh = th.select((col(idCol) +: blockCols.map(col)) :+
      hashedWordShingles(col("th"), n).as("sh"): _*)
      .filter(size(col("sh")) > 0)
    bucketPairs(sh, blockCols, idCol, threshold, maxBucket)
  }

  /** Embedding-cosine near-duplicate pairs within a blocking column
    * (brute force inside blocks; LSH blocking in
    * [[Similarity.lshBuckets]] replaces the block column at scale). */
  def embeddingCosineDups(embs: DataFrame, blockCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 0.99): DataFrame = {
    val withVec = embs.select(col(blockCol), col(idCol),
      transform(col(vecCol), x => x.cast(DoubleType)).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .repartition(col(idCol)) // barrier: one norm fold per vector
    val a = withVec.select(col(blockCol), col(idCol).as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = withVec.select(col(blockCol), col(idCol).as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosinePrenormed(col("va"), col("vb"), col("na"),
          col("nb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Connected components over near-dup pairs — the dedup FINISHING
    * step: every document that appears in any (id_a, id_b) pair gets a
    * `cluster_id` = the minimum doc id reachable through the pair graph,
    * so keep-one-per-cluster is a trivial `filter(id === cluster_id)`.
    *
    * Min-label propagation TO CONVERGENCE: each round, every node takes
    * the min of its own label and its neighbors' labels (one equi-join +
    * one min-groupBy — two bounded shuffles per round, never a cross
    * product). Labels only decrease, so an unchanged `sum(label)`
    * between rounds is a fixpoint — the exact transitive closure. Real
    * near-dup clusters converge in a handful of rounds (a round extends
    * the radius one hop); `iterations` is a safety cap for pathological
    * chain graphs, after which the partial labels are returned.
    *
    * Iterative lineage is TRUNCATED every round: each round references
    * `labels` twice and `edges` once, so without materialization the
    * final plan re-executes the upstream pair generator exponentially.
    * `edges` is checkpointed once and `labels` per round (the
    * materialization doubles as the convergence probe) — on a real
    * cluster swap `localCheckpoint` for reliable `checkpoint` so
    * executor loss cannot drop a round. */
  def dupClusters(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", iterations: Int = 50): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint() // pairs generator runs exactly once
    // seed = least(id, min neighbor) — the first propagation round done
    // inside the initialization aggregate (replaces distinct + a join)
    var labels = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
      .withColumnRenamed("src", "id")
      .localCheckpoint()
    var prevSig = Option.empty[Long]
    var r = 0
    var converged = false
    while (r < iterations && !converged) {
      r += 1
      val fromNbr = edges.alias("e")
        .join(labels.alias("l"), col("e.dst") === col("l.id"))
        .select(col("e.src").as("id"), col("l.cluster_id").as("cluster_id"))
      labels = labels.union(fromNbr)
        .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint()
      val sig = labels.agg(sum(col("cluster_id"))).head.getLong(0)
      converged = prevSig.contains(sig)
      prevSig = Some(sig)
    }
    labels.select(col("id").as("doc_id"), col("cluster_id"))
  }
}
