package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import TextOps.{h32, tokens}

/** Deterministic hash-based sampling for corpus curation. Unlike
  * `df.sample` (RNG-seeded per partition — results change with
  * partitioning), the keep decision is a pure function of the row key:
  * `h32(key) mod 10000 < fraction·10000`. The same row is kept on every
  * run, on any cluster layout, and the sample is reproducible from the
  * key alone — the property training-data pipelines need so reruns and
  * backfills select identical subsets. Narrow (no shuffle): the filter
  * pushes into the scan stage.
  */
object Sampling {

  private def keep(key: Column, fraction: Double): Column =
    pmod(h32(key.cast("string")), lit(10000)) < lit((fraction * 10000).toInt)

  /** Uniform deterministic sample: keep ~`fraction` of rows keyed by
    * `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(keep(col(keyCol), fraction))

  /** Stratified deterministic sample: per-stratum fractions with a
    * default for unlisted strata — e.g. downsample dominant languages
    * while keeping the tail. One narrow pass; the CASE on the stratum
    * column selects the threshold per row. */
  def stratifiedHashSample(df: DataFrame, keyCol: String,
      stratumCol: String, fractions: Map[String, Double],
      defaultFraction: Double): DataFrame = {
    val threshold = fractions.foldLeft(
      lit((defaultFraction * 10000).toInt)) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum, lit((f * 10000).toInt)).otherwise(acc)
    }
    df.filter(pmod(h32(col(keyCol).cast("string")), lit(10000)) < threshold)
  }

  /** Deterministic corpus shuffle into `nShards` training shards: shard
    * assignment and within-shard order are both pure functions of the
    * row key (`h32("shard:"+key)` / `h32("pos:"+key)`), so the global
    * permutation is reproducible on any cluster layout — the property a
    * training run needs for resumable, audit-stable data ordering
    * (epoch reshuffles = change the salt). Scale shape: ONE exchange
    * hash-partitioned on `shard` plus a per-shard sort; pick `nShards`
    * so a shard fits an executor (100 TB / 10 MB shards = 10M shards —
    * the sort never sees more than one shard). No global sort, no
    * driver state. */
  def shuffleShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = col(keyCol).cast("string")
    val shard = pmod(h32(concat(lit("shard:"), key)), lit(nShards))
    val order = h32(concat(lit("pos:"), key))
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(order, col(keyCol))).cast("long"))
  }

  /** Fixed-proportion mixture sampling: downsample each domain so the
    * kept corpus matches target weights (basis points summing to
    * 10000) as closely as downsampling-only allows. The largest total
    * honoring every target is `T = min_s floor(n_s·10000/w_s)`; each
    * domain then keeps `target_s = floor(w_s·T/10000)` rows via the
    * deterministic hash threshold `floor(target_s·10000/n_s)`. All
    * arithmetic is BIGINT (no floats), so the kept set is bit-identical
    * across engines and reruns. Scale shape: one map-side-combined
    * per-domain count, broadcast back, one narrow corpus filter — no
    * corpus shuffle. Domains with no target weight are dropped. */
  def mixtureSample(df: DataFrame, keyCol: String, domainCol: String,
      weightsBp: Map[String, Int]): DataFrame = {
    require(weightsBp.values.sum == 10000,
      s"mixture weights must sum to 10000 bp, got ${weightsBp.values.sum}")
    val w = weightsBp.foldLeft(lit(null).cast("long")) {
      case (acc, (dom, bp)) =>
        when(col(domainCol) === dom, lit(bp.toLong)).otherwise(acc)
    }
    // BIGINT `div` throughout (Spark/DuckDB float `/` would round):
    // bit-exact cross-engine, no precision cliff at 2^53 rows·bp
    // lazy checkpoint of the ≤|weightsBp|-row count table: `tmax` is a
    // broadcast scalar nested under the thresholds broadcast, and
    // nested broadcast stages defeat exchange reuse (the d_dsir
    // finding) — unchecked, the corpus was aggregated twice
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_dom"))
      .withColumn("w_bp", w).filter(col("w_bp").isNotNull)
      .localCheckpoint(false)
    val tmax = counts
      .agg(min(expr("(n_dom * 10000) div w_bp")).as("t_max"))
    val thresholds = counts.crossJoin(broadcast(tmax))
      .select(col(domainCol),
        expr("((w_bp * t_max) div 10000) * 10000 div n_dom")
          .as("keep_bp"))
    df.join(broadcast(thresholds), Seq(domainCol))
      .filter(pmod(h32(col(keyCol).cast("string")), lit(10000)) <
        col("keep_bp"))
  }

  /** Temperature-τ=0.5 domain rebalancing (the multilingual-/domain-
    * mixing stage: sample domain s with probability ∝ n_s^τ instead of
    * n_s, flattening the head without dropping the tail). Realized as
    * downsampling-only: every domain keeps fraction √(n_min/n_s) of its
    * rows — the smallest domain keeps 100%, a 100×-larger one keeps 10%
    * — which yields post-mix counts ∝ √n_s exactly. The keep decision
    * is the deterministic [[hashSample]] hash on the row key, and the
    * per-domain fraction uses only division + IEEE-exact `sqrt`, so the
    * sampled set is engine-reproducible (DuckDB-oracle-checkable) and
    * stable across reruns/partitionings.
    *
    * Scale shape: one map-side-combined count per domain (tiny result),
    * broadcast back, then a single narrow filter over the corpus — no
    * corpus shuffle at all. */
  def temperatureResample(df: DataFrame, keyCol: String,
      domainCol: String): DataFrame = {
    // domain-cardinality rows; lazy-checkpointed for the same nested-
    // broadcast reason as mixtureSample (nmin re-ran the corpus agg)
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("domain_docs"))
      .localCheckpoint(false)
    val nmin = counts.agg(min(col("domain_docs")).as("__nmin"))
    val thresholds = counts.crossJoin(broadcast(nmin))
      .select(col(domainCol), col("domain_docs"),
        floor(sqrt(col("__nmin").cast("double") /
          col("domain_docs").cast("double")) * 10000)
          .cast("long").as("keep_bp"))
    df.join(broadcast(thresholds), Seq(domainCol))
      .filter(pmod(h32(col(keyCol).cast("string")), lit(10000)) <
        col("keep_bp"))
  }

  /** Data-constrained epoch planning (Muennighoff et al. 2023 shape):
    * given a total token budget and target mixture weights, compute
    * per-domain target tokens, the epoch (repeat) factor over the
    * available unique tokens, and the repeat-capped planned tokens —
    * the training-recipe table that decides how many times each
    * domain is seen.
    *
    * Scale shape: ONE hash-aggregate over the corpus (per-domain token
    * sums — a handful of rows), then pure literal arithmetic against
    * the broadcast weights table. Engine-exact: token counts are
    * integers, every derived figure is IEEE multiply/divide/floor on
    * identical operands, `least` is exact. */
  def epochPlan(docs: DataFrame, domainCol: String, nTokensCol: Column,
      weights: Seq[(String, Double)], budgetTokens: Long,
      maxEpochs: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toDF(domainCol, "weight")
    val perDomain = docs
      .select(col(domainCol), nTokensCol.cast(LongType).as("__nt"))
      .groupBy(col(domainCol))
      .agg(sum(col("__nt")).as("tokens_available"))
    perDomain.join(broadcast(w), Seq(domainCol))
      .select(col(domainCol),
        col("tokens_available"),
        floor(lit(budgetTokens).cast(DoubleType) * col("weight"))
          .as("target_tokens"),
        least(
          floor(lit(budgetTokens).cast(DoubleType) * col("weight"))
            .cast(DoubleType) /
            col("tokens_available").cast(DoubleType),
          lit(maxEpochs)).as("epochs"),
        floor(col("tokens_available").cast(DoubleType) *
          least(
            floor(lit(budgetTokens).cast(DoubleType) * col("weight"))
              .cast(DoubleType) /
              col("tokens_available").cast(DoubleType),
            lit(maxEpochs))).as("planned_tokens"))
  }

  /** DSIR data selection (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): score every corpus document by
    * its hashed-unigram log importance weight under a target-vs-raw
    * bucket model and keep the top `topK`. `isTarget` marks the target
    * (in-domain) subset; both distributions come from ONE token pass —
    * per-bucket target count `ct` (tokens of target docs) and raw count
    * `cr` (all tokens) — with add-one smoothing over `buckets` hash
    * buckets. A document's weight is
    * `Σ_tokens ln(p_target(b)/p_raw(b))`.
    *
    * Engine-exact scoring discipline (see [[graft.ops.Search]] /
    * bigramCrossEntropy): the single `ln` per BUCKET (not per token) is
    * the only transcendental; its argument is one exact
    * integer-ratio — `(ct+1)(N_r+B) / (cr+1)(N_t+B)` with both products
    * formed in BIGINT before one double division — and it is quantized
    * to 6 dp, then per-document sums run through a DECIMAL(18,6)
    * accumulator so aggregation order cannot perturb the result.
    *
    * Scale shape: the bucket model is `buckets` rows (map-side-combined
    * from the token pass) and is BROADCAST back; the corpus side is one
    * narrow tokenize+explode and ONE shuffle keyed by document id for
    * the per-doc sum (partial aggregation applies). Top-k is
    * TakeOrderedAndProject — no global sort. Nothing is ever keyed by
    * token or bucket on the corpus side. */
  def dsirSelect(docs: DataFrame, isTarget: Column,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 1024, topK: Int = 200): DataFrame = {
    val b = buckets.toLong
    // ONE tokenize+explode corpus pass, reduced to a (doc, bucket)
    // histogram that BOTH consumers — the bucket model and the scoring
    // join — read through the same exchange (ReuseExchange dedups the
    // identical shuffle subtrees). The previous shape hung the model
    // directly off the token stream, so the corpus was re-tokenized
    // once for `totals`, once for `lam`, and once for scoring — three
    // full passes where one suffices (guide §2.3/§2.4: aggregate
    // before you shuffle; at 100 TB re-tokenizing the corpus 3× is the
    // whole job). Per-doc sums move to exact decimal lam×count
    // arithmetic — the same values summed in groups, bit-identical.
    val docBuckets = docs
      .select(col(idCol), isTarget.as("__is_t"),
        explode(tokens(col(textCol))).as("__w"))
      .select(col(idCol), col("__is_t"),
        pmod(h32(col("__w")), lit(b)).as("__b"))
      // explicit not-null on the (never-null) bucket key: the scoring
      // join infers `isnotnull(__b)` on ITS branch only, which would
      // de-canonicalize the two otherwise-identical aggregate subtrees
      // and break ReuseExchange — with the filter on BOTH, the model
      // branch reads the probe's shuffle instead of re-running the
      // tokenize pass (verified in plans/r17/d_dsir_after.txt)
      .filter(col("__b").isNotNull)
      .groupBy(col(idCol), col("__is_t"), col("__b"))
      .agg(count(lit(1)).as("__n"))
    val bucketCounts = docBuckets.groupBy(col("__b")).agg(
      sum(when(col("__is_t"), col("__n")).otherwise(lit(0L))).as("ct"),
      sum(col("__n")).as("cr"))
    // corpus totals as an unpartitioned window over the bucket model —
    // NOT a broadcast scalar subquery: a nested broadcast inside the
    // lam broadcast plans its own query stage, and exchange reuse does
    // not reach it (measured: the totals branch re-ran the whole
    // tokenize+histogram pipeline — a full extra corpus pass). The
    // window input is hard-bounded at `buckets` rows by the pmod
    // domain (PlanGuard.boundedWindowAllow carries the argument), so
    // one single-partition pass over ≤1024 rows replaces a corpus scan.
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val lam = bucketCounts
      .withColumn("nt", sum(col("ct")).over(wAll))
      .withColumn("nr", sum(col("cr")).over(wAll))
      .select(col("__b"),
        round(log(((col("ct") + lit(1L)) * (col("nr") + lit(b)))
          .cast(DoubleType) /
          ((col("cr") + lit(1L)) * (col("nt") + lit(b))).cast(DoubleType)),
          6).cast(DecimalType(18, 6)).as("__lam"))
    docBuckets.join(broadcast(lam), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__lam") * col("__n")).cast(DoubleType).as("dsir_score"),
        sum(col("__n")).cast(LongType).as("n_tokens"))
      .orderBy(col("dsir_score").desc, col(idCol))
      .limit(topK)
  }
}
