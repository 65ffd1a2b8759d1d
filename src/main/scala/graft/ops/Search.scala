package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import TextOps.tokens

/** Keyword relevance search — Okapi BM25 top-k over the corpus, the
  * lexical-retrieval twin of the embedding ANN family in
  * [[Similarity]] (dense + sparse retrieval are the two halves of any
  * corpus search stack).
  *
  * Scale shape: tokenization is written ONCE and each scan of the
  * corpus is one narrow pass — a single set-membership filter over the
  * token array keeps only query-term occurrences, and per-term
  * frequencies are then counted over that (tiny) matched array, so
  * query-term count multiplies the matched tokens, not the corpus
  * tokens. No shuffle is keyed by term. The plan still evaluates the
  * corpus lineage twice (once under the tiny broadcast stats/dfreq
  * aggregate, once as the probe side) — inherent to two-phase BM25
  * without caching. The only aggregations are the two tiny ones
  * (corpus doc count/average length, derived exactly from the
  * pre-filter term rows; per-term document frequencies — at most
  * |query| rows), both map-side combined and broadcast back. The
  * final top-k is Spark's TakeOrderedAndProject (per-partition heads,
  * no global sort).
  *
  * Engine-exact scoring (differentially checkable against DuckDB):
  * `ln` is NOT bit-identical across engines, so the per-term idf —
  * the only transcendental — is quantized to 9 dp (|query| values,
  * not |corpus|), every other factor is IEEE-exact arithmetic on
  * integers, and the per-document sum of term scores runs through a
  * DECIMAL(18,6) accumulator so partial-aggregation order cannot
  * perturb the result.
  */
object Search {

  /** Top-`k` documents by BM25 score for `queryTerms`, with the
    * standard k1=1.2, b=0.75 parameters. Output: doc_id, score
    * (descending), matched_tf (total term occurrences).
    * `queryTerms` must be distinct (a repeated term would double-count
    * its contribution, per the classic bag-of-words formulation). */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      topK: Int = 100): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: queryTerms must be non-empty")
    val k1 = lit(1.2)
    val b = lit(0.75)
    // one tokenized projection; a single membership pass keeps only
    // query-term tokens so the per-term counts below scan the matched
    // array (|matches|), not the full token array (|tokens|)
    val perDoc = docs
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), size(col("__t")).cast(LongType).as("dl"),
        filter(col("__t"), x => x.isin(queryTerms: _*)).as("__m"))
    val termRows = perDoc
      .select(col(idCol), col("dl"),
        array(queryTerms.map(t =>
          struct(lit(t).as("term"),
            size(filter(col("__m"), x => x === lit(t)))
              .cast(LongType).as("tf"))): _*).as("__tfs"))
      .select(col(idCol), col("dl"), explode(col("__tfs")).as("e"))
      .select(col(idCol), col("dl"), col("e.term").as("term"),
        col("e.tf").as("tf"))
    val withTf = termRows.filter(col("tf") > 0)
    // ONE per-term aggregate produces the WHOLE model: every document
    // contributes exactly one pre-filter row per query term, so each
    // term's row count IS n_docs and each term's Σdl IS the corpus
    // total — the same integers the old separate one-row `stats`
    // aggregate computed (oracle-identical idf/avgdl). The previous
    // shape hung `stats` as a broadcast nested inside the dfreq
    // broadcast, which re-ran the tokenize pipeline (nested broadcast
    // stages defeat exchange reuse — same finding as d_dsir); with the
    // fused aggregate + a lazy checkpoint of the ≤|queryTerms|-row
    // model, the corpus is tokenized twice total (model + probe)
    // instead of three times.
    val dfreq = termRows.groupBy(col("term"))
      .agg(sum(when(col("tf") > 0, lit(1L)).otherwise(lit(0L)))
          .as("dfreq"),
        count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl"))
      // idf quantized to 9 dp: the one non-IEEE-exact factor, one value
      // per query term
      .select(col("term"),
        round(log((col("n_docs") - col("dfreq") + lit(0.5)) /
          (col("dfreq") + lit(0.5)) + lit(1.0)), 9).as("idf"),
        (col("sum_dl").cast(DoubleType) / col("n_docs")).as("avgdl"))
      .localCheckpoint(false)
    // round to 6 dp BEFORE the DECIMAL(18,6) cast so the cast is
    // lossless — cross-engine agreement no longer hinges on the two
    // engines' double→decimal conversions tying identically at 6 dp
    val termScore =
      round(col("idf") * (col("tf") * (k1 + lit(1.0)) /
        (col("tf") + k1 * (lit(1.0) - b + b * col("dl") / col("avgdl")))), 6)
        .cast(DecimalType(18, 6))
    withTf.join(broadcast(dfreq), Seq("term"))
      .groupBy(col(idCol))
      .agg(sum(termScore).cast(DoubleType).as("score"),
        sum(col("tf")).as("matched_tf"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Exact phrase search — documents containing the query tokens as a
    * CONSECUTIVE sequence, with occurrence count and first match
    * position (1-based). The positional capability BM25's bag-of-words
    * scoring cannot express.
    *
    * Scale shape: one narrow tokenize, then posexplode anchored on the
    * first phrase token only (the cheap prefilter: positions where
    * `t[i] = phrase₀`), with the remaining tokens checked by
    * `element_at` against the SAME materialized token array — the
    * Generate output keeps `__t` a named attribute reference, so the
    * whole match stays in whole-stage codegen (no per-element
    * re-evaluation; see bigramCrossEntropy). ONE shuffle keyed by
    * document id for the per-doc counts, partial aggregation applies. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val n = phrase.length
    val anchored = docs
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col(idCol), col("__t"),
        posexplode(col("__t")).as(Seq("__i", "__w")))
      .filter(col("__w") === phrase.head &&
        col("__i") <= size(col("__t")) - n)
    val matched = (1 until n).foldLeft(anchored) { (df, k) =>
      df.filter(element_at(col("__t"), col("__i") + (k + 1)) === phrase(k))
    }
    matched.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"),
        (min(col("__i")) + 1).cast(LongType).as("first_pos"))
  }

  /** Inverted-index construction: one row per vocabulary term with its
    * document frequency, total term frequency, and a bounded posting
    * sample (the first `postingCap` doc ids in id order, serialized) —
    * the index-build stage behind [[bm25]]-style retrieval when the
    * index is materialized rather than recomputed per query.
    *
    * Scale shape: tokenize + explode (narrow), one (term, doc)
    * hash-aggregate for tf, then term-keyed window + final term
    * aggregate that reuse the SAME term partitioning (one exchange, not
    * two — the row_number cap and the final groupBy cluster on the
    * window's partition key). The posting array is capped BEFORE
    * collection, so no row exceeds `postingCap` ids even for stop-word
    * terms; df/tf stats still count the full posting set. */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", postingCap: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val td = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))
    val capped = td.withColumn("rn",
      row_number().over(Window.partitionBy(col("term"))
        .orderBy(col(idCol))))
    capped.groupBy(col("term"))
      .agg(count(lit(1)).as("dfreq"),
        sum(col("tf")).as("total_tf"),
        array_join(array_sort(collect_list(
          when(col("rn") <= postingCap, col(idCol))))
          .cast("array<string>"), ",").as("posting_sample"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    * merge lexical (BM25) and dense (ANN) retrieval into one hybrid
    * ranking: each input ranking contributes `1/(kConst + rank)` and
    * documents absent from a ranking contribute 0.
    *
    * Deterministic by construction: ranks are integers, each
    * contribution is one exact IEEE division, and the fused score is a
    * FIXED-ORDER fold over the rankings (successive outer joins in
    * input order, not an aggregation) — so it hash-matches across
    * engines with no quantization. Each ranking is top-k-bounded and
    * the joins are id-keyed; at corpus scale the inputs are already
    * tiny (k rows per query source). */
  def rrfFuse(rankings: Seq[(String, DataFrame)],
      idCol: String = "doc_id", kConst: Int = 60,
      topK: Int = 50): DataFrame = {
    val contribs = rankings.map { case (name, df) =>
      df.select(col(idCol), col("rank").cast(LongType).as(s"${name}_rank"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(kConst) + col(s"${name}_rank")), lit(0.0))
    }.reduce(_ + _)
    joined
      .withColumn("rrf", score)
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
