package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import TextOps.tokens

/** Distributed BPE (byte-pair-encoding) tokenizer training — the merge-
  * table learning loop every LLM data pipeline runs before tokenizing a
  * corpus (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units").
  *
  * Scale shape: the corpus is reduced ONCE to its word-frequency
  * dictionary (one shuffle on word — the dictionary is orders of
  * magnitude smaller than the corpus and is the classic BPE training
  * input), and every merge round after that touches only the
  * dictionary: one narrow pair-explode pass, one map-side-combined
  * pair-count aggregate (keyed by the pair, bounded by the distinct-
  * pair vocabulary), a 1-row top-pair aggregate broadcast back, and a
  * literal string replace to apply the merge. Rounds are inherently
  * sequential (round r+1's counts depend on round r's merge); the
  * dictionary is re-checkpointed each round so the plan stays flat
  * instead of nesting r rounds of subplans (`localCheckpoint` here; on
  * a real cluster swap for reliable `checkpoint`). Nothing is ever
  * collected to the driver.
  *
  * Engine-exact and differentially checkable end-to-end: pair counts
  * are integer sums of word frequencies; the winning pair is picked by
  * (count DESC, lhs, rhs) — a total order with no float anywhere; and
  * the merge itself is a literal (non-regex) string replace under a
  * delimiter encoding chosen so that plain left-to-right non-
  * overlapping `replace` implements exactly BPE's left-to-right merge:
  * each symbol is wrapped in double bars (`||a||b||c||`), and the pair
  * (a,b) is replaced via pattern `|a||b|` → `|ab|`. Because the
  * pattern consumes only the INNER bar of each flanking double bar,
  * back-to-back occurrences (`...a||b||a||b...`) both match — unlike a
  * single-delimiter encoding, where the first replacement would eat
  * the boundary the next match needs. Symbols are [a-z0-9]+ subwords,
  * so `|` can never occur inside one.
  */
object Bpe {

  private val emptyPairs = array().cast(
    ArrayType(StructType(Seq(StructField("lhs", StringType),
      StructField("rhs", StringType)))))

  /** Adjacent symbol pairs (with multiplicity — BPE counts every
    * adjacency, e.g. `aaa` has (a,a) twice) of the `||`-encoded word. */
  private def adjacentPairs(enc: org.apache.spark.sql.Column) = {
    val arr = filter(split(enc, "\\|+"), x => x =!= "")
    when(size(arr) >= 2,
      transform(sequence(lit(0), size(arr) - 2),
        i => struct(element_at(arr, i + 1).as("lhs"),
          element_at(arr, i + 2).as("rhs"))))
      .otherwise(emptyPairs)
  }

  /** Learn `rounds` BPE merges from the corpus. Returns one row per
    * merge: (merge_rank 1-based, lhs, rhs, pair_count) in learned
    * order. Words shorter than 2 characters carry no pairs and are
    * dropped up front.
    *
    * Pair counts are maintained INCREMENTALLY (the fast-BPE recipe,
    * Sennrich et al. 2016 §3): the full dictionary is pair-exploded
    * exactly once, and each subsequent round recounts only the words
    * the last merge actually touched — count(r+1) = count(r) −
    * pairs(old enc of touched) + pairs(new enc of touched), an exact
    * integer delta folded into the distinct-pair relation by a
    * full-outer join. Untouched words (the overwhelming majority once
    * merges specialize) cost one narrow string-replace pass and no
    * explode, which is what keeps the per-round cost tracking the
    * touched set instead of the vocabulary (round-6 measured exponent
    * 0.67 at sf10 came from 6 full re-explodes). Zero-count pairs are
    * dropped after each delta so the relation stays exactly equal to a
    * from-scratch recount (a pair is present iff its count is > 0). */
  def trainMerges(docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "bpe: rounds must be >= 1")
    // corpus -> word-frequency dictionary (the only corpus-sized pass)
    val dict0 = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(lit("||"),
        regexp_replace(col("w"), "(.)", "$1||")).as("enc"), col("freq"))
    var dict = dict0.localCheckpoint()
    // the one full-vocabulary pair explode
    def pairCounts(d: DataFrame, f: org.apache.spark.sql.Column,
        enc: String) = d
      .select(explode(adjacentPairs(col(enc))).as("p"), f.as("f"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("f")).as("pair_count"))
    var counts = pairCounts(dict, col("freq"), "enc").localCheckpoint()
    var merges: Seq[DataFrame] = Nil
    for (r <- 1 to rounds) {
      val top = counts
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1)
        .localCheckpoint()
      merges = merges :+ top.withColumn("merge_rank", lit(r))
      if (r < rounds) {
        val topLR = broadcast(top.select(col("lhs"), col("rhs")))
        // one narrow pass over the dictionary: apply the merge, keep
        // the pre-merge encoding so the touched set is `enc0 != enc`
        val applied = dict.crossJoin(topLR)
          .select(col("enc").as("enc0"),
            replace(col("enc"),
              concat(lit("|"), col("lhs"), lit("||"), col("rhs"), lit("|")),
              concat(lit("|"), col("lhs"), col("rhs"), lit("|"))).as("enc"),
            col("freq"))
          .localCheckpoint()
        val touched = applied.filter(col("enc0") =!= col("enc"))
        val delta = pairCounts(touched, -col("freq"), "enc0")
          .unionByName(pairCounts(touched, col("freq"), "enc"))
          .groupBy(col("lhs"), col("rhs"))
          .agg(sum(col("pair_count")).as("d"))
        counts = counts.join(delta, Seq("lhs", "rhs"), "full_outer")
          .select(col("lhs"), col("rhs"),
            (coalesce(col("pair_count"), lit(0L))
              + coalesce(col("d"), lit(0L))).as("pair_count"))
          .filter(col("pair_count") > 0)
          .localCheckpoint()
        dict = applied.select(col("enc"), col("freq"))
      }
    }
    merges.reduce(_ union _)
      .select(col("merge_rank"), col("lhs"), col("rhs"),
        col("pair_count"))
  }

  /** Apply a learned `rounds`-row merge table to the corpus vocabulary —
    * the distributed inference twin of [[trainMerges]]: the merge table
    * collapses to ONE broadcast row (a rank-sorted struct array), and
    * each merge is a literal replace under the same double-bar encoding,
    * unrolled statically (`rounds` is the static merge count, so the
    * whole segmentation is one codegen'd projection — no loop state, no
    * UDF). Returns (word, subwords_json, n_subwords) per distinct
    * corpus word of length >= 2. */
  def segmentVocab(docs: DataFrame, textCol: String, merges: DataFrame,
      rounds: Int): DataFrame = {
    val ms = merges
      .agg(sort_array(collect_list(struct(col("merge_rank"),
        col("lhs"), col("rhs")))).as("__ms"))
    val enc0 = concat(lit("||"),
      regexp_replace(col("w"), "(.)", "$1||"))
    val encN = (1 to rounds).foldLeft(enc0) { (e, i) =>
      // a degenerate corpus can learn fewer than `rounds` merges; a
      // NULL pattern would null the whole encoding, and plain
      // element_at past the array end THROWS under Spark 4's default
      // ANSI mode — try_element_at is NULL-on-out-of-bounds in every
      // mode, and the isNull guard then skips the absent merge
      val m = try_element_at(col("__ms"), lit(i))
      when(m.isNull, e).otherwise(replace(e,
        concat(lit("|"), m("lhs"), lit("||"), m("rhs"), lit("|")),
        concat(lit("|"), m("lhs"), m("rhs"), lit("|"))))
    }
    val sub = filter(split(encN, "\\|+"), x => x =!= "")
    docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2).distinct()
      .crossJoin(broadcast(ms))
      .select(col("w").as("word"), to_json(sub).as("subwords_json"),
        size(sub).as("n_subwords"))
  }

  /** Apply a learned merge table to a token: the inference twin of
    * [[trainMerges]] (merges applied in rank order). Exposed for the
    * spec's round-trip property; tokenization of a corpus would ride
    * the same broadcast merge table. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var enc = "||" + word.flatMap(c => s"$c||")
    merges.foreach { case (l, r) =>
      enc = enc.replace(s"|$l||$r|", s"|$l$r|")
    }
    enc.split("\\|+").toSeq.filter(_.nonEmpty)
  }
}
