package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import TextOps._

/** Text-analysis operators for corpus curation — language ID, quality
  * scoring, token counting, fingerprinting (north-star text-analysis
  * block). All pure column programs: one narrow pass over the corpus,
  * no shuffles at all, so they stream at scan speed on any corpus size.
  */
object TextAnalysis {

  /** Tiny per-language function-word lexicons for the n-gram/stopword
    * language-ID heuristic. */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "zai"))

  /** All five lexicon hit counts + token count + total token length in
    * ONE native codegen'd pass over the text
    * ([[graft.functions.TokenLexStats]]) — previously each lexicon was a
    * separate interpreted `aggregate` fold re-walking the token array
    * (5× for language ID plus the quality facets' extra folds), the
    * second-worst contention amplifier in the round-2 bench. */
  def tokenLexStats(text: Column): Column =
    graft.functions.TokenLexStats.tokenLexStats(text, lexicons.map(_._2))

  /** Per-language hit-count columns (`hits_de` … `hits_zh`) from a
    * materialized [[tokenLexStats]] struct. */
  def langHitCols(st: Column): Seq[Column] =
    lexicons.zipWithIndex.map { case ((lang, _), i) =>
      element_at(st.getField("hits"), i + 1).as(s"hits_$lang")
    }

  /** Predicted language = argmax lexicon hits from a materialized
    * [[tokenLexStats]] struct; alphabetical tie-break (deterministic);
    * null-ish text predicts the first language. */
  def langIdFromStats(st: Column): Column = {
    val hits = st.getField("hits")
    val mx = array_max(hits)
    // first lexicon achieving the max wins (lexicons are alphabetical);
    // chain yields null only for null input → first language
    val chain = lexicons.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, ((lang, _), i)) =>
        val cond = element_at(hits, i + 1) === mx
        Some(acc.fold(when(cond, lit(lang)))(_.when(cond, lit(lang))))
    }.get
    coalesce(chain, lit(lexicons.head._1))
  }

  def langId(text: Column): Column = langIdFromStats(tokenLexStats(text))

  def langIdScores(text: Column): Column =
    struct(langHitCols(tokenLexStats(text)): _*)

  /** Quality facets from a materialized [[tokenLexStats]] struct +
    * the text: length band, stopword presence, punctuation restraint,
    * word-length sanity — the length/punct/stopword-ratio heuristics of
    * corpus filtering. Fully codegen'd (the only non-trivial work is the
    * punctuation regex and the shared stats pass). */
  def qualityFacetsFromStats(text: Column, st: Column): Column = {
    val nChars = length(text)
    val nToks = st.getField("n_tokens")
    val meanLen = when(nToks > 0,
      st.getField("sum_token_len").cast(DoubleType) / nToks)
      .otherwise(lit(0.0))
    val punct = length(regexp_replace(text, "[^.!?,;:]", ""))
    val punctRatio = when(nChars > 0,
      punct.cast(DoubleType) / nChars).otherwise(lit(0.0))
    val enIdx = lexicons.indexWhere(_._1 == "en")
    val stopRatio = when(nToks > 0,
      element_at(st.getField("hits"), enIdx + 1).cast(DoubleType) / nToks)
      .otherwise(lit(0.0))
    struct(nChars.as("n_chars"), nToks.as("n_tokens"),
      meanLen.as("mean_token_len"), punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"))
  }

  def qualityFacets(text: Column): Column =
    qualityFacetsFromStats(text, tokenLexStats(text))

  def qualityScoreFromFacets(f: Column): Column = {
    val lengthOk = when(f.getField("n_tokens").between(10, 10000), 1.0)
      .otherwise(0.0)
    val wordLenOk = when(f.getField("mean_token_len").between(2.0, 12.0), 1.0)
      .otherwise(0.0)
    val punctOk = when(f.getField("punct_ratio") <= 0.2, 1.0).otherwise(0.0)
    (lengthOk * 0.4 + wordLenOk * 0.3 + punctOk * 0.3)
  }

  def qualityScore(text: Column): Column =
    qualityScoreFromFacets(qualityFacets(text))

  /** Gopher-style compound rule filter (Rae et al. 2021 §A1.1 shape):
    * per-rule booleans + overall pass, so a curation run can report WHY
    * each document was dropped, not just that it was. Every comparison
    * is integer-only (counts and cross-multiplied ratios — never a
    * float division), so the verdict is bit-identical in any engine and
    * oracle-checkable. One narrow codegen pass: the token stats ride
    * the shared [[tokenLexStats]] kernel, the rest are per-row
    * length/replace/filter counts. Rules:
    *   - word_count: 10 ≤ n_tokens ≤ 5000
    *   - mean_word_len: 2 ≤ Σlen/n ≤ 12   (as 2n ≤ Σlen ≤ 12n)
    *   - symbol_ratio: (#'#' + #'...') · 10 ≤ n
    *   - bullet_lines: lines starting "- "/"* " ≤ 90% of lines
    *   - alpha_words: tokens containing [a-z] ≥ 80%  (10·a ≥ 8n)
    *   - stopwords: ≥ 2 English function-word occurrences
    */
  def gopherRules(text: Column): Column = {
    val st = tokenLexStats(text)
    val n = st.getField("n_tokens")
    val sumLen = st.getField("sum_token_len")
    val enIdx = lexicons.indexWhere(_._1 == "en")
    val stopHits = element_at(st.getField("hits"), enIdx + 1)
    val hashes = length(text) - length(replace(text, lit("#"), lit("")))
    // numerator is an exact multiple of 3 (each removal = 3 chars), so
    // the double division is exact and the int cast lossless
    val ellipses =
      ((length(text) - length(replace(text, lit("..."), lit("")))) / 3)
        .cast(IntegerType)
    val lines = split(text, "\n")
    val nLines = size(lines)
    val bullets = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("* ")))
    val alpha = size(filter(TextOps.tokens(text), t => t.rlike("[a-z]")))
    val rWordCount = n.between(10, 5000)
    val rMeanLen = n > 0 && sumLen >= n * 2 && sumLen <= n * 12
    val rSymbol = (hashes + ellipses) * 10 <= n
    val rBullet = bullets * 10 <= nLines * 9
    val rAlpha = alpha * 10 >= n * 8
    val rStop = stopHits >= 2
    struct(rWordCount.as("r_word_count"), rMeanLen.as("r_mean_word_len"),
      rSymbol.as("r_symbol_ratio"), rBullet.as("r_bullet_lines"),
      rAlpha.as("r_alpha_words"), rStop.as("r_stopwords"),
      (rWordCount && rMeanLen && rSymbol && rBullet && rAlpha && rStop)
        .as("pass"))
  }

  /** Token counts: whitespace tokens and a BPE-ish split (letter runs,
    * single digits, single punctuation) — the common pre-tokenizer
    * shape. */
  def tokenCounts(text: Column): Column =
    struct(
      size(filter(split(text, "\\s+"), t => t =!= "")).as("ws_tokens"),
      regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))
        .as("bpe_ish_tokens"))

  /** Flesch reading-ease and Flesch–Kincaid grade heuristics — the
    * classic readability band filter of corpus curation. Words are the
    * shared alnum tokens, sentences are `[.!?]+` runs (floored at 1 so
    * unpunctuated text degrades to one sentence instead of dividing by
    * zero), syllables are vowel-group runs `[aeiouy]+` per the standard
    * approximation (groups never span a word boundary, so one pass over
    * the whole text equals the per-word sum).
    *
    * Engine-exact WITHOUT quantization: the formulas use only literal
    * constants (both engines parse a decimal literal to the same
    * nearest double), integer counts, and IEEE divide/multiply/
    * subtract — every step is correctly rounded, so the doubles are
    * bit-identical cross-engine. One narrow codegen pass, no shuffle. */
  def readability(text: Column): Column = {
    val words = size(TextOps.tokens(text)).cast(LongType)
    val sentences = greatest(regexp_count(text, lit("[.!?]+")), lit(1))
      .cast(LongType)
    val syllables = regexp_count(lower(text), lit("[aeiouy]+"))
      .cast(LongType)
    val wps = words.cast(DoubleType) / sentences
    val spw = syllables.cast(DoubleType) / words
    struct(words.as("n_words"), sentences.as("n_sentences"),
      syllables.as("n_syllables"),
      (lit(206.835) - lit(1.015) * wps - lit(84.6) * spw).as("flesch"),
      (lit(0.39) * wps + lit(11.8) * spw - lit(15.59)).as("fk_grade"))
  }

  /** Document fingerprint: full-content md5 + min-hash of char-5-gram
    * shingles (a 1-hash MinHash — the rolling-hash winnowing
    * fingerprint's cheap cousin, robust to whitespace). The shingle
    * minimum is [[graft.functions.MinShingleH32]] — a native codegen'd
    * one-pass expression, not a per-window HOF (the interpreted
    * evaluator made this the slowest query under CPU contention:
    * 21.6 s vs ≤1 s for 5,000 docs at sf0.1). */
  def fingerprint(text: Column): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    struct(
      md5(norm).as("content_md5"),
      graft.functions.MinShingleH32.minShingleH32(norm, 5)
        .as("shingle_minhash"))
  }

  /** [[fingerprint]] as a table program: one narrow codegen'd pass, no
    * shuffle. The normalization regex is a projected column referenced
    * twice downstream — CollapseProject keeps non-cheap multi-reference
    * producers un-inlined and whole-stage codegen subexpression-
    * eliminates any remaining duplicate, so it runs once per row. */
  def fingerprintTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        regexp_replace(lower(col(textCol)), "\\s+", " ").as("__norm"))
      .select(col(idCol),
        md5(col("__norm")).as("content_md5"),
        graft.functions.MinShingleH32.minShingleH32(col("__norm"), 5)
          .as("shingle_minhash"))

  /** Gopher-style repetition metrics per document (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", table A1's repetition
    * filters, token-count flavored): type-token ratio, the corpus share
    * of the most frequent 2-gram, and the fraction of 3-gram slots
    * occupied by repeated 3-grams. One native codegen'd pass
    * ([[graft.functions.TextHash.repetitionStats]]) over the token
    * hashes — a narrow scan-speed pass like the rest of this file, vs
    * the explode + two groupBy shuffles of the naive formulation.
    * Ratios are int/int double divisions (engine-exact vs the DuckDB
    * oracle); documents shorter than a gram score 0 for that metric. */
  def repetitionTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val st = graft.functions.TextHash.repetitionStats(
      graft.functions.TextHash.tokenHashes(col(textCol)))
    docs.select(col(idCol), st.as("__rs"))
      .select(col(idCol),
        col("__rs.n_tokens").as("n_tokens"),
        when(col("__rs.n_tokens") > 0,
          col("__rs.distinct_tokens").cast(DoubleType) / col("__rs.n_tokens"))
          .otherwise(0.0).as("ttr"),
        when(col("__rs.n_tokens") > 1,
          col("__rs.top2gram_count").cast(DoubleType) /
            (col("__rs.n_tokens") - 1))
          .otherwise(0.0).as("top2gram_frac"),
        when(col("__rs.n_tokens") > 2,
          col("__rs.dup3gram_occurrences").cast(DoubleType) /
            (col("__rs.n_tokens") - 2))
          .otherwise(0.0).as("dup3gram_frac"))
  }

  /** Model-based quality scoring — the fasttext-classifier-shaped
    * stage of production curation pipelines (a linear model over hashed
    * token features, thresholded into a keep decision), with a
    * deterministic placeholder weight table (integer weights in
    * [−1, 1]·10⁻³ derived from the feature hash) standing in for
    * learned weights. The PLUMBING is the production shape: md5-h32
    * feature hashing, one codegen'd scan-speed accumulator pass
    * ([[graft.functions.TextHash.linearScoreSum]] — exact integer sum,
    * so the operator is DuckDB-hash-checkable), a single float division,
    * a threshold. Swapping in learned weights = replacing the weight
    * formula with a broadcast lookup; nothing else changes. */
  def modelScoreTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", threshold: Double = 0.0): DataFrame = {
    val th = graft.functions.TextHash.tokenHashes(col(textCol))
    docs.select(col(idCol), th.as("__th"))
      .select(col(idCol), size(col("__th")).as("n_tokens"),
        graft.functions.TextHash.linearScoreSum(col("__th")).as("__s"))
      .select(col(idCol), col("n_tokens"),
        when(col("n_tokens") > 0,
          col("__s").cast(DoubleType) / (col("n_tokens") * 1000.0))
          .otherwise(0.0).as("score"))
      .withColumn("keep", col("score") >= threshold)
  }

  /** Overlapping token-window chunking — the context-window prep step:
    * each document becomes ceil((n−chunk)/stride)+1 windows of
    * `chunkTokens` whitespace tokens, consecutive windows sharing
    * `chunkTokens − stride` tokens of overlap. Whitespace tokens (case
    * and punctuation preserved — chunk text feeds the model, unlike the
    * analysis tokens). ZERO-exchange narrow pass + explode: the token
    * array is a named non-cheap producer (CollapseProject refuses to
    * inline HOF producers into their multiple downstream references,
    * and Project does not collapse across the Generate), so the
    * tokenizer runs once per document and the operator streams at scan
    * speed — no repartition barrier (asserted in PlanAuditSpec). */
  def chunkTable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkTokens: Int = 64,
      stride: Int = 48): DataFrame = {
    val tk = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val withToks = docs.select(col(idCol), tk.as("__tk"))
    val n = size(col("__tk"))
    val nChunks = when(n > chunkTokens,
      floor((n - chunkTokens + (stride - 1)).cast(DoubleType) / stride)
        .cast(IntegerType) + 1).otherwise(lit(1))
    withToks
      .select(col(idCol), col("__tk"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ", slice(col("__tk"), col("chunk_idx") * stride + 1,
          lit(chunkTokens))).as("chunk_text"),
        size(slice(col("__tk"), col("chunk_idx") * stride + 1,
          lit(chunkTokens))).as("n_tokens"))
  }

  /** Apply a tokenizer vocabulary — the tokenization stage between
    * curation and training: encode each document (with ≥1 token) as
    * the id array of its analysis tokens, OOV → 0. `vocab` is a
    * `(token, tok_id)` table (e.g. ranks of the [[graft.queries
    * .DataOpsQueries]] vocabulary query).
    *
    * Scale shape: tokens explode WITH POSITION, broadcast-join the
    * vocabulary (real vocabularies are ≤10⁶ rows — broadcast range),
    * then regroup per document ordering by position — ONE exchange
    * keyed on the doc id; the corpus never shuffles for the lookup. */
  def encodeTokens(docs: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "token")))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"),
        coalesce(col("tok_id"), lit(0)).as("tid")))).as("pt"))
      .select(col(idCol),
        transform(col("pt"), e => e.getField("tid")).as("ids"))
  }

  /** PII patterns for redaction/counting — RE2-safe syntax (no
    * lookaround, `[0-9]` classes) so the same pattern text runs
    * identically on Spark (java.util.regex) and DuckDB (RE2). Order
    * matters: SSN before phone (both are digit-dash shapes). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b" -> "<SSN>",
    "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b" -> "<PHONE>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>")

  /** Redact emails, SSNs, phone numbers, and IPv4 addresses — the
    * pre-training scrub pass. A chain of narrow regexp_replace calls:
    * streams at scan speed, no shuffle. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** How many PII hits each pattern family found (for curation
    * reports). */
  def piiCounts(text: Column): Column =
    struct(
      regexp_count(text, lit(piiPatterns(0)._1)).as("n_email"),
      regexp_count(text, lit(piiPatterns(1)._1)).as("n_ssn"),
      regexp_count(text, lit(piiPatterns(2)._1)).as("n_phone"),
      regexp_count(text, lit(piiPatterns(3)._1)).as("n_ip"))

  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("tokens", tokenCounts(col(textCol)))
      .withColumn("fp", fingerprint(col(textCol)))

  /** Bigram-LM cross-entropy scoring — the CCNet-style perplexity
    * quality filter: train an add-one-smoothed bigram language model on
    * a reference corpus (CCNet uses Wikipedia; callers pass any clean
    * split), score every target document by its average negative
    * log-probability, and filter/bucket on the score (low = fluent,
    * high = noise).
    *
    * Engine-exact like [[Search.bm25]]: each bigram's
    * `ln((c(ab)+1)/(c(a)+V))` is quantized to 6 dp — the distinct
    * argument set is bounded by the LM's (pair count, prefix count)
    * combinations, not corpus size — and the 6-dp values sum EXACTLY
    * through a DECIMAL(18,6) accumulator (a 6-dp-rounded double casts
    * to DECIMAL(18,6) losslessly), so the per-doc order of bigrams
    * cannot perturb the score.
    *
    * Scale shape: LM training is two map-side-combined counts over the
    * (small) reference corpus; the model broadcasts; the target corpus
    * makes one narrow tokenize+explode pass, one broadcast join, and
    * one doc-keyed aggregation — shuffle volume is per-document rows,
    * never per-bigram. */
  def bigramCrossEntropy(target: DataFrame, reference: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // bigram rows WITHOUT a higher-order lambda: posexplode the token
    // array (a named attribute — Generate keeps it a reference, not a
    // copy) and pair each position with element_at(t, i+2). Everything
    // stays in whole-stage codegen; the first formulation (transform
    // lambda building struct pairs) ran interpreted and re-evaluated
    // the array expression per element — 26 s vs ~2 s at sf0.1.
    def bigramRows(df: DataFrame, extra: Seq[Column]): DataFrame =
      df.filter(size(col("__t")) >= 2)
        .select(extra ++ Seq((size(col("__t")) - 1).cast(LongType)
          .as("n_bigrams"), col("__t"),
          posexplode(col("__t")).as(Seq("__i", "w1"))): _*)
        .filter(col("__i") < col("n_bigrams"))
        .select(extra ++ Seq(col("n_bigrams"), col("w1"),
          element_at(col("__t"), col("__i") + 2).as("w2")): _*)
    // the reference corpus is the SMALL side by contract (a curated
    // clean split standing in for the LM training set); its tokenized
    // form feeds THREE separate model builds below (unigram counts,
    // bigram counts, vocabulary size), each a distinct broadcast
    // subtree — unchecked, the reference was re-read and re-tokenized
    // three times (measured: 4 scans of documents in the final plan,
    // 3 of them the reference). One lazy checkpoint bounds it to one
    // tokenize pass; the blocks are reference-sized, the bounded side.
    val refToks = reference.select(tokens(col(textCol)).as("__t"))
      .localCheckpoint(false)
    val uni = refToks.select(explode(col("__t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val bi = bigramRows(refToks, Seq.empty)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val vocabSize = uni.agg(count(lit(1)).as("v"))
    val tgt = bigramRows(
      target.select(col(idCol), tokens(col(textCol)).as("__t")),
      Seq(col(idCol)))
    val logp = round(log(
      (coalesce(col("c2"), lit(0L)) + lit(1.0)) /
        (coalesce(col("c1"), lit(0L)) + col("v"))), 6)
    tgt
      .join(broadcast(uni), Seq("w1"), "left")
      .join(broadcast(bi), Seq("w1", "w2"), "left")
      .crossJoin(broadcast(vocabSize))
      .select(col(idCol), col("n_bigrams"),
        logp.cast(DecimalType(18, 6)).as("__lp"))
      .groupBy(col(idCol))
      .agg(min(col("n_bigrams")).as("n_bigrams"),
        (-sum(col("__lp")).cast(DoubleType) /
          min(col("n_bigrams"))).as("cross_entropy"))
  }

  /** Sequence-packing manifest — the concat-then-chunk packing LLM
    * pretraining uses (all documents concatenated in id order, the
    * token stream cut into fixed `seqLen` sequences): for every
    * document, its global token offset and the first/last training
    * sequence it lands in. `seqLen` should be a power of two (the
    * 256/512/1024/... convention) so the offset division is IEEE-exact
    * and the manifest is engine-reproducible.
    *
    * Scale shape: the global ordered cumulative sum — the part a naive
    * `Window.orderBy(id)` would serialize onto ONE partition — is
    * two-level: an in-bucket cumsum windowed by `id div bucketSize`
    * (shuffle keyed by bucket, even partitions by construction) plus a
    * bucket-offset table of N/bucketSize rows whose own prefix sum runs
    * on the tiny side and broadcasts back. No corpus-wide sort, no
    * single-partition stage. */
  def packManifest(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", seqLen: Int = 256,
      bucketSize: Int = 1000): DataFrame = {
    val n = docs
      .select(col(idCol), size(TextOps.tokens(col(textCol)))
        .cast(LongType).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("__bucket", floor(col(idCol) / lit(bucketSize)))
    val inBucket = Window.partitionBy(col("__bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = n.withColumn("__cum", sum(col("n_tokens")).over(inBucket))
    val offsets = n.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(
        Window.orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__off"))
    withCum.join(broadcast(offsets), Seq("__bucket"))
      .select(col(idCol), col("n_tokens"),
        (col("__off") + col("__cum") - col("n_tokens")).as("tok_offset"))
      .withColumn("seq_first", floor(col("tok_offset") / lit(seqLen)))
      .withColumn("seq_last",
        floor((col("tok_offset") + col("n_tokens") - 1) / lit(seqLen)))
  }

  /** C4/CCNet-style boilerplate removal: a segment (fixed token chunk,
    * the [[graft.ops.Dedup.paragraphDedup]] segmentation) that occurs
    * in more than `maxDocShare` of a DOMAIN's documents is template
    * boilerplate (nav bars, footers, cookie banners) and is stripped
    * from every document of that domain; documents reassemble from
    * the surviving segments in order.
    *
    * Scale shape: segmentation is one narrow generate pass; the
    * boilerplate table is a (domain, segment-hash) distinct-doc
    * aggregate joined to per-domain doc counts (both keyed shuffles
    * over segment rows, map-side combined); the strip is a
    * (domain, hash)-keyed anti-join — the boilerplate side is tiny
    * (segments above the share threshold) and broadcasts. No pair
    * stage, no corpus self-join. */
  def boilerplateStrip(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", domainCol: String = "domain",
      segTokens: Int = 8, maxDocShare: Double = 0.2): DataFrame = {
    val tk = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val nseg = ((size(col("__tk")) + lit(segTokens - 1)) / lit(segTokens))
      .cast(IntegerType)
    val segs = docs
      .select(col(idCol), col(domainCol), tk.as("__tk"))
      .filter(size(col("__tk")) > 0)
      .select(col(idCol), col(domainCol),
        nseg.cast(LongType).as("n_segments"),
        posexplode(transform(sequence(lit(0), nseg - 1),
          i => concat_ws(" ",
            slice(col("__tk"), i * segTokens + 1, lit(segTokens)))))
          .as(Seq("seg_idx", "seg")))
      .withColumn("seg_hash", md5(col("seg")))
    // per-domain doc counts straight from the doc table: a doc appears
    // in `segs` iff it has ≥1 token, i.e. iff trim(text) is non-empty —
    // same integers as the old distinct-over-the-explode, without
    // paying the segment explode a second time (doc ids are unique, so
    // the distinct was only undoing the explode's multiplication)
    val domDocs = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .groupBy(col(domainCol)).agg(count(lit(1)).as("dom_docs"))
    val segDocs = segs.groupBy(col(domainCol), col("seg_hash"))
      .agg(countDistinct(col(idCol)).as("seg_docs"))
    val boiler = segDocs.join(domDocs, Seq(domainCol))
      .filter(col("seg_docs").cast(DoubleType) >
        lit(maxDocShare) * col("dom_docs").cast(DoubleType))
      .select(col(domainCol), col("seg_hash"))
    segs.join(boiler, Seq(domainCol, "seg_hash"), "left_anti")
      .groupBy(col(idCol), col(domainCol))
      .agg(min(col("n_segments")).as("n_segments"),
        count(lit(1)).as("kept_segments"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          e => e.getField("seg")), " ").as("text_clean"))
  }

  /** TF-IDF keyword extraction: the top-`k` terms of every document by
    * tf·idf weight — the doc-tagging stage of a curation pipeline
    * (topic routing, per-doc metadata, index keys).
    *
    * Scale shape: (doc, term) tf aggregate, term-keyed idf join, one
    * doc-keyed window for the top-k cut — every stage keyed by doc or
    * term, no corpus-wide sort, no pairing. Engine-exact: idf (the
    * only transcendental) is quantized to 9 dp per TERM (vocab-sized,
    * not corpus-sized), the weight is round-6-then-DECIMAL like the
    * BM25 term score, and rank ties break on the term string. */
  def tfidfKeywords(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3): DataFrame = {
    val td = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // examined for exchange reuse between the idf build and the probe
    // (round-17 optimization): the two (doc, term) aggregate subtrees
    // stay canonically distinct under column pruning (probe keeps tf,
    // idf build does not — forcing tf via count(tf) still left the
    // partial aggregates different), so the model build keeps its own
    // tokenize pass — 2 corpus passes total, the same shape as BM25's
    // model+probe, inherent to building a vocab model you then join
    val dfreq = td.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf = dfreq.crossJoin(broadcast(nDocs))
      .select(col("term"),
        round(log(col("n_docs").cast(DoubleType) / col("df")), 9).as("idf"))
    val w = td.join(idf, Seq("term"))
      .select(col(idCol), col("term"),
        round(col("tf") * col("idf"), 6).cast(DecimalType(18, 6)).as("wq"))
    w.withColumn("kw_rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("wq").desc, col("term"))))
      .filter(col("kw_rank") <= k)
      .select(col(idCol), col("term"),
        col("wq").cast(DoubleType).as("weight"), col("kw_rank"))
  }

  /** Term co-occurrence association over the corpus — pointwise mutual
    * information in LIFT form, `P(x,y)/(P(x)P(y)) = c_xy·N/(c_x·c_y)`
    * (= e^PMI; the log is monotone, so ranking is identical and the
    * score stays inside IEEE-exact arithmetic — `ln` is not bit-stable
    * across engines, division is).
    *
    * Scale shape: the vocabulary is first cut to the `vocabSize` most
    * document-frequent terms (ranked aggregate, tiny result,
    * broadcast), so the per-document pair generation is bounded by
    * vocabSize²/2 regardless of document length: per doc, the matched
    * terms are collected (≤ vocabSize), pairs are generated by a
    * nested HOF over that bounded array inside one narrow stage, and
    * one hash-aggregate keyed by (term_a, term_b) counts co-occurrence.
    * The corpus never self-joins. */
  def pmiLift(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", vocabSize: Int = 50,
      minCoDocs: Long = 5L): DataFrame = {
    val docTerms = docs
      .select(col(idCol),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
    val dfreq = docTerms.groupBy(col("term"))
      .agg(count(lit(1)).as("c"))
    // the ≤vocabSize-row vocab is referenced THREE times below (the
    // perDoc probe and the two lift joins), each as a distinct
    // broadcast subtree — without truncation every broadcast re-runs
    // the corpus tokenize+explode+groupBy(term) pipeline (4 corpus
    // passes total; at 100 TB the model build IS the job). A lazy
    // checkpoint of the tiny vocab bounds it to one pass; the first
    // broadcast materializes it.
    val topV = dfreq.orderBy(col("c").desc, col("term")).limit(vocabSize)
      .localCheckpoint(false)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val perDoc = docTerms
      .join(broadcast(topV.select(col("term"))), Seq("term"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("term"))).as("ts"))
    // ordered pairs (a < b) from the bounded per-doc term array: for
    // element i, pair with every later element — `ts` stays a named
    // attribute so the nested lambda reads the materialized array
    // (see bigramCrossEntropy's posexplode note)
    val pairs = perDoc.select(explode(flatten(
      zip_with(col("ts"), sequence(lit(0), size(col("ts")) - 1),
        (x, i) => transform(slice(col("ts"), i + lit(2),
          greatest(size(col("ts")) - i - 1, lit(0))),
          y => struct(x.as("term_a"), y.as("term_b"))))))
      .as("p"))
      .groupBy(col("p.term_a").as("term_a"), col("p.term_b").as("term_b"))
      .agg(count(lit(1)).as("co_docs"))
      .filter(col("co_docs") >= minCoDocs)
    pairs
      .join(broadcast(topV.select(col("term").as("term_a"),
        col("c").as("c_a"))), Seq("term_a"))
      .join(broadcast(topV.select(col("term").as("term_b"),
        col("c").as("c_b"))), Seq("term_b"))
      .crossJoin(broadcast(nDocs))
      .select(col("term_a"), col("term_b"), col("co_docs"),
        ((col("co_docs").cast(DoubleType) * col("n_docs").cast(DoubleType))
          / (col("c_a").cast(DoubleType) * col("c_b").cast(DoubleType)))
          .as("lift"))
  }
}
