package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Sampling, Search}

/** Round-4 pipeline additions: corpus-wide segment (paragraph) dedup,
  * temperature-based domain rebalancing, and BM25 lexical retrieval —
  * the curation / data-mixing / search stages that sit alongside the
  * dedup+ANN families in a full training-data pipeline. All
  * differentially oracle-checked against DuckDB.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private def h32Sql(arg: String) =
    s"('0x' || substr(md5($arg), 1, 8))::BIGINT"
  private val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  // synthetic skewed domain labels over documents (60/25/10/5%): the
  // head-heavy mixture temperature sampling exists to flatten
  private val domainCase =
    """CASE WHEN doc_id % 100 < 60 THEN 'web'
      |     WHEN doc_id % 100 < 85 THEN 'books'
      |     WHEN doc_id % 100 < 95 THEN 'code'
      |     ELSE 'wiki' END""".stripMargin
  private def domainCol =
    when(col("doc_id") % 100 < 60, "web")
      .when(col("doc_id") % 100 < 85, "books")
      .when(col("doc_id") % 100 < 95, "code")
      .otherwise("wiki")

  val defs: Map[String, Q] = Map(
    // CCNet/RefinedWeb-style corpus-wide segment dedup: every 8-token
    // segment survives only at its first (doc, position) occurrence;
    // documents reassemble from surviving segments.
    "d_dedup_paragraph" -> ((s, dir) =>
      Dedup.paragraphDedup(Tables.load(s, dir, "documents"),
        segTokens = 8)),

    // Temperature-0.5 domain rebalance over a synthetic skewed domain
    // mix: post-sample counts ∝ √n_domain, smallest domain kept whole.
    "d_resample_temp" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), domainCol.as("domain"))
      Sampling.temperatureResample(d, keyCol = "doc_id",
        domainCol = "domain")
        .select(col("doc_id"), col("domain"), col("domain_docs"),
          col("keep_bp"))
    }),

    // BM25 top-100 lexical retrieval for a 3-term query.
    "s_bm25" -> ((s, dir) =>
      Search.bm25(Tables.load(s, dir, "documents"),
        Seq("spark", "window", "merge"), topK = 100))
  )

  val oracle: Map[String, String] = Map(
    "d_dedup_paragraph" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |c AS (SELECT doc_id, tk, CAST((len(tk) + 7) // 8 AS BIGINT) AS nseg
        |  FROM t WHERE len(tk) > 0),
        |segs AS (SELECT doc_id, nseg, CAST(i AS INT) AS seg_idx,
        |    array_to_string(list_slice(tk, i*8 + 1, i*8 + 8), ' ') AS seg
        |  FROM c, unnest(generate_series(0, CAST(nseg AS INT) - 1)) g(i)),
        |k AS (SELECT doc_id, nseg, seg_idx, seg,
        |    doc_id * 1000000 + seg_idx AS ord,
        |    min(doc_id * 1000000 + seg_idx)
        |      OVER (PARTITION BY md5(seg)) AS fo
        |  FROM segs)
        |SELECT doc_id, min(nseg) AS n_segments,
        |  count(*) AS kept_segments,
        |  string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup
        |FROM k WHERE ord = fo GROUP BY doc_id""".stripMargin,

    "d_resample_temp" ->
      s"""WITH d AS (SELECT doc_id, $domainCase AS domain FROM documents),
         |c AS (SELECT domain, count(*) AS domain_docs FROM d GROUP BY domain),
         |m AS (SELECT min(domain_docs) AS nmin FROM c),
         |f AS (SELECT domain, domain_docs,
         |    CAST(floor(sqrt(CAST(nmin AS DOUBLE) /
         |      CAST(domain_docs AS DOUBLE)) * 10000) AS BIGINT) AS keep_bp
         |  FROM c, m)
         |SELECT d.doc_id, d.domain, f.domain_docs, f.keep_bp
         |FROM d JOIN f USING (domain)
         |WHERE ${h32Sql("CAST(d.doc_id AS VARCHAR)")} % 10000 < f.keep_bp""".stripMargin,

    "s_bm25" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |l AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, tk FROM t),
         |s AS (SELECT count(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
         |  FROM l),
         |q AS (SELECT unnest(['spark', 'window', 'merge']) AS term),
         |tf AS (SELECT doc_id, dl, term,
         |    CAST(len(list_filter(tk, x -> x = term)) AS BIGINT) AS tf
         |  FROM l, q),
         |tfp AS (SELECT * FROM tf WHERE tf > 0),
         |dfq AS (SELECT term, count(*) AS dfreq FROM tfp GROUP BY term),
         |idf AS (SELECT term,
         |    round(ln((s.n_docs - dfreq + CAST(0.5 AS DOUBLE)) /
         |      (dfreq + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)), 9)
         |      AS idf,
         |    CAST(s.sum_dl AS DOUBLE) / s.n_docs AS avgdl
         |  FROM dfq, s),
         |sc AS (SELECT doc_id,
         |    CAST(idf * (tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
         |      (tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
         |        - CAST(0.75 AS DOUBLE)
         |        + CAST(0.75 AS DOUBLE) * dl / avgdl)))
         |      AS DECIMAL(18,6)) AS ts,
         |    tf
         |  FROM tfp JOIN idf USING (term))
         |SELECT doc_id, CAST(SUM(ts) AS DOUBLE) AS score,
         |  CAST(SUM(tf) AS BIGINT) AS matched_tf
         |FROM sc GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 100""".stripMargin
  )
}
