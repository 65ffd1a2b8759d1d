package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-curation operators over a URL column — the domain-level stages
  * every web-scale corpus pipeline runs before content filters (the
  * C4 / RefinedWeb recipe): domain extraction, blocklist scrubbing,
  * and per-domain document caps.
  *
  * Scale shape: extraction and blocklisting are narrow regex/set
  * passes (the blocklist ships as a literal/broadcast set — real
  * blocklists are ~10⁵ domains, well inside broadcast range); the
  * domain cap is one row_number window keyed by domain — a single
  * hash exchange whose key cardinality (#domains) is far below
  * #documents, with the id-ordered rank making the kept set
  * deterministic under any partitioning. */
object UrlOps {

  /** Host part of a URL — a RE2-safe regex (identical pattern text runs
    * on DuckDB) instead of `parse_url`, so the operator is
    * cross-engine hash-checkable. */
  def domain(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/:?#]+)", 1)

  /** Drop documents whose URL domain is blocklisted. */
  def dropBlockedDomains(docs: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame =
    docs.filter(!domain(col(urlCol)).isInCollection(blocked))

  /** Keep at most `maxPerDomain` documents per domain (lowest ids) —
    * the domain-frequency cap that stops boilerplate-heavy hosts from
    * dominating a corpus. Adds a `domain` column. */
  def domainCap(docs: DataFrame, idCol: String, urlCol: String,
      maxPerDomain: Int): DataFrame = {
    val w = Window.partitionBy(col("domain")).orderBy(col(idCol))
    docs.withColumn("domain", domain(col(urlCol)))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPerDomain)
      .drop("__rk")
  }
}
