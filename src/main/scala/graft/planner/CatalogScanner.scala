package graft.planner

import java.nio.file.{Files, Path, Paths}

/** Upstream-volume estimator — port of the reference's `CatalogScanner`
  * (reference `catalog_scanner.py:51-234`): sum of upstream table sizes
  * with a TTL'd cache and a bytes/row fallback. Locally the "catalog" is
  * the filesystem (parquet dir sizes); on a cluster this becomes catalog
  * statistics (`spark.table(t).queryExecution.logical.stats`), same API.
  */
final class CatalogScanner(ttlMinutes: Long = 60,
    clock: () => Long = () => System.currentTimeMillis()) {

  /** bytes/row fallback when no files exist (catalog_scanner.py:216-223). */
  val fallbackBytesPerRow = 100L

  private val cache =
    scala.collection.mutable.Map[String, (Long, Long)]() // path -> (bytes, at)

  def sizeBytes(tableDir: String): Long = {
    val now = clock()
    cache.get(tableDir) match {
      case Some((bytes, at)) if now - at < ttlMinutes * 60000 => bytes
      case _ =>
        val p = Paths.get(tableDir)
        val bytes =
          if (!Files.exists(p)) 0L
          else {
            import scala.jdk.CollectionConverters._
            Files.walk(p).iterator().asScala
              .filter(Files.isRegularFile(_))
              .map(Files.size).sum
          }
        cache(tableDir) = (bytes, now)
        bytes
    }
  }

  /** Estimated input volume of a model = Σ upstream sizes
    * (catalog_scanner.py:63-71). */
  def estimateInputGb(upstreamDirs: Seq[String]): Double =
    upstreamDirs.map(sizeBytes).sum.toDouble / (1L << 30)

  def estimateFromRows(rowCount: Long): Long =
    rowCount * fallbackBytesPerRow

  def invalidate(): Unit = cache.clear()
}
