package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps.h32

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
}
