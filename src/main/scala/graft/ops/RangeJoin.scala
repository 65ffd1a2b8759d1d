package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join on event time: pairs within `toleranceSeconds`
  * of each other. A naive `|a.ts - b.ts| <= tol` predicate gives Spark a
  * non-equi join and a BroadcastNestedLoopJoin (O(N·M)); bucketing both
  * sides into tolerance-width bins turns it into an equi-join on
  * (keys..., bin) — each left row probes its own bin and the two
  * neighbors, so every qualifying pair is found exactly once and the
  * join shuffles hash-partitioned like any other equi-join.
  */
object RangeJoin {

  /** Equi-keys + time-proximity join. Left side is exploded to 3 bins
    * (cheap side to triple; pass the smaller frame as `left`). */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      toleranceSeconds: Long): DataFrame = {
    val tolUs = toleranceSeconds * 1000000L
    val lBin = floor(unix_micros(col(leftTs)) / tolUs)
    val l = left.withColumn("__bin",
      explode(array(lBin - 1, lBin, lBin + 1)))
    val r = right.withColumn("__bin",
      floor(unix_micros(col(rightTs)) / tolUs))
    l.join(r, keys :+ "__bin")
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs)))
        <= tolUs)
      .drop("__bin")
  }
}
