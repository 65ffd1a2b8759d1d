package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the shapes AQE can't always fix (SURVEY
  * "Optimize for scale": skewed keys → salting).
  *
  * [[saltedJoin]] spreads a hot key over `saltFactor` shuffle partitions:
  * the big side gets a deterministic per-row salt, the small side is
  * replicated once per salt value, and the join key becomes
  * (keys..., salt). Row results are identical to the unsalted join —
  * salting only changes the physical distribution.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // deterministic salt from the whole big-side row (any spread works —
    // correctness never depends on the salt value)
    val salted = big.withColumn("__graft_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor.toLong))
        .cast("int"))
    val replicated = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__graft_salt", joinType)
      .drop("__graft_salt")
  }
}
