package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Z-order (Morton) clustering key — multi-dimensional data layout for
  * compaction. Linear `clusterBy(x)` gives parquet min/max pruning on
  * `x` only: every file spans the full range of every OTHER column.
  * Interleaving the bits of several rank-quantized columns makes file
  * boundaries follow a space-filling curve, so each file covers a small
  * hyper-rectangle of ALL the clustered columns and predicates on ANY
  * of them prune files — the layout Delta/Iceberg `OPTIMIZE ZORDER BY`
  * applies, composed here from codegen'd built-ins.
  *
  * Scale shape: one tiny min/max aggregate (map-side combined, a single
  * row) broadcast back, then a narrow per-row quantize+interleave —
  * the only corpus-wide movement is the range partition of the rewrite
  * itself, which any compaction pays.
  */
object ZOrder {

  /** Append a `__z` Morton-code column built from `cols` (numeric),
    * each linearly min/max-quantized to `bits` bits. `bits × |cols|`
    * must fit in 63. Constant columns quantize to 0; nulls sort first
    * (quantized 0). */
  def withZValue(df: DataFrame, cols: Seq[String],
      bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits * cols.size <= 63,
      s"bits($bits) x dims(${cols.size}) must fit in a long")
    val buckets = 1L << bits
    val stats = df.agg(
      min(col(cols.head)).cast(DoubleType).as(s"__min_${cols.head}"),
      (cols.tail.flatMap(c => Seq(
        min(col(c)).cast(DoubleType).as(s"__min_$c"),
        max(col(c)).cast(DoubleType).as(s"__max_$c"))) :+
        max(col(cols.head)).cast(DoubleType).as(s"__max_${cols.head}")): _*)
    val quantized = cols.map { c =>
      val lo = col(s"__min_$c")
      val hi = col(s"__max_$c")
      val span = hi - lo
      val q = when(col(c).isNull || span <= lit(0.0), lit(0L))
        .otherwise(least(
          floor((col(c).cast(DoubleType) - lo) / span * buckets)
            .cast(LongType),
          lit(buckets - 1)))
      greatest(q, lit(0L))
    }
    val d = cols.size
    val z = (for {
      i <- 0 until bits
      (q, j) <- quantized.zipWithIndex
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * d + j))
      .reduce(_.bitwiseOR(_))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", z)
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }
}
