package graft

import org.apache.spark.sql.SparkSession

/** Single-query micro-benchmark: runs one registered query N times in
  * one JVM so steady-state time and run-to-run spread are visible
  * separately from first-execution codegen/JIT (which run 1 absorbs).
  * Usage: `runMain graft.MicroBench <queryName> [runs]` with
  * `SPARK_GRAFT_SF_DIR` selecting the scale. Developer tooling — not a
  * driver surface. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MINPART", "64k"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args.headOption.getOrElse("d_dedup_embed_lsh")
    val runs = args.lift(1).map(_.toInt).getOrElse(4)
    val spill = graft.telemetry.SpillListener
      .forContext(spark.sparkContext)
    (1 to runs).foreach { i =>
      val s0 = spill.totalSpillBytes
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously — settle before reading
      Thread.sleep(500)
      val gb = (spill.totalSpillBytes - s0) / 1e9
      println(f"run $i: $sec%.3f s  spill ${gb}%.2f GB")
    }
    spark.stop()
  }
}
