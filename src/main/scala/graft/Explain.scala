package graft

import org.apache.spark.sql.SparkSession

/** Plan dump for one registered query: prints the executed physical
  * plan (pass `run` as third arg to execute first, so the printed
  * AdaptiveSparkPlan is the FINAL one with ReusedExchange/AQE stages
  * visible). Developer tooling — not a driver surface.
  * Usage: `runMain graft.Explain <queryName> <sfDir> [run]` */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    if (args.length > 2 && args(2) == "run") {
      val n = df.queryExecution.toRdd.count()
      println(s"=== ROWS $n ===")
    }
    println("=== PLAN START ===")
    println(df.queryExecution.executedPlan.toString)
    println("=== PLAN END ===")
    spark.stop()
  }
}
