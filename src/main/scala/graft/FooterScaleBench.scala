package graft

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.materialize.{IcebergTable, IcebergWriter}

/** One-shot measurement main for the round-16 verdict's watch item:
  * driver wall of parquet-footer field-id resolution at native-table
  * file counts (~50k files). Builds a 50k-file Iceberg table once
  * under `bigdata/` (gitignored), then times first-touch (footer
  * resolution included) vs footer-cached reads. */
object FooterScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-footer-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val files = args.lift(1).map(_.toInt).getOrElse(50000)
    val batch = 2000
    val dir = args.headOption.getOrElse(
      s"/root/repo/bigdata/footer$files")
    if (!new File(dir, "metadata").exists()) {
      val t = System.nanoTime()
      // batched appends: one 50k-task job GC-thrashes the 8g driver;
      // 25 × 2000-file commits build the same table incrementally
      def slice(lo: Long, hi: Long) =
        spark.range(lo, hi)
          .select(col("id"), (col("id") * 2).as("v"))
          .repartition(batch)
      IcebergWriter.create(spark, dir, slice(0, batch.toLong))
      var lo = batch.toLong
      while (lo < files) {
        IcebergWriter.append(spark, dir,
          slice(lo, math.min(lo + batch, files.toLong)))
        lo += batch
        println(s"APPENDED ${lo}")
      }
      println(f"BUILD ${(System.nanoTime() - t) / 1e9}%.1f s")
    }
    def timed(tag: String): Unit = {
      val t = System.nanoTime()
      val n = IcebergTable.read(spark, dir).count()
      println(f"$tag count=$n in ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    timed("FIRST")   // manifest parse + footer resolution + scan
    timed("CACHED")  // footers cached: manifest parse + scan only
    spark.stop()
  }
}
