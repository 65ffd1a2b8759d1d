package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.queries.SkewQueries

/** Salted-vs-unsalted skew measurement (developer tooling, not a driver
  * surface): runs the q_skew_salted join shape — ~20% of lineitem rows
  * on ONE hot supplier key — three ways on `SPARK_GRAFT_SF_DIR`:
  *
  *  1. `unsalted`       — plain sort-merge join, AQE skew-join OFF:
  *                        the naive plan, paced by its one hot partition
  *  2. `unsalted_aqe`   — plain join, AQE skew-join ON: Spark's runtime
  *                        mitigation (splits oversized SMJ partitions)
  *  3. `salted`         — [[Skew.saltedJoin]], AQE skew-join OFF: the
  *                        by-construction mitigation that also covers
  *                        the shapes AQE can't split (shuffled-hash
  *                        build sides, aggregation keys)
  *
  * Per leg (after an untimed warm run of the scan): wall seconds, max
  * single-task milliseconds (the straggler signal — an unsalted run's
  * max task IS the hot partition), and spilled bytes. One JSON line per
  * leg + a row-count identity check across legs. Results land in
  * SCALING.md (round 9).
  */
object SkewBench {

  private final class TaskStats extends SparkListener {
    val spill = new AtomicLong(0L)
    val maxTaskMs = new AtomicLong(0L)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      if (e.taskInfo != null)
        maxTaskMs.getAndUpdate(c => math.max(c, e.taskInfo.duration))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def agg(joined: DataFrame): DataFrame = joined
      .groupBy(col("s_name"), col("n_name"))
      .agg(count(lit(1)).as("n_lines"), sum(col("__rev")).as("rev"))

    def legs: Seq[(String, Boolean, () => DataFrame)] = Seq(
      ("unsalted", false, () =>
        agg(SkewQueries.skewedLines(spark, sfDir)
          .join(SkewQueries.supplierDim(spark, sfDir).hint("MERGE"),
            Seq("supp_eff")))),
      ("unsalted_aqe", true, () =>
        agg(SkewQueries.skewedLines(spark, sfDir)
          .join(SkewQueries.supplierDim(spark, sfDir).hint("MERGE"),
            Seq("supp_eff")))),
      ("salted", false, () =>
        agg(Skew.saltedJoin(SkewQueries.skewedLines(spark, sfDir),
          SkewQueries.supplierDim(spark, sfDir).hint("MERGE"),
          Seq("supp_eff"), saltFactor = 8)))
    )

    // untimed warm: page-cache the parquet + absorb first-run codegen
    SkewQueries.skewedLines(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val counts = scala.collection.mutable.Map[String, Long]()
    legs.foreach { case (name, aqeSkew, build) =>
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        aqeSkew.toString)
      val stats = new TaskStats
      spark.sparkContext.addSparkListener(stats)
      val t0 = System.nanoTime()
      build().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(stats)
      counts(name) = build().count()
      println(f"""{"leg":"$name","sec":$sec%.3f,""" +
        s""""max_task_ms":${stats.maxTaskMs.get()},""" +
        s""""spill_bytes":${stats.spill.get()},"sf_dir":"$sfDir"}""")
    }
    require(counts.values.toSet.size == 1,
      s"result-group counts diverged across legs: $counts")
    println(s"""{"identity":"ok","groups":${counts.values.head}}""")
    spark.stop()
  }
}
