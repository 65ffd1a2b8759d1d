package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.queries.SkewQueries

/** Salted-vs-unsalted skew measurement (developer tooling, not a driver
  * surface): runs the q_skew_salted join shape — ~20% of lineitem rows
  * on ONE hot supplier key — four ways on `SPARK_GRAFT_SF_DIR`:
  *
  *  1. `unsalted_merge`     — sort-merge join, AQE skew-join OFF: the
  *                            naive plan, paced by its hot partition
  *  2. `unsalted_merge_aqe` — sort-merge, AQE skew-join ON: Spark's
  *                            runtime mitigation (splits oversized
  *                            SMJ partitions)
  *  3. `unsalted_hash`      — shuffled-hash join, skew unmitigated:
  *                            the shape AQE's skew rule does not
  *                            split by default
  *  4. `salted_hash`        — [[Skew.saltedJoin]] + shuffled-hash:
  *                            the by-construction mitigation,
  *                            sortless and balanced
  *
  * Per leg (after an untimed warm run of the scan): wall seconds, max
  * single-task milliseconds (the straggler signal — an unsalted run's
  * max task IS the hot partition), spilled bytes, and per-stage
  * (max, mean, tasks) for the top stages — a balanced stage has
  * max ≈ mean, a skewed one max >> mean. One JSON line per leg + a
  * row-count identity check across legs. Results land in SCALING.md
  * (round 9).
  */
object SkewBench {

  private final class TaskStats extends SparkListener {
    val spill = new AtomicLong(0L)
    val maxTaskMs = new AtomicLong(0L)
    // per-stage (max task ms, task count, stage task-time sum) — the
    // straggler signal must be ATTRIBUTED: a scan-stage straggler and a
    // hot join reducer look identical in a global max
    val byStage = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, Long, Long)]()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      if (e.taskInfo != null) {
        val d = e.taskInfo.duration
        maxTaskMs.getAndUpdate(c => math.max(c, d))
        byStage.merge(e.stageId, (d, 1L, d),
          (a, b) => (math.max(a._1, b._1), a._2 + b._2, a._3 + b._3))
      }
    }
    /** Top-k stages by max task, as a compact JSON fragment: each entry
      * (stage, max task ms, mean task ms, tasks) — a balanced stage has
      * max ≈ mean; a skewed one has max >> mean. */
    def topStages(k: Int): String = {
      import scala.jdk.CollectionConverters._
      byStage.asScala.toSeq.sortBy(-_._2._1).take(k)
        .map { case (sid, (mx, n, sum)) =>
          s"""{"stage":$sid,"max_ms":$mx,"mean_ms":${sum / n},"tasks":$n}"""
        }.mkString("[", ",", "]")
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
      // the SURVEY sizing rule, applied: sf10's lineitem is one 1.1 GB
      // parquet file, and the default 128 MB split gives a 9-task scan
      // stage whose ~22 s stragglers MASK the join-stage skew this tool
      // exists to measure (observed: every leg's max task was a scan
      // task). 32 MB splits put the map side at ~36 tasks on 32 cores.
      .config("spark.sql.files.maxPartitionBytes", (32L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def agg(joined: DataFrame): DataFrame = joined
      .groupBy(col("s_name"), col("n_name"))
      .agg(count(lit(1)).as("n_lines"), sum(col("__rev")).as("rev"))

    // Leg design note (measured on the way here, sf10): salting a
    // SORT-MERGE join balances the stage (max/mean task 1.10 vs 2.37)
    // but the salt as a tie-breaking second sort key turns the
    // prefix-tied key comparisons (~300 distinct suppliers per
    // partition) into full-record compares — stage CPU doubled and the
    // balance bought nothing. The scale-correct composition is salting
    // + SHUFFLED-HASH: no sort anywhere, the replicated dim builds a
    // tiny per-partition hash map, and the probe side streams balanced.
    def legs: Seq[(String, Boolean, () => DataFrame)] = Seq(
      ("unsalted_merge", false, () =>
        agg(SkewQueries.skewedLines(spark, sfDir)
          .join(SkewQueries.supplierDim(spark, sfDir).hint("MERGE"),
            Seq("supp_eff")))),
      ("unsalted_merge_aqe", true, () =>
        agg(SkewQueries.skewedLines(spark, sfDir)
          .join(SkewQueries.supplierDim(spark, sfDir).hint("MERGE"),
            Seq("supp_eff")))),
      ("unsalted_hash", false, () =>
        agg(SkewQueries.skewedLines(spark, sfDir)
          .join(SkewQueries.supplierDim(spark, sfDir)
            .hint("SHUFFLE_HASH"), Seq("supp_eff")))),
      ("salted_hash", false, () =>
        agg(Skew.saltedJoin(SkewQueries.skewedLines(spark, sfDir),
          SkewQueries.supplierDim(spark, sfDir).hint("SHUFFLE_HASH"),
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
        s""""spill_bytes":${stats.spill.get()},""" +
        s""""top_stages":${stats.topStages(3)},"sf_dir":"$sfDir"}""")
    }
    require(counts.values.toSet.size == 1,
      s"result-group counts diverged across legs: $counts")
    println(s"""{"identity":"ok","groups":${counts.values.head}}""")
    spark.stop()
  }
}
