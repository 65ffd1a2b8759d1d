package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")

  test("watermarked tumbling window aggregates a replayed batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0))
    val q = StreamOps.tumblingCounts(in.toDF(), "1 hour", "2 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling").start()
    q.processAllAvailable()
    val rows = spark.table("tumbling")
      .select(col("window.start").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 00:00:00", "click", 2L),
      ("2024-01-01 01:00:00", "view", 1L)))
  }

  test("sliding windows land each event in every covering window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(20), 1, "click", 1.0), // windows starting 23:30..00:15
      Event(2, ts(50), 1, "click", 2.0)) // windows starting 00:00..00:45
    val q = StreamOps.slidingCounts(in.toDF(), "1 hour", "15 minutes",
      "2 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding").start()
    q.processAllAvailable()
    val rows = spark.table("sliding")
      .select(col("window.start").cast("string"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    q.stop()
    // 4 windows each; the 00:00 and 00:15 windows cover both events
    assert(rows.size == 6, rows.toString)
    assert(rows("2024-01-01 00:00:00") == 2L)
    assert(rows("2024-01-01 00:15:00") == 2L)
    assert(rows("2023-12-31 23:30:00") == 1L)
    assert(rows("2024-01-01 00:45:00") == 1L)
  }

  test("stateful sessionizer closes sessions across the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.sessionize(in.toDS(), gapSeconds = 1800,
      idleTimeout = false)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    // user 1: two events 10 min apart (one session), then one 40 min
    // later -> first session closes when the late event arrives
    in.addData(Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0))
    q.processAllAvailable()
    in.addData(Event(3, ts(55), 1, "click", 4.0))
    q.processAllAvailable()
    val closed = spark.table("sessions").as[StreamOps.SessionUpdate]
      .collect()
    q.stop()
    assert(closed.length == 1)
    assert(closed.head.n_events == 2 && closed.head.total_value == 3.0)
    assert(closed.head.session_start_us == ts(0).getTime * 1000)
  }

  test("streaming dedup drops repeated content within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = graft.streaming.StreamOps.dedupStream(docs)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    in.addData((1L, ts(0), "hello  world"), (2L, ts(1), "hello world"),
      (3L, ts(2), "fresh text"))
    q.processAllAvailable()
    in.addData((4L, ts(3), "HELLO world"), (5L, ts(4), "newer text"))
    q.processAllAvailable()
    val kept = spark.table("dedup_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    // 2 normalizes to 1's text; 4 differs only by case -> dropped
    assert(kept == Set(1L, 3L, 5L))
  }

  test("stream-stream interval join attributes clicks to impressions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, Long)] // (imp_id, ts, user)
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamOps.intervalJoin(
      imps.toDF().toDF("imp_id", "ts", "user_id"),
      clicks.toDF().toDF("click_id", "ts", "user_id"),
      key = "user_id", withinSeconds = 600)
    val q = joined.select(col("l_imp_id"), col("r_click_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("attributed").start()
    imps.addData((100L, ts(0), 1L), (101L, ts(0), 2L))
    clicks.addData(
      (200L, ts(5), 1L), // 5 min after user 1's impression -> match
      (201L, ts(30), 2L), // 30 min after -> outside the 10-min window
      (202L, ts(3), 3L)) // no impression for user 3
    q.processAllAvailable()
    val rows = spark.table("attributed").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(rows == Set((100L, 200L)))
  }

  test("stream-static enrich joins the broadcast dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust_id", "tier")
    val in = MemoryStream[Event]
    val q = graft.streaming.StreamOps.enrich(in.toDF(), dim,
      "user_id", "cust_id")
      .select("event_id", "tier")
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    in.addData(Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 9, "view", 2.0))
    q.processAllAvailable()
    val rows = spark.table("enriched").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    q.stop()
    assert(rows == Map(1L -> Some("gold"), 2L -> None))
  }
}
