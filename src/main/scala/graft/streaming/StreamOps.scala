package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch event operators
  * ([[graft.queries.EventQueries]]) — the streaming extension SURVEY.md
  * §2.9 sequences after reference parity (the reference only *detects*
  * stream syntax to route it away; we execute it).
  *
  * All transforms take/return streaming DataFrames so callers wire any
  * source (`readStream.parquet/kafka/...`) and sink; tests drive them
  * with a MemoryStream and a memory sink. Watermarks bound state: the
  * windowed aggregation drops state for windows older than the
  * watermark, and the sessionizer times out per-key state — both
  * requirements for unbounded runs on a real cluster.
  */
object StreamOps {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionUpdate(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, total_value: Double)

  final case class SessionState(startUs: Long, endUs: Long, n: Long,
      total: Double)

  /** Watermarked tumbling-window counts/sums per event type. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Watermarked sliding-window counts/sums per event type — each event
    * lands in `window_/slide` overlapping windows (4 at the 1h/15min
    * default). The expansion happens map-side in the window generator;
    * state per key is bounded by the watermark exactly as in
    * [[tumblingCounts]], just `window_/slide`× wider. Batch twin:
    * `e_sliding_count` in [[graft.queries.EventQueries]]. */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
      slide: String = "15 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Gap-based streaming sessionization via per-user state: a session
    * closes after `gapSeconds` idle (event-time on the arriving batch)
    * or — when `idleTimeout` is set — on processing-time timeout,
    * emitting one [[SessionUpdate]] per closed session.
    *
    * `idleTimeout=false` disables the wall-clock timer (sessions then
    * only close when a later event arrives): use it in replay/test
    * harnesses, where a pending timer makes the micro-batch engine spin
    * empty batches until the timer fires. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
      idleTimeout: Boolean = true): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._

    def update(userId: Long, evs: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionUpdate] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionUpdate(userId, s.startUs, s.endUs, s.n, s.total))
      }
      val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var closed = List.empty[SessionUpdate]
      var cur = state.getOption
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000
        cur match {
          case Some(s) =>
            if (us - s.endUs > gapSeconds * 1000000) {
              closed ::= SessionUpdate(userId, s.startUs, s.endUs, s.n, s.total)
              cur = Some(SessionState(us, us, 1L, e.value))
            } else cur = Some(SessionState(s.startUs, math.max(s.endUs, us),
              s.n + 1, s.total + e.value))
          case None => cur = Some(SessionState(us, us, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        if (idleTimeout) state.setTimeoutDuration(gapSeconds * 1000)
      }
      closed.reverseIterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(update)
  }

  final case class AnomalyAlert(event_id: Long, user_id: Long,
      value: Double, z: Double)

  /** Ring of the user's trailing values as DECIMAL(18,2) unscaled
    * cents — the integer form of the batch twin's decimal casts, so the
    * streamed moments are bit-identical to the batch window sums. */
  final case class RingState(cents: Seq[Long])

  /** Streaming twin of the `e_anomaly` batch query: per-user trailing
    * z-scores via [[org.apache.spark.sql.KeyValueGroupedDataset
    * .flatMapGroupsWithState]]. Each event is scored against the user's
    * PREVIOUS `trailing` values (self-excluded, exactly the batch
    * twin's `rowsBetween(-trailing, -1)` frame), then enters the ring.
    * Arithmetic parity with the batch/oracle pipeline is exact: values
    * quantize to DECIMAL(18,2) cents via the same Double.toString
    * HALF_UP path Spark's decimal cast uses, moments are integer sums
    * of cents (scale-2) and squared cents (scale-4) converted to
    * double exactly like `CAST(sum AS DOUBLE)`, σ clamps variance
    * before the IEEE sqrt — so a replayed stream emits bit-identical
    * z-scores to the batch query.
    *
    * State is a bounded ring (`trailing` longs per user — no timeout
    * needed; total state ∝ distinct users, the same bound as any
    * user-keyed stateful op). Event-time order is assumed per user
    * within and across batches (the replay/ingest contract shared by
    * [[sessionize]]); each micro-batch sorts its own slice by
    * (ts, event_id). */
  def anomalies(events: Dataset[Event], trailing: Int = 10,
      zThreshold: Double = 2.5): Dataset[AnomalyAlert] = {
    import events.sparkSession.implicits._

    def toCents(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()

    def update(userId: Long, evs: Iterator[Event],
        state: GroupState[RingState]): Iterator[AnomalyAlert] = {
      var ring = state.getOption.map(_.cents.toVector)
        .getOrElse(Vector.empty[Long])
      val out = List.newBuilder[AnomalyAlert]
      evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        if (ring.length == trailing) {
          val n = trailing.toDouble
          val mu = new java.math.BigDecimal(
            java.math.BigInteger.valueOf(ring.sum), 2).doubleValue() / n
          val m2 = new java.math.BigDecimal(
            java.math.BigInteger.valueOf(ring.map(c => c * c).sum), 4)
            .doubleValue() / n
          val sigma = math.sqrt(math.max(m2 - mu * mu, 0.0))
          if (sigma > 0) {
            val z = (e.value - mu) / sigma
            if (math.abs(z) > zThreshold)
              out += AnomalyAlert(e.event_id, userId, e.value, z)
          }
        }
        ring = (if (ring.length == trailing) ring.tail else ring) :+
          toCents(e.value)
      }
      state.update(RingState(ring))
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  final case class Transition(user_id: Long, from_type: String,
      to_type: String)
  final case class LastEvent(event_type: String)

  /** Streaming twin of the `e_transitions` batch query's pairing
    * stage: per-user (from, to) event-type transitions via
    * [[org.apache.spark.sql.KeyValueGroupedDataset
    * .flatMapGroupsWithState]]. State is ONE string per user (the last
    * event type) — the minimum any transition tracker needs, bounded
    * by distinct users like every user-keyed stateful op here.
    * Event-time order per user within and across batches is the same
    * replay/ingest contract as [[sessionize]]/[[anomalies]]; each
    * micro-batch sorts its slice by (ts, event_id). Downstream the
    * transition stream aggregates to the same (from, to) counts as
    * the batch lag-window pairing — exactly (replay-parity asserted
    * in StreamingSpec). */
  def transitions(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._

    def update(userId: Long, evs: Iterator[Event],
        state: GroupState[LastEvent]): Iterator[Transition] = {
      var last = state.getOption.map(_.event_type)
      val out = List.newBuilder[Transition]
      evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        last.foreach(f => out += Transition(userId, f, e.event_type))
        last = Some(e.event_type)
      }
      last.foreach(l => state.update(LastEvent(l)))
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming ingest dedup — the streaming twin of [[graft.ops.Dedup
    * .exact]]: drop documents whose normalized-content hash was already
    * seen within the watermark horizon. State is bounded: Spark evicts
    * seen-hash state older than the watermark, which is the standard
    * trade for unbounded streams (exact global dedup of an infinite
    * stream needs unbounded memory; the batch operator covers the
    * at-rest pass). */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__th",
        md5(regexp_replace(lower(col(textCol)), "\\s+", " ")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__th")
      .drop("__th")

  /** Stream-static enrichment join: the static dimension is read per
    * micro-batch and broadcast — the standard pattern for joining a
    * stream against (small) reference data without shuffling the
    * stream. Sides are aliased so the same key name on both (the common
    * enrichment shape) does not trip an ambiguous-reference error. */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String): DataFrame =
    events.alias("__s").join(broadcast(dim.alias("__d")),
      col(s"__s.$eventKey") === col(s"__d.$dimKey"), "left")

  /** Stream-stream interval join — the attribution shape (e.g. click
    * joins its impression within a time window): right-side rows match
    * left-side rows with the same key whose timestamp falls in
    * `[leftTs, leftTs + withinSeconds]`. BOTH sides carry watermarks and
    * the join condition carries the time range, which is exactly what
    * Spark needs to bound both state stores — without the range, state
    * grows forever. Output columns are prefixed `l_`/`r_` (stream-stream
    * joins forbid post-join disambiguation tricks that reshuffle). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String = "ts", watermark: String = "1 hour",
      withinSeconds: Long = 600): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) =>
      d.withColumnRenamed(c, s"l_$c")).withWatermark(s"l_$tsCol", watermark)
    val r = right.columns.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"r_$c")).withWatermark(s"r_$tsCol", watermark)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") +
          expr(s"INTERVAL $withinSeconds SECONDS"))
  }
}
