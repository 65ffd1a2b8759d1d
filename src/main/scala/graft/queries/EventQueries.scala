package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Event-stream batch analytics over the `events` table — the
  * sessionization / windowed-aggregation patterns SURVEY.md §2.9 notes
  * as the natural batch extension (the reference itself has no
  * streaming). The streaming twins live in
  * [[graft.streaming.StreamOps]]; these batch forms are the
  * oracle-checkable semantics.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // gap-based sessionization: a session breaks after 30 idle minutes
    "e_sessionize" -> ((s, dir) => {
      // event_id tie-break: lag/running-sum assignment must be
      // deterministic across engines even with duplicate timestamps
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val evs = Tables.load(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
              1800L * 1000000,
            1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_session")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      evs.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("session_value"))
    }),

    // tumbling hourly windows per event type
    "e_tumbling_hour" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("total_value"))),

    // native session windows: Catalyst's SessionWindow operator (merge
    // events whose ts falls before the running session end = last ts +
    // gap; a gap of EXACTLY 30 min starts a new session — the >= break
    // the oracle mirrors). The stateful streaming twin is
    // StreamOps.sessionize; this exercises the built-in batch operator.
    "e_session_window" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("session_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"),
          col("session_value"))),

    // sliding windows: 1-hour windows advancing every 15 minutes (each
    // event lands in 4 overlapping windows) — the batch twin of
    // Structured Streaming's window(ts, "1 hour", "15 minutes"). The
    // 4× row expansion happens map-side in the window generator; the
    // aggregation combines partially before the one exchange on the
    // (window, event_type) key.
    "e_sliding_count" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("total_value"))
        .select(col("w.start").as("window_start"),
          col("w.end").as("window_end"), col("event_type"), col("n"),
          col("total_value"))),

    // trailing-window anomaly detection: each event's value against the
    // mean/σ of the user's previous 10 events (a bounded trailing ROWS
    // frame EXCLUDING the current row — the self-exclusion every
    // online anomaly check needs). Moments through DECIMAL window sums
    // (exact), σ via IEEE-exact sqrt, so z-scores hash-match.
    "e_anomaly" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-10, -1)
      val dv = col("value").cast(DecimalType(18, 2))
      Tables.load(s, dir, "events")
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("mu", sum(dv).over(w).cast(DoubleType) / col("n"))
        .withColumn("m2", sum(dv * dv).over(w).cast(DoubleType) / col("n"))
        .filter(col("n") >= 10)
        // m2 - mu² can double-round to a tiny negative when the trailing
        // values are identical; clamp BEFORE sqrt (DuckDB aborts on
        // sqrt(negative), Spark returns NaN which passes > comparisons)
        .withColumn("sigma",
          sqrt(greatest(col("m2") - col("mu") * col("mu"), lit(0.0))))
        .filter(col("sigma") > 0)
        .withColumn("z", (col("value") - col("mu")) / col("sigma"))
        .filter(abs(col("z")) > 2.5)
        .select(col("event_id"), col("user_id"), col("value"), col("z"))
    }),

    // rolling active users: per day, DAU + trailing-7-day WAU +
    // stickiness (dau/wau, one exact IEEE division). Windowed DISTINCT
    // without a giant re-dedup: dedup to (epoch-day, user) once as
    // NARROW int+long rows — the only corpus-sized shuffle, with a
    // SINGLE downstream consumer so its final aggregate runs once
    // (the round-11 shape fanned du out to dau AND perUser: the reused
    // exchange was shared but the final distinct pass over ~1 B
    // shuffled pairs ran TWICE — most of the measured 64 GB sf1000
    // spill). For WAU merge each user's 7-day coverage intervals over
    // their SORTED distinct-day array — a user's day list is
    // CALENDAR-bounded (≤ the corpus date span, ~tens of entries), so
    // the per-group buffer is tiny and every covered (user, window-day)
    // is emitted EXACTLY ONCE. DAU markers ride the SAME explode
    // (tagged structs), so one final day-keyed partial-count aggregate
    // produces both counts: three single-consumer shuffles total.
    "e_active_users" -> ((s, dir) => {
      // epoch-day ints: exact integer interval arithmetic. The
      // collect_set is duplicate-insensitive, so Catalyst removes any
      // explicit pre-distinct — the 1 B-row corpus reduces MAP-SIDE to
      // one (user, day-set) row per user and the only corpus-wide
      // exchange carries ~users rows (measured sf1000: 497 MB shuffle
      // for 1 B events; the partial set agg absorbs the volume at
      // ~42 GB object spill on one JVM — distributes on a cluster).
      val epoch = to_date(lit("1970-01-01"))
      val perUser = Tables.load(s, dir, "events")
        .select(datediff(col("ts"), epoch).as("dayint"), col("user_id"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_set(col("dayint"))).as("ds"))
      // user active on day d covers window-days [d, d+6]; for sorted
      // distinct days the FRESH coverage of ds[i] is
      // [max(ds[i], ds[i-1]+7), ds[i]+6] — non-empty (ds strictly
      // increasing ⇒ ds[i-1]+7 ≤ ds[i]+6), disjoint, union-complete.
      // DAU markers ride the SAME explode, tag-encoded in the low bit
      // (actual day d → odd 2d+1; covered day cd → even 2cd, via a
      // STEP-2 sequence — plain codegen arithmetic, no per-covered-day
      // lambda: a struct-emitting variant of this stage measured
      // 3 127 CPU-s at sf1000 and a boundary-delta HOF variant 5 400
      // CPU-s ×2 consumers; the flat-int encoding is the measured
      // winner). One final day-keyed partial-count aggregate then
      // produces both counts: a single single-consumer chain.
      val emitted = perUser.select(explode(concat(
        transform(col("ds"), d => d * 2 + 1),
        flatten(zip_with(col("ds"), sequence(lit(1), size(col("ds"))),
          (d, i) => sequence(
            when(i === 1, d * 2).otherwise(
              greatest(d * 2, (element_at(col("ds"), i - 1) + 7) * 2)),
            d * 2 + 12, lit(2)))))).as("x"))
      emitted.groupBy(shiftright(col("x"), 1).as("dayint"))
        .agg(sum(col("x").bitwiseAND(1)).as("dau"),
          count(lit(1)).as("n"))
        // coverage tails past the last actual day have wau>0, dau=0 —
        // the original shape's inner join dropped them; keep that
        // contract
        .filter(col("dau") > 0)
        .select(date_add(epoch, col("dayint")).cast("timestamp").as("day"),
          col("dau"), (col("n") - col("dau")).as("wau"),
          (col("dau").cast(DoubleType) /
            (col("n") - col("dau"))).as("stickiness"))
    }),

    // weekly retention cohorts: users grouped by first-activity week,
    // distinct actives counted at each week offset — the classic
    // retention matrix. Two shuffles (per-user first week, cohort
    // grouping), offsets exact (both engines truncate weeks to Monday
    // so the day difference is an exact multiple of 7).
    "e_retention" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      val firstWeek = e.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val active = e.select(col("user_id"),
        date_trunc("week", col("ts")).as("week")).distinct()
      active.join(firstWeek, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7)
            .cast(IntegerType).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
    }),

    // funnel: users whose first signup precedes a later purchase
    "e_funnel" -> ((s, dir) => {
      val evs = Tables.load(s, dir, "events")
      val signups = evs.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
      val purchases = evs.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(max(col("ts")).as("last_purchase_ts"),
          count(lit(1)).as("n_purchases"))
      signups.join(purchases, Seq("user_id"))
        .filter(col("last_purchase_ts") > col("signup_ts"))
    }),

    // RANGE join: same-user event pairs within 60 seconds, via
    // tolerance-width time buckets (graft.ops.RangeJoin) — an equi-join
    // shuffle instead of the nested-loop a raw interval predicate costs
    "e_range_join" -> ((s, dir) => {
      val evs = Tables.load(s, dir, "events")
      val a = evs.select(col("user_id"), col("event_id").as("id_a"),
        col("ts").as("ts_a"))
      val b = evs.select(col("user_id"), col("event_id").as("id_b"),
        col("ts").as("ts_b"))
      graft.ops.RangeJoin.within(a, b, Seq("user_id"), "ts_a", "ts_b", 60)
        .filter(col("id_a") < col("id_b"))
        .select(col("user_id"), col("id_a"), col("id_b"),
          (unix_micros(col("ts_b")) - unix_micros(col("ts_a"))).as("dt_us"))
    }),

    // Time-bounded slice of the same range join: the first two days of
    // the event stream. Semantically a partition-pruned run of
    // e_range_join — the shape a production backfill actually executes
    // (range joins over a month of events run day-at-a-time) — and the
    // fifth-decade evidence path for the family where the FULL month's
    // shuffle exceeds a single box's disk (SCALING.md r16).
    "e_range_join_slice" -> ((s, dir) => {
      val evs = Tables.load(s, dir, "events")
        .filter(col("ts") < lit("2024-01-03").cast("timestamp"))
      val a = evs.select(col("user_id"), col("event_id").as("id_a"),
        col("ts").as("ts_a"))
      val b = evs.select(col("user_id"), col("event_id").as("id_b"),
        col("ts").as("ts_b"))
      graft.ops.RangeJoin.within(a, b, Seq("user_id"), "ts_a", "ts_b", 60)
        .filter(col("id_a") < col("id_b"))
        .select(col("user_id"), col("id_a"), col("id_b"),
          (unix_micros(col("ts_b")) - unix_micros(col("ts_a"))).as("dt_us"))
    }),

    // AS-OF join: for each purchase, the user's most recent click at or
    // before it — composed from a window with IGNORE NULLS (the
    // Spark-native expression of ASOF; no custom physical operator
    // needed, one shuffle on user_id). Oracle uses DuckDB's native
    // ASOF JOIN, so the two formulations check each other.
    "e_asof_join" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("last_click_id",
          last(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" &&
          col("last_click_id").isNotNull)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("last_click_id"),
          col("last_click_ts"))
    }),

    // JSON props extraction + top event per user by value (dedup window)
    // winsorization: clip every value to its event type's exact
    // [p01, p99] band — outlier taming before aggregation. The bounds
    // come from the q_quantiles_exact shape (distinct-(type, value)
    // counts + cumulative pick, domain-bounded) and broadcast back;
    // the clip itself is least/greatest, IEEE-exact
    "e_winsorize" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
      val agg = e.groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("c"))
      val byType = Window.partitionBy(col("event_type"))
      val v = agg
        .withColumn("cum", sum(col("c")).over(
          byType.orderBy(col("value"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(byType))
      def pos(k: Int) = Exact.pctPos(k)
      val bounds = v.groupBy(col("event_type"))
        .agg(min(when(col("cum") >= pos(1), col("value"))).as("p01"),
          min(when(col("cum") >= pos(99), col("value"))).as("p99"))
      e.join(broadcast(bounds), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          least(greatest(col("value"), col("p01")), col("p99"))
            .as("value_clipped"))
    }),

    // sequence mining: the top-20 most common 3-step event paths —
    // two lead() reads on the same user-keyed window (one exchange),
    // then a path hash-aggregate and TakeOrderedAndProject top-k
    "e_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .withColumn("step2", lead(col("event_type"), 1).over(w))
        .withColumn("step3", lead(col("event_type"), 2).over(w))
        .filter(col("step2").isNotNull && col("step3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("step2"),
          col("step3"))
        .agg(count(lit(1)).as("n_paths"))
        .orderBy(col("n_paths").desc, col("step1"), col("step2"),
          col("step3"))
        .limit(20)
    }),

    // Markov transition matrix over per-user event sequences: counts
    // and exact-division probabilities for each (from, to) event-type
    // bigram — the path-analysis staple. One user-keyed window (lag)
    // + one (from, to) hash-aggregate; probabilities are integer
    // ratios, engine-exact
    "e_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.load(s, dir, "events")
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n_transitions"))
      val fromTotals = pairs.groupBy(col("from_type"))
        .agg(sum(col("n_transitions")).as("from_total"))
      pairs.join(fromTotals, Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n_transitions"),
          (col("n_transitions").cast(DoubleType) /
            col("from_total").cast(DoubleType)).as("p_transition"))
    }),

    // fixed-width value histogram per event type: floor-binning is
    // exact IEEE division + floor (engine-deterministic), one
    // hash-aggregate keyed by (type, bin) — the metric-distribution
    // profile at any scale
    "e_histogram" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          floor(col("value") / lit(25.0)).as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("event_type"), col("bin"),
          (col("bin").cast(DoubleType) * lit(25.0)).as("bin_lo"),
          ((col("bin") + 1).cast(DoubleType) * lit(25.0)).as("bin_hi"),
          col("n_events"))),

    "e_top_event" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.load(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k")
          .cast(IntegerType))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("k"))
    })
  )

  val oracle: Map[String, String] = Map(
    "e_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |se AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM se GROUP BY user_id, session_id""".stripMargin,

    "e_tumbling_hour" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "e_session_window" ->
      """WITH o AS (SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |m AS (SELECT user_id, event_id, ts, value,
        |  CASE WHEN prev_ts IS NULL OR
        |    epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
        |    THEN 1 ELSE 0 END AS brk FROM o),
        |s AS (SELECT user_id, ts, value,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m)
        |SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start,
        |  CAST(MAX(ts) + INTERVAL '30 minutes' AS TIMESTAMP)
        |    AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS session_value
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // every event belongs to the 4 15-min-aligned windows covering it;
    // DuckDB time_bucket's origin (2000-01-01) and Spark's (epoch) are
    // a whole number of days apart, so 15-minute boundaries coincide
    "e_sliding_count" ->
      """WITH w AS (SELECT event_type, value,
        |  time_bucket(INTERVAL '15 minutes', ts)
        |    - (i * INTERVAL '15 minutes') AS window_start
        |  FROM events, unnest(generate_series(0, 3)) g(i))
        |SELECT CAST(window_start AS TIMESTAMP) AS window_start,
        |  CAST(window_start + INTERVAL '1 hour' AS TIMESTAMP) AS window_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM w GROUP BY 1, 2, 3""".stripMargin,

    "e_anomaly" ->
      """WITH w AS (SELECT event_id, user_id, value,
        |    COUNT(*) OVER win AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) OVER win AS s1,
        |    SUM(CAST(value AS DECIMAL(18,2)) *
        |        CAST(value AS DECIMAL(18,2))) OVER win AS s2
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT event_id, user_id, value, n,
        |    CAST(s1 AS DOUBLE) / n AS mu, CAST(s2 AS DOUBLE) / n AS m2
        |  FROM w WHERE n >= 10),
        |sg AS (SELECT event_id, user_id, value, mu,
        |    sqrt(greatest(m2 - mu * mu, CAST(0.0 AS DOUBLE))) AS sigma
        |  FROM m),
        |z AS (SELECT event_id, user_id, value,
        |    (value - mu) / sigma AS z FROM sg WHERE sigma > 0)
        |SELECT event_id, user_id, value, z FROM z
        |WHERE abs(z) > CAST(2.5 AS DOUBLE)""".stripMargin,

    "e_active_users" ->
      """WITH du AS (SELECT DISTINCT
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
        |  FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau
        |  FROM du GROUP BY day),
        |contrib AS (SELECT CAST(w AS TIMESTAMP) AS day, user_id
        |  FROM du, unnest(generate_series(day,
        |    day + INTERVAL '6' DAY, INTERVAL '1' DAY)) g(w)),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau
        |  FROM contrib GROUP BY day)
        |SELECT d.day, d.dau, w.wau,
        |  CAST(d.dau AS DOUBLE) / w.wau AS stickiness
        |FROM dau d JOIN wau w USING (day)""".stripMargin,

    "e_retention" ->
      """WITH fw AS (SELECT user_id,
        |    CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        |  FROM events)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) / 7 AS INT)
        |    AS week_offset,
        |  COUNT(DISTINCT user_id) AS active_users
        |FROM a JOIN fw USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "e_funnel" ->
      """WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (SELECT user_id, MAX(ts) AS last_purchase_ts,
        |  COUNT(*) AS n_purchases FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT s.user_id, signup_ts, last_purchase_ts, n_purchases
        |FROM s JOIN p ON s.user_id = p.user_id
        |WHERE last_purchase_ts > signup_ts""".stripMargin,

    "e_range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000""".stripMargin,

    "e_range_join_slice" ->
      """WITH ev AS (SELECT * FROM events
        |  WHERE ts < TIMESTAMP '2024-01-03')
        |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
        |FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000""".stripMargin,

    "e_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  p.ts AS purchase_ts, c.event_id AS last_click_id,
        |  c.ts AS last_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    "e_winsorize" ->
      """WITH agg AS (
        |  SELECT event_type, value, count(*) AS c
        |  FROM events GROUP BY event_type, value),
        |v AS (
        |  SELECT event_type, value, c,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM agg),
        |bounds AS (
        |  SELECT event_type,
        |    min(CASE WHEN cum >= (1 * n + 99) // 100
        |      THEN value END) AS p01,
        |    min(CASE WHEN cum >= (99 * n + 99) // 100
        |      THEN value END) AS p99
        |  FROM v GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  least(greatest(e.value, b.p01), b.p99) AS value_clipped
        |FROM events e JOIN bounds b ON e.event_type = b.event_type"""
        .stripMargin,

    "e_paths" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS step1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS step2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS step3
        |  FROM events)
        |SELECT step1, step2, step3, count(*) AS n_paths
        |FROM seq WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY step1, step2, step3
        |ORDER BY n_paths DESC, step1, step2, step3 LIMIT 20"""
        .stripMargin,

    "e_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |pairs AS (
        |  SELECT from_type, event_type AS to_type,
        |    count(*) AS n_transitions
        |  FROM seq WHERE from_type IS NOT NULL
        |  GROUP BY from_type, event_type),
        |totals AS (
        |  SELECT from_type, CAST(sum(n_transitions) AS BIGINT)
        |    AS from_total
        |  FROM pairs GROUP BY from_type)
        |SELECT p.from_type, p.to_type, p.n_transitions,
        |  CAST(p.n_transitions AS DOUBLE) / CAST(t.from_total AS DOUBLE)
        |    AS p_transition
        |FROM pairs p JOIN totals t ON p.from_type = t.from_type"""
        .stripMargin,

    "e_histogram" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(floor(value / CAST(25.0 AS DOUBLE)) AS BIGINT) AS bin
        |  FROM events)
        |SELECT event_type, bin,
        |  CAST(bin AS DOUBLE) * CAST(25.0 AS DOUBLE) AS bin_lo,
        |  CAST(bin + 1 AS DOUBLE) * CAST(25.0 AS DOUBLE) AS bin_hi,
        |  count(*) AS n_events
        |FROM b GROUP BY event_type, bin""".stripMargin,

    // thin-row formulation of per-user argmax (the engine's discipline,
    // round-11 embed-LSH precedent): the naive ROW_NUMBER() OVER user
    // spec sorts all events WITH the wide props payload — at 1 B events
    // DuckDB's window spill exceeded the sandbox disk. Equivalent by
    // construction (value is non-null throughout the generated data):
    // rn=1 under ORDER BY value DESC, event_id = max value per user,
    // then min event_id among ties; the payload joins back by the
    // winning (user_id, event_id)
    "e_top_event" ->
      """WITH t AS (SELECT user_id, event_id, value FROM events),
        |mx AS (SELECT user_id, max(value) AS mv FROM t GROUP BY user_id),
        |win AS (SELECT t.user_id, min(t.event_id) AS event_id
        |  FROM t JOIN mx ON t.user_id = mx.user_id AND t.value = mx.mv
        |  GROUP BY t.user_id)
        |SELECT e.user_id, e.event_id, e.event_type, e.value,
        |  CAST(json_extract_string(e.props, '$.k') AS INT) AS k
        |FROM events e JOIN win USING (user_id, event_id)""".stripMargin
  )
}
