package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._

/** Event-stream analytics over the `events` table (JSON props + timestamps).
  * The same projections run under Structured Streaming (`readStream` with the
  * identical schema — see graft.streaming); these batch forms are the
  * oracle-certified semantics.
  */
object Events {

  /** `events` with `ts` normalized to a micros TimestampType regardless of
    * the parquet encoding (legacy nanos-long vs timestamp[us]) — the
    * type dispatch lives in one place, [[graft.Tables.normalizeTs]]. */
  private def eventsTs(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.Tables.eventsTs(s, d)

  /** JSON extraction from a string column + grouped rollup
    * (JSON boundary handling, SURVEY.md §2.8 note). */
  val qE1Json = Q(
    "q_e1_json_extract",
    """SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |            AS BIGINT) AS sum_k,
      |       sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
      |         AS sum_value
      |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    eventsTs(s, d)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
        stableSum(col("value"), 1e6).as("sum_value"))
  }

  /** Hourly time-bucket aggregation — the batch equivalent of a streaming
    * windowed aggregate (watermark + window in graft.streaming). */
  val qE2HourlyWindow = Q(
    "q_e2_hourly_window",
    """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_bucket,
      |       event_type,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
      |         AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
    eventsTs(s, d)
      .select(
        date_trunc("hour", col("ts")).cast("string").as("hour_bucket"),
        col("event_type"),
        col("value"))
      .groupBy("hour_bucket", "event_type")
      .agg(count(lit(1)).as("cnt"), stableSum(col("value"), 1e6).as("sum_value"))
  }

  /** Per-user event ordering: previous event type + gap in seconds —
    * window functions over event time (sessionization building block). */
  val qE3UserSeq = Q(
    "q_e3_user_seq",
    """SELECT user_id, event_id, event_type,
      |       lag(event_type, 1) OVER w AS prev_type,
      |       CAST(date_diff('second',
      |              lag(ts, 1) OVER w, ts) AS BIGINT) AS gap_sec
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) {
    (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      eventsTs(s, d).select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .cast("long").as("gap_sec"))
  }

  /** Gap-based sessionization (30-minute inactivity closes a session):
    * session ids via a cumulative sum of gap-break flags, then per-session
    * rollup. The streaming twin (graft.streaming.Streams.sessionize) keeps
    * the same semantics with flatMapGroupsWithState. */
  val qE4Sessionize = Q(
    "q_e4_sessionize",
    """WITH g AS (
      |  SELECT user_id, event_id, value,
      |         CAST(date_diff('second',
      |                lag(ts) OVER w, ts) AS BIGINT) AS gap_sec,
      |         CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP))
      |              AS BIGINT) AS ts_sec
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, value, ts_sec,
      |         sum(CASE WHEN gap_sec IS NULL OR gap_sec > 1800
      |                  THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |           AS session_id
      |  FROM g)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(min(ts_sec) AS BIGINT) AS start_sec,
      |       CAST(max(ts_sec) AS BIGINT) AS end_sec,
      |       sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
      |         AS sum_value
      |FROM s GROUP BY user_id, session_id""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    eventsTs(s, d)
      .withColumn("gap_sec",
        (unix_timestamp(col("ts"))
          - unix_timestamp(lag(col("ts"), 1).over(w))).cast("long"))
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("session_id",
        sum(when(col("gap_sec").isNull || col("gap_sec") > 1800, 1)
          .otherwise(0)).over(ws).cast("long"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_sec")).as("start_sec"),
        max(col("ts_sec")).as("end_sec"),
        stableSum(col("value"), 1e6).as("sum_value"))
  }

  /** Pivot: per-user event-type value rollup as wide columns. sum-based
    * (not count): both engines yield NULL for absent (user, type) cells. */
  val qE5Pivot = Q(
    "q_e5_pivot",
    """SELECT user_id,
      |       sum(CAST(round(value * 1000000) AS BIGINT))
      |         FILTER (WHERE event_type = 'click') / 1000000.0 AS click,
      |       sum(CAST(round(value * 1000000) AS BIGINT))
      |         FILTER (WHERE event_type = 'error') / 1000000.0 AS error,
      |       sum(CAST(round(value * 1000000) AS BIGINT))
      |         FILTER (WHERE event_type = 'purchase') / 1000000.0 AS purchase,
      |       sum(CAST(round(value * 1000000) AS BIGINT))
      |         FILTER (WHERE event_type = 'signup') / 1000000.0 AS signup,
      |       sum(CAST(round(value * 1000000) AS BIGINT))
      |         FILTER (WHERE event_type = 'view') / 1000000.0 AS view
      |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
    eventsTs(s, d)
      .groupBy("user_id")
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(sum(round(col("value") * lit(1e6)).cast("long")) / lit(1e6))
  }

  /** Exact interpolated percentiles (both engines: linear interpolation).
    *
    * Scale note: `percentile` buffers every value of its group in one
    * aggregate buffer — here that is bounded per event_type, and the
    * parity goal (bit-match DuckDB's quantile_cont) requires the exact
    * form. For corpus-wide percentiles over unbounded groups use the
    * guarded exact/approx split in
    * [[graft.operators.TextAnalysis.lmBuckets]]. */
  val qE6Percentiles = Q(
    "q_e6_percentiles",
    """SELECT event_type,
      |       quantile_cont(value, 0.5) AS p50,
      |       quantile_cont(value, 0.95) AS p95,
      |       max(value) AS max_v
      |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    eventsTs(s, d)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        max(col("value")).as("max_v"))
  }

  /** As-of join: each purchase picks the value of the user's most recent
    * prior-or-simultaneous click. Times compared in epoch microseconds on
    * both sides (Spark reads the ns parquet at µs precision). The oracle
    * replicates the same union+window construction. */
  val qE7AsOf = Q(
    "q_e7_asof_join",
    """WITH u AS (
      |  SELECT user_id AS part, CAST(epoch_us(ts) AS BIGINT) AS t, 0 AS side,
      |         event_id AS tie,
      |         value AS av, NULL::BIGINT AS event_id, NULL::DOUBLE AS v
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT), 1, 0,
      |         NULL::DOUBLE, event_id, value
      |  FROM events WHERE event_type = 'purchase'),
      |f AS (
      |  SELECT part, t, side, event_id, v,
      |         last_value(CASE WHEN side = 0 THEN struct_pack(av := av)
      |                    END IGNORE NULLS) OVER (
      |           PARTITION BY part ORDER BY t, side, tie
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           .av AS asof_click_value
      |  FROM u)
      |SELECT CAST(part AS BIGINT) AS user_id, event_id, v AS value,
      |       t AS ts_us, asof_click_value
      |FROM f WHERE side = 1""".stripMargin) { (s, d) =>
    val ev = eventsTs(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("click_value"))
    graft.operators.AsOfJoin.asOf(
      purchases, clicks, "user_id", "ts_us", "ts_us", Seq("click_value"),
      rightTieCol = Some("event_id"))
  }

  /** Range join: events falling inside each user's first-6-hours interval,
    * executed as a bucketized equi-join (exactly equal to the naive
    * inequality join the oracle runs). */
  val qE8RangeJoin = Q(
    "q_e8_range_join",
    """WITH iv AS (
      |  SELECT user_id,
      |         CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
      |         CAST(min(epoch_us(ts)) + 21600000000 AS BIGINT) AS end_us
      |  FROM events GROUP BY user_id)
      |SELECT e.user_id, iv.start_us,
      |       CAST(count(*) AS BIGINT) AS n_in_window,
      |       sum(CAST(round(e.value * 1000000) AS BIGINT)) / 1000000.0
      |         AS sum_value
      |FROM events e JOIN iv
      |  ON e.user_id = iv.user_id
      | AND CAST(epoch_us(e.ts) AS BIGINT) >= iv.start_us
      | AND CAST(epoch_us(e.ts) AS BIGINT) <= iv.end_us
      |GROUP BY e.user_id, iv.start_us""".stripMargin) { (s, d) =>
    val ev = eventsTs(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val intervals = ev.groupBy("user_id")
      .agg(min(col("ts_us")).as("start_us"))
      .withColumn("end_us", col("start_us") + lit(21600000000L))
    graft.operators.RangeJoin
      .pointInInterval(
        ev.select(col("user_id"), col("ts_us"), col("value")),
        intervals, "user_id", "ts_us", "start_us", "end_us",
        binSize = 3600000000L)
      .groupBy(col("user_id"), col("start_us"))
      .agg(count(lit(1)).as("n_in_window"),
        stableSum(col("value"), 1e6).as("sum_value"))
  }

  /** Cohort retention: users grouped by first-seen day, activity counted
    * at each day offset, retention as the exact-integer ratio against
    * cohort size — the classic product-analytics matrix.
    *
    * Scale shape: first-seen is a (user)-keyed hash agg (map-side
    * partials, users-sized output); activity is a distinct over
    * (user, day) — the same agg shuffle key — joined to cohorts on
    * user_id; the final matrix is cohorts×offsets-sized. No window
    * functions, no driver-side data; at 100 TB every exchange carries
    * user-day pairs (16 B), never events. */
  val qE9Retention = Q(
    "q_e9_retention",
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      |           FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |j AS (SELECT a.user_id, f.cohort,
      |             date_diff('day', f.cohort, a.day) AS day_offset
      |      FROM a JOIN f ON a.user_id = f.user_id),
      |c AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
      |      FROM f GROUP BY 1),
      |r AS (SELECT cohort, CAST(day_offset AS BIGINT) AS day_offset,
      |             CAST(count(*) AS BIGINT) AS active_users
      |      FROM j GROUP BY 1, 2)
      |SELECT r.cohort, r.day_offset, r.active_users, c.cohort_users,
      |       CAST(r.active_users AS DOUBLE) / c.cohort_users AS retention
      |FROM r JOIN c ON r.cohort = c.cohort""".stripMargin) { (s, d) =>
    val ev = eventsTs(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
    val first = ev.groupBy("user_id").agg(min(col("day")).as("cohort"))
    val active = ev.distinct()
    val matrix = active.join(first, "user_id")
      .select(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .groupBy("cohort", "day_offset")
      .agg(count(lit(1)).as("active_users"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
    matrix.join(sizes, "cohort")
      .select(col("cohort"), col("day_offset"), col("active_users"),
        col("cohort_users"),
        (col("active_users").cast("double") / col("cohort_users"))
          .as("retention"))
  }

  /** First-touch funnel: users who viewed, then clicked after their
    * first view, then purchased after that first qualifying click — the
    * ordered-sequence conversion count of product analytics.
    * Deterministic (min timestamps at every stage; raw nanos compare
    * identically to DuckDB's timestamp order).
    *
    * Scale shape: three user-keyed hash aggs and two joins whose both
    * sides are user-sized or filtered event slices; stage counts are
    * 1-row aggregates unioned — no windows, no driver data. */
  val qE10Funnel = Q(
    "q_e10_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t1
      |      FROM events e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t2
      |      FROM events e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY 1)
      |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
      |UNION ALL
      |SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
      |UNION ALL
      |SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p""".stripMargin) {
    (s, d) =>
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t0"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t0"))
        .groupBy("user_id").agg(min("ts").as("t1"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      def stage(df: org.apache.spark.sql.DataFrame, name: String) =
        df.agg(count(lit(1)).as("n"))
          .select(lit(name).as("stage"), col("n").cast("long").as("n_users"))
      stage(v, "1_view")
        .unionByName(stage(c, "2_click"))
        .unionByName(stage(p, "3_purchase"))
  }

  /** As-of join with a TOLERANCE bound (pandas merge_asof semantics):
    * each purchase picks its most recent prior-or-simultaneous click,
    * but only when the click is at most 30 minutes old — staler matches
    * yield null. The oracle replays the identical union+window
    * construction and carries the matched click's own time for the
    * tolerance CASE, exactly as the operator does. */
  val qE11AsOfTolerance = Q(
    "q_e11_asof_tolerance",
    """WITH u AS (
      |  SELECT user_id AS part, CAST(epoch_us(ts) AS BIGINT) AS t, 0 AS side,
      |         event_id AS tie,
      |         value AS av, NULL::BIGINT AS event_id, NULL::DOUBLE AS v
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT), 1, 0,
      |         NULL::DOUBLE, event_id, value
      |  FROM events WHERE event_type = 'purchase'),
      |f AS (
      |  SELECT part, t, side, event_id, v,
      |         last_value(CASE WHEN side = 0
      |                    THEN struct_pack(rt := t, av := av) END
      |                    IGNORE NULLS) OVER (
      |           PARTITION BY part ORDER BY t, side, tie
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS m
      |  FROM u)
      |SELECT CAST(part AS BIGINT) AS user_id, event_id, v AS value,
      |       t AS ts_us,
      |       CASE WHEN m.rt IS NOT NULL AND t - m.rt <= 1800000000
      |            THEN m.av END AS asof_click_value
      |FROM f WHERE side = 1""".stripMargin) { (s, d) =>
    val ev = eventsTs(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("click_value"))
    graft.operators.AsOfJoin.asOf(
      purchases, clicks, "user_id", "ts_us", "ts_us", Seq("click_value"),
      rightTieCol = Some("event_id"), tolerance = Some(1800000000L))
  }

  /** FORWARD as-of join: each purchase picks the value of the user's
    * FIRST following-or-simultaneous click (the other merge_asof
    * direction — attribution windows that look ahead). Same union, the
    * window ordered over descending time; the oracle mirrors it. */
  val qE12AsOfForward = Q(
    "q_e12_asof_forward",
    """WITH u AS (
      |  SELECT user_id AS part, CAST(epoch_us(ts) AS BIGINT) AS t, 0 AS side,
      |         event_id AS tie,
      |         value AS av, NULL::BIGINT AS event_id, NULL::DOUBLE AS v
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT), 1, 0,
      |         NULL::DOUBLE, event_id, value
      |  FROM events WHERE event_type = 'purchase'),
      |f AS (
      |  SELECT part, t, side, event_id, v,
      |         last_value(CASE WHEN side = 0 THEN struct_pack(av := av)
      |                    END IGNORE NULLS) OVER (
      |           PARTITION BY part ORDER BY t DESC, side, tie
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           .av AS asof_click_value
      |  FROM u)
      |SELECT CAST(part AS BIGINT) AS user_id, event_id, v AS value,
      |       t AS ts_us, asof_click_value
      |FROM f WHERE side = 1""".stripMargin) { (s, d) =>
    val ev = eventsTs(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"), col("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("click_value"))
    graft.operators.AsOfJoin.asOf(
      purchases, clicks, "user_id", "ts_us", "ts_us", Seq("click_value"),
      rightTieCol = Some("event_id"), forward = true)
  }

  val all: Seq[Q] =
    Seq(qE1Json, qE2HourlyWindow, qE3UserSeq, qE4Sessionize, qE5Pivot,
      qE6Percentiles, qE7AsOf, qE8RangeJoin, qE9Retention, qE10Funnel,
      qE11AsOfTolerance, qE12AsOfForward)
}
