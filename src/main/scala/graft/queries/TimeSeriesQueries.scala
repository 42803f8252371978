package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.sources.Tables

/** Windowed / analytic operator inventory (SURVEY §2.4, §2.5, §2.9)
  * over the `events` stream table. `event_type` plays the keyword role,
  * `user_id` the source role of the reference's alert logic.
  */
object TimeSeriesQueries {
  import QueryDef.sql

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  // A3 base: hour-bucket counts (advanced_trend_analyzer.py:77).
  val q14 = sql(
    "q14_hourly_counts",
    """SELECT strftime(ts, '%Y%m%d%H') AS bucket, event_type AS key, count(*) AS cnt
      |FROM events GROUP BY 1, 2 ORDER BY bucket, key""".stripMargin) { (s, d) =>
    TimeSeries.bucketCounts(ev(s, d), col("ts"), col("event_type"), "yyyyMMddHH")
      .orderBy(col("bucket"), col("key"))
  }

  // A4/O4: per-minute timeline for one key (advanced_trend_analyzer.py:87,314-329).
  val q15 = sql(
    "q15_minute_timeline",
    """SELECT strftime(ts, '%Y%m%d%H%M') AS bucket, count(*) AS cnt
      |FROM events WHERE event_type = 'error' GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
    ev(s, d).filter(col("event_type") === "error")
      .groupBy(date_format(col("ts"), "yyyyMMddHHmm").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("bucket"))
  }

  // W4 velocity with new-key boost (advanced_trend_analyzer.py:148-169).
  val q16 = sql(
    "q16_velocity",
    """WITH h AS (SELECT strftime(ts, '%Y%m%d%H') AS bucket, event_type AS key, count(*) AS cnt
      |           FROM events GROUP BY 1, 2)
      |SELECT bucket, key, cnt,
      |  CASE WHEN lag(cnt, 1, 0) OVER (PARTITION BY key ORDER BY bucket) = 0
      |       THEN cnt * 2.0
      |       ELSE (cnt - lag(cnt, 1, 0) OVER (PARTITION BY key ORDER BY bucket)) * 1.0
      |  END AS velocity
      |FROM h ORDER BY bucket, key""".stripMargin) { (s, d) =>
    TimeSeries.velocity(
      TimeSeries.bucketCounts(ev(s, d), col("ts"), col("event_type"), "yyyyMMddHH"))
      .orderBy(col("bucket"), col("key"))
  }

  // W3/A15 z-score vs trailing 168 buckets (advanced_trend_analyzer.py:171-197).
  val q17 = sql(
    "q17_zscore",
    """WITH h AS (SELECT strftime(ts, '%Y%m%d%H') AS bucket, event_type AS key, count(*) AS cnt
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT bucket, key, cnt,
      |  count(cnt) OVER win AS n, sum(cnt) OVER win AS s1, sum(cnt*cnt) OVER win AS s2
      |  FROM h WINDOW win AS (PARTITION BY key ORDER BY bucket ROWS BETWEEN 168 PRECEDING AND 1 PRECEDING))
      |SELECT bucket, key, cnt,
      |  round(CASE WHEN n < 2 OR (s2 - s1*s1/n)/n <= 0 THEN 0.0
      |        ELSE (cnt - s1/n) / sqrt((s2 - s1*s1/n)/n) END, 6) AS z
      |FROM w ORDER BY bucket, key""".stripMargin) { (s, d) =>
    TimeSeries.zscore(
      TimeSeries.bucketCounts(ev(s, d), col("ts"), col("event_type"), "yyyyMMddHH"))
      .orderBy(col("bucket"), col("key"))
  }

  // A3 multi-horizon rollup from the hourly state table.
  val q18 = sql(
    "q18_multi_horizon",
    """WITH h AS (SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS bucket, event_type AS key, count(*) AS cnt
      |           FROM events GROUP BY 1, 2),
      |a AS (SELECT max(bucket) AS anchor FROM h)
      |SELECT key,
      |  CAST(SUM(CASE WHEN bucket > anchor - 1   THEN cnt ELSE 0 END) AS BIGINT) AS c1h,
      |  CAST(SUM(CASE WHEN bucket > anchor - 6   THEN cnt ELSE 0 END) AS BIGINT) AS c6h,
      |  CAST(SUM(CASE WHEN bucket > anchor - 24  THEN cnt ELSE 0 END) AS BIGINT) AS c24h,
      |  CAST(SUM(CASE WHEN bucket > anchor - 168 THEN cnt ELSE 0 END) AS BIGINT) AS c168h
      |FROM h, a GROUP BY key ORDER BY key""".stripMargin) { (s, d) =>
    TimeSeries.multiHorizon(
      TimeSeries.epochBucketCounts(ev(s, d), col("ts"), col("event_type"), 3600))
      .orderBy(col("key"))
  }

  // A1 trending alert: 30-min tumbling window, count >= threshold
  // (AlertTopology.java:86-90; AlertConfig.java:40 scaled to testdata).
  val q19 = sql(
    "q19_trending_alerts",
    """SELECT strftime(to_timestamp(CAST(floor(epoch(ts)/1800)*1800 AS BIGINT)), '%Y-%m-%d %H:%M') AS window_start,
      |  event_type AS key, count(*) AS cnt
      |FROM events GROUP BY 1, 2 HAVING count(*) >= 4 ORDER BY window_start, key""".stripMargin) { (s, d) =>
    ev(s, d)
      .groupBy(window(col("ts"), "30 minutes"), col("event_type").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 4)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("key"), col("cnt"))
      .orderBy(col("window_start"), col("key"))
  }

  // A2/A8/A9 breaking alert: 5-min window, volume + distinct-source
  // thresholds (AlertAnalyzer.java:13-43 scaled to testdata).
  val q20 = sql(
    "q20_breaking_alerts",
    """SELECT strftime(to_timestamp(CAST(floor(epoch(ts)/300)*300 AS BIGINT)), '%Y-%m-%d %H:%M') AS window_start,
      |  event_type AS key, count(*) AS cnt, count(DISTINCT user_id) AS n_sources
      |FROM events GROUP BY 1, 2 HAVING count(*) >= 3 AND count(DISTINCT user_id) >= 2
      |ORDER BY window_start, key""".stripMargin) { (s, d) =>
    ev(s, d)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type").as("key"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("n_sources"))
      .filter(col("cnt") >= 3 && col("n_sources") >= 2)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("key"), col("cnt"), col("n_sources"))
      .orderBy(col("window_start"), col("key"))
  }

  // ST3 exact sliding 30-min window over minute buckets (SURVEY §4.3
  // deviation: exact semantics instead of the reference's decay hack).
  val q21 = sql(
    "q21_sliding_30min",
    """WITH m AS (SELECT CAST(floor(epoch(ts)/60) AS BIGINT) AS bucket, event_type AS key, count(*) AS cnt
      |           FROM events GROUP BY 1, 2)
      |SELECT bucket, key, cnt, CAST(sum(cnt) OVER
      |  (PARTITION BY key ORDER BY bucket RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS sliding_cnt
      |FROM m ORDER BY bucket, key""".stripMargin) { (s, d) =>
    TimeSeries.slidingSum(
      TimeSeries.epochBucketCounts(ev(s, d), col("ts"), col("event_type"), 60), 30)
      .orderBy(col("bucket"), col("key"))
  }

  // W2/J4 rank-delta between consecutive snapshots
  // (realtime_keyword_aggregator.py:358-383). The oracle mirrors
  // rankDelta's topN=100 snapshot pre-limit (QUALIFY rank <= 100):
  // the limit ordering equals the rank ordering, so ranks of the
  // surviving rows are identical either way — and the two sides can
  // no longer diverge if the key domain ever exceeds topN.
  val q22 = sql(
    "q22_rank_delta",
    """WITH cur AS (SELECT event_type AS key, count(*) AS cnt,
      |    row_number() OVER (ORDER BY count(*) DESC, event_type) AS cur_rank
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY event_type
      |  QUALIFY cur_rank <= 100),
      |prev AS (SELECT event_type AS key, row_number() OVER (ORDER BY count(*) DESC, event_type) AS prev_rank
      |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY event_type
      |  QUALIFY prev_rank <= 100)
      |SELECT COALESCE(cur.key, prev.key) AS key, cur.cnt AS cur_cnt, cur_rank, prev_rank,
      |  CASE WHEN prev_rank IS NULL THEN 'new'
      |       WHEN cur_rank IS NULL THEN 'dropped'
      |       WHEN prev_rank - cur_rank >= 3 THEN 'rising-fast'
      |       WHEN prev_rank - cur_rank >= 1 THEN 'rising'
      |       WHEN prev_rank - cur_rank <= -3 THEN 'falling-fast'
      |       WHEN prev_rank - cur_rank <= -1 THEN 'falling'
      |       ELSE 'stable' END AS movement
      |FROM cur FULL OUTER JOIN prev ON cur.key = prev.key
      |ORDER BY key""".stripMargin) { (s, d) =>
    val split = lit("2024-01-16 00:00:00").cast("timestamp")
    val cur = ev(s, d).filter(col("ts") >= split)
      .groupBy(col("event_type").as("key")).agg(count(lit(1)).as("cnt"))
    val prev = ev(s, d).filter(col("ts") < split)
      .groupBy(col("event_type").as("key")).agg(count(lit(1)).as("cnt"))
    TimeSeries.rankDelta(cur, prev, topN = 100).orderBy(col("key"))
  }

  // O1/A6 top-N by global count.
  val q23 = sql(
    "q23_top_users",
    """SELECT user_id, count(*) AS n FROM events GROUP BY user_id
      |ORDER BY n DESC, user_id LIMIT 20""".stripMargin) { (s, d) =>
    ev(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(20)
  }

  // W8 retention: newest 100 error events (LTRIM 0..99 analog).
  // Ordering key is second-truncated time + id: the raw ns timestamps
  // are not representable in Spark so sub-second order is not portable.
  val q24 = sql(
    "q24_retention_newest100",
    """SELECT event_id, strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS sec, value
      |FROM events WHERE event_type = 'error'
      |ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC, event_id DESC LIMIT 100""".stripMargin) { (s, d) =>
    TimeSeries.retainNewest(
      ev(s, d).filter(col("event_type") === "error")
        .withColumn("_sec", unix_timestamp(col("ts"))),
      100, Seq(col("_sec"), col("event_id")))
      .select(col("event_id"),
        date_format(col("_sec").cast("timestamp"), "yyyy-MM-dd HH:mm:ss").as("sec"),
        col("value"))
  }

  // S8/F8 sync-sink batch semantics: last-writer-wins per user with
  // soft-delete marker (SyncService.py:87-146; error = delete marker).
  val q25 = sql(
    "q25_last_state_per_user",
    """SELECT user_id, last_type, last_value, n_events, is_deleted FROM (
      |  SELECT user_id, event_type AS last_type, value AS last_value,
      |    count(*) OVER (PARTITION BY user_id) AS n_events,
      |    event_type = 'error' AS is_deleted,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY CAST(floor(epoch(ts)) AS BIGINT) DESC, event_id DESC) AS rn
      |  FROM events) t WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    TimeSeries.lastStatePerKey(
      ev(s, d).withColumn("_sec", unix_timestamp(col("ts"))),
      col("user_id"), Seq(col("_sec"), col("event_id")),
      col("event_type") === "error", countAs = Some("n_events"))
      .select(col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"), col("n_events"), col("is_deleted"))
      .orderBy(col("user_id"))
  }

  // SC12/S4 JSON path extraction from the props payload.
  val q26 = sql(
    "q26_json_extract",
    """SELECT event_type AS key, count(*) AS n,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type ORDER BY key""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("int")
    ev(s, d).groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n"),
        sum(k).cast("long").as("sum_k"),
        max(k).cast("long").as("max_k"))
      .orderBy(col("key"))
  }

  // SC9 date-part profile: hour-of-day histogram per key.
  val q27 = sql(
    "q27_hour_of_day_profile",
    """SELECT CAST(hour(ts) AS BIGINT) AS hod, event_type AS key, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY hod, key""".stripMargin) { (s, d) =>
    ev(s, d).groupBy(hour(col("ts")).cast("long").as("hod"), col("event_type").as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("hod"), col("key"))
  }

  // ST4 session windows (not in the reference — completes the window
  // family): per-user sessions with a 30-min inactivity gap. Event
  // times are second-truncated on BOTH sides so the gap arithmetic is
  // engine-identical; a new session starts when the gap is >= the
  // window (Spark merges only while next.start < prev.end, strictly).
  val q28s = sql(
    "q28_session_windows",
    """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
      |d AS (SELECT user_id, s,
      |  CASE WHEN lag(s, 1) OVER w IS NULL OR s - lag(s, 1) OVER w >= 1800 THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s)),
      |g AS (SELECT user_id, s,
      |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM d)
      |SELECT user_id, strftime(to_timestamp(min(s)), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  count(*) AS n
      |FROM g GROUP BY user_id, sess ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    ev(s, d)
      .withColumn("ts_sec", timestamp_seconds(unix_timestamp(col("ts"))))
      .groupBy(col("user_id"), session_window(col("ts_sec"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n"))
      .orderBy(col("user_id"), col("session_start"))
  }

  // SC14 alert envelope (AlertAnalyzer.java:54-58,83-89): both alert
  // branches wrapped in the published envelope — UUID id, type,
  // severity constants 0.8/0.5 — rolled up over the deterministic
  // columns (uuid/detected_at are nondeterministic by design and are
  // pinned by spec instead: uniqueness + constants).
  val q63 = sql(
    "q63_alert_envelope_rollup",
    """SELECT alert_type, severity, count(*) AS n FROM (
      |  SELECT 'trending' AS alert_type, CAST(0.5 AS DOUBLE) AS severity
      |  FROM (SELECT 1 AS one FROM events GROUP BY floor(epoch(ts)/1800), event_type
      |        HAVING count(*) >= 4) t
      |  UNION ALL
      |  SELECT 'breaking' AS alert_type, CAST(0.8 AS DOUBLE) AS severity
      |  FROM (SELECT 1 AS one FROM events GROUP BY floor(epoch(ts)/300), event_type
      |        HAVING count(*) >= 3 AND count(DISTINCT user_id) >= 2) b
      |) u GROUP BY alert_type, severity ORDER BY alert_type""".stripMargin) { (s, d) =>
    import graft.streaming.Pipelines
    val t = Pipelines.alertEnvelope(
      Pipelines.trendingAlerts(ev(s, d), "ts", "event_type", "30 minutes", 4),
      "trending", 0.5)
    val b = Pipelines.alertEnvelope(
      Pipelines.breakingAlerts(ev(s, d), "ts", "event_type", "user_id", "5 minutes", 3, 2),
      "breaking", 0.8)
    t.unionByName(b)
      .groupBy(col("alert_type"), col("severity")).agg(count(lit(1)).as("n"))
      .orderBy(col("alert_type"))
  }

  // As-of join (Joins.asof — union + tag + running-last, one shuffle,
  // never a range self-join): each purchase picks the user's latest
  // at-or-before signup value. Oracle: DuckDB's native ASOF JOIN.
  // Signups are pre-aggregated per (user, second) — as-of requires a
  // unique right side per (key, ts) for determinism.
  val q66 = sql(
    "q66_asof_join",
    """WITH p AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
      |          FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sig_ts, max(value) AS sig_value
      |      FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id, p.ts_sec, p.value, s.sig_value AS asof_sig_value
      |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts_sec >= s.sig_ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val e = ev(s, d).withColumn("ts_sec", unix_timestamp(col("ts")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_sec"), col("value"))
    val signups = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts_sec").as("sig_ts"))
      .agg(max(col("value")).as("sig_value"))
    graft.operators.Joins.asof(purchases, signups,
      Seq("user_id"), "ts_sec", "sig_ts", Seq("sig_value"))
      .orderBy(col("event_id"))
  }

  // Interval/range join (Joins.rangeJoin — binned equi-join on
  // (key, time-bin), never a per-key nested loop): every purchase
  // within 10 minutes AT OR AFTER a click by the same user.
  // Comparisons run in integer µs on both sides — events carry ns
  // timestamps and both engines floor identically (ns DIV 1000).
  val q99 = sql(
    "q99_range_join",
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
      |l AS (SELECT user_id, event_id AS click_id, us AS lus FROM e WHERE event_type = 'click'),
      |r AS (SELECT user_id, event_id AS purchase_id, us AS rus FROM e WHERE event_type = 'purchase')
      |SELECT l.user_id AS user_id, click_id, purchase_id, (rus - lus)//1000 AS gap_ms
      |FROM l JOIN r ON l.user_id = r.user_id AND rus >= lus AND rus <= lus + 600000000
      |ORDER BY user_id, click_id, purchase_id""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    graft.operators.Joins.rangeJoin(clicks, purchases, Seq("user_id"), "ts", "pts",
      lowerMs = 0L, upperMs = 600000L)
      .select(col("user_id"), col("click_id"), col("r_purchase_id").as("purchase_id"),
        floor((unix_micros(col("r_pts")) - unix_micros(col("ts"))) / 1000L)
          .cast("long").as("gap_ms"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  // Ordered funnel signup → view → purchase (EventAnalytics.funnel):
  // stage counts of users whose steps complete in order (step i+1 at
  // or after step i). The oracle chains the same filtered min-joins.
  val q100 = sql(
    "q100_funnel",
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
      |s1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'view' AND us >= t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND us >= t2 GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1 AS stage, 'signup' AS step, count(*) AS n_users FROM s1
      |  UNION ALL SELECT 2, 'view', count(*) FROM s2
      |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3) u
      |ORDER BY stage""".stripMargin) { (s, d) =>
    val f = graft.operators.EventAnalytics.funnel(
      ev(s, d), col("user_id"), unix_micros(col("ts")), col("event_type"),
      Seq("signup", "view", "purchase"))
    // one pass over the per-key frame: conditional sums, then unpivot
    val stages = Seq((1, "signup"), (2, "view"), (3, "purchase"))
    val cs = stages.map { case (i, _) =>
      sum(when(col("reached") >= i, 1L).otherwise(0L)).as(s"c$i")
    }
    val counts = f.agg(cs.head, cs.tail: _*)
    counts.select(explode(array(stages.map { case (i, st) =>
      struct(lit(i).as("stage"), lit(st).as("step"), col(s"c$i").as("n_users"))
    }: _*)).as("s"))
      .select(col("s.stage"), col("s.step"), col("s.n_users"))
      .orderBy(col("stage"))
  }

  // Weekly cohort retention (EventAnalytics.cohortRetention): distinct
  // users active `offset` epoch-weeks after their first-activity week.
  // Pure integer week indexes — no calendar/timezone semantics.
  val q101 = sql(
    "q101_cohort_retention",
    """WITH kw AS (SELECT DISTINCT user_id, epoch_ns(ts)//1000000000//604800 AS wk FROM events),
      |c AS (SELECT user_id, min(wk) AS cohort_week FROM kw GROUP BY 1)
      |SELECT cohort_week, wk - cohort_week AS week_offset, count(*) AS n_users
      |FROM kw JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.cohortRetention(
      ev(s, d), col("user_id"), unix_timestamp(col("ts")))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  // Attribution interval join — the BATCH form of the stream-stream
  // Pipelines.intervalJoin (watermarks are a no-op on batch inputs, so
  // the very same operator is oracle-gated here and replay-tested in
  // StreamingConsistencySpec): purchases within 30 min of a view by
  // the same user.
  val q109 = sql(
    "q109_attribution_join",
    """WITH v AS (SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase')
      |SELECT v.user_id, strftime(vts, '%Y%m%d%H%M%S') AS left_ts,
      |  strftime(pts, '%Y%m%d%H%M%S') AS right_ts
      |FROM v JOIN p ON p.user_id = v.user_id
      |  AND pts >= vts AND pts <= vts + INTERVAL 30 MINUTE
      |ORDER BY v.user_id, left_ts, right_ts""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    graft.streaming.Pipelines.intervalJoin(
      e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts")),
      e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts")),
      "user_id", "vts", "pts", maxDelay = "30 minutes")
      .select(col("user_id"),
        date_format(col("left_ts"), "yyyyMMddHHmmss").as("left_ts"),
        date_format(col("right_ts"), "yyyyMMddHHmmss").as("right_ts"))
      .orderBy(col("user_id"), col("left_ts"), col("right_ts"))
  }

  // Profile similarity (TimeSeries.similarProfiles): top-10 users
  // whose hour-of-day activity shape is closest to user 0's —
  // z-normalized squared-Euclidean over dense 24-dim count profiles.
  // The oracle replays the exact chain: integer sums → one IEEE
  // mean/std formula → round6 per-dim terms → DECIMAL-exact
  // accumulation (order-independent in both engines).
  val q115 = sql(
    "q115_similar_profiles",
    """WITH c AS (SELECT user_id, CAST(strftime(ts, '%H') AS INT) AS dim, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |spine AS (SELECT DISTINCT user_id FROM events),
      |dims AS (SELECT unnest(range(0, 24)) AS dim),
      |dense AS (SELECT s.user_id, d.dim, COALESCE(c.c, 0) AS c
      |  FROM spine s CROSS JOIN dims d
      |  LEFT JOIN c ON c.user_id = s.user_id AND c.dim = d.dim),
      |stats AS (SELECT user_id, CAST(sum(c) AS DOUBLE) / 24 AS mean,
      |    sqrt(CAST(sum(c*c) AS DOUBLE) / 24
      |      - (CAST(sum(c) AS DOUBLE) / 24) * (CAST(sum(c) AS DOUBLE) / 24)) AS sd
      |  FROM dense GROUP BY 1),
      |z AS (SELECT d.user_id, d.dim,
      |    CASE WHEN st.sd = 0 THEN 0.0
      |         ELSE (CAST(d.c AS DOUBLE) - st.mean) / st.sd END AS z
      |  FROM dense d JOIN stats st USING (user_id)),
      |q AS (SELECT dim, z AS qz FROM z WHERE user_id = 0),
      |t AS (SELECT z.user_id, round((z.z - q.qz) * (z.z - q.qz), 6) AS t
      |  FROM z JOIN q USING (dim) WHERE z.user_id <> 0),
      |d AS (SELECT user_id, round(CAST(sum(CAST(t AS DECIMAL(38,18))) AS DOUBLE), 6) AS dist
      |  FROM t GROUP BY 1)
      |SELECT user_id AS key, dist FROM d ORDER BY dist, key LIMIT 10""".stripMargin) { (s, d) =>
    graft.operators.TimeSeries.similarProfiles(
      ev(s, d), col("user_id"), hour(col("ts")), queryKey = 0L, k = 10)
      .select(col("key"), col("dist"))
  }

  // Per-type value percentiles (the p50/p95/p99 SLO read): EXACT
  // R-7 linear-interpolated quantiles, identical definition in
  // Spark's percentile() and DuckDB's quantile_cont(). The
  // spark.graft.approxPercentile flag swaps in the fixed-size
  // GK-sketch rewrite for the same query text (PlansSpec pins both
  // the rewrite and its accuracy).
  val q138 = sql(
    "q138_value_percentiles",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.9), 6) AS p90,
      |  round(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.valuePercentiles(
        Tables.events(s, d), col("event_type"), col("value"), Seq(0.5, 0.9, 0.99))
      .withColumnRenamed("group", "event_type")
      .orderBy(col("event_type"))
  }

  // The windowed (SLO-dashboard) percentile form under the hash gate:
  // per (6-hour tumbling window, event_type) p50/p95 — the same exact
  // R-7 quantiles as q138 bucketed by the q19 epoch-window recipe.
  // (The STREAMING form of this exact plan is pinned stream==batch by
  // StreamingConsistencySpec.)
  val q140 = sql(
    "q140_windowed_percentiles",
    """SELECT strftime(to_timestamp(CAST(floor(epoch(ts)/21600)*21600 AS BIGINT)), '%Y-%m-%d %H:%M') AS window_start,
      |  event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.95), 6) AS p95
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
    graft.operators.EventAnalytics.windowedValuePercentiles(
        ev(s, d), col("ts"), col("event_type"), col("value"),
        Seq(0.5, 0.95), "6 hours")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("group").as("event_type"), col("n_events"), col("p50"), col("p95"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val all: Seq[QueryDef] = Seq(q14, q15, q16, q17, q18, q19, q20, q21,
    q22, q23, q24, q25, q26, q27, q28s, q63, q66, q99, q100, q101, q109, q115,
    q138, q140)
}
