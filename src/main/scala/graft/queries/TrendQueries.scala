package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{TimeSeries, Trend, WordCloud}
import graft.sources.Tables

/** The compound trend-metric bundle (W3–W7/U4) and the word-cloud
  * snapshot (A7/W9) — the reference's two flagship read endpoints.
  */
object TrendQueries {
  import QueryDef.sql

  val q43 = sql(
    "q43_trend_metrics",
    """WITH h AS (SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS bucket, event_type AS key, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |a AS (SELECT max(bucket) AS anchor FROM h),
      |m AS (SELECT key,
      |  CAST(SUM(CASE WHEN bucket = anchor THEN cnt ELSE 0 END) AS BIGINT) AS c1h,
      |  CAST(SUM(CASE WHEN bucket = anchor-1 THEN cnt ELSE 0 END) AS BIGINT) AS cprev,
      |  CAST(SUM(CASE WHEN bucket > anchor-6 THEN cnt ELSE 0 END) AS BIGINT) AS c6h,
      |  CAST(SUM(CASE WHEN bucket > anchor-12 AND bucket <= anchor-6 THEN cnt ELSE 0 END) AS BIGINT) AS prev6,
      |  CAST(SUM(CASE WHEN bucket > anchor-24 THEN cnt ELSE 0 END) AS BIGINT) AS c24h,
      |  CAST(SUM(CASE WHEN bucket >= anchor-168 AND bucket <= anchor-1 THEN cnt ELSE 0 END) AS BIGINT) AS s1,
      |  CAST(SUM(CASE WHEN bucket >= anchor-168 AND bucket <= anchor-1 THEN cnt*cnt ELSE 0 END) AS BIGINT) AS s2
      |  FROM h, a GROUP BY key),
      |x AS (SELECT key, c1h, c6h, c24h,
      |  CASE WHEN cprev = 0 THEN c1h * 2.0 ELSE (c1h - cprev) * 1.0 END AS velocity,
      |  (c6h - prev6) / 6.0 AS vel6,
      |  CASE WHEN (s2 - s1*s1/168.0)/168.0 <= 0 THEN 0.0
      |       ELSE (c1h - s1/168.0) / sqrt((s2 - s1*s1/168.0)/168.0) END AS zraw,
      |  CASE WHEN c24h = 0 THEN 0.0 ELSE least(c6h / CAST(c24h AS DOUBLE), 5.0) * 2.0 END AS momentum
      |  FROM m)
      |SELECT key, c1h, c6h, c24h, velocity, round(zraw, 6) AS z, momentum,
      |  CASE WHEN velocity > 2 AND vel6 > 1 THEN 'rising'
      |       WHEN velocity < -1 AND vel6 < -0.5 THEN 'falling'
      |       ELSE 'stable' END AS direction,
      |  round((least(c1h/10.0, 10.0)*0.25 + least(greatest(velocity, 0.0)/5.0, 10.0)*0.30
      |       + least(abs(zraw)/3.0, 1.0)*10.0*0.25 + momentum*0.20) * 10.0, 6) AS compound
      |FROM x ORDER BY key""".stripMargin) { (s, d) =>
    Trend.metricsAtAnchor(
      TimeSeries.epochBucketCounts(Tables.events(s, d), col("ts"), col("event_type"), 3600))
      .orderBy(col("key"))
  }

  val q44 = sql(
    "q44_wordcloud",
    """WITH c AS (SELECT t AS token, count(*) AS cnt FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents) u
      |  WHERE t <> '' GROUP BY t),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_count, count(*) AS unique_keywords FROM c),
      |top AS (SELECT token, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank
      |  FROM c ORDER BY cnt DESC, token LIMIT 50)
      |SELECT token, cnt, rank,
      |  CAST(CASE WHEN rank <= 10 THEN 60 - (rank-1)*2
      |            WHEN rank <= 30 THEN 40 - (rank-11)
      |            WHEN rank <= 50 THEN 20 - floor((rank-31)/4.0)
      |            ELSE 15 END AS INT) AS size,
      |  CAST((rank-1) // 10 AS INT) AS color_idx,
      |  CASE WHEN rank <= 3 THEN 'pulse' WHEN rank <= 10 THEN 'glow' ELSE 'fade' END AS animation,
      |  total_count, unique_keywords
      |FROM top, tot ORDER BY rank""".stripMargin) { (s, d) =>
    val counts = Tables.documents(s, d)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    WordCloud.snapshot(counts, 50).orderBy(col("rank"))
  }

  // Seasonally-adjusted anomalies (Trend.seasonalAnomalies): each
  // (event_type, date, hour) cell scored against that key's
  // same-hour-of-day baseline across all days — rush hour is normal,
  // busier-than-this-hour-usually-is fires. Dense cells (missing =
  // 0) via the key×date×hour spine on both engines.
  val q119 = sql(
    "q119_seasonal_anomalies",
    """WITH c AS (SELECT event_type AS key, strftime(ts, '%Y%m%d') AS date,
      |    CAST(strftime(ts, '%H') AS INT) AS hour, count(*) AS cnt
      |  FROM events GROUP BY 1, 2, 3),
      |keys AS (SELECT DISTINCT key FROM c),
      |dates AS (SELECT DISTINCT date FROM c),
      |hours AS (SELECT unnest(range(0, 24)) AS hour),
      |dense AS (SELECT k.key, d.date, h.hour, COALESCE(c.cnt, 0) AS cnt
      |  FROM keys k CROSS JOIN dates d CROSS JOIN hours h
      |  LEFT JOIN c ON c.key = k.key AND c.date = d.date AND c.hour = h.hour),
      |b AS (SELECT key, hour, count(*) AS n, CAST(sum(cnt) AS DOUBLE) / count(*) AS mean,
      |    sqrt(CAST(sum(cnt*cnt) AS DOUBLE) / count(*)
      |      - (CAST(sum(cnt) AS DOUBLE) / count(*)) * (CAST(sum(cnt) AS DOUBLE) / count(*))) AS sd
      |  FROM dense GROUP BY 1, 2),
      |z AS (SELECT d.key, d.date, d.hour, d.cnt, b.mean,
      |    CASE WHEN b.sd = 0 THEN 0.0 ELSE (CAST(d.cnt AS DOUBLE) - b.mean) / b.sd END AS z
      |  FROM dense d JOIN b ON b.key = d.key AND b.hour = d.hour)
      |SELECT key, date, hour, cnt, round(mean, 6) AS hour_mean, round(z, 6) AS z
      |FROM z WHERE abs(z) > 2.0 ORDER BY key, date, hour""".stripMargin) { (s, d) =>
    val cells = Tables.events(s, d)
      .groupBy(col("event_type").as("key"),
        date_format(col("ts"), "yyyyMMdd").as("date"),
        hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    Trend.seasonalAnomalies(cells)
      .orderBy(col("key"), col("date"), col("hour"))
  }

  val all: Seq[QueryDef] = Seq(q43, q44, q119)
}
