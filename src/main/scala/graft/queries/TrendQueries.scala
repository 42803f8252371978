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

  val all: Seq[QueryDef] = Seq(q43, q44)
}
