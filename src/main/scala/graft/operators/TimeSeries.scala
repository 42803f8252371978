package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / windowed-count operators (SURVEY §2.4–§2.5, §2.9).
  *
  * These re-express the reference's Redis-sorted-set keyword buckets
  * (keyword-extraction/advanced_trend_analyzer.py:68-91) and in-memory
  * window maps (realtime_keyword_aggregator.py:32-36) as plain windowed
  * aggregations over an event-time column. The per-keyword, per-hour
  * read loops (advanced_trend_analyzer.py:127-197, ~400 Redis
  * round-trips per query) collapse into single set-based jobs.
  *
  * Scale notes: every function shuffles once on (bucket, key) — the
  * partial aggregation (map-side combine) reduces the shuffle payload
  * to the distinct-bucket-key count. Analytic windows partition by key
  * so no global sort ever happens.
  */
object TimeSeries {

  /** String-bucketed counts, e.g. fmt="yyyyMMddHH" for the hour buckets
    * of advanced_trend_analyzer.py:77 / "yyyyMMddHHmm" for the minute
    * timeline (:87). */
  def bucketCounts(df: DataFrame, ts: Column, key: Column, fmt: String): DataFrame =
    df.groupBy(date_format(ts, fmt).as("bucket"), key.as("key"))
      .agg(count(lit(1)).as("cnt"))

  /** Epoch-bucketed counts (bucket = floor(epoch_seconds / width)),
    * used where downstream needs numeric range frames. */
  def epochBucketCounts(df: DataFrame, ts: Column, key: Column, widthSec: Long): DataFrame =
    df.groupBy(floor(unix_timestamp(ts) / widthSec).cast("long").as("bucket"), key.as("key"))
      .agg(count(lit(1)).as("cnt"))

  /** W4 velocity (advanced_trend_analyzer.py:148-169): delta vs the
    * previous bucket; a key absent before (previous == 0) gets the
    * new-keyword boost current*2.0 (:166-167). */
  def velocity(counts: DataFrame, key: String = "key", bucket: String = "bucket",
      cnt: String = "cnt"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
    val prev = lag(col(cnt), 1, 0).over(w)
    counts.withColumn("velocity",
      when(prev === 0, col(cnt) * 2.0).otherwise((col(cnt) - prev) * 1.0))
  }

  /** W3/A15 z-score (advanced_trend_analyzer.py:171-197): current count
    * vs mean/std of the trailing `lookback` buckets excluding current;
    * std == 0 → 0 (:192). Variance is computed from exact integer
    * sums (s1, s2) so the double arithmetic is engine-identical. */
  def zscore(counts: DataFrame, lookback: Int = 168, key: String = "key",
      bucket: String = "bucket", cnt: String = "cnt"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
      .rowsBetween(-lookback, -1)
    val n = count(col(cnt)).over(w)
    val s1 = sum(col(cnt)).over(w)
    val s2 = sum(col(cnt) * col(cnt)).over(w)
    val variance = (s2 - s1 * s1 / n) / n
    val z = when(n < lit(2) || variance <= 0, lit(0.0))
      .otherwise((col(cnt) - s1 / n) / sqrt(variance))
    counts.withColumn("z", round(z, 6))
  }

  /** ST3 sliding window done exactly (vs the reference's decay
    * approximation, realtime_keyword_aggregator.py:94-161 — documented
    * deviation SURVEY §4.3): sum over a numeric range frame of
    * `width` buckets ending at the current bucket. */
  def slidingSum(counts: DataFrame, width: Int, key: String = "key",
      bucket: String = "bucket", cnt: String = "cnt"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(bucket))
      .rangeBetween(-(width - 1), 0)
    counts.withColumn("sliding_cnt", sum(col(cnt)).over(w))
  }

  /** A3 multi-horizon rollup (advanced_trend_analyzer.py:41,127-146):
    * counts per key over trailing 1h/6h/24h/7d, anchored at the newest
    * hour bucket present. Re-aggregates the (small) hourly state table
    * instead of running 168-row windows per event. */
  def multiHorizon(hourly: DataFrame, key: String = "key", bucket: String = "bucket",
      cnt: String = "cnt"): DataFrame = {
    val anchor = hourly.agg(max(col(bucket)).as("anchor"))
    hourly.crossJoin(broadcast(anchor))
      .groupBy(col(key))
      .agg(
        sum(when(col(bucket) > col("anchor") - 1, col(cnt)).otherwise(0L)).as("c1h"),
        sum(when(col(bucket) > col("anchor") - 6, col(cnt)).otherwise(0L)).as("c6h"),
        sum(when(col(bucket) > col("anchor") - 24, col(cnt)).otherwise(0L)).as("c24h"),
        sum(when(col(bucket) > col("anchor") - 168, col(cnt)).otherwise(0L)).as("c168h"))
  }

  /** W2/J4 rank-delta (realtime_keyword_aggregator.py:358-383): rank
    * keys in two snapshots, full-outer join, classify movement. The
    * reference's ±3 thresholds map to rising-fast/falling-fast.
    *
    * Scale: the reference only ever ranks a top-K candidate snapshot
    * (realtime_keyword_aggregator.py:166-172 over-fetches 2·limit
    * candidates first), so each snapshot is pre-limited to `topN` with
    * orderBy+limit — planned as TakeOrderedAndProject, a distributed
    * per-partition top-N plus a driver merge of topN rows. The
    * single-partition rank window that follows then runs over at most
    * `topN` rows, never the full key domain. */
  def rankDelta(current: DataFrame, previous: DataFrame, key: String = "key",
      cnt: String = "cnt", topN: Int = 100): DataFrame = {
    def ranked(df: DataFrame, rk: String) = df
      .orderBy(col(cnt).desc, col(key)).limit(topN)
      .withColumn(rk, row_number().over(Window.orderBy(col(cnt).desc, col(key))))
    val cur = ranked(current, "cur_rank").select(col(key), col(cnt).as("cur_cnt"), col("cur_rank"))
    val prev = ranked(previous, "prev_rank").select(col(key).as("pkey"), col("prev_rank"))
    cur.join(prev, cur(key) === prev("pkey"), "full_outer")
      .select(
        coalesce(col(key), col("pkey")).as(key),
        col("cur_cnt"), col("cur_rank"), col("prev_rank"),
        when(col("prev_rank").isNull, lit("new"))
          .when(col("cur_rank").isNull, lit("dropped"))
          .when(col("prev_rank") - col("cur_rank") >= 3, lit("rising-fast"))
          .when(col("prev_rank") - col("cur_rank") >= 1, lit("rising"))
          .when(col("prev_rank") - col("cur_rank") <= -3, lit("falling-fast"))
          .when(col("prev_rank") - col("cur_rank") <= -1, lit("falling"))
          .otherwise(lit("stable")).as("movement"))
  }

  /** S8 sync-sink semantics, batch-equivalent: the MySQL
    * INSERT..ON DUPLICATE KEY UPDATE replay (targetDB1/SyncService.py:
    * 87-146) reduces to "last writer wins per key" — row_number over
    * event order desc. Soft delete (:144): a delete marker sets
    * is_deleted instead of removing the row. */
  def lastStatePerKey(df: DataFrame, key: Column, ord: Seq[Column],
      deleteMarker: Column, countAs: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord.map(_.desc): _*)
    val counted = countAs match {
      // events-per-key must be counted BEFORE the rn=1 filter, so it is
      // an opt-in output column here rather than a caller-side groupBy.
      case Some(name) => df.withColumn(name, count(lit(1)).over(Window.partitionBy(key)))
      case None => df
    }
    counted.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .withColumn("is_deleted", deleteMarker)
      .drop("_rn")
  }

  /** W8 retention window (advanced_trend_analyzer.py:281, LTRIM 0..99):
    * keep the newest n rows by the given ordering. Planned as
    * TakeOrderedAndProject — no global sort materializes. */
  def retainNewest(df: DataFrame, n: Int, ord: Seq[Column]): DataFrame =
    df.orderBy(ord.map(_.desc): _*).limit(n)
}
