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

  /** Time-series profile similarity — "which keys trend like X":
    * z-normalized squared-Euclidean distance between per-key activity
    * profiles (e.g. hour-of-day count vectors), the series-similarity
    * primitive behind co-trending keyword / similar-user queries.
    * `dims` is the dense dimension domain (missing dims count 0 —
    * densification matters: z-normalization over sparse rows would
    * drop the zeros that carry the shape).
    *
    * Determinism contract (engine-replayable): per-key mean/std are
    * single IEEE chains over exact integer sums; a zero-std profile
    * z-scores to 0 (the q17/W3 convention); per-dim squared diffs are
    * round6-quantized and accumulated in DECIMAL(38,18) (the pagerank
    * pattern), so the distance never depends on partial-agg order.
    *
    * Scale: one (key, dim) aggregation, row-local z-chain, broadcast
    * of the query key's `|dims|` rows, one keyed rollup, top-k as
    * TakeOrderedAndProject. The corpus shuffles once on key. */
  def similarProfiles(events: DataFrame, key: Column, dim: Column,
      queryKey: Long, k: Int, nDims: Int = 24): DataFrame = {
    val spark = events.sparkSession
    import org.apache.spark.sql.types.DecimalType
    val counts = events.select(key.as("key"), dim.cast("int").as("dim"))
      .groupBy(col("key"), col("dim")).agg(count(lit(1)).as("c"))
    val spine = events.select(key.as("key")).distinct()
      .crossJoin(spark.range(nDims).select(col("id").cast("int").as("dim")))
    val dense = spine.join(counts, Seq("key", "dim"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val stats = dense.groupBy(col("key"))
      .agg(sum(col("c")).as("s"), sum(col("c") * col("c")).as("ss"))
      .withColumn("mean", col("s").cast("double") / nDims)
      .withColumn("sd", sqrt(col("ss").cast("double") / nDims - col("mean") * col("mean")))
    val z = dense.join(stats, "key")
      .withColumn("z", when(col("sd") === 0, 0.0)
        .otherwise((col("c").cast("double") - col("mean")) / col("sd")))
      .select(col("key"), col("dim"), col("z"))
    val q = z.filter(col("key") === queryKey)
      .select(col("dim"), col("z").as("qz"))
    z.filter(col("key") =!= queryKey)
      .join(broadcast(q), "dim")
      .withColumn("_t", round((col("z") - col("qz")) * (col("z") - col("qz")), 6))
      .groupBy(col("key"))
      .agg(sum(col("_t").cast(DecimalType(38, 18))).cast("double").as("dist"))
      .withColumn("dist", round(col("dist"), 6))
      .orderBy(col("dist"), col("key"))
      .limit(k)
  }
}
