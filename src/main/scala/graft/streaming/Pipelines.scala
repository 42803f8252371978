package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Cdc

/** Structured Streaming pipelines (SURVEY §2.9, §3.1–§3.4).
  *
  * Design rule: every transform is a plain DataFrame→DataFrame function
  * that works on BOTH a batch and a streaming input — the stream-batch
  * consistency property (the Structured Streaming paper's core
  * guarantee, see PAPERS.md) is what the replay tests assert.
  *
  * Delivery semantics: checkpointed exactly-once (strictly stronger
  * than the reference's at-least-once, SURVEY §4.3#3); the mirror sink
  * stays correct under replay because the merge is idempotent —
  * matching the reference's ON DUPLICATE KEY UPDATE idempotency
  * (targetDB1/SyncService.py:87-146).
  */
object Pipelines {

  /** S1/S2/S3: Kafka CDC source. Production wiring — the test
    * environment has no broker, so correctness of the downstream DAG
    * is pinned via MemoryStream replay against the same transforms. */
  def kafkaCdcSource(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    Cdc.parse(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load()
        .select(col("value").cast("string").as("value")),
      col("value"))

  /** A1 trending branch (AlertTopology.java:86-98): tumbling window
    * count over the key with a short watermark (no-grace parity,
    * SURVEY ST1). Works unchanged on batch input (watermark is a
    * no-op there). */
  def trendingAlerts(events: DataFrame, ts: String, key: String,
      windowDur: String = "30 minutes", threshold: Long = 10,
      watermark: String = "0 seconds"): DataFrame =
    events.withWatermark(ts, watermark)
      .groupBy(window(col(ts), windowDur), col(key).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("window.start").as("window_start"), col("key"), col("cnt"))

  /** A2/A8/A9 breaking branch (AlertTopology.java:49-75): volume +
    * distinct-source thresholds. collect_set keeps the aggregation
    * streaming-legal (countDistinct is not allowed in streaming
    * aggs); source cardinality is small and bounded. */
  def breakingAlerts(events: DataFrame, ts: String, key: String, source: String,
      windowDur: String = "5 minutes", minCount: Long = 3, minSources: Int = 2,
      watermark: String = "0 seconds"): DataFrame =
    events.withWatermark(ts, watermark)
      .groupBy(window(col(ts), windowDur), col(key).as("key"))
      .agg(count(lit(1)).as("cnt"), collect_set(col(source)).as("sources"))
      .filter(col("cnt") >= minCount && size(col("sources")) >= minSources)
      .select(col("window.start").as("window_start"), col("key"), col("cnt"),
        size(col("sources")).as("n_sources"))

  /** §3.1 keyword dataflow head: quality filter → keyword fan-out.
    * `extract` is the U1 keyword column (array) for the row. */
  def keywordFanout(parsed: DataFrame, textCol: String,
      extract: org.apache.spark.sql.Column): DataFrame =
    parsed
      .filter(col(textCol).isNotNull && length(col(textCol)) >= 50)
      .select(col("*"), explode(extract).as("keyword"))

  /** S6: enriched keyword-event payload for the republish sink
    * (keyword_republisher.py:14-38,43-123 — FIXTURES A6): Kafka key
    * `article_{id}`, JSON value with the keyword array, per-keyword
    * classification map (SC7), extraction method and event time.
    * Pipe the result into writeStream.format("kafka"). */
  def republishKeywords(keywords: DataFrame, id: Column, ts: Column): DataFrame =
    keywords
      .groupBy(id.as("article_id"), ts.as("event_time"))
      .agg(array_distinct(collect_list(col("keyword"))).as("keywords"))
      .select(
        concat(lit("article_"), col("article_id")).as("key"),
        to_json(struct(
          col("article_id"),
          col("keywords"),
          map_from_arrays(col("keywords"),
            transform(col("keywords"), k => graft.functions.Text.classifyKeyword(k)))
            .as("keyword_classes"),
          lit("graft-regex").as("extraction_method"),
          date_format(col("event_time"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("timestamp")))
          .as("value"))

  /** F9 streaming form: dedup by natural key (existsByLink,
    * ArticleRepository.java:21) on a stream. State is bounded by the
    * watermark: a key is remembered only while late duplicates can
    * still arrive. */
  def dedupByKey(df: DataFrame, keys: Seq[String], eventTime: String,
      watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(eventTime, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** S8: apply one CDC micro-batch to a parquet mirror table —
    * idempotent last-writer-wins MERGE keyed on id, soft delete for
    * `d` ops (SyncService.py:87-146,222-283). Used from foreachBatch;
    * also callable on batch data (tests). */
  def applyCdcBatch(spark: SparkSession, parsed: DataFrame, mirrorPath: String): Unit = {
    val incoming = parsed.select(
      coalesce(col("after.id"), col("before.id")).as("id"),
      col("table"),
      col("ts_ms"),
      col("after.value").as("value"),
      (col("op") === "d").as("is_deleted"))
      .filter(col("id").isNotNull)
    val fs = new Path(mirrorPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(new Path(mirrorPath))) spark.read.parquet(mirrorPath)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        incoming.schema)
    // union → keep the newest (ts_ms) version per (table, id); replayed
    // duplicates collapse because dropDuplicates runs before the rank.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("table"), col("id"))
      .orderBy(col("ts_ms").desc, col("is_deleted").desc)
    val merged = existing.unionByName(incoming)
      .dropDuplicates(Seq("table", "id", "ts_ms", "is_deleted"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
      .localCheckpoint() // materialize BEFORE overwriting the source path
    merged.write.mode("overwrite").parquet(mirrorPath)
  }

  /** The full sync pipeline: parsed CDC stream → idempotent mirror. */
  def cdcMirrorSink(spark: SparkSession, parsed: DataFrame, mirrorPath: String,
      checkpoint: String, trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    parsed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdcBatch(spark, batch, mirrorPath)
      }
      .start()
}
