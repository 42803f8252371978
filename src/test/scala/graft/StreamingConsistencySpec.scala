package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Pipelines

/** Stream-batch consistency (SURVEY §5): replaying the events table
  * through MemoryStream must produce exactly the windowed-aggregation
  * results of the batch computation on the same data.
  */
class StreamingConsistencySpec extends SparkSuite {
  init()
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private lazy val events: Seq[(Timestamp, String, Long)] =
    Tables.events(spark, sf0001)
      .select(col("ts"), col("event_type"), col("user_id"))
      .as[(Timestamp, String, Long)]
      .collect().toSeq

  test("trending alert windows match batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val sdf = stream.toDF().toDF("ts", "event_type", "user_id")
    val q = Pipelines.trendingAlerts(sdf, "ts", "event_type", threshold = 2)
      .writeStream.outputMode("complete").format("memory").queryName("trending").start()
    // feed in two chunks to exercise incremental state
    val (a, b) = events.splitAt(events.size / 2)
    stream.addData(a); q.processAllAvailable()
    stream.addData(b); q.processAllAvailable()
    val streamed = spark.table("trending")
    val batch = Pipelines.trendingAlerts(
      Tables.events(spark, sf0001), "ts", "event_type", threshold = 2)
    assert(sortedRows(streamed) == sortedRows(batch))
    assert(streamed.count() > 0)
    q.stop()
  }

  test("session windows match batch") {
    implicit val sqlCtx = spark.sqlContext
    def dag(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts_sec", timestamp_seconds(unix_timestamp(col("ts"))))
      .withWatermark("ts_sec", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts_sec"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n"))
    val stream = MemoryStream[(Timestamp, String, Long)]
    val q = dag(stream.toDF().toDF("ts", "event_type", "user_id"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("sessions").start()
    stream.addData(events)
    q.processAllAvailable()
    val batch = dag(Tables.events(spark, sf0001)
      .select(col("ts"), col("event_type"), col("user_id")))
    assert(sortedRows(spark.table("sessions")) == sortedRows(batch))
    assert(spark.table("sessions").count() > 0)
    q.stop()
  }

  test("breaking alert windows match batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val sdf = stream.toDF().toDF("ts", "event_type", "user_id")
    val q = Pipelines.breakingAlerts(sdf, "ts", "event_type", "user_id",
      minCount = 2, minSources = 2)
      .writeStream.outputMode("complete").format("memory").queryName("breaking").start()
    stream.addData(events)
    q.processAllAvailable()
    val streamed = spark.table("breaking")
    val batch = Pipelines.breakingAlerts(
      Tables.events(spark, sf0001), "ts", "event_type", "user_id",
      minCount = 2, minSources = 2)
    assert(sortedRows(streamed) == sortedRows(batch))
    q.stop()
  }
}
