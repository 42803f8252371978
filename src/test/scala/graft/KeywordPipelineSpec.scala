package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.model.Cdc
import graft.sources.Tables
import graft.streaming.Pipelines

/** The full §3.1 dataflow end-to-end as a STREAM: CDC JSON → parse →
  * quality filter → keyword fan-out → windowed counts — replayed via
  * MemoryStream and compared against the batch run of the identical
  * transform chain. This is the reference's main pipeline
  * (ks/main.py:106-161 + AlertTopology keyword branch) in one DAG.
  */
class KeywordPipelineSpec extends SparkSuite {
  init()
  import spark.implicits._

  /** documents as CDC insert envelopes: doc_id minutes past epoch. */
  private lazy val envelopes: Seq[String] =
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect()
      .map { r =>
        val id = r.getLong(0)
        val text = r.getString(1).replace("\\", "").replace("\"", "")
        val ts = 1704067200000L + id * 60000L
        s"""{"op":"c","after":{"id":$id,"content":"$text"},"source":{"table":"articles"},"ts_ms":$ts}"""
      }.toSeq

  private def dag(json: DataFrame): DataFrame = {
    val parsed = Cdc.upserts(Cdc.parse(json, col("value")))
    val fanned = Pipelines.keywordFanout(
      parsed.withColumn("event_time", timestamp_millis(col("ts_ms"))),
      "after.content", Text.validKeywords(col("after.content")))
    fanned
      .groupBy(window(col("event_time"), "1 hour"), col("keyword"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("keyword"), col("cnt"))
  }

  test("streamed keyword window counts equal batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val q = dag(stream.toDF().toDF("value"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("kwcounts").start()
    val (a, b) = envelopes.splitAt(envelopes.size / 3)
    stream.addData(a); q.processAllAvailable()
    stream.addData(b); q.processAllAvailable()
    val streamed = spark.table("kwcounts").collect().map(_.toString).sorted.toSeq
    val batch = dag(envelopes.toDF("value")).collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    q.stop()
  }

  test("republish payload: article_{id} key, keyword array + class map JSON") {
    val parsed = Cdc.upserts(Cdc.parse(envelopes.take(3).toDF("value"), col("value")))
    val fanned = Pipelines.keywordFanout(
      parsed.withColumn("event_time", timestamp_millis(col("ts_ms"))),
      "after.content", Text.validKeywords(col("after.content")))
    val out = Pipelines.republishKeywords(fanned, col("after.id"), col("event_time"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val key = r.getAs[String]("key")
      assert(key.matches("article_\\d+"), key)
      val v = r.getAs[String]("value")
      assert(v.contains("\"keywords\":[") && v.contains("\"keyword_classes\":{") &&
        v.contains("\"extraction_method\":\"graft-regex\"") &&
        v.contains("\"timestamp\":\""), v.take(200))
    }
    // classification ladder spot check through the payload
    val classes = Seq("ab", "x9", "general-word").toDF("kw")
      .select(Text.classifyKeyword(col("kw"))).as[String].collect().toSeq
    assert(classes == Seq("short", "numeric", "general"))
  }

  test("quality filter drops short content before fan-out") {
    val rows = Seq(
      """{"op":"c","after":{"id":1,"content":"short"},"source":{"table":"articles"},"ts_ms":1704067200000}""",
      """{"op":"c","after":{"id":2,"content":"this content is definitely long enough to pass the fifty char gate"},"source":{"table":"articles"},"ts_ms":1704067200000}"""
    ).toDF("value")
    val out = dag(rows).select(sum(col("cnt"))).collect().head.getLong(0)
    // 'is'/'to'/'the' are stopwords; 'definitely' exceeds the length-8 cap
    val expected = Seq("this", "content", "long", "enough", "pass", "fifty", "char", "gate").length
    assert(out == expected)
  }
}
