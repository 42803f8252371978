package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.{TimeSeries, Trend, WordCloud}

/** Query-API surface mirroring the reference's REST endpoints
  * (SURVEY §3.3): each method returns the endpoint's result as a
  * DataFrame over the engine's state tables instead of a Redis/JPA
  * round-trip storm. A serving tier pages these out; the engine's job
  * ends at the DataFrame.
  *
  * `articles`: any document-shaped table (doc_id, text, lang, source);
  * `events`:   the keyword/event stream with (ts, event_type, user_id).
  */
class Api(articles: DataFrame, events: DataFrame) {

  private def hourly =
    TimeSeries.epochBucketCounts(events, col("ts"), col("event_type"), 3600)

  /** GET /trending-keywords-advanced?limit= (ks/main.py:555-582):
    * compound-score ranked keys. One aggregation job replaces ~400
    * sequential Redis reads per request (SURVEY §3.3). */
  def trendingKeywordsAdvanced(limit: Int = 20): DataFrame =
    Trend.metricsAtAnchor(hourly)
      .orderBy(col("compound").desc, col("key"))
      .limit(limit)

  /** GET /keyword-timeline/{kw} (ks/main.py:584-588): minute-bucket
    * counts for one key, chronological. */
  def keywordTimeline(keyword: String): DataFrame =
    events.filter(col("event_type") === keyword)
      .groupBy(date_format(col("ts"), "yyyyMMddHHmm").as("minute"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("minute"))

  /** GET /wordcloud/{window} (ks/main.py:618-627): ranked top-k token
    * snapshot with presentation attributes. */
  def wordcloud(k: Int = 50): DataFrame = {
    val counts = articles
      .select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    WordCloud.snapshot(counts, k)
  }

  /** GET /api/v1/articles (ArticleController.java:30-37 +
    * ArticleServiceImpl.java:190-238): composable dynamic predicates
    * (F6/F7), dynamic sort (O2), page/size pagination (O3). Pagination
    * is top-(page·size) + rank — never a global sort. */
  def searchArticles(
      keyword: Option[String] = None,
      source: Option[String] = None,
      lang: Option[String] = None,
      sortBy: String = "doc_id",
      ascending: Boolean = true,
      page: Int = 0,
      size: Int = 20): DataFrame = {
    val conds: Seq[Column] = Seq(
      keyword.map(k => lower(col("text")).contains(k.toLowerCase)),
      source.map(col("source") === _),
      lang.map(col("lang") === _)).flatten
    val filtered = conds.foldLeft(articles)(_ filter _)
    val ord = if (ascending) Seq(col(sortBy).asc, col("doc_id").asc)
      else Seq(col(sortBy).desc, col("doc_id").asc)
    val w = Window.orderBy(ord: _*)
    filtered
      .orderBy(ord: _*).limit((page + 1) * size)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > page * size)
      .drop("rn")
  }

  /** GET /stats category breakdown (A10, ArticleRepository.java:56-65). */
  def categoryStats: DataFrame =
    articles.groupBy(col("lang").as("category"))
      .agg(count(lit(1)).as("n"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .orderBy(col("category"))

  /** A11 count-by-category (ArticleRepository.java:32-33). */
  def countByCategory: DataFrame =
    articles.groupBy(col("lang").as("category")).agg(count(lit(1)).as("n"))
      .orderBy(col("category"))

  /** A12 distinct counts (ArticleRepository.java:38-45). */
  def distinctCounts: DataFrame =
    articles.agg(
      countDistinct(col("lang")).as("n_categories"),
      countDistinct(col("source")).as("n_sources"))

  /** A13/A14 stream stats: newest event + daily volumes
    * (ArticleRepository.java:50-51,70-79). */
  def dailyCounts(days: Int = 7): DataFrame =
    events.groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day").desc)
      .limit(days)

  /** A17 processing counters (ks/main.py:88,148): one pass. */
  def pipelineStats: DataFrame =
    events.agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("event_type")).as("n_types"),
      max(col("ts")).cast("date").cast("string").as("last_day"))
}
