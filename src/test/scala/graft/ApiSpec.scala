package graft

import graft.api.Api
import graft.sources.Tables

/** Endpoint-shaped API behavior: predicate composition, pagination
  * arithmetic, sort direction, ranking order. */
class ApiSpec extends SparkSuite {
  init()
  import spark.implicits._

  private lazy val api =
    new Api(Tables.documents(spark, sf0001), Tables.events(spark, sf0001))

  test("trending: ranked by compound desc, limited") {
    val rows = api.trendingKeywordsAdvanced(3).collect()
    assert(rows.length == 3)
    val scores = rows.map(_.getAs[Double]("compound")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("timeline: chronological minutes for one key") {
    val m = api.keywordTimeline("error").select("minute").as[String].collect().toSeq
    assert(m.nonEmpty && m == m.sorted)
  }

  test("wordcloud: k rows with rank 1..k") {
    val rows = api.wordcloud(10).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 10))
  }

  test("search: predicates compose (AND semantics)") {
    val all = api.searchArticles(size = 1000).count()
    val en = api.searchArticles(lang = Some("en"), size = 1000).count()
    val enKw = api.searchArticles(lang = Some("en"), keyword = Some("JOIN"), size = 1000).count()
    assert(en < all && enKw <= en && enKw > 0)
  }

  test("search: pagination pages are disjoint and ordered") {
    val p0 = api.searchArticles(page = 0, size = 5).select("doc_id").as[Long].collect().toSeq
    val p1 = api.searchArticles(page = 1, size = 5).select("doc_id").as[Long].collect().toSeq
    assert(p0.length == 5 && p1.length == 5)
    assert(p0.toSet.intersect(p1.toSet).isEmpty)
    assert((p0 ++ p1) == (p0 ++ p1).sorted) // ascending doc_id across pages
  }

  test("search: descending dynamic sort") {
    val chars = api.searchArticles(sortBy = "n_chars", ascending = false, size = 10)
      .select("n_chars").as[Long].collect().toSeq
    assert(chars == chars.sorted.reverse)
  }

  test("stats endpoints return sane shapes") {
    assert(api.categoryStats.columns.toSeq ==
      Seq("category", "n", "min_chars", "max_chars"))
    assert(api.countByCategory.count() == 5) // 5 langs
    val d = api.distinctCounts.collect().head
    assert(d.getAs[Long]("n_categories") == 5L)
    assert(api.dailyCounts(7).count() == 7)
    assert(api.pipelineStats.collect().head.getAs[Long]("n_types") == 5L)
  }
}
