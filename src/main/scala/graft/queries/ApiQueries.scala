package graft.queries

import org.apache.spark.sql.functions._

import graft.api.Api
import graft.sources.Tables

/** The REST-mirroring API surface under the oracle gate: dynamic
  * search with pagination (F6/F7/O2/O3) and the compound-score
  * trending endpoint (W7/O1).
  */
object ApiQueries {
  import QueryDef.sql

  private def api(s: org.apache.spark.sql.SparkSession, d: String) =
    new Api(Tables.documents(s, d), Tables.events(s, d))

  val q53 = sql(
    "q53_api_search",
    """SELECT doc_id, text, lang, source, n_chars FROM documents
      |WHERE lang = 'en' ORDER BY n_chars DESC, doc_id
      |OFFSET 10 LIMIT 10""".stripMargin) { (s, d) =>
    api(s, d).searchArticles(lang = Some("en"), sortBy = "n_chars",
      ascending = false, page = 1, size = 10)
      .orderBy(col("n_chars").desc, col("doc_id"))
  }

  val q54 = sql(
    "q54_api_trending", {
      val inner = TrendQueries.q43.oracle.get
      s"SELECT * FROM ($inner) t ORDER BY compound DESC, key LIMIT 3"
    }) { (s, d) =>
    api(s, d).trendingKeywordsAdvanced(3)
  }

  val all: Seq[QueryDef] = Seq(q53, q54)
}
