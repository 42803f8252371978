package graft

import org.apache.spark.sql.functions._

import graft.api.Api
import graft.functions.Exact
import graft.operators.WordCloud
import graft.sources.Tables

/** Remaining edge coverage: presentation-ladder totality, exact
  * product-sum arithmetic, API degenerate inputs. */
class EdgeCaseSpec extends SparkSuite {
  init()
  import spark.implicits._

  test("wordcloud ladder is total and monotone non-increasing over ranks 1..120") {
    val sizes = (1 to 120).toDF("rank")
      .select(WordCloud.sizeFor(col("rank")).cast("int").as("s"),
        WordCloud.colorFor(col("rank")).as("c"),
        WordCloud.animationFor(col("rank")).as("a"))
      .collect()
    val s = sizes.map(_.getInt(0)).toSeq
    assert(s == s.sorted.reverse, "sizes must not increase with rank")
    assert(s.head == 60 && s.last == 15)
    assert(sizes.map(_.getInt(1)).forall(c => c >= 0 && c <= 11))
    assert(sizes.map(_.getString(2)).toSet == Set("pulse", "glow", "fade"))
  }

  test("prodSum equals BigDecimal arithmetic") {
    val rows = Seq((1.15, 0.05), (2.37, 0.01), (100.99, 0.10))
    val got = rows.toDF("a", "b")
      .agg(Exact.prodSum(col("a"), lit(1.0) - col("b"))).collect().head.getDouble(0)
    val expected = rows.map { case (a, b) =>
      BigDecimal(a).setScale(2) * (BigDecimal(1).setScale(2) - BigDecimal(b).setScale(2))
    }.sum.toDouble
    assert(got == expected)
  }

  test("search with no filters returns everything; unknown lang returns nothing") {
    val api = new Api(Tables.documents(spark, sf0001), Tables.events(spark, sf0001))
    assert(api.searchArticles(size = 10000).count() == 500)
    assert(api.searchArticles(lang = Some("xx"), size = 10).count() == 0)
  }

  test("trend metrics on a single-bucket corpus degrade gracefully") {
    val hourly = Seq((5L, "only", 7L)).toDF("bucket", "key", "cnt")
    val m = graft.operators.Trend.metricsAtAnchor(hourly).collect().head
    assert(m.getDouble(4) == 14.0) // velocity boost: prev = 0
    assert(m.getDouble(5) == 0.0)  // z over empty history
    // a brand-new spiking key is 'rising' per the reference ladder
    // (v1h=14>2 and v6h=7/6>1, advanced_trend_analyzer.py:199-206)
    assert(m.getString(7) == "rising")
  }
}
