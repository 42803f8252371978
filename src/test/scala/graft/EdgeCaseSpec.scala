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

  test("dmean equals exact-sum / count and is partitioning-independent") {
    val xs = Seq(0.1, 0.2, 0.3, 1e9, -1e9, 0.4)
    val expected = (xs.map(BigDecimal(_).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      / xs.length).toDouble
    val a = xs.toDF("x").agg(Exact.dmean(col("x"))).collect().head.getDouble(0)
    val b = xs.toDF("x").repartition(5).agg(Exact.dmean(col("x"))).collect().head.getDouble(0)
    assert(a == expected && b == expected)
  }

  test("curation edges: empty text, empty inputs, oversized single doc") {
    import graft.operators.{Curation, Quantization}
    // empty / 1-char text → exactly one chunk, text preserved
    val tiny = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
    val ch = Curation.chunkByChars(tiny, col("doc_id"), col("text"), 200, 50)
      .as[(Long, Int, String)].collect().sortBy(_._1)
    assert(ch.toSeq == Seq((1L, 0, ""), (2L, 0, "x")))
    // empty inputs flow through every curation operator without error
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.withSplit(empty, col("doc_id")).count() == 0)
    assert(Curation.repetitionStats(empty, col("doc_id"), col("text")).count() == 0)
    assert(Curation.curateStream(empty, col("doc_id"), col("text")).count() == 0)
    assert(Curation.packIntoContexts(empty, col("doc_id"), col("doc_id"),
      lit(1), 10).count() == 0)
    val emptyEmb = Seq.empty[(Long, Seq[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(Quantization.withInt8(emptyEmb).count() == 0)
    // a single doc bigger than the pack budget still starts at pack 0
    // offset 0 and pushes the NEXT doc into a later pack
    val big = Seq((1L, "s", 500), (2L, "s", 10)).toDF("doc_id", "shard", "n")
    val packed = Curation.packIntoContexts(big, col("shard"), col("doc_id"), col("n"), 128)
      .select(col("doc_id"), col("pack_id"), col("pack_offset"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(packed(0) == ((1L, 0L, 0L)))
    assert(packed(1) == ((2L, 500L / 128L, 500L % 128L)))
  }

  test("search with no filters returns everything; unknown lang returns nothing") {
    val api = new Api(Tables.documents(spark, sf0001), Tables.events(spark, sf0001))
    assert(api.searchArticles(size = 10000).count() == 500)
    assert(api.searchArticles(lang = Some("xx"), size = 10).count() == 0)
  }

  test("dup clusters on an empty pair list → empty output, loop terminates") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.operators.Dedup.dupClusters(empty).count() == 0)
  }

  test("as-of with an empty right side → every left row gets null") {
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "ev")
    val right = Seq.empty[(Long, Long, Double)].toDF("k", "rts", "v")
    val out = graft.operators.Joins.asof(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("asof_v")))
  }

  test("rank-delta with topN below the key domain ranks only the head") {
    // 3 keys, topN=2: the third key must not appear in either snapshot
    val cur = Seq(("a", 10L), ("b", 5L), ("c", 1L)).toDF("key", "cnt")
    val prev = Seq(("c", 9L), ("b", 6L), ("a", 2L)).toDF("key", "cnt")
    val out = graft.operators.TimeSeries.rankDelta(cur, prev, topN = 2)
      .collect().map(r => r.getAs[String]("key") -> r.getAs[String]("movement")).toMap
    // snapshots only ever contain the top-K (the reference's Redis
    // semantics): a is outside prev's top-2 → "new"; c fell out → "dropped"
    assert(out("a") == "new" && out("b") == "stable" && out("c") == "dropped")
    assert(out.size == 3)
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

  test("duplicateSpans: all-short corpus yields no rows; dup_ppm spans the full range") {
    val shorties = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(graft.operators.Dedup.duplicateSpans(shorties, col("doc_id"), col("text"))
      .count() == 0)
    // two identical 8-token docs: every window duplicated → 1e6 ppm
    val t = "t1 t2 t3 t4 t5 t6 t7 t8"
    val full = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.duplicateSpans(full, col("doc_id"), col("text"))
      .collect()
    assert(rows.length == 2 && rows.forall(_.getLong(3) == 1000000L))
  }

  test("vocabCoverage with an empty vocab marks every token OOV") {
    val corpus = Seq((1L, "a b c")).toDF("id", "text")
    val emptyVocab = Seq.empty[(Long, String, Long)].toDF("token_id", "token", "cnt")
    val r = graft.functions.Text.vocabCoverage(corpus, col("id"), col("text"), emptyVocab)
      .collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 3 && r.getLong(3) == 1000000L)
  }

  test("pagerank on a two-node cycle is uniform 0.5") {
    val pr = graft.operators.Graphs.pagerank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .collect().map(_.getDouble(1))
    assert(pr.toSeq == Seq(0.5, 0.5))
  }

  test("similarProfiles: z-normalization makes scaled copies distance-0; flat profiles rank last") {
    // user 1 = user 0's shape x3 (same z-profile -> dist 0);
    // user 2 = flat (sd 0 -> all-zero z, maximal distance to a shaped query)
    val ev = (Seq.fill(5)((0L, 9)) ++ Seq.fill(2)((0L, 14)) ++
      Seq.fill(15)((1L, 9)) ++ Seq.fill(6)((1L, 14)) ++
      (0 until 24).map(h => (2L, h))).toDF("user_id", "h")
    val out = graft.operators.TimeSeries.similarProfiles(
      ev, col("user_id"), col("h"), queryKey = 0L, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.head._1 == 1L && out.head._2 == 0.0,
      s"scaled copy must be distance 0: ${out.toSeq}")
    assert(out.last._1 == 2L && out.last._2 > 0.0)
  }

  test("snapshotDiff against an empty side labels everything added/removed") {
    val v = Seq((1L, "x")).toDF("id", "text")
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val added = graft.operators.Curation.snapshotDiff(empty, v, "id", md5(col("text")))
      .collect().map(_.getString(1)).toSeq
    val removed = graft.operators.Curation.snapshotDiff(v, empty, "id", md5(col("text")))
      .collect().map(_.getString(1)).toSeq
    assert(added == Seq("added") && removed == Seq("removed"))
  }
}
