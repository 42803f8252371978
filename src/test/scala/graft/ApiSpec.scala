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

  test("Index.build* commits the layout and returns a serving handle") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Index
    val root = java.nio.file.Files.createTempDirectory("idxbuild").toString
    val emb = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 200)
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") < 60)
    val pq = Index.buildIvfPq(emb, 8, s"$root/ivfpq")
    assert(pq.kind == "ivf-pq" && pq.search(7L, 5).count() == 5)
    val ivf = Index.buildIvf(emb, 8, s"$root/ivf")
    assert(ivf.kind == "ivf" && ivf.search(7L, 5).count() == 5)
    val lsh = Index.buildLsh(docs, col("doc_id"), col("text"), s"$root/lsh")
    assert(lsh.kind == "lsh")
    // the returned handle and a fresh open agree on kind + params
    assert(Index.open(spark, s"$root/ivfpq").kind == "ivf-pq")
  }

  test("IvfPq handle: auto shortlist derives from corpus size and tracks mutations") {
    import org.apache.spark.sql.functions.col
    import graft.operators.{Index, Similarity}
    val root = java.nio.file.Files.createTempDirectory("idxauto").toString
    val emb = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 300)
    val pq = Index.buildIvfPq(emb, 8, s"$root/ivfpq")
    // the handle knows its corpus from the list_sizes histogram
    assert(pq.nVectors == 300)
    // at this size the auto default IS the floor (pre-r12 behavior):
    // the default-shortlist search equals the explicit-floor search
    assert(Similarity.autoShortlist(300, 8, 4, 5) == Similarity.ShortlistFloor)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(rows(pq.search(7L, 5)) ==
      rows(pq.search(7L, 5, shortlist = Similarity.ShortlistFloor)))
    // mutations refresh the derived size through the handle
    pq.delete(emb.filter(col("vec_id") < 5).select(col("vec_id")))
    assert(pq.nVectors == 295)
    pq.upsert(emb.filter(col("vec_id") < 2))
    assert(pq.nVectors == 297)
    // rebuild (retrain) refreshes too and serving still works
    pq.rebuild()
    assert(pq.nVectors == 297 && pq.search(7L, 5).count() == 5)
  }

  test("Index.open dispatches on the manifest: ivf-pq, ivf and lsh handles all serve") {
    import org.apache.spark.sql.functions.col
    import graft.operators.{Dedup, Index, Similarity}
    val root = java.nio.file.Files.createTempDirectory("idxopen").toString
    val emb = Tables.embeddings(spark, sf0001).filter(col("vec_id") < 300)
    val docs = Tables.documents(spark, sf0001).filter(col("doc_id") < 100)
    Similarity.buildIvfIndex(emb, 8, s"$root/ivf")
    Similarity.buildIvfPqIndex(emb, 8, s"$root/ivfpq")
    Dedup.writeLshIndex(docs, col("doc_id"), col("text"), s"$root/lsh")

    // IVF-PQ: preloaded-codebook serving, identical to the direct call
    val pq = Index.open(spark, s"$root/ivfpq") match {
      case h: Index.IvfPq => h
      case other => fail(s"expected ivf-pq, got ${other.kind}")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(rows(pq.search(7L, 5, nProbe = 4, shortlist = 25)) ==
      rows(Similarity.ivfPqSearchIndexed(spark, s"$root/ivfpq", 4, 7L, 5, 25)
        .select(col("vec_id"), col("label"), col("sim"))))
    assert(pq.searchBatch(emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding")), 5).count() == 10)
    assert(pq.stats().listSizes.values.sum == 300)

    // plain IVF: exact-cosine probe serving
    val ivf = Index.open(spark, s"$root/ivf") match {
      case h: Index.Ivf => h
      case other => fail(s"expected ivf, got ${other.kind}")
    }
    val got = ivf.search(7L, 5, nProbe = 8).collect().map(_.getLong(0)).toSeq
    assert(got == Similarity.ivfSearchIndexed(spark, s"$root/ivf", 8, 7L, 5)
      .collect().map(_.getLong(0)).toSeq)

    // LSH: incremental pairs with the INDEX's own banding params
    val lsh = Index.open(spark, s"$root/lsh") match {
      case h: Index.Lsh => h
      case other => fail(s"expected lsh, got ${other.kind}")
    }
    val batch = Tables.documents(spark, sf0001)
      .filter(col("doc_id") >= 100 && col("doc_id") < 150)
    val viaHandle = lsh.pairs(batch, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Dedup.incrementalLshPairsIndexed(batch, col("doc_id"),
        col("text"), s"$root/lsh")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaHandle == direct)

    // query-by-vector (un-indexed embedding): feeding vector 7's own
    // embedding must rank vector 7 first at sim 1.0, followed exactly
    // by the id-based search's results (which self-exclude)
    val e7 = emb.filter(col("vec_id") === 7L)
      .select(col("embedding")).head().getSeq[Float](0).toSeq
    val byVec = pq.searchVector(e7, 6, nProbe = 4, shortlist = 26).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(byVec.head._1 == 7L && byVec.head._2 == 1.0,
      s"own embedding must rank itself first: ${byVec.toSeq}")
    val byId = Similarity.ivfPqSearchIndexed(spark, s"$root/ivfpq", 4, 7L, 5, 25)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(byVec.tail.toSeq == byId, s"${byVec.tail.toSeq} != $byId")
    val ivfByVec = ivf.searchVector(e7, 3, nProbe = 8).collect()
    assert(ivfByVec.head.getLong(0) == 7L)

    // mutations route through the same layout: delete shrinks the pq
    // index by exactly the deleted row
    pq.delete(emb.filter(col("vec_id") === 7L).select(col("vec_id")))
    assert(pq.stats().listSizes.values.sum == 299)
    assert(Index.open(spark, s"$root/ivfpq").kind == "ivf-pq")
  }
}
