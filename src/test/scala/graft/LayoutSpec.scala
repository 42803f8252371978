package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.Pipelines

/** Storage-layout scale evidence (SURVEY §4.2): date-partitioned
  * tables prune files before IO; plus the streaming natural-key dedup
  * (F9 streaming form). */
class LayoutSpec extends SparkSuite {
  init()
  import spark.implicits._

  test("date-partitioned layout prunes partitions at the scan") {
    val dir = Files.createTempDirectory("part").toString + "/events_by_day"
    val ev = Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.partitionBy("day").parquet(dir)

    val filtered = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters:") && scan.contains("2024-01-05"),
      s"partition filter not pushed:\n$scan")
    // pruned result matches the unpartitioned filter
    val expected = ev.filter(col("day") === "2024-01-05").count()
    assert(filtered.count() == expected && expected > 0)
  }

  test("persisted IVF index: probe reads only its list partitions") {
    val idx = Files.createTempDirectory("ivf").toString + "/index"
    graft.operators.Similarity.buildIvfIndex(
      Tables.embeddings(spark, sf0001), 8, idx)
    val res = graft.operators.Similarity.ivfSearchIndexed(spark, idx, 2, 0L, 5)
    val scans = res.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains(idx.split("/").last))
    assert(scans.nonEmpty)
    // the corpus-side scan must carry a list_id partition filter (the
    // centroid/query scans are vec_id-filtered and may read all lists)
    val pruned = scans.exists { s =>
      val i = s.indexOf("PartitionFilters: [")
      i >= 0 && s.substring(i, math.max(s.indexOf("]", i), i)).contains("list_id")
    }
    assert(pruned, s"no partition filter on list_id:\n${scans.mkString("\n---\n")}")
    assert(res.count() > 0)
  }

  test("IVF index rebuild: versioned commit, orphan ignored, old version swept") {
    import graft.operators.{Similarity, VersionedIndex}
    val idx = Files.createTempDirectory("ivf2").toString + "/index"
    val emb = Tables.embeddings(spark, sf0001)
    Similarity.buildIvfIndex(emb, 8, idx)
    assert(VersionedIndex.currentDir(spark, idx).exists(_.endsWith("/v=1")))
    val r1 = Similarity.ivfSearchIndexed(spark, idx, 2, 0L, 5)
      .collect().map(_.getLong(0)).toSet
    // a crashed rebuild (uncommitted v=2) must not affect readers
    Files.createDirectories(java.nio.file.Paths.get(idx, "v=2", "lists"))
    assert(VersionedIndex.currentDir(spark, idx).exists(_.endsWith("/v=1")))
    // full rebuild sweeps the orphan, commits v=2, removes v=1
    Similarity.buildIvfIndex(emb, 8, idx)
    assert(VersionedIndex.currentDir(spark, idx).exists(_.endsWith("/v=2")))
    assert(!Files.exists(java.nio.file.Paths.get(idx, "v=1")))
    assert(VersionedIndex.readParams(spark, s"$idx/v=2") == Map("nLists" -> "8"))
    val r2 = Similarity.ivfSearchIndexed(spark, idx, 2, 0L, 5)
      .collect().map(_.getLong(0)).toSet
    assert(r2 == r1, "identical corpus + params must search identically")
  }

  test("IVF index upsert: new vectors join existing lists, centroids stay anchored") {
    import graft.operators.{Similarity, VersionedIndex}
    import org.apache.spark.sql.functions.{col, countDistinct}
    val idx = Files.createTempDirectory("ivf3").toString + "/index"
    val emb = Tables.embeddings(spark, sf0001)
    val initial = emb.filter(col("vec_id") < 400)
    Similarity.buildIvfIndex(initial, 8, idx)
    val v1 = spark.read.parquet(s"$idx/v=1/lists")
    val centroidIds = v1.filter(col("vec_id") === col("list_id").cast("long"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(centroidIds.nonEmpty)

    // batch: the remaining vectors PLUS a re-ingested centroid (its
    // embedding unchanged here; the pin keeps its own list id) and a
    // re-ingested non-centroid
    val someCentroid = centroidIds.min
    val batch = emb.filter(col("vec_id") >= 400)
      .unionByName(emb.filter(col("vec_id") === someCentroid))
      .unionByName(emb.filter(col("vec_id") === 399L))
    Similarity.upsertIvfIndex(batch, idx)
    assert(VersionedIndex.currentDir(spark, idx).exists(_.endsWith("/v=2")))
    val v2 = spark.read.parquet(s"$idx/v=2/lists")
      .select(col("vec_id"), col("list_id").cast("long").as("list_id"))
    // every vector exactly once
    assert(v2.count() == emb.count())
    assert(v2.select(countDistinct(col("vec_id"))).head.getLong(0) == emb.count())
    // centroid set unchanged and anchored (vec_id == list_id rows)
    val c2 = v2.filter(col("vec_id") === col("list_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(c2 == centroidIds, s"centroids must survive upsert: $c2 vs $centroidIds")
    // new vectors landed in EXISTING lists only
    val lists2 = v2.select("list_id").distinct().collect().map(_.getLong(0)).toSet
    assert(lists2 == centroidIds)
    // search over the upserted index can return post-upsert vectors
    val res = Similarity.ivfSearchIndexed(spark, idx, 8, someCentroid, 500)
    assert(res.count() == emb.count() - 1, "full-probe search sees every vector")
  }

  test("streaming vector ingest: batches bootstrap then upsert the IVF index atomically") {
    import graft.operators.{Similarity, VersionedIndex}
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("vecing").toString
    val idx = s"$base/index"
    val emb = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding")
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getSeq[Float](2))).sortBy(_._1)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Int, Seq[Float])]
    val sdf = stream.toDF().toDF("vec_id", "label", "embedding")
    val q = graft.streaming.Pipelines.vectorIngestSink(sdf, idx, s"$base/ckpt",
      nLists = 8,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    val (a, b) = rows.splitAt(rows.length / 2)
    stream.addData(a.toIndexedSeq)
    q.processAllAvailable()
    assert(VersionedIndex.currentDir(spark, idx).exists(_.endsWith("/v=1")))
    stream.addData(b.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    assert(VersionedIndex.currentDir(spark, idx).exists(_.endsWith("/v=2")))
    // every vector searchable after two triggers; cast embeddings back
    // to float on read parity is preserved by parquet round-trip
    val res = Similarity.ivfSearchIndexed(spark, idx, 8, 0L, 500)
    assert(res.count() == rows.length - 1, "full probe sees every ingested vector")
  }

  test("streaming dedup by natural key drops duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)](11, spark, None)
    val out = Pipelines.dedupByKey(
      stream.toDF().toDF("ts", "link"), Seq("link"), "ts")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 00:01:00")
    stream.addData((t0, "a"), (t0, "b"), (t0, "a")) // in-batch dup
    q.processAllAvailable()
    stream.addData((t1, "a"), (t1, "c")) // cross-batch dup within watermark
    q.processAllAvailable()
    val links = spark.table("dedup").select("link").as[String].collect().sorted.toSeq
    assert(links == Seq("a", "b", "c"), s"got $links")
    q.stop()
  }

  test("streaming content dedup: re-encoded duplicates collapse across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)](12, spark, None)
    val out = Pipelines.dedupByContent(
      stream.toDF().toDF("ts", "text"), "text", "ts")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cdedup").start()
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 00:01:00")
    stream.addData((t0, "Hello   World"), (t0, "different text"))
    q.processAllAvailable()
    // same content after normalization (case/punct/whitespace) arriving later
    stream.addData((t1, "hello, world!"), (t1, "brand new"))
    q.processAllAvailable()
    // Unicode-form duplicates: precomposed vs decomposed é — the same
    // word from two crawlers. Without the NFC-first fingerprint the
    // regex strips the precomposed char whole but leaves the
    // decomposed base letter, so they would NOT collapse.
    stream.addData((t1, "café hello"), (t1, "café hello"))
    q.processAllAvailable()
    val texts = spark.table("cdedup").select("text").as[String].collect().toSeq
    assert(texts.length == 4, s"NFC variants must collapse to one row: $texts")
    assert(texts.count(t => t == "café hello" || t == "café hello") == 1)
    q.stop()
  }
}
