package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.Pipelines

/** The streaming corpus factory end-to-end (round-6 upsert primitive
  * composed): curation funnel → incremental LSH dedup against the
  * persisted index → atomic index upsert → batch-scoped landing zone.
  * Replay of a batch must converge to the same corpus state.
  */
class CorpusFactorySpec extends SparkSuite {
  init()
  import spark.implicits._

  // four genuinely distinct English documents (≥30 tokens, disjoint
  // content vocabulary, en-marker stopwords present)
  private val docA = "the ancient library holds thousands of rare manuscripts " +
    "and the curators carefully restore faded pages while scholars from " +
    "distant universities request access to study medieval bindings inks " +
    "and marginal annotations preserved under controlled humidity for " +
    "future generations"
  private val docB = "the mountain expedition began before dawn and the " +
    "climbers traced a narrow ridge above the glacier while porters carried " +
    "supplies toward the high camp where meteorologists monitored wind " +
    "pressure and visibility before granting the final ascent window"
  private val docC = "the harbor market opens with fishermen unloading crates " +
    "of mackerel and the vendors arrange octopus squid and clams on crushed " +
    "ice while chefs negotiate morning prices and gulls circle the pier " +
    "waiting for scraps near the auction bell"
  private val docD = "the orchestra rehearsed the new symphony and the " +
    "conductor adjusted tempo through the difficult passage while violinists " +
    "marked bowings cellists tuned against the oboe and the composer " +
    "listened from the balcony taking notes for revisions"

  private def landedIds(path: String): Set[Long] =
    spark.read.parquet(path).select("doc_id").collect().map(_.getLong(0)).toSet

  private def indexIds(idx: String): Set[Long] =
    Dedup.readLshTable(spark, idx, "shingles")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet

  test("corpus factory: funnel → incremental dedup → index upsert → landing, replay-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("cfactory").toString
    val (idx, land) = (s"$base/idx", s"$base/land")
    val stream = MemoryStream[(Long, String)]
    val sdf = stream.toDF().toDF("doc_id", "text")
    val q = Pipelines.corpusFactorySink(sdf, idx, land, s"$base/ckpt",
      minQuality = 0.5,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))

    // batch 0: doc 2 near-dups doc 1 (greedy min-id keeps 1), doc 3 is
    // distinct, doc 4 fails the token gate
    stream.addData((1L, docA), (2L, docA + " extra tail"),
      (3L, docB), (4L, "too short"))
    q.processAllAvailable()
    assert(landedIds(s"$land/batch=0") == Set(1L, 3L))
    assert(Dedup.currentLshIndexDir(spark, idx).endsWith("/v=1"))
    assert(indexIds(idx) == Set(1L, 3L))

    // batch 1: doc 5 near-dups the INDEXED doc 3 (drops even though
    // 5 > 3 is irrelevant — corpus copy wins); doc 6 fresh; docs 7/8
    // near-dup each other within the batch (7 kept)
    stream.addData((5L, docB + " small tail"), (6L, docC),
      (7L, docD), (8L, docD + " more appended"))
    q.processAllAvailable()
    assert(landedIds(s"$land/batch=1") == Set(6L, 7L))
    assert(indexIds(idx) == Set(1L, 3L, 6L, 7L))
    q.stop()

    // crash-replay: re-apply batch 1 verbatim (same batchId) — the
    // landing overwrites, the index re-upserts the same rows, and the
    // corpus state is unchanged
    val batch1 = Seq((5L, docB + " small tail"), (6L, docC),
      (7L, docD), (8L, docD + " more appended")).toDF("doc_id", "text")
    Pipelines.applyCorpusFactoryBatch(spark, batch1, 1L, idx, land,
      minQuality = 0.5)
    assert(landedIds(s"$land/batch=1") == Set(6L, 7L))
    assert(indexIds(idx) == Set(1L, 3L, 6L, 7L))
    // whole landing zone = the deduped curated corpus
    assert(landedIds(land) == Set(1L, 3L, 6L, 7L))

    // landing layout contract (DISCRIMINATING case: without the
    // range-repartition + sort the assertions below fail — verified
    // by reverting the product lines): drive a batch of 6 docs that
    // all hash into ONE (split, shard) leaf; landed files must each
    // be doc_id-sorted with pairwise-DISJOINT id ranges (a leaf may
    // legitimately split across range partitions, but never into
    // hash-interleaved fragments), and the leaf holds ≤
    // shuffle-partitions files, not one per upstream task
    val candidates = spark.range(1000, 1500).select(col("id").as("doc_id"))
    val leafOf = graft.operators.Curation
      .withSplit(candidates, col("doc_id"))
      .withColumn("shard",
        graft.operators.Curation.hashBucket(col("doc_id"), "shard", 8))
    val targetIds = leafOf.collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("shard"), r.getAs[Long]("doc_id")))
      .groupBy(t => (t._1, t._2)).values.find(_.length >= 6).get
      .map(_._3).take(6).sorted.reverse.toSeq
    val (tSplit, tShard) = {
      val r = leafOf.filter(col("doc_id") === targetIds.head).collect()(0)
      (r.getAs[String]("split"), r.getAs[Long]("shard"))
    }
    val bulk = targetIds.map(i => (i,
      // en markers pass the language gate; the unique tail keeps the
      // docs mutually non-near-dup and the quality score high
      "the and of to in is " +
        (0 until 35).map(t => s"tok${i}x$t").mkString(" "))).toDF("doc_id", "text")
    Pipelines.applyCorpusFactoryBatch(spark, bulk, 2L, idx, land,
      minQuality = 0.5)
    val leaf = java.nio.file.Paths.get(
      s"$land/batch=2/split=$tSplit/shard=$tShard")
    val listStream = java.nio.file.Files.list(leaf)
    val parts = try listStream.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    finally listStream.close()
    assert(parts.nonEmpty &&
      parts.size <= spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"$leaf has ${parts.size} files")
    val perFile = parts.map { f =>
      val ids = spark.read.parquet(f.toString)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"$f not doc_id-sorted: $ids")
      (ids.min, ids.max)
    }
    perFile.sortBy(_._1).sliding(2).foreach {
      case Seq((_, hi), (lo, _)) =>
        assert(hi < lo, s"overlapping id ranges across landed files: $perFile")
      case _ =>
    }
    assert(spark.read.parquet(leaf.toString).count() == 6)
  }

  test("corpus factory: optional DSIR admission gate drops off-target docs") {
    val base = java.nio.file.Files.createTempDirectory("cfactory3").toString
    // fit ratios with docC as the target and docD as the raw tail —
    // docD's bigram buckets get negative log-ratios, docC's positive
    val fitDocs = Seq((100L, docC), (101L, docD)).toDF("doc_id", "text")
    val ratios = graft.operators.Curation.collectRatios(
      graft.operators.Curation.dsirRatios(
        fitDocs, col("text"), Seq((100L, docC)).toDF("doc_id", "text"), col("text")))
    // with a 2-doc fit corpus the shared function-word bigrams push
    // BOTH totals negative (q̂ > p̂ on doc-shared grams) — the gate is
    // a RELATIVE threshold: docC scores ~-0.3 nats, docD ~-22 nats,
    // so a floor between them admits only the target-like doc
    val b = Seq((21L, docC), (22L, docD)).toDF("doc_id", "text")
    Pipelines.applyCorpusFactoryBatch(spark, b, 0L, s"$base/idx", s"$base/land",
      minQuality = 0.5, dsirGate = Some((ratios, -1000000L)))
    assert(landedIds(s"$base/land/batch=0") == Set(21L),
      "only the target-like doc may pass the DSIR admission gate")
  }

  test("corpus factory: BPE-token admission gate == batch recompute of the trained budget") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cfbpe").toString
    // train the reference tokenizer on a held corpus, collect the
    // literal word→n_sym map the streaming gate consumes
    val fit = Seq((100L, docA), (101L, docB), (102L, docC), (103L, docD))
      .toDF("doc_id", "text")
    val state = graft.operators.Bpe.trainState(fit, col("text"), 5)
    val wordMap = state.collectWordTokenCounts()
    val batch = Seq((31L, docC), (32L, docD), (33L, docA + " " + docB))
      .toDF("doc_id", "text")
    // batch recompute of each candidate's BPE budget via the SAME map
    // (docs pass the quality funnel untouched by PII scrub, so the
    // gate sees the identical text)
    val budgets = batch.select(col("doc_id"),
      graft.operators.Bpe.bpeTokenCount(col("text"), wordMap).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = budgets.values.toSeq.sorted.apply(1) + 1 // admit only above the median doc
    val expectAdmitted = budgets.filter(_._2 >= cut).keySet
    assert(expectAdmitted.nonEmpty && expectAdmitted.size < budgets.size,
      s"test needs a discriminating budget: $budgets cut=$cut")
    Pipelines.applyCorpusFactoryBatch(spark, batch, 0L, s"$base/idx", s"$base/land",
      minQuality = 0.5, bpeGate = Some((wordMap, cut)))
    assert(landedIds(s"$base/land/batch=0") == expectAdmitted,
      "streaming literal-map gate must equal the batch recompute")
  }

  test("corpus factory: NB admission gate (join form) == the per-row column form") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cfnb").toString
    // weak labels: docC-flavored text is the positive class, docD the
    // negative — the trained llr signs separate the two vocabularies
    val fit = Seq((100L, docC, 1), (101L, docD, 0), (102L, docC + " fresh catch", 1),
      (103L, docD + " second movement", 0)).toDF("doc_id", "text", "y")
    val model = graft.functions.Text.nbTrain(fit, col("text"), col("y"))
    val batch = Seq((21L, docC), (22L, docD)).toDF("doc_id", "text")
    // expected admission via the STREAMING per-row column (bit-equal
    // to the join form by the StreamingConsistencySpec pin — here the
    // two forms must agree at the GATE, i.e. in composition)
    val local = graft.functions.Text.collectNbModel(model)
    val expect = batch.select(col("doc_id"),
        graft.functions.Text.nbScoreExpr(col("text"), local).as("s"))
      .filter(col("s") >= 0.0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(expect == Set(21L),
      s"test needs a discriminating model: admitted=$expect")
    Pipelines.applyCorpusFactoryBatch(spark, batch, 0L, s"$base/idx", s"$base/land",
      minQuality = 0.5, nbGate = Some((model, 0.0)))
    assert(landedIds(s"$base/land/batch=0") == expect,
      "the factory's join-form NB gate must equal the per-row column form")
    assert(indexIds(s"$base/idx") == expect)
  }

  test("corpus factory batch: at-least-once redelivery of a doc_id within one trigger commits once") {
    val base = java.nio.file.Files.createTempDirectory("cfactory3").toString
    // the same doc delivered twice in one trigger (the at-least-once
    // norm) must collapse to one committed row — the index boundary's
    // unique-id guard would otherwise kill the stream on a redelivery
    val b = Seq((1L, docA), (1L, docA), (2L, docB))
      .toDF("doc_id", "text")
    Pipelines.applyCorpusFactoryBatch(spark, b, 0L, s"$base/idx", s"$base/land")
    assert(landedIds(s"$base/land/batch=0") == Set(1L, 2L))
    assert(indexIds(s"$base/idx") == Set(1L, 2L))
    // one row per doc in the landing output, not one per delivery
    assert(spark.read.parquet(s"$base/land/batch=0").count() == 2)
  }

  test("corpus factory batch: curation gates attribute before dedup (batch mode)") {
    val base = java.nio.file.Files.createTempDirectory("cfactory2").toString
    // a near-dup PAIR where the lower id fails a gate: the higher id
    // must survive (gates run first; dropped docs never join dedup)
    val b = Seq((10L, "way too short to pass"), (11L, docC))
      .toDF("doc_id", "text")
    Pipelines.applyCorpusFactoryBatch(spark, b, 0L, s"$base/idx", s"$base/land",
      minQuality = 0.5)
    assert(landedIds(s"$base/land/batch=0") == Set(11L))
    assert(indexIds(s"$base/idx") == Set(11L))
  }

  test("post-landing balanced selection: survivors-only, per-cluster cap, dedup denies flood slots") {
    import graft.operators.Clustering
    // the q159 composition over the factory's own landing zone: land a
    // batch that contains a near-dup FLOOD (four copies of docA with
    // one token appended — same semantic mode), then run the
    // selection job over landed survivors + the embedding side table
    val base = java.nio.file.Files.createTempDirectory("cfactory3").toString
    val flood = (20L to 23L).map(i => (i, docA + s" appended$i"))
    val b = (flood ++ Seq((30L, docB), (31L, docC), (32L, docD)))
      .toDF("doc_id", "text")
    Pipelines.applyCorpusFactoryBatch(spark, b, 0L, s"$base/idx", s"$base/land",
      minQuality = 0.5)
    val landed = spark.read.parquet(s"$base/land/batch=0")
    val survivorIds = landedIds(s"$base/land/batch=0")
    assert(survivorIds.intersect(Set(21L, 22L, 23L)).isEmpty,
      s"the flood must dedup to one representative, landed $survivorIds")
    // embeddings for EVERY ingested doc (flood included): two tight
    // semantic modes, deterministic coordinates
    val emb = (flood.map(_._1) ++ Seq(30L, 31L, 32L)).map { i =>
      val mode = if (i < 30L) 0 else 1
      (i, (0 until 64).map(j =>
        (if (j % 2 == mode) 1.0f else 0.0f) + i * 0.001f).toArray, mode)
    }.toDF("vec_id", "embedding", "label")
    val sel = Clustering.corpusBalancedSelection(landed, col("doc_id"),
      emb, col("vec_id"), k = 2, passes = 2, n = 2)
    val selIds = sel.select("vec_id").collect().map(_.getLong(0)).toSet
    // selection ⊆ survivors: dropped near-dups never buy a slot even
    // though their embeddings sit in the side table
    assert(selIds.subsetOf(survivorIds), s"$selIds ⊄ $survivorIds")
    // balanced = capped per LEARNED cluster (≤ n each, everything
    // kept when the cluster is smaller)
    val perCluster = sel.groupBy("cluster").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perCluster.values.forall(_ <= 2), perCluster.toString)
    // deterministic: the same selection under a different input
    // partitioning (the stratified cut is a pure hash function)
    val selRepart = Clustering.corpusBalancedSelection(
      landed.repartition(7), col("doc_id"),
      emb.repartition(5), col("vec_id"), k = 2, passes = 2, n = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(selRepart == selIds)
  }
}
