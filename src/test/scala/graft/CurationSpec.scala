package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Curation operator invariants beyond the oracle gate: determinism,
  * split exhaustiveness, packing structure, decontamination recall,
  * repetition edge cases, scrub idempotence, shuffle permutation
  * properties. */
class CurationSpec extends SparkSuite {
  init()
  import spark.implicits._

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  test("withSplit: deterministic, exhaustive, and roughly proportional") {
    val a = Curation.withSplit(docs, col("doc_id"))
      .groupBy(col("split")).count().as[(String, Long)].collect().toMap
    val b = Curation.withSplit(docs, col("doc_id"))
      .groupBy(col("split")).count().as[(String, Long)].collect().toMap
    assert(a == b, "same salt+key must give the same split")
    assert(a.keySet == Set("train", "val", "test"))
    assert(a.values.sum == 500)
    assert(a("train") > 300, s"train should dominate an 80/10/10 split: $a")
    // a different salt moves documents between splits
    val moved = Curation.withSplit(docs, col("doc_id")).select(col("doc_id"), col("split"))
      .join(Curation.withSplit(docs, col("doc_id"), salt = "other")
        .select(col("doc_id"), col("split").as("split2")), "doc_id")
      .filter(col("split") =!= col("split2")).count()
    assert(moved > 0)
  }

  test("sampleByHash: stable subset, sane size, consistent with itself") {
    val s1 = Curation.sampleByHash(docs, col("doc_id"), 20).select("doc_id").as[Long].collect().toSet
    val s2 = Curation.sampleByHash(docs, col("doc_id"), 20).select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(s1.size > 50 && s1.size < 160, s"20% of 500 docs, got ${s1.size}")
    // a 10% sample with the same salt is a subset of the 20% sample
    val s3 = Curation.sampleByHash(docs, col("doc_id"), 10).select("doc_id").as[Long].collect().toSet
    assert(s3.subsetOf(s1), "smaller pct must nest inside larger pct")
  }

  test("packIntoContexts: offsets within budget, packs dense per shard, order respected") {
    val packed = Curation.packIntoContexts(docs, col("source"), col("doc_id"),
      graft.functions.Text.wsTokenCount(col("text")), 128)
      .select(col("source"), col("doc_id"), col("n_tok"), col("pack_id"), col("pack_offset"))
      .collect()
    assert(packed.forall(r => r.getLong(4) >= 0 && r.getLong(4) < 128))
    // within a shard, pack_id is non-decreasing in doc_id order and
    // starts at 0 with offset 0 for the first doc
    packed.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getLong(1))
      assert(ordered.head.getLong(3) == 0 && ordered.head.getLong(4) == 0)
      assert(ordered.map(_.getLong(3)).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("contaminationScores: identical text maxes the score; disjoint vocab is absent") {
    val bench = Seq((1000L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // identical → all shingles shared
      (2L, "alpha beta gamma other words here"),   // partial overlap
      (3L, "completely different vocabulary entirely")).toDF("doc_id", "text")
    val scores = Curation.contaminationScores(corpus, bench, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    assert(scores(1L) == 4, "6 tokens → 4 distinct 3-gram shingles, all shared")
    assert(scores(2L) == 1, "only 'alpha beta gamma' survives")
    assert(!scores.contains(3L), "no shared shingle → absent from scores")
  }

  test("repetitionStats: degenerate repetition and unique text bracket the range") {
    val df = Seq(
      (1L, "a a a a"),                   // top=4/4, bigrams: 3ב'a a' → dup 2/3
      (2L, "w x y z"),                   // all unique
      (3L, "solo")).toDF("doc_id", "text")
    val r = Curation.repetitionStats(df, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_tokens"), col("top_token_ppm"), col("dup_bigram_ppm"))
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 4L, 1000000L, 666666L)))
    assert(r(2L) == ((2L, 4L, 250000L, 0L)))
    assert(r(3L) == ((3L, 1L, 1000000L, 0L)), "single token → no bigrams → ratio 0")
  }

  test("PII scrub: counts match redactions, scrub is idempotent") {
    val df = Seq(
      (1L, "reach me at jane.doe@corp.example or 010-1234-5678 thanks"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.c and d.e@f.gh plus 02-555-0100")).toDF("id", "t")
    val out = df.select(col("id"),
      Curation.piiCount(col("t")).as("n"),
      Curation.scrubPii(col("t")).as("s")).as[(Long, Long, String)].collect()
      .map(t => t._1 -> t).toMap
    assert(out(1L)._2 == 2 && out(1L)._3.contains("[EMAIL]") && out(1L)._3.contains("[PHONE]"))
    assert(out(2L)._2 == 0 && out(2L)._3 == "no pii here at all")
    assert(out(3L)._2 == 3)
    // idempotent: scrubbing scrubbed text changes nothing and counts 0
    val rescrub = df.select(
      Curation.piiCount(Curation.scrubPii(col("t"))).as("n2"),
      (Curation.scrubPii(Curation.scrubPii(col("t"))) === Curation.scrubPii(col("t"))).as("same"))
      .as[(Long, Boolean)].collect()
    assert(rescrub.forall(r => r._1 == 0 && r._2))
  }

  test("hash membership is invariant under physical layout (repartition/coalesce)") {
    // THE property that distinguishes hash-derived membership from
    // rand()/sample(): the selected set cannot depend on how the data
    // is partitioned — which is also what makes it reproducible on a
    // 1000-executor cluster vs local[32].
    def ids(df: org.apache.spark.sql.DataFrame) =
      Curation.sampleByHash(df, col("doc_id"), 20).select("doc_id").as[Long].collect().toSet
    val base = ids(docs)
    assert(ids(docs.repartition(7)) == base)
    assert(ids(docs.coalesce(1)) == base)
    def splits(df: org.apache.spark.sql.DataFrame) =
      Curation.withSplit(df, col("doc_id")).select("doc_id", "split")
        .as[(Long, String)].collect().toMap
    assert(splits(docs.repartition(13)) == splits(docs))
  }

  test("inline top-token ppm equals the shuffle-based repetitionStats value") {
    val inline = docs.withColumn("_toks", graft.functions.Text.tokens(col("text")))
      .select(col("doc_id"),
        Curation.topTokenPpmInline(col("_toks")).as("ppm_inline"))
    val viaAgg = Curation.repetitionStats(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("top_token_ppm"))
    val diff = inline.join(viaAgg, "doc_id")
      .filter(col("ppm_inline") =!= col("top_token_ppm")).count()
    assert(diff == 0, "streaming-safe formulation must match the batch one")
  }

  test("curateStream: streaming replay equals the batch funnel, gates attribute correctly") {
    implicit val sqlCtx = spark.sqlContext
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val sdf = stream.toDF().toDF("doc_id", "text")
    val q = Curation.curateStream(sdf, col("doc_id"), col("text"))
      .writeStream.outputMode("append").format("memory").queryName("curated").start()
    val (a, b) = rows.splitAt(rows.size / 2)
    stream.addData(a); q.processAllAvailable()
    stream.addData(b); q.processAllAvailable()
    try {
      val streamed = spark.table("curated")
      val batch = Curation.curateStream(docs, col("doc_id"), col("text"))
      assert(streamed.count() == 500)
      assert(streamed.collect().map(_.toString).sorted.toSeq ==
        batch.collect().map(_.toString).sorted.toSeq)
      val verdicts = streamed.groupBy(col("verdict")).count()
        .as[(String, Long)].collect().toMap
      assert(verdicts.contains("keep") && verdicts.size >= 3,
        s"expected a populated funnel, got $verdicts")
    } finally q.stop()
  }

  test("curateStream: NULL text is drop:short, never a NULL-verdict 'keep' fall-through") {
    // r20 advisor fix: a NULL text row tokenizes to a NULL array, so
    // pre-fix n_tok was NULL (not 0), every when-condition evaluated
    // NULL, and the row fell through to 'keep' with a NULL nb_score —
    // violating the model gate's "NULL score ⇒ short-gated" invariant
    val model = graft.functions.Text.nbTrain(
      docs.filter(col("doc_id") % 2 === 0),
      col("text"), (col("lang") === "en").cast("int"))
    val local = graft.functions.Text.collectNbModel(model)
    val withNulls = docs.select(col("doc_id"), col("text"))
      .unionAll(Seq((100001L, null: String), (100002L, "")).toDF("doc_id", "text"))
    for (m <- Seq(None, Some(local))) {
      val out = Curation.curateStream(withNulls, col("doc_id"), col("text"),
        nbModel = m)
      val got = out.filter(col("doc_id") > 100000L)
        .select(col("doc_id"), col("verdict"), col("n_tok"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
      assert(got(100001L) == ("drop:short", 0), s"nbModel=$m: ${got(100001L)}")
      assert(got(100002L)._1 == "drop:short", s"nbModel=$m: ${got(100002L)}")
      // the invariant the verdict comment asserts: every NULL nb_score
      // row is short-gated first — no NULL verdict anywhere
      assert(out.filter(col("verdict").isNull).count() == 0)
    }
  }

  test("curateStream + NB model gate: stream == batch (keep-set equality), drop:model attributes last") {
    // the r19 composition: heuristics first, the learned filter after
    // (the CCNet order) — the per-row nbScoreExpr stage must keep the
    // funnel streaming-legal and bit-equal to the batch run (q155's
    // oracle pins the values; this pins the stream replay)
    implicit val sqlCtx = spark.sqlContext
    val model = graft.functions.Text.nbTrain(
      docs.filter(col("doc_id") % 2 === 0),
      col("text"), (col("lang") === "en").cast("int"))
    val local = graft.functions.Text.collectNbModel(model)
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val sdf = stream.toDF().toDF("doc_id", "text")
    val q = Curation.curateStream(sdf, col("doc_id"), col("text"),
        nbModel = Some(local))
      .writeStream.outputMode("append").format("memory").queryName("nbcurated").start()
    val (a, b) = rows.splitAt(rows.size / 2)
    stream.addData(a); q.processAllAvailable()
    stream.addData(b); q.processAllAvailable()
    try {
      val streamed = spark.table("nbcurated")
      val batch = Curation.curateStream(docs, col("doc_id"), col("text"),
        nbModel = Some(local))
      assert(streamed.count() == 500)
      assert(streamed.collect().map(_.toString).sorted.toSeq ==
        batch.collect().map(_.toString).sorted.toSeq,
        "stream rows (incl. nb_score) must equal the batch funnel bit-for-bit")
      val verdicts = streamed.groupBy(col("verdict")).count()
        .as[(String, Long)].collect().toMap
      assert(verdicts.contains("drop:model") && verdicts.contains("keep"),
        s"expected a populated model gate, got $verdicts")
      // model-gate attribution is LAST: every drop:model row passed
      // every heuristic gate
      val misattributed = streamed.filter(col("verdict") === "drop:model")
        .filter(col("n_tok") < 30 || col("quality") < 0.65 ||
          col("lang_guess") =!= "en" || col("top_token_ppm") > 300000L)
        .count()
      assert(misattributed == 0)
      // and the gate itself: drop:model ⇔ nb_score < 0 among heuristic
      // survivors
      val wrongGate = streamed
        .filter(col("verdict").isin("drop:model", "keep"))
        .filter((col("verdict") === "drop:model") =!= (col("nb_score") < 0.0))
        .count()
      assert(wrongGate == 0)
    } finally q.stop()
  }

  test("stratifiedSample: exactly n per stratum (or all when smaller), deterministic") {
    val s1 = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), 10)
      .groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    assert(s1.values.forall(_ == 10), s"every language stratum capped at 10: $s1")
    val s2 = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), 10)
      .select("doc_id").as[Long].collect().toSet
    val s3 = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), 10)
      .select("doc_id").as[Long].collect().toSet
    assert(s2 == s3, "same salt must select the same rows")
    // n larger than a stratum returns the whole stratum
    val all = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), 100000).count()
    assert(all == 500)
    // nested property: the 5-per-stratum sample is a subset of 10-per-stratum
    val small = Curation.stratifiedSample(docs, col("lang"), col("doc_id"), 5)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(s2))
  }

  test("chunkByChars: full coverage with exact overlap, short docs = one chunk") {
    val df = Seq(
      (1L, "a" * 450),  // 3 chunks: [0,200) [150,350) [300,450)
      (2L, "b" * 200),  // exactly one window
      (3L, "c" * 10)).toDF("doc_id", "text")
    val chunks = Curation.chunkByChars(df, col("doc_id"), col("text"), 200, 50)
      .as[(Long, Int, String)].collect().groupBy(_._1)
    assert(chunks(1L).length == 3)
    assert(chunks(1L).map(_._3.length).sorted.toSeq == Seq(150, 200, 200))
    assert(chunks(2L).length == 1 && chunks(2L).head._3.length == 200)
    assert(chunks(3L).length == 1 && chunks(3L).head._3 == "c" * 10)
    // reassembly: drop each chunk's first `overlap` chars (except chunk 0)
    // and concatenation restores the document
    val re = chunks(1L).sortBy(_._2).zipWithIndex.map {
      case ((_, _, c), 0) => c
      case ((_, _, c), _) => c.drop(50)
    }.mkString
    assert(re == "a" * 450)
  }

  test("curatedLandingSink: streaming keep-rows land split/shard-partitioned, equal to batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("landing").toString
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // data BEFORE start: AvailableNow snapshots available offsets when
    // the query starts, so rows added after can be skipped entirely
    // (observed as an empty landing dir on a slow first trigger)
    val (a, b) = rows.splitAt(rows.size / 2)
    stream.addData(a); stream.addData(b)
    val q = graft.streaming.Pipelines.curatedLandingSink(
      stream.toDF().toDF("doc_id", "text"), s"$dir/data", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(60000); q.stop()
    val landed = spark.read.parquet(s"$dir/data")
    val batchKeep = Curation.curateStream(docs, col("doc_id"), col("text"))
      .filter(col("verdict") === "keep")
    assert(landed.count() == batchKeep.count() && landed.count() > 0)
    // partition columns round-trip and are consistent with the operators
    val splits = landed.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    val reSplit = Curation.withSplit(landed.drop("split"), col("doc_id"))
    assert(landed.select(col("doc_id"), col("split"))
      .except(reSplit.select(col("doc_id"), col("split"))).count() == 0,
      "landed split partitions must equal recomputed split membership")
  }

  test("curatedLandingSink + NB gate: landed set == batch keep set under the model") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("landing-nb").toString
    val model = graft.functions.Text.collectNbModel(
      graft.functions.Text.nbTrain(docs.filter(col("doc_id") % 2 === 0),
        col("text"), (col("lang") === "en").cast("int")))
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    stream.addData(rows) // before start — the AvailableNow snapshot rule
    val q = graft.streaming.Pipelines.curatedLandingSink(
      stream.toDF().toDF("doc_id", "text"), s"$dir/data", s"$dir/ckpt",
      nbModel = Some(model),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(60000); q.stop()
    val landed = spark.read.parquet(s"$dir/data")
      .select("doc_id").as[Long].collect().toSet
    val batchKeep = Curation.curateStream(docs, col("doc_id"), col("text"),
        nbModel = Some(model))
      .filter(col("verdict") === "keep")
      .select("doc_id").as[Long].collect().toSet
    assert(landed == batchKeep && landed.nonEmpty)
    // the gate is live in the sink: without it, strictly more docs land
    val withoutGate = Curation.curateStream(docs, col("doc_id"), col("text"))
      .filter(col("verdict") === "keep").count()
    assert(withoutGate > landed.size,
      "the model gate must drop heuristic survivors in this corpus")
  }

  test("curatedLandingSink: checkpointed restart resumes exactly-once (file source)") {
    val dir = java.nio.file.Files.createTempDirectory("landing-restart").toString
    val src = s"$dir/src"
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val (a, b) = rows.splitAt(rows.size / 2)
    def srcStream() = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(src)
    def land() = {
      val q = graft.streaming.Pipelines.curatedLandingSink(
        srcStream(), s"$dir/data", s"$dir/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(60000); q.stop()
    }
    def keepCount(chunk: Seq[(Long, String)]) =
      Curation.curateStream(chunk.toDF("doc_id", "text"), col("doc_id"), col("text"))
        .filter(col("verdict") === "keep").count()

    a.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    land()
    assert(spark.read.parquet(s"$dir/data").count() == keepCount(a))

    // new files arrive while the query is DOWN; the restarted
    // incarnation (same checkpoint) must process only the new files
    b.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    land()
    val landed = spark.read.parquet(s"$dir/data")
    assert(landed.count() == keepCount(a) + keepCount(b),
      "restart must pick up exactly the unprocessed files")
    val dup = landed.groupBy(col("doc_id")).count().filter(col("count") > 1).count()
    assert(dup == 0, "no document lands twice across incarnations")
  }

  test("shuffleShards: a permutation — dense positions per shard, all docs once, salt changes order") {
    val s0 = Curation.shuffleShards(docs.select("doc_id"), col("doc_id"), 4, "e0")
      .select(col("doc_id"), col("shard"), col("pos"))
      .as[(Long, Long, Int)].collect()
    assert(s0.map(_._1).distinct.length == 500, "every doc exactly once")
    s0.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), "positions dense 1..n")
    }
    val s1 = Curation.shuffleShards(docs.select("doc_id"), col("doc_id"), 4, "e1")
      .select(col("doc_id"), col("shard"), col("pos"))
      .as[(Long, Long, Int)].collect()
    assert(s0.sortBy(_._1).map(t => (t._2, t._3)).toSeq !=
      s1.sortBy(_._1).map(t => (t._2, t._3)).toSeq, "new salt → new permutation")
  }

  test("bloomContamination: no false negatives vs exact shingle sharing; bitmap == position semi-join") {
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val bloom = Curation.bloomContamination(corpus, bench, col("doc_id"), col("text"))
      .select("doc_id", "n_bloom_hits").as[(Long, Long)].collect().toMap
    // one-sided error: every truly shared shingle sets all its bits
    val exact = Curation.contaminationScores(corpus, bench, col("doc_id"), col("text"))
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toMap
    exact.foreach { case (id, shared) =>
      assert(bloom(id) >= shared, s"doc $id: bloom ${bloom(id)} < exact $shared")
    }
    // bitmap test ≡ "all k positions inserted" (semi-join replay)
    val k = 3; val m = 8192
    val benchPos = graft.operators.Dedup.shingleSet(bench, col("doc_id"), col("text"), 3)
      .select(explode(array((0 until k).map(j =>
        Curation.bloomPos(col("shingle"), j, m)): _*)).as("pos"))
      .distinct()
    val cs = graft.operators.Dedup.shingleSet(corpus, col("doc_id"), col("text"), 3)
    val semiHits = (0 until k).map { j =>
      cs.withColumn("pos", Curation.bloomPos(col("shingle"), j, m))
        .join(benchPos, "pos").select("doc_id", "shingle").distinct()
    }.reduce(_.intersect(_))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val bloomNonzero = bloom.filter(_._2 > 0)
    assert(bloomNonzero == semiHits, "bitmap membership must equal the position semi-join")
  }

  test("mixtureSample: rates clamp at 1, kept fraction tracks the threshold, unknown domain drops") {
    val weights = Seq("en" -> 0.3, "de" -> 0.1, "es" -> 0.1, "fr" -> 0.45, "zh" -> 0.05)
    val m = Curation.mixtureSample(docs, col("lang"), col("doc_id"),
      graft.functions.Text.wsTokenCount(col("text")), weights, 15000L)
    assert(m.filter(col("mix_thresh_ppm") > 1000000L).count() == 0)
    // deterministic: same call twice → same keep set
    val k1 = m.filter(col("mix_keep")).select("doc_id").as[Long].collect().toSet
    val k2 = Curation.mixtureSample(docs, col("lang"), col("doc_id"),
      graft.functions.Text.wsTokenCount(col("text")), weights, 15000L)
      .filter(col("mix_keep")).select("doc_id").as[Long].collect().toSet
    assert(k1 == k2)
    // a domain absent from the weight map keeps nothing
    val noZh = Curation.mixtureSample(docs, col("lang"), col("doc_id"),
      graft.functions.Text.wsTokenCount(col("text")), weights.filterNot(_._1 == "zh"), 15000L)
    assert(noZh.filter(col("mix_keep") && col("mix_domain") === "zh").count() == 0)
    // kept token mass per capped domain lands near budget·w (hash noise aside)
    val keptTok = m.filter(col("mix_keep") && col("mix_domain") === "en")
      .agg(sum(col("mix_tok"))).as[Long].collect().head
    assert(keptTok > 1500 && keptTok < 9000, s"en kept tokens $keptTok far from target 4500")
  }

  test("mixture schedule: every prefix is weight-faithful; order is partitioning-independent") {
    import spark.implicits._
    val weights = Seq("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.2, "zh" -> 0.1)
    val d = docs
    val sched = Curation.mixtureSchedule(d, col("lang"), col("doc_id"), weights)
    // stride property: in the prefix {vt <= T}, domain d holds
    // min(floor(w_d * T), |d|) docs — exact, not approximate
    val prefix = sched.orderBy(col("sched_vt"), col("sched_domain"), col("doc_id")).limit(200)
      .select(col("sched_domain"), col("sched_vt")).collect()
    val t = prefix.map(_.getDouble(1)).max
    val counts = prefix.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val domSizes = d.groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    weights.foreach { case (dom, w) =>
      val expected = math.min(math.floor(w * t).toLong, domSizes(dom))
      // the cut at exactly vt=T can split ties across domains; allow 1
      assert(math.abs(counts.getOrElse(dom, 0) - expected) <= 1,
        s"$dom: got ${counts.getOrElse(dom, 0)}, stride predicts $expected (T=$t)")
    }
    val a = sched.select("doc_id", "sched_vt").as[(Long, Double)].collect().sorted
    val b = Curation.mixtureSchedule(d.repartition(7), col("lang"), col("doc_id"), weights)
      .select("doc_id", "sched_vt").as[(Long, Double)].collect().sorted
    assert(a.sameElements(b), "schedule must not depend on physical partitioning")
  }

  test("DSIR selection: target-like docs dominate, weights invariant under repartitioning") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val target = docs.filter(col("lang") === "en")
    val sel = Curation.dsirSelect(docs, col("doc_id"), col("text"),
      target, col("text"), 50)
    val langs = sel.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs.getOrElse("en", 0L) >= 40,
      s"selection must skew heavily to the target language: $langs")
    // weights are a pure function of the input — exact integer
    // micro-nats, no float-sum order dependence
    def w(df: org.apache.spark.sql.DataFrame) =
      Curation.dsirWeights(df, col("doc_id"), col("text"), target, col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(w(docs) == w(docs.repartition(7)))
  }

  test("dsirScore: literal-map streaming form equals dsirWeights; stream == batch") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val target = docs.filter(col("lang") === "en")
    val ratios = Curation.collectRatios(
      Curation.dsirRatios(docs, col("text"), target, col("text")))
    assert(ratios.nonEmpty && ratios.size <= 1024)
    val viaScore = docs
      .select(col("doc_id"), Curation.dsirScore(col("text"), ratios).as("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaWeights = Curation.dsirWeights(docs, col("doc_id"), col("text"),
      target, col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // fit corpus == scored corpus → every bucket is in the map; the
    // two formulations must agree exactly (docs with <2 tokens are
    // absent from the rollup form and score 0 in the column form)
    viaWeights.foreach { case (id, w) =>
      assert(viaScore(id) == w, s"doc $id: $w vs ${viaScore(id)}")
    }

    // the column form is stateless → streaming replay equals batch
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), Curation.dsirScore(col("text"), ratios).as("w"))
      .writeStream.outputMode("append").format("memory").queryName("dsirs").start()
    val sample = docs.select(col("doc_id"), col("text")).limit(20)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    stream.addData(sample)
    q.processAllAvailable()
    val streamed = spark.table("dsirs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.foreach { case (id, _) => assert(streamed(id) == viaScore(id)) }
    q.stop()
  }

  test("snapshot diff: added/removed/changed/unchanged partition the key space") {
    import spark.implicits._
    val vOld = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val vNew = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "text")
    val out = Curation.snapshotDiff(vOld, vNew, "id", md5(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("leakage-safe split: near-dup cluster members always share a split") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, col("doc_id"), col("text"))
    val split = Curation.leakageSafeSplit(docs, col("doc_id"), pairs)
    // zero cross-split near-dup pairs BY CONSTRUCTION (the q85 audit)
    val straddling = pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(straddling == 0, s"$straddling near-dup pairs straddle splits")
    // docs in no cluster split by their own id — identical to withSplit
    val clustered = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val lone = split.join(clustered, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("split"))
    val base = Curation.withSplit(docs, col("doc_id"))
      .select(col("doc_id"), col("split").as("base_split"))
    assert(lone.join(base, "doc_id")
      .filter(col("split") =!= col("base_split")).count() == 0,
      "singleton docs must get the same split as plain withSplit")
  }

  test("weighted sample: deterministic, size n, heavy weights dominate") {
    import spark.implicits._
    // 100 heavy rows (w=1e6 → priority ≈ 1) vs 100 light (w=1e-3 → ≈ 0)
    val df = ((0L until 100L).map(i => (i, 1e6)) ++
      (100L until 200L).map(i => (i, 1e-3))).toDF("id", "w")
    val s1 = Curation.weightedSample(df, col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSet
    assert(s1.size == 50 && s1.forall(_ < 100L), "all winners must come from the heavy group")
    val s2 = Curation.weightedSample(df, col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2, "same salt + corpus must reproduce the same sample")
    // uniform weights degenerate to hash-uniform sampling; a different
    // salt is then a different permutation (priority = round6(u))
    val uni = (0L until 200L).map(i => (i, 1.0)).toDF("id", "w")
    val u1 = Curation.weightedSample(uni, col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSet
    val u2 = Curation.weightedSample(uni, col("id"), col("w"), 50, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(u1.size == 50 && u2.size == 50 && u1 != u2)
  }
}
