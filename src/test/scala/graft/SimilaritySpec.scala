package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables
import graft.streaming.{Metrics, Pipelines}

/** ANN variants vs brute-force ground truth + streaming metrics. */
class SimilaritySpec extends SparkSuite {
  init()
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val truth10 =
    Similarity.bruteForceTopK(emb, 0L, 10).select("vec_id").as[Long].collect().toSet

  test("ivf assignment: every vector lands in exactly one list, centroids self-assign") {
    val assigned = Similarity.ivfAssign(emb, 16)
    assert(assigned.count() == emb.count())
    val centroidRows = assigned.filter(col("vec_id") === col("list_id"))
    assert(centroidRows.count() == 16)
    assert(assigned.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
  }

  test("ivf search: full probe recovers the brute-force top-k exactly") {
    val full = Similarity.ivfSearch(emb, 16, 16, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(full == truth10)
  }

  test("ivf search: partial probe trades recall, stays ordered") {
    val rows = Similarity.ivfSearch(emb, 16, 4, 0L, 10).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val sims = rows.map(_.getAs[Double]("sim")).toSeq
    assert(sims == sims.sorted.reverse)
    val recall = rows.map(_.getAs[Long]("vec_id")).count(truth10) / 10.0
    assert(recall > 0.0, "nprobe=4/16 should recover at least one true neighbor")
  }

  test("streaming metrics listener counts batches and rows") {
    implicit val sqlCtx = spark.sqlContext
    val m = Metrics.attach(spark)
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](7, spark, None)
    val q = stream.toDF().toDF("value")
      .writeStream.format("memory").queryName("mtest").outputMode("append").start()
    stream.addData("a", "b", "c")
    q.processAllAvailable()
    stream.addData("d")
    q.processAllAvailable()
    q.stop()
    val (batches, rows) = m.snapshot
    assert(batches >= 2 && rows == 4, s"got batches=$batches rows=$rows")
    assert(m.lastProgressJson.nonEmpty)
    spark.streams.removeListener(m)
  }

  test("knn graph: per-node top-k matches per-node brute force on real embeddings") {
    val g = Similarity.knnGraph(emb.limit(50), 3).collect()
      .groupBy(_.getAs[Long]("vec_id"))
    assert(g.size == 50 && g.values.forall(_.length == 3))
    // node 0's neighbor list == the single-query brute-force search
    val bf = Similarity.bruteForceTopK(emb.limit(50), 0L, 3)
      .select("vec_id").as[Long].collect().toSeq
    val knn0 = g(0L).sortBy(r => (-r.getAs[Double]("sim"), r.getAs[Long]("nbr")))
      .map(_.getAs[Long]("nbr")).toSeq
    assert(knn0 == bf, s"knn($knn0) != brute force($bf)")
  }

  test("ivfPqSearchIndexed serving cost: 1 driver job with a preloaded codebook, 2 without") {
    val idx = java.nio.file.Files.createTempDirectory("ivfpqjobs").toString + "/index"
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") < 300), 8, idx)
    val cb = Similarity.readPqCodebook(spark, idx)
    // count DRIVER ROUND-TRIPS (blocking Dataset actions) during frame
    // construction — the serving path's per-query cost; executing the
    // returned frame is the caller's. Scheduler jobs are the wrong
    // metric here (AQE materializes broadcast stages as extra jobs).
    val n = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { n.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    def drained(): Int = {
      val deadline = System.currentTimeMillis + 20000
      var last = -1
      while (System.currentTimeMillis < deadline && n.get != last) {
        last = n.get; Thread.sleep(250)
      }
      n.get
    }
    spark.listenerManager.register(listener)
    try {
      val warm = Similarity.ivfPqSearchIndexed(spark, idx, 4, 7L, 5, 25,
        codebook = Some(cb))
      assert(drained() == 1,
        s"preloaded-codebook query must cost exactly 1 plan action, saw ${n.get}")
      n.set(0)
      val cold = Similarity.ivfPqSearchIndexed(spark, idx, 4, 7L, 5, 25)
      assert(drained() == 2,
        s"codebook read + plan action = 2, saw ${n.get}")
      // same answers either way
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "sim").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(ids(warm) == ids(cold))
    } finally spark.listenerManager.unregister(listener)
  }

  test("ivfPqSearchIndexedBatch: one plan for the whole query set, row-identical to the per-query loop") {
    val idx = java.nio.file.Files.createTempDirectory("ivfpqbatch").toString + "/index"
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") < 300), 8, idx)
    val cb = Similarity.readPqCodebook(spark, idx)
    val qids = Seq(0L, 7L, 42L, 111L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val batch = Similarity
      .ivfPqSearchIndexedBatch(spark, idx, 4, queries, 5, 25, Some(cb))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2), r.getDouble(3))))
      .groupBy(_._1)
      .map { case (q, rs) =>
        q -> rs.map(_._2).sortBy(t => (-t._3, t._1)).toSeq
      }
    assert(batch.keySet == qids.toSet, s"missing query groups: ${batch.keySet}")
    for (q <- qids) {
      val single = Similarity.ivfPqSearchIndexed(spark, idx, 4, q, 5, 25, Some(cb))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(batch(q) == single, s"query $q: batch ${batch(q)} != loop $single")
    }
  }

  test("ivfSearchIndexedBatch: row-identical to the per-query plain-IVF loop") {
    val idx = java.nio.file.Files.createTempDirectory("ivfbatch").toString + "/index"
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 300), 8, idx)
    val qids = Seq(0L, 7L, 42L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val batch = Similarity.ivfSearchIndexedBatch(spark, idx, 4, queries, 5)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2), r.getDouble(3))))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).sortBy(t => (-t._3, t._1)).toSeq }
    for (q <- qids) {
      val single = Similarity.ivfSearchIndexed(spark, idx, 4, q, 5)
        .select(col("vec_id"), col("label"), col("sim"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(batch(q) == single, s"query $q: batch ${batch(q)} != loop $single")
    }
  }

  test("batched serving on vec_ids >= 2^33 (64-bit id space, no packing contract)") {
    // Every id sits far past the old 2^33 packed-order ceiling (the
    // pre-r11 exec RAISED here); the contract is batch == per-query
    // loop row-for-row — the single-query path always used true
    // multi-column ordering with no id bound, so it is the ground
    // truth for the 64-bit id space.
    val off = 1L << 40
    val big = emb.filter(col("vec_id") < 300)
      .withColumn("vec_id", col("vec_id") + lit(off))
    val idx = java.nio.file.Files.createTempDirectory("ivfpqbigid").toString + "/index"
    Similarity.buildIvfPqIndex(big, 8, idx)
    val qids = Seq(0L, 7L, 42L).map(_ + off)
    val queries = big.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val batch = Similarity.ivfPqSearchIndexedBatch(spark, idx, 4, queries, 5, 25)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(3))))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).sortBy(t => (-t._2, t._1)).toSeq }
    assert(batch.keySet == qids.toSet)
    for (q <- qids) {
      assert(batch(q).forall(_._1 >= (1L << 33)), "corpus ids must exceed 2^33")
      val single = Similarity.ivfPqSearchIndexed(spark, idx, 4, q, 5, 25)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(batch(q) == single, s"query $q: batch ${batch(q)} != loop $single")
    }
  }

  test("knn graph on vec_ids >= 2^33") {
    val off = 1L << 40
    val shifted = Similarity.knnGraph(
        emb.limit(50).withColumn("vec_id", col("vec_id") + lit(off)), 3)
      .collect()
      .map(r => (r.getLong(0) - off, r.getLong(1) - off, r.getDouble(2))).toSet
    val plain = Similarity.knnGraph(emb.limit(50), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(shifted == plain)
  }

  test("knn graph blocked: every edge stays inside its block") {
    val withLabelBlock = Similarity.knnGraph(emb.limit(100), 2, Some(col("label")))
    val labels = emb.limit(100).select(col("vec_id"), col("label"))
    val crossBlock = withLabelBlock
      .join(labels.withColumnRenamed("label", "la"), "vec_id")
      .join(labels.select(col("vec_id").as("nbr"), col("label").as("lb")), "nbr")
      .filter(col("la") =!= col("lb"))
    assert(crossBlock.count() == 0)
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("capped knn graph: fall-through and e<=1 buckets are output-IDENTICAL to plain blocking") {
    import graft.functions.Vectors
    val bucketCol = Vectors.lshBucket(col("embedding"), 64, 8)
    val uncapped = edgeSet(Similarity.knnGraph(emb, 5, Some(bucketCol)))
    // sf0.001 buckets top out at 24 rows. cap=12: 2·cap covers every
    // bucket, so the operator SHORT-CIRCUITS to the plain blocked
    // plan (the capped construction would be output-identical there
    // but pays fixed plan overhead for nothing — measured r12)
    assert(edgeSet(Similarity.knnGraphBucketedCapped(emb, 5, 64, 8,
      maxBlock = 12)) == uncapped, "fall-through must be a no-op")
    // cap=8 ENGAGES the capped plan (max bucket 24 > 16) — and inside
    // it, vectors whose buckets hold ≤ 2·cap rows get e ≤ 1
    // refinement bits, where Hamming-1 probing over one bit reaches
    // every sub-block pair: their edges must be IDENTICAL to plain
    // blocking (the zero-recall-cost band of the cap)
    val capped8 = Similarity.knnGraphBucketedCapped(emb, 5, 64, 8,
      maxBlock = 8, maxExtraBits = 3)
    val bSizes = emb.select(col("vec_id"), bucketCol.as("bkt"))
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bkt"))))
    val smallBucketIds = bSizes.filter(col("bn") <= 16)
      .select(col("vec_id")).as[Long].collect().toSet
    def restrict(s: Set[(Long, Long, Double)]) = s.filter(e => smallBucketIds(e._1))
    assert(restrict(edgeSet(capped8)) == restrict(uncapped),
      "e<=1 buckets inside an engaged capped plan must match plain blocking")
  }

  test("index build rejects duplicate vec_ids loudly (validated in the seeding scan)") {
    // {0,1,1,3}-style corpora pass the count/min/max density proof
    // while the stride sample silently emits duplicate/missing
    // centroids — uniqueness is a hard corpus contract, checked in
    // the aggregation the build already pays
    val dup = emb.limit(10).union(emb.limit(3))
    val dir = java.nio.file.Files.createTempDirectory("ivfdup").toString + "/i"
    val e = intercept[IllegalArgumentException](
      Similarity.buildIvfIndex(dup, 4, dir))
    assert(e.getMessage.contains("duplicate vec_id"), e.getMessage)
  }

  test("index build rejects NULL vec_ids with a NULL-specific message") {
    // count_distinct ignores NULLs — without the dedicated non-null
    // count a NULL-id corpus would fail with a misleading
    // "duplicate vec_id rows" message
    val withNull = emb.limit(10)
      .withColumn("vec_id", when(col("vec_id") === 3L, lit(null)).otherwise(col("vec_id")))
    val dir = java.nio.file.Files.createTempDirectory("ivfnull").toString + "/i"
    val e = intercept[IllegalArgumentException](
      Similarity.buildIvfIndex(withNull, 4, dir))
    assert(e.getMessage.contains("NULL vec_id"), e.getMessage)
  }

  test("index build on NEGATIVE vec_ids: exactly nLists centroids via the hash-ordered sample") {
    // negative ids satisfy the stride predicate too (Spark's % keeps
    // the dividend's sign), so the stride sample can over-collect
    // there — the exact-count acceptance must route such corpora to
    // the hash-ordered fallback, which is exact by construction
    val neg = emb.limit(100).withColumn("vec_id", col("vec_id") - lit(50L))
    val dir = java.nio.file.Files.createTempDirectory("ivfneg").toString + "/i"
    Similarity.buildIvfIndex(neg, 8, dir)
    val cents = Similarity.readIvfCentroids(spark, dir)
    assert(cents.count() == 8, "exactly nLists centroid rows")
    assert(cents.select("list_id").distinct().count() == 8)
    // and the index serves (full probe == brute force on this corpus)
    val got = Similarity.ivfSearchIndexed(spark, dir, 8, -43L, 5)
      .select("vec_id").as[Long].collect().toSeq
    val want = Similarity.bruteForceTopK(neg, -43L, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == want)
  }

  test("capped knn graph: empty corpus yields an empty graph, not an NPE") {
    // max(_bn) over zero buckets is NULL; the plan decision must read
    // it null-safely and degrade exactly like plain knnGraph
    val empty = emb.filter(col("vec_id") < 0)
    assert(Similarity.knnGraphBucketedCapped(empty, 5, 64, 8).count() == 0)
  }

  test("sorted knn graph: window >= n-1 degenerates to the exact graph") {
    // with every pair rank-adjacent in the single table, the candidate
    // set is complete and the output must EQUAL knnGraph — same
    // rounding, same (sim DESC, nbr ASC) tie-break, same mirroring
    val small = emb.limit(60)
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "nbr", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = edges(Similarity.knnGraph(small, 3))
    val sorted = edges(Similarity.knnGraphSorted(small, 3, 64,
      nBits = 32, tables = 1, window = 60))
    assert(sorted == exact)
  }

  test("sorted knn graph: dense-regime recall floor on a replicated corpus") {
    // the operator's target regime: clusters of near-identical vectors
    // (every corpus member + 5 jittered replicas via the ScaleProbe
    // replication the sf1 probes use). Exact top-5 of each node is
    // dominated by its own cluster; the sorted-sketch tables must
    // recover those edges without any quadratic-in-cluster term.
    // Measured: ~0.99 directed-edge recall at (T=4, w=16) on this
    // corpus (numpy prototype at n=3000 reads 0.987; the in-Spark
    // jitter differs only in its hash source). Pinned at 0.90 — a drop
    // below that means the permutation/rank/adjacency logic broke,
    // not noise (the whole construction is deterministic).
    val dir = java.nio.file.Files.createTempDirectory("sortedknn").toString
    Tables.embeddings(spark, sf0001).limit(200)
      .write.mode("overwrite").parquet(s"$dir/base/embeddings.parquet")
    graft.ScaleProbe.materialize(spark, s"$dir/base", s"$dir/rep", 6,
      Set("embeddings"))
    val rep = Tables.embeddings(spark, s"$dir/rep")
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = edges(Similarity.knnGraph(rep, 5))
    val approx = Similarity.knnGraphSorted(rep, 5, 64).collect()
    val approxEdges = approx.map(r => (r.getLong(0), r.getLong(1))).toSet
    // every node present with exactly k neighbors
    assert(approx.groupBy(_.getLong(0)).size == 1200)
    assert(approx.length == 1200 * 5)
    val recall = (approxEdges & exact).size.toDouble / exact.size
    info(f"dense-regime directed-edge recall = $recall%.4f (floor 0.90)")
    assert(recall >= 0.90, s"dense-regime recall $recall below the 0.90 floor")
  }

  test("sorted knn graph: output invariant to physical partitioning (scalable rank)") {
    // the global rank is computed as range-partition + per-partition
    // offset; the claim that it is a PURE function of (t, code,
    // vec_id) — independent of where sampled range boundaries fall —
    // is what makes q143/q146 deterministic. Pin it by varying both
    // the input layout and the shuffle partitioning.
    val small = emb.limit(120)
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = edges(Similarity.knnGraphSorted(small, 4, 64))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = edges(Similarity.knnGraphSorted(small.repartition(11), 4, 64))
      assert(a == b, "rank must not depend on partition boundaries")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sorted near-dup: exact precision, recall floor, and window degeneracy") {
    import graft.operators.Dedup
    // precision is 1.0 BY CONSTRUCTION (candidates are scored with the
    // exact kernel, so every emitted pair is a true >= t pair); recall
    // is the sketch property, pinned on the same replicated corpus as
    // the graph pin. Exhaustive ground truth via the blocked operator
    // with a constant block (= all pairs).
    val dir = java.nio.file.Files.createTempDirectory("sortedndp").toString
    Tables.embeddings(spark, sf0001).limit(200)
      .write.mode("overwrite").parquet(s"$dir/base/embeddings.parquet")
    graft.ScaleProbe.materialize(spark, s"$dir/base", s"$dir/rep", 6,
      Set("embeddings"))
    val rep = Tables.embeddings(spark, s"$dir/rep")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.embeddingNearDupPairs(
      rep.withColumn("one", lit(1)), "one", 0.9))
    val approx = pairs(Dedup.embeddingNearDupSorted(rep, 0.9, 64))
    assert(exact.nonEmpty, "replicated corpus must contain >=0.9 pairs")
    assert(approx.subsetOf(exact), "emitted pairs must all be true pairs")
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"sorted near-dup recall = $recall%.4f over ${exact.size} exact pairs")
    assert(recall >= 0.90, s"near-dup recall $recall below the 0.90 floor")
    // window >= n-1 in one table covers every pair: output == exact
    val small = emb.limit(60)
    val exactSmall = pairs(Dedup.embeddingNearDupPairs(
      small.withColumn("one", lit(1)), "one", 0.2))
    val degenerate = pairs(Dedup.embeddingNearDupSorted(small, 0.2, 64,
      tables = 1, window = 60))
    assert(degenerate == exactSmall)
  }

  test("sorted near-dup mid-noise floor: the measured T=8/w=32 noisy-regime setting") {
    import graft.operators.Dedup
    // the r14 noise sweep (SCALE.md): at ~7% sign-bit flips
    // (±0.05 jitter) the r13 default T=4/w=16 reads ~0.79 recall;
    // doubling TABLES beats doubling the window at equal cost
    // (0.872 vs 0.864 at n=3000), and the recommended noisy-regime
    // setting T=8/w=32 restores >=0.90. Pin that setting's floor on
    // the same replicated-corpus recipe the probe used.
    val dir = java.nio.file.Files.createTempDirectory("sortedmidn").toString
    Tables.embeddings(spark, sf0001).limit(200)
      .write.mode("overwrite").parquet(s"$dir/base/embeddings.parquet")
    graft.ScaleProbe.materialize(spark, s"$dir/base", s"$dir/rep", 6,
      Set("embeddings"), jitterPermille = 50)
    val rep = Tables.embeddings(spark, s"$dir/rep")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.embeddingNearDupPairs(
      rep.withColumn("one", lit(1)), "one", 0.9))
    assert(exact.nonEmpty, "mid-noise corpus must contain >=0.9 pairs")
    val approx = pairs(Dedup.embeddingNearDupSorted(rep, 0.9, 64,
      nBits = 32, tables = 8, window = 32))
    assert(approx.subsetOf(exact), "precision must stay 1.0 by construction")
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"mid-noise T=8/w=32 recall = $recall%.4f over ${exact.size} exact pairs")
    // deterministic construction: measures exactly 0.9740 on this
    // corpus (n=1200; the n=3000 probe reads 0.9355) — the floor
    // leaves margin only for future corpus regeneration
    assert(recall >= 0.95, s"mid-noise recall $recall below the 0.95 floor")
  }

  test("bitOrder: rotation family pinned byte-exact for t<8; avalanche family distinct past the ceiling") {
    // t<8 sequences are baked into every gated sorted-sketch oracle
    // (q143, q146–q150 all run T=4) — a change here silently re-keys
    // their hashes, so the first two rotations are pinned byte-exact
    assert(Similarity.bitOrder(0, 32) == Seq(0, 26, 19, 12, 5, 31, 24,
      17, 10, 3, 29, 22, 15, 8, 1, 27, 20, 13, 6, 25, 18, 11, 4, 30,
      23, 16, 9, 2, 28, 21, 14, 7))
    assert(Similarity.bitOrder(3, 32) == Seq(28, 21, 14, 7, 0, 26, 19,
      12, 5, 31, 24, 17, 10, 3, 29, 22, 15, 8, 1, 27, 20, 13, 6, 25,
      18, 11, 4, 30, 23, 16, 9, 2))
    // the avalanche tier is pinned too (same reason, for any future
    // gated query running T>8)
    assert(Similarity.bitOrder(8, 32) == Seq(23, 9, 18, 10, 20, 4, 3,
      30, 31, 17, 19, 11, 8, 28, 16, 7, 22, 29, 26, 24, 1, 14, 12, 27,
      2, 21, 13, 6, 5, 25, 15, 0))
    // the defect the hybrid closed: under the old formula t>=8 were
    // exact DUPLICATES of earlier tables (t=8 equalled t=3 — sorting
    // an arithmetic progression mod p has only a rotation family of
    // orders), so raising T past 8 bought zero new candidates at full
    // kernel cost. Now: 16 distinct permutations, none past t=7 a
    // rotation of the shared t<8 cycle, every one a true permutation.
    val orders = (0 until 16).map(t => Similarity.bitOrder(t, 32))
    assert(orders.distinct.size == 16, "tables must be pairwise distinct")
    val cycle = orders.head
    val rotations = (0 until 32).map(k => cycle.drop(k) ++ cycle.take(k)).toSet
    (0 until 8).foreach(t => assert(rotations.contains(orders(t)),
      s"t=$t must stay in the pinned rotation family (hash stability)"))
    (8 until 16).foreach(t => assert(!rotations.contains(orders(t)),
      s"t=$t must leave the rotation family (else it duplicates coverage)"))
    orders.foreach(o => assert(o.sorted == (0 until 32),
      "every table must be a permutation of the bit indices"))
  }

  test("sorted near-dup handoff-band floor: the measured T=12/w=32 sizing at ~13% flips") {
    import graft.operators.Dedup
    // the r16 handoff bracketing (SCALE.md): in the 10–15% flip band
    // T=8/w=32 decays to 0.886/0.852 while T=12/w=32 — real only
    // after the bitOrder hybrid ended the 8-table rotation ceiling —
    // holds 0.931/0.905 (n=3000). Pin the recommended band sizing on
    // the deterministic jitter=100 spec corpus, plus the STRUCTURAL
    // prefix property the hybrid guarantees: T=12's first eight
    // tables ARE T=8's, so its pair set is a superset — a future
    // bitOrder change that breaks prefix stability fails here before
    // it silently re-keys recall.
    val dir = java.nio.file.Files.createTempDirectory("sortedband").toString
    Tables.embeddings(spark, sf0001).limit(200)
      .write.mode("overwrite").parquet(s"$dir/base/embeddings.parquet")
    graft.ScaleProbe.materialize(spark, s"$dir/base", s"$dir/rep", 6,
      Set("embeddings"), jitterPermille = 100)
    val rep = Tables.embeddings(spark, s"$dir/rep")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.embeddingNearDupPairs(
      rep.withColumn("one", lit(1)), "one", 0.9))
    assert(exact.nonEmpty, "band corpus must contain >=0.9 pairs")
    val t8 = pairs(Dedup.embeddingNearDupSorted(rep, 0.9, 64,
      nBits = 32, tables = 8, window = 32))
    val t12 = pairs(Dedup.embeddingNearDupSorted(rep, 0.9, 64,
      nBits = 32, tables = 12, window = 32))
    val t16 = pairs(Dedup.embeddingNearDupSorted(rep, 0.9, 64,
      nBits = 32, tables = 16, window = 32))
    assert(t16.subsetOf(exact), "precision must stay 1.0 by construction")
    assert(t8.subsetOf(t12),
      "T=12's first eight tables must BE T=8's (prefix stability)")
    // r17: the avalanche tier's SLOPE is pinned too — the family's
    // claim is "raise T keeps raising recall" (the defect r16 fixed
    // was exactly this climb silently ceilinging at 8 duplicated
    // tables), so one more deterministic row guards a future mix()
    // edit that preserves prefix stability but flattens the climb
    assert(t12.subsetOf(t16),
      "T=16's first twelve tables must BE T=12's (prefix stability)")
    val recall8 = (t8 & exact).size.toDouble / exact.size
    val recall12 = (t12 & exact).size.toDouble / exact.size
    val recall16 = (t16 & exact).size.toDouble / exact.size
    info(f"band recall: T=8/w=32 $recall8%.4f, T=12/w=32 $recall12%.4f, " +
      f"T=16/w=32 $recall16%.4f over ${exact.size}%d exact pairs")
    assert(recall12 >= 0.88,
      s"band-regime T=12/w=32 recall $recall12 below the 0.88 floor")
    assert(recall12 >= recall8, "extra distinct tables can only add recall")
    assert(recall16 >= recall12, "the avalanche tier must keep its slope")
    assert(recall16 >= 0.93,
      s"band-regime T=16/w=32 recall $recall16 below the 0.93 floor " +
        "(numpy measured 0.992 vs the 0.973 rotation ceiling)")
  }

  test("estimateFlipRate equals the q152 replay totals (same-engine pin, moved from the runner r22)") {
    // Formerly an in-runner require inside q152_flip_rate_replay: the
    // production estimator must agree EXACTLY (not epsilon) with the
    // gated integer totals of the same construction — Average's own
    // sum/count-then-/nBits order. Moved here because the runner's
    // estimator call re-ran the whole corpus kernel join per
    // invocation purely to feed the require; the property is pinned
    // on the same real corpus, same construction, every `sbt test`.
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val reemb = emb.select((col("vec_id") - 1).as("vec_id"), col("embedding"))
    val rate = Similarity.estimateFlipRate(emb, reemb)
    def codes(df: org.apache.spark.sql.DataFrame, c: String) = df.select(
      col("vec_id"), graft.functions.Vectors.lshBucket(col("embedding"), 64, 32).as(c))
    val t = codes(emb, "c0").join(codes(reemb, "c1"), "vec_id")
      .select(bit_count(col("c0").bitwiseXOR(col("c1"))).cast("int").as("flips"))
      .agg(sum(col("flips")), count(lit(1))).head()
    val (fsum, n) = (t.getLong(0), t.getLong(1))
    assert(n > 0)
    assert(rate == (fsum.toDouble / n) / 32,
      s"estimateFlipRate ($rate) disagrees with the replay's integer " +
        s"totals ($fsum flips / ${n * 32} bits) — the estimator and the " +
        "q152 replay no longer share one definition")
  }

  test("estimateFlipRate + recommendSketch: the production sizing rule is an API") {
    // the r15 operator form of the r14 sweep's guidance: measure the
    // corpus flip rate from paired embedding versions, look the
    // sizing up — instead of hand-running probe code (SCALE.md cites
    // this API). Same replicated-corpus recipe as the mid-noise pin.
    val dir = java.nio.file.Files.createTempDirectory("fliprate").toString
    Tables.embeddings(spark, sf0001).limit(200)
      .write.mode("overwrite").parquet(s"$dir/base/embeddings.parquet")
    graft.ScaleProbe.materialize(spark, s"$dir/base", s"$dir/rep", 6,
      Set("embeddings"), jitterPermille = 50)
    val base = spark.read.parquet(s"$dir/base/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val stride = base.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val reps = Tables.embeddings(spark, s"$dir/rep")
      .filter(col("vec_id") >= stride)
      .select((col("vec_id") % stride).as("vec_id"), col("embedding"))
    val rate = Similarity.estimateFlipRate(base, reps)
    info(f"measured flip rate = $rate%.4f on the jitter=50 spec corpus")
    // deterministic construction: the ±0.05-jitter regime the sweep
    // measured at 0.069 (n=3000) — the band covers corpus regeneration
    assert(rate > 0.04 && rate < 0.10,
      s"jitter=50 flip rate $rate outside the sweep's mid-noise regime")
    // and the lookup lands exactly on the sweep's recommendation
    assert(Similarity.recommendSketch(rate) == Similarity.SketchSizing(8, 32))
    // identical versions: zero flips by definition
    assert(Similarity.estimateFlipRate(base, base) == 0.0)
    // negated versions: every plane dot changes sign -> every bit flips
    val neg = base.select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    assert(Similarity.estimateFlipRate(base, neg) == 1.0)
    // the pinned lookup table + the IVF-handoff cliff (the 10–15%
    // band measured r16: T=12/w=32 reads 0.931/0.905 at 10.0%/13.0%
    // flips where T=8/w=32 decays to 0.886/0.852 — SCALE.md)
    assert(Similarity.recommendSketch(0.013) == Similarity.SketchSizing(4, 16))
    assert(Similarity.recommendSketch(0.069) == Similarity.SketchSizing(8, 32))
    assert(Similarity.recommendSketch(0.13) == Similarity.SketchSizing(12, 32))
    val cliff = intercept[IllegalArgumentException](Similarity.recommendSketch(0.2))
    assert(cliff.getMessage.contains("IVF"),
      "past the cliff the error must name the IVF tier")
    intercept[IllegalArgumentException](Similarity.recommendSketch(-0.1))
    // disjoint id spaces: loud, not NaN
    intercept[IllegalArgumentException](Similarity.estimateFlipRate(
      base, base.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))))
    // dim mismatch: loud, never a silent all-zero-code 0.0 rate (the
    // kernel nulls on width mismatch and null dots encode as bit 0 —
    // a quiet 0.0 would UNDERSIZE the sketch via recommendSketch)
    val wrongDim = intercept[IllegalArgumentException](
      Similarity.estimateFlipRate(base, base, dim = 128))
    assert(wrongDim.getMessage.contains("dim=128"))
  }

  test("batch-incident cap: a bulk-sized batch fails loudly, before any kernel or broadcast") {
    import graft.operators.Dedup
    // 1M+1 ids: over MaxIncidentBatchIds. The LIMIT-probe runs
    // unconditionally and the require fires AT OPERATOR CONSTRUCTION
    // — no plane dots, no broadcast build, no action by the caller.
    // (This spec is also why the probe is unconditional: a plan-stats
    // skip estimated this exact frame under the skip bound.)
    val huge = spark.range(0L, 1000001L).select(col("id").as("vec_id"),
      org.apache.spark.sql.functions.array(
        (0 until 4).map(_ => lit(0.1f)): _*).as("embedding"))
    val ex = intercept[IllegalArgumentException](
      Dedup.embeddingNearDupIncremental(huge, emb.limit(10)
        .select(col("vec_id"), col("embedding")), 0.9, 64))
    assert(ex.getMessage.contains("embeddingNearDupSorted"),
      "the contract error must route callers to the bulk API")
  }

  test("incremental embedding near-dup == batch-incident subset of the full pairs") {
    import graft.operators.Dedup
    // the q117 contract on the vector tier: the incremental form must
    // produce EXACTLY the batch-incident subset of the full-corpus
    // sorted-sketch pairs (same union, same ranks), while paying
    // kernels only on batch-incident candidates
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inc = pairs(Dedup.embeddingNearDupIncremental(
      emb.filter(col("vec_id") % 3 === 0),
      emb.filter(col("vec_id") % 3 =!= 0), 0.3, 64))
    val full = pairs(Dedup.embeddingNearDupSorted(emb, 0.3, 64)
      .filter(col("vec_a") % 3 === 0 || col("vec_b") % 3 === 0))
    assert(inc.nonEmpty && inc == full)
  }

  test("incremental embedding near-dup: a changed vector's batch version replaces the corpus row") {
    import graft.operators.Dedup
    // vec_id 1 re-ingested with vector 5's embedding: the batch
    // version must fully supersede the stale corpus row, so the
    // (1, 5) pair comes out at sim 1.0
    val changed = emb.filter(col("vec_id") === 5L)
      .select(lit(1L).as("vec_id"), col("embedding"))
    val out = Dedup.embeddingNearDupIncremental(changed, emb, 0.999, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.contains((1L, 5L, 1.0)), out.mkString(", "))
  }

  test("sketch index lifecycle: indexed == in-memory incremental; Index.open dispatches") {
    import graft.operators.{Dedup, Index, Similarity}
    // write %3==0, upsert %3==1, delete (%3!=2 && %5==2) — three
    // commits deep through the partial-commit carry chain; the indexed
    // per-round detection must then EQUAL the in-memory incremental
    // over the surviving corpus (same union, same ranks, same sims)
    val dir = java.nio.file.Files.createTempDirectory("sketchidx").toString + "/i"
    val h = Index.buildSketch(emb.filter(col("vec_id") % 3 === 0), dir, 64)
    assert(h.kind == "sketch" && h.nBits == 32)
    h.upsert(emb.filter(col("vec_id") % 3 === 1))
    h.delete(emb.filter(col("vec_id") % 3 =!= 2 && col("vec_id") % 5 === 2)
      .select(col("vec_id")))
    val batch = emb.filter(col("vec_id") % 3 === 2)
    val survivors = emb.filter(col("vec_id") % 3 =!= 2 && col("vec_id") % 5 =!= 2)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaIndex = pairs(h.pairs(batch, 0.3))
    val inMem = pairs(Dedup.embeddingNearDupIncremental(batch, survivors, 0.3, 64))
    assert(viaIndex.nonEmpty && viaIndex == inMem)
    // upserting a CHANGED vector replaces its indexed row: re-ingest
    // id 3 (an index member: 3%3==0) with vector 8's embedding — the
    // next round's (3, 8) pair must score 1.0
    val changed = emb.filter(col("vec_id") === 8L)
      .select(lit(3L).as("vec_id"), col("embedding"))
    h.upsert(changed)
    val out = h.pairs(emb.filter(col("vec_id") === 8L), 0.999).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.contains((3L, 8L, 1.0)), out.mkString(", "))
  }

  test("sketch index survives full takedown then re-ingest (empty-manifest recovery)") {
    import graft.operators.{Index, Similarity}
    // taking down EVERY indexed id legitimately commits a version that
    // owns zero partitions (the VersionedIndex empty-table contract);
    // the index must still open, serve (empty corpus), accept further
    // deletes, and re-ingest through upsert — the streaming sink's
    // post-bootstrap path — instead of wedging on a missing manifest
    // entry
    val dir = java.nio.file.Files.createTempDirectory("sketchempty").toString + "/i"
    val h = Index.buildSketch(emb.limit(20), dir, 64)
    h.delete(emb.limit(20).select(col("vec_id")))
    val h2 = Index.open(spark, dir).asInstanceOf[Index.Sketch]
    assert(h2.kind == "sketch")
    assert(Similarity.readSketchTable(spark, dir).count() == 0)
    assert(h2.pairs(emb.limit(10), 0.999999).count() >= 0) // plan executes
    h2.delete(emb.limit(5).select(col("vec_id"))) // delete-on-empty: no error
    h2.upsert(emb.limit(20))
    assert(Similarity.readSketchTable(spark, dir).count() == 20)
  }

  test("incremental near-dup batch with duplicate vec_ids raises loudly") {
    import graft.operators.Dedup
    val dup = emb.limit(5).union(emb.limit(2)).select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") >= 100L)
    val e = intercept[Exception](
      Dedup.embeddingNearDupIncremental(dup, corpus, 0.0, 64).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicate vec_id")), msgs(e).mkString(" | "))
  }

  test("incremental near-dup batch with a NULL vec_id raises loudly") {
    import graft.operators.Dedup
    // a NULL id would pass a duplicates-only guard and then silently
    // drop out of the scoring join (null-propagating =!= condition) —
    // the in-plan guard must name it instead, mirroring the eager
    // boundaries' NULL-specific message
    val nulled = emb.limit(5).select(
      when(col("vec_id") === 2L, lit(null)).otherwise(col("vec_id")).as("vec_id"),
      col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 100L)
    val e = intercept[Exception](
      Dedup.embeddingNearDupIncremental(nulled, corpus, 0.0, 64).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NULL vec_id")), msgs(e).mkString(" | "))
  }

  test("empty-batch sketch upsert is a no-op on both branches (no new version)") {
    import graft.operators.{Similarity, VersionedIndex}
    val dir = java.nio.file.Files.createTempDirectory("sketchemptyb").toString + "/i"
    val empty = emb.filter(lit(false)).select("vec_id", "embedding")
    Similarity.writeSketchIndex(emb.limit(20), dir, 64)
    val v1 = VersionedIndex.currentVersion(spark, dir)
    // partial branch: healthy index, empty batch → nothing committed
    Similarity.upsertSketchIndex(empty, dir)
    assert(VersionedIndex.currentVersion(spark, dir) == v1)
    // full-rewrite branch: a full takedown leaves a WholeTable
    // manifest (!plan.ok on the next mutation); an empty upsert there
    // used to commit a content-identical empty version per call — a
    // streaming sink's empty micro-batches would grow the chain
    Similarity.deleteFromSketchIndex(
      emb.limit(20).select(col("vec_id")), dir)
    val v2 = VersionedIndex.currentVersion(spark, dir)
    Similarity.upsertSketchIndex(empty, dir)
    Similarity.upsertSketchIndex(empty, dir)
    assert(VersionedIndex.currentVersion(spark, dir) == v2)
    // and a real re-ingest still works after the no-ops
    Similarity.upsertSketchIndex(emb.limit(10), dir)
    assert(Similarity.readSketchTable(spark, dir).count() == 10)
  }

  test("sketch drift loop: a re-embedded batch trips the sizing boundary, a quiet one doesn't") {
    import graft.operators.{Index, Similarity, VersionedIndex}
    // the r17 operational close of the sizing story: every upsert
    // measures the batch's flip rate against the index's PRIOR codes
    // for the same ids (estimateFlipRate's definition on the stored
    // canon column — no extra kernel pass), persists it in the
    // version params, and records a sizing-band CROSSING loudly. The
    // jitter construction is ScaleProbe's deterministic formula, so
    // amplitudes map onto the measured sweep (SCALE.md r16:
    // ±0.05 ≈ 6.9% flips, ±0.10 ≈ 13%).
    val base = emb.limit(200).select("vec_id", "embedding")
    def jittered(permille: Int) = base.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x + (pmod(hash(col("vec_id") * 31 + i + lit(1)), lit(2000)) - 1000)
          .cast("float") / lit(1000000.0f / permille)).cast("float"))
        .as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("sketchdrift").toString + "/i"
    Similarity.writeSketchIndex(base, dir, 64)
    // fresh build: no drift measured yet
    val s0 = Similarity.sketchIndexStats(spark, dir)
    assert(s0.driftFlipRate.isEmpty && s0.driftBand.isEmpty &&
      s0.driftBoundary.isEmpty)
    assert(Index.stats(spark, dir).drift.isEmpty)
    // QUIET batch: code-identical re-embeds are ZERO regime evidence
    // — the reading carries (here: stays unmeasured) instead of
    // recording 0.0, which is also exactly what a crash-replay of an
    // already-committed upsert measures (the batch against its own
    // rows), so the persisted drift state is replay-idempotent
    Similarity.upsertSketchIndex(base, dir)
    val s1 = Similarity.sketchIndexStats(spark, dir)
    assert(s1.driftFlipRate.isEmpty && s1.driftBand.isEmpty &&
      s1.driftBoundary.isEmpty, s"quiet batch must carry, read $s1")
    assert(Index.stats(spark, dir).drift.isEmpty)
    // mid-noise re-embed (±0.05 ≈ 6.9% flips): the FIRST measurement
    // — band recorded, no boundary (nothing measured to cross from)
    Similarity.upsertSketchIndex(jittered(50), dir)
    val s2 = Similarity.sketchIndexStats(spark, dir)
    info(f"jitter=50 drift: rate=${s2.driftFlipRate.get}%.4f band=${s2.driftBand.get}")
    assert(s2.driftFlipRate.exists(r => r > 0.03 && r < 0.10), s"$s2")
    assert(s2.driftBand.contains("T8/w32"))
    assert(s2.driftBoundary.isEmpty,
      "the first measured band has no prior band to cross from")
    // band-regime re-embed: the index now holds the ±0.05 versions,
    // the batch carries ±0.15 of the SAME deterministic jitter
    // pattern — difference amplitude ±0.10 ≈ 13% flips — so THE
    // boundary the verdict names trips: T8/w32 -> T12/w32
    Similarity.upsertSketchIndex(jittered(150), dir)
    val s3 = Similarity.sketchIndexStats(spark, dir)
    info(f"jitter=150-vs-50 drift: rate=${s3.driftFlipRate.get}%.4f band=${s3.driftBand.get}")
    assert(s3.driftFlipRate.exists(r => r >= 0.10 && r < 0.15), s"$s3")
    assert(s3.driftBand.contains("T12/w32"))
    assert(s3.driftBoundary.contains("T8/w32->T12/w32"))
    assert(Index.stats(spark, dir).drift == s3.driftFlipRate)
    // the recorded band agrees with the sizing rule the monitor would
    // look up (the loop is closed: measure → band → recommendSketch)
    assert(Similarity.recommendSketch(s3.driftFlipRate.get) ==
      Similarity.SketchSizing(12, 32))
    // CRASH-REPLAY pin: redelivering the already-committed batch
    // re-measures it against its own rows (zero flips = zero
    // evidence) — the T12 reading and its boundary must survive, not
    // collapse to a phantom "T12/w32->T4/w16" crossing
    Similarity.upsertSketchIndex(jittered(150), dir)
    val sReplay = Similarity.sketchIndexStats(spark, dir)
    assert(sReplay.driftFlipRate == s3.driftFlipRate &&
      sReplay.driftBand == s3.driftBand &&
      sReplay.driftBoundary == s3.driftBoundary,
      s"replay must carry the reading, got $sReplay")
    // a takedown measures nothing: the last regime reading CARRIES
    Similarity.deleteFromSketchIndex(base.limit(5).select(col("vec_id")), dir)
    val s4 = Similarity.sketchIndexStats(spark, dir)
    assert(s4.driftFlipRate == s3.driftFlipRate &&
      s4.driftBand == s3.driftBand && s4.driftBoundary == s3.driftBoundary)
    // an all-NEW-ids batch has no overlap to measure: drift carries
    Similarity.upsertSketchIndex(
      base.select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")),
      dir)
    val s5 = Similarity.sketchIndexStats(spark, dir)
    assert(s5.driftFlipRate == s3.driftFlipRate &&
      s5.driftBand == s3.driftBand && s5.driftBoundary == s3.driftBoundary)
  }

  test("ivf centroid-staleness loop: off-geometry ingest alarms, a re-centering rebuild clears it") {
    import graft.operators.{Index, Similarity, VersionedIndex}
    // the r18 close of the one mutable kind without a regime axis:
    // every upsert folds the batch's mean assigned-centroid
    // micro-distance into the ivfDist EWMA (the pqErr fold on the
    // GEOMETRY axis — drift toward list boundaries degrades probe
    // recall without necessarily skewing the histogram the skew
    // trigger watches), judges the excess over the build baseline,
    // and persists ok/stale through the shared Drift machine.
    // A CONTROLLED regime: the gated corpus is near-isotropic (a
    // negated or random batch fits its nearest-of-8 centroid about as
    // badly as the corpus itself does — measured excess ~0.015, no
    // alarm headroom), so the threshold behavior is pinned on a
    // corpus whose geometry is KNOWN: 8 tight clusters of
    // multiplicative-jitter clones (±2% per coordinate — scale-free,
    // so the construction is independent of the embedding norms)
    // around 8 real anchor vectors. Dense ids anchor·30+k make the
    // stride seeding pick exactly the k=0 clone of each cluster.
    val anchors = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("anchor"), col("embedding").as("aemb"),
        col("label"))
    def tight(idBase: Long): org.apache.spark.sql.DataFrame =
      anchors.crossJoin(spark.range(0, 30).toDF("k"))
        .select((col("anchor") * 30 + col("k") + idBase).as("vec_id"),
          col("aemb"), col("label"))
        .select(col("vec_id"),
          transform(col("aemb"), (x, i) =>
            (x * (lit(1.0f) +
              (pmod(hash(col("vec_id") * 31 + i + lit(1)), lit(2000)) - 1000)
                .cast("float") / lit(50000.0f))).cast("float"))
            .as("embedding"),
          col("label"))
    val dir = java.nio.file.Files.createTempDirectory("ivfdistdrift")
      .toString + "/i"
    Similarity.buildIvfIndex(tight(0L), 8, dir)
    def params = VersionedIndex.currentDir(spark, dir)
      .map(VersionedIndex.readParams(spark, _)).getOrElse(Map.empty)
    // fresh build: recent == baseline → excess exactly 0.0 (the same
    // 0-is-healthy convention as every other kind); no state yet —
    // nothing ingested against the pinned geometry
    assert(Index.stats(spark, dir).drift.contains(0.0))
    assert(params.get("driftState").isEmpty)
    assert(params.get("ivfDistBuild").exists(_.toLong > 0L),
      s"tight clusters must still measure a nonzero baseline: $params")
    // ON-regime ingest (new ids, same cluster construction): fit
    // holds — state ok, excess under the stale threshold
    Similarity.upsertIvfIndex(tight(10000L), dir)
    assert(params.get("driftState").contains("ok"), s"$params")
    val dOk = Index.stats(spark, dir).drift.get
    assert(dOk < Similarity.DefaultIvfStaleExcess,
      s"on-regime ingest must stay under the stale excess, read $dOk")
    // OFF-GEOMETRY ingest (real corpus vectors — effectively random
    // directions vs the 8 tight anchors, cosine fit near the
    // isotropic floor): the excess crosses the threshold, the state
    // machine records the crossing, and the WARN names the rebuild
    // answer
    val offGeo = emb.filter(col("vec_id") >= 100 && col("vec_id") < 400)
      .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"),
        col("label"))
    Similarity.upsertIvfIndex(offGeo, dir)
    val dStale = Index.stats(spark, dir).drift.get
    info(f"staleness excess after off-geometry ingest: $dStale%.3f")
    assert(dStale >= Similarity.DefaultIvfStaleExcess, s"read $dStale")
    assert(params.get("driftState").contains("stale"))
    assert(params.get("driftBoundary").contains("ok->stale"))
    // the params-only stats surface (the pqCodebookStats twin) agrees
    // with the state machine and Index.stats on every field
    val cs = Similarity.ivfCentroidStats(spark, dir)
    assert(cs.needsRecenter && cs.excess == dStale &&
      cs.state.contains("stale") && cs.boundary.contains("ok->stale"),
      s"$cs")
    // CRASH-REPLAY pin: redelivering the already-committed batch
    // carries the persisted signature match instead of double-folding
    // the EWMA — this probe measures batch-vs-GEOMETRY (the replayed
    // batch measures identically, unlike the sketch/lsh probes'
    // batch-vs-own-rows zero), so without the signature gate a replay
    // would move ivfDistRecent and could log a phantom crossing
    val beforeReplay = params
    Similarity.upsertIvfIndex(offGeo, dir)
    val afterReplay = params
    def drifty(m: Map[String, String]) = m.filter { case (k, _) =>
      k.startsWith("ivfDist") || k.startsWith("drift") }
    assert(drifty(afterReplay) == drifty(beforeReplay),
      s"replay must carry the EWMA and alarm state:\n" +
        s"  before ${drifty(beforeReplay)}\n  after  ${drifty(afterReplay)}")
    // a takedown measures nothing — the alarm and boundary CARRY
    // (statsParams passes prior params through on the delete path)
    Similarity.deleteFromIvfIndex(
      tight(0L).limit(5).select(col("vec_id")), dir)
    assert(params.get("driftState").contains("stale") &&
      params.get("driftBoundary").contains("ok->stale"))
    // the drift policy's answer: a re-centering rebuild re-seeds the
    // geometry FROM the current rows, so the rebuilt baseline fits
    // the corpus that actually exists — excess returns to exactly
    // 0.0 and the state machine resets (fresh build params)
    Similarity.rebuildIvfIndex(spark, dir)
    assert(Index.stats(spark, dir).drift.contains(0.0),
      "a re-centering rebuild must clear the staleness excess")
    assert(params.get("driftState").isEmpty &&
      params.get("driftBoundary").isEmpty)
    val csAfter = Similarity.ivfCentroidStats(spark, dir)
    assert(!csAfter.needsRecenter && csAfter.excess == 0.0 &&
      csAfter.state.isEmpty && csAfter.boundary.isEmpty, s"$csAfter")
    // DEGENERATE baseline: a corpus whose sampled rows ARE their
    // centroids (8 rows, 8 lists) measures build fit ≤ 0 — an
    // excess over it is garbage, so the stats surface refuses
    // loudly (and ivfCentroidStatsFrom reads None, keeping the
    // sink's automated trigger unarmed instead of rebuild-looping)
    val dgen = java.nio.file.Files.createTempDirectory("ivfdegen")
      .toString + "/i"
    Similarity.buildIvfIndex(emb.filter(col("vec_id") < 8), 8, dgen)
    val err = intercept[RuntimeException](
      Similarity.ivfCentroidStats(spark, dgen))
    assert(err.getMessage.contains("no usable centroid-fit baseline"),
      err.getMessage)
  }

  test("capped knn graph: low cap keeps edges in-bucket and holds the measured recall floor") {
    import graft.functions.Vectors
    val uncapped = Similarity.knnGraph(emb, 5,
      Some(Vectors.lshBucket(col("embedding"), 64, 8)))
    val capped = Similarity.knnGraphBucketedCapped(emb, 5, 64, 8,
      maxBlock = 4, maxExtraBits = 3)
    // structural: capped edges are a subset of in-bucket pairs
    val buckets = emb.select(col("vec_id"),
      Vectors.lshBucket(col("embedding"), 64, 8).as("bkt"))
    val crossBucket = capped
      .join(buckets.withColumnRenamed("bkt", "ba"), "vec_id")
      .join(buckets.select(col("vec_id").as("nbr"), col("bkt").as("bb")), "nbr")
      .filter(col("ba") =!= col("bb")).count()
    assert(crossBucket == 0)
    // recall vs the uncapped blocked graph, at the deliberately-harsh
    // q142 setting (cap=4 splits buckets of 5+ rows; similarity-aware
    // refinement + Hamming-1 probing keeps most true neighbors):
    // measured 1567/1643 directed top-5 edges retained = 95.4% (the
    // independent DuckDB replay agrees); pinned at 93% — a regression
    // below that means the splitting or probe logic broke, not noise
    // (everything here is deterministic)
    val kept = capped.as("c").join(uncapped.as("u"),
      col("c.vec_id") === col("u.vec_id") && col("c.nbr") === col("u.nbr")).count()
    val total = uncapped.count()
    assert(kept.toDouble / total >= 0.93,
      s"capped recall $kept/$total fell below the pinned floor")
  }
}
