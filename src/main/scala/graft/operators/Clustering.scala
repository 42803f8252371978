package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering for training-data pipelines: quantized k-means
  * (Lloyd's over int8 codes, exact integer arithmetic throughout) and
  * SemDeDup-style semantic near-dup removal within the learned
  * clusters (Abbas et al., arXiv:2303.09540).
  *
  * Why INTEGER k-means: float centroid means depend on summation
  * order, so a float Lloyd's loop is not reproducible across partition
  * counts — let alone across engines. Quantizing to int8 first (the
  * q75 scheme: bit-reproducible everywhere) makes every distance an
  * exact BIGINT and every centroid update an exact integer floor-mean:
  * the whole clustering is a pure function of the input, verifiable in
  * any engine, and stable under repartitioning/retries — the same
  * determinism contract as Curation's hash-based sampling. The ~0.4%
  * quantization error is irrelevant for the bucketing/dedup use cases
  * (cluster boundaries, not model weights).
  *
  * Scale: assignment is a columnar scan — centroids are O(k·d) driver
  * state compiled into literal arrays (the standard Spark k-means
  * shape; no corpus-side join or shuffle), so one pass is one
  * WholeStageCodegen stage over the corpus. The update aggregates
  * (cluster, dim) partial sums map-side: the shuffle carries at most
  * k·d·partitions rows, independent of corpus size.
  */
object Clustering {

  /** Per-vector squared L2 distance between two int code arrays —
    * exact BIGINT (d·254² ≪ 2⁶³). */
  /** Exact integer squared L2 — the native fused-loop kernel
    * (plans.SqDistLong). The HOF spelling
    * `aggregate(zip_with(a,b,(x,y)=>(x-y)²), 0L, +)` is arithmetic-
    * identical on int8 codes but CodegenFallback: k copies of it in
    * the argmin tree cost seconds of analyzer+codegen per pass and
    * break whole-stage codegen. Requires GraftFunctions.register
    * (kmeansInt8 does it). */
  def sqDistInt(a: Column, b: Column): Column =
    graft.plans.GraftFunctions.sqdist(a, b)

  /** Lloyd's k-means over the int8-quantized embeddings.
    *
    * Deterministic contract (mirrored by the DuckDB oracle):
    *  - codes: Quantization.withInt8 (bit-reproducible);
    *  - init: the codes of the `k` lowest-id vectors, cluster index =
    *    0-based rank of the id;
    *  - assignment: argmin over exact integer squared L2, ties to the
    *    lowest cluster index;
    *  - update: per-dimension floor(sum/count) — exact ints into an
    *    IEEE double divide, so every engine lands on the same code;
    *    clusters left empty by an assignment pass drop out.
    *
    * `passes` = number of assignment passes; centroid updates run
    * between passes (passes=2 → init, assign, update, assign).
    * Returns (vec_id, label, cluster, dist).
    *
    * TWO assignment strategies, same values:
    *  - k ≤ `maxLiteralK`: centroids compile into k literal distance
    *    expressions and argmin is one `array_min` — a single
    *    WholeStageCodegen scan, zero joins/shuffles per pass.
    *  - k > `maxLiteralK`: the literal tree leaves the codegen
    *    envelope (analyzer + janino cost grows with k·d and the
    *    generated method exceeds JIT limits well before k=1000), so
    *    assignment switches to a broadcast cross-join against the
    *    centroid table + a map-side-combined `min(struct(dist,
    *    cluster))` argmin and one join back for (label, q8). Costs one
    *    shuffle per pass but scales to arbitrary k. The default
    *    threshold 256 is the measured envelope on this corpus (d=64:
    *    literal assignment stays sub-second to k≈256, balloons
    *    super-linearly past it).
    */
  def kmeansInt8(emb: DataFrame, k: Int, passes: Int,
      id: String = "vec_id", v: String = "embedding",
      maxLiteralK: Int = 256): DataFrame = {
    require(k > 0 && passes >= 1)
    graft.plans.GraftFunctions.register(emb.sparkSession)
    // The quantized (vec_id, label, q8) table is consumed once per
    // assignment pass PLUS the init collect and each update collect —
    // without a barrier every consumer re-executes the ENTIRE upstream
    // plan (for q159 that is the five-stage survivor chain, measured
    // ~4 full re-executions; guide §5 — cache when reused and
    // recomputation is the expensive side). Lazy localCheckpoint: the
    // narrow int8-code table materializes at the init collect and every
    // later pass reads the blocks.
    val q = Quantization.withInt8(emb, v)
      .select(col(id).as("vec_id"), col("label"), col("q8"))
      .localCheckpoint(eager = false)

    // O(k·d) driver state per round — the sanctioned k-means exception
    // (centroids are small by definition); the corpus never collects.
    // vec_id stays in the projection and the driver re-sorts: collected
    // order through a post-limit projection is not an API guarantee,
    // and the 0-based id rank IS the cluster id the oracle pins.
    var centroids: Seq[(Int, Seq[Int])] =
      q.orderBy(col("vec_id")).limit(k).select(col("vec_id"), col("q8"))
        .collect().toSeq
        .sortBy(_.getLong(0))
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Int](1)) }

    def assignLiteral(cs: Seq[(Int, Seq[Int])]): DataFrame = {
      // k literal distance expressions per row; argmin via array_min
      // over (dist, cluster) structs — lexicographic struct ordering
      // gives the lowest-cluster tiebreak for free.
      val alts = cs.map { case (c, arr) =>
        struct(sqDistInt(col("q8"), typedlit(arr)).as("dist"), lit(c).as("cluster"))
      }
      q.withColumn("_best", array_min(array(alts: _*)))
        .select(col("vec_id"), col("label"), col("q8"),
          col("_best.cluster").as("cluster"), col("_best.dist").as("dist"))
    }

    def assignJoin(cs: Seq[(Int, Seq[Int])]): DataFrame = {
      // Broadcast the O(k·d) centroid table, expand to n·k (dist,
      // cluster) rows, reduce with min(struct) — partial aggregation
      // collapses each vector to one row map-side, so the shuffle
      // carries n rows, not n·k. Identical values and tiebreak as the
      // literal path (lexicographic struct min).
      val spark = emb.sparkSession
      import spark.implicits._
      val cdf = cs.toDF("cluster", "q8c")
      val best = q.select(col("vec_id"), col("q8"))
        .crossJoin(broadcast(cdf))
        .groupBy(col("vec_id"))
        .agg(min(struct(sqDistInt(col("q8"), col("q8c")).as("dist"),
          col("cluster").as("cluster"))).as("_best"))
        .select(col("vec_id").as("_vid"),
          col("_best.cluster").as("cluster"), col("_best.dist").as("dist"))
      q.join(best, col("vec_id") === col("_vid"))
        .select(col("vec_id"), col("label"), col("q8"), col("cluster"), col("dist"))
    }

    def assign(cs: Seq[(Int, Seq[Int])]): DataFrame =
      if (cs.size <= maxLiteralK) assignLiteral(cs) else assignJoin(cs)

    var assigned = assign(centroids)
    for (_ <- 2 to passes) {
      val updated = assigned
        .select(col("cluster"), posexplode(col("q8")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(floor(sum(col("x")) / count(lit(1))).cast("int").as("ci"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("ci")))),
          s => s.getField("ci")).as("q8"))
      centroids = updated.collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Int](1)))
        .sortBy(_._1)
      assigned = assign(centroids)
    }
    assigned.select(col("vec_id"), col("label"), col("cluster"), col("dist"))
  }

  /** SemDeDup: exact-cosine near-dup pairs WITHIN k-means clusters —
    * the cluster is the blocking key, so the pair join is
    * block-quadratic (corpus²/k per cluster on average), never
    * corpus-quadratic, and the join shuffles on `cluster` only.
    * Returns (cluster, vec_a, vec_b, sim) with sim rounded to 6
    * (the cross-engine float recipe) and vec_a < vec_b. */
  def semanticNearDupPairs(emb: DataFrame, k: Int, passes: Int,
      tau: Double): DataFrame = {
    val clusters = kmeansInt8(emb, k, passes).select(col("vec_id"), col("cluster"))
    val withC = emb.join(clusters, "vec_id")
      .select(col("vec_id"), col("cluster"), col("embedding"))
    // Blocked exact-cosine pair join (the q57 machinery) with the
    // learned cluster as the block.
    Dedup.embeddingNearDupPairs(withC, "cluster", tau)
      .select(col("cluster"), col("vec_a"), col("vec_b"), col("sim"))
  }

  /** SemDeDup keep/drop verdict: drop every vector that has a
    * LOWER-id neighbor at sim ≥ tau in its own cluster (min-id wins —
    * the greedy one-per-ε-ball rule made deterministic; not a
    * transitive closure, by design: a chain a~b~c with a≁c keeps a
    * and c). Returns the kept rows of `emb`. */
  def semanticDedup(emb: DataFrame, k: Int, passes: Int, tau: Double): DataFrame = {
    val dropped = semanticNearDupPairs(emb, k, passes, tau)
      .select(col("vec_b").as("vec_id")).distinct()
    emb.join(dropped, Seq("vec_id"), "left_anti")
  }

  /** Cluster-BALANCED sampling — the semantic-diversity selection cut
    * (the cluster-rebalancing practice of embedding-curated corpora):
    * learn k semantic clusters and keep the `n` lowest-hash members of
    * EACH, so the subset is balanced across semantic modes instead of
    * mirroring the corpus's mode skew — a dominant topic cannot swamp
    * the selection the way a uniform sample lets it. Membership is
    * [[Curation.stratifiedSample]]'s deterministic contract with the
    * LEARNED cluster as the stratum (q81 stratifies on a stored
    * column; this composes the stratum out of [[kmeansInt8]], which is
    * itself integer-exact, so the whole selection stays a pure,
    * engine-replayable function of the corpus). Clusters smaller than
    * `n` keep everything — balanced means capped, not padded. NOTE the
    * stability boundary: sampling is stable under corpus growth only
    * WITHIN a fixed clustering; re-clustering a grown corpus can move
    * cluster boundaries, so pipelines pin the clustering artifact
    * (like an index version) and sample against it.
    * Returns the sampled (vec_id, label, cluster, dist) rows.
    *
    * Scale: the kmeans passes dominate (columnar scans; shuffles carry
    * ≤ k·d·partitions rows); the sample adds one cluster-partitioned
    * rank window — ≤ k partitions of ~corpus/k rows, never a global
    * sort. */
  def clusterBalancedSample(emb: DataFrame, k: Int, passes: Int, n: Int,
      salt: String = "cbal"): DataFrame = {
    require(n > 0)
    Curation.stratifiedSample(kmeansInt8(emb, k, passes), col("cluster"),
      col("vec_id"), n, salt)
  }

  /** The PRODUCTION composition of [[clusterBalancedSample]] (r20 —
    * the embedding-curation recipe: curate → dedup → cluster →
    * balanced cut): semantic selection runs over the CORPUS that
    * survived curation and dedup, never the raw crawl — clustering
    * raw data lets near-duplicate floods forge their own "semantic
    * modes" and buy selection slots the dedup tier exists to deny.
    * `corpus` is the survivor set (the factory's landing zone or any
    * curated batch output), `emb` the embedding side table; only
    * embeddings whose `vecId` matches a surviving `id` cluster and
    * compete (one left_semi join — embeddings of dropped docs are
    * pruned BEFORE the k-means passes, so the expensive stage runs on
    * the small side). Returns [[clusterBalancedSample]]'s
    * (vec_id, label, cluster, dist) rows.
    *
    * This is a POST-LANDING JOB, not a per-batch gate, on purpose: a
    * balanced cut is a function of the whole corpus's cluster
    * structure, and clustering one micro-batch would balance within
    * the batch while the corpus drifts arbitrarily across batches —
    * the same reason the LSH index rebuild is a maintenance job. Run
    * it at selection time (epoch build), against a PINNED clustering
    * per [[clusterBalancedSample]]'s stability note.
    *
    * Scale: the semi-join shuffles ids only (embedding column prunes
    * out of the probe side); the k-means passes dominate as before,
    * now over survivors — strictly cheaper than corpus-wide. */
  def corpusBalancedSelection(corpus: DataFrame, id: Column,
      emb: DataFrame, vecId: Column, k: Int, passes: Int, n: Int,
      salt: String = "cbal"): DataFrame = {
    val survivors = emb.join(
      corpus.select(id.as("_sel_id")), vecId === col("_sel_id"), "left_semi")
    clusterBalancedSample(survivors, k, passes, n, salt)
  }
}
