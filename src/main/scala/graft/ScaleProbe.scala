package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf0.1 → sf1 scaling probe for the heavy dedup/ANN/BPE tier —
  * MEASUREMENT ONLY, never an oracle input (the driver generates data
  * up to sf0.1; correctness gates run exclusively on driver data).
  *
  * The synthetic sf1 is a ×F replication of the driver's sf0.1
  * documents/embeddings, built to preserve the STATISTICAL SHAPE the
  * probed operators are sensitive to rather than raw bytes:
  *
  *  - ids remap into disjoint ranges (`id + k·stride`), so exact-dedup
  *    group counts and join fan-outs scale like real corpus growth;
  *  - replica k>0 text is token-salted (every whitespace token gets an
  *    `rK` suffix), so each replica's shingle/vocab space is DISJOINT
  *    from every other's — without this, every original doc would gain
  *    F−1 near-clones and LSH pair output would blow up O(F²) per doc,
  *    which is not what 10× more crawl data looks like. Salting makes
  *    vocabulary grow linearly (real vocab growth is sublinear), so
  *    BPE-tier ratios here are an UPPER bound;
  *  - replica k>0 embeddings get deterministic per-element jitter
  *    (±0.01, hash-derived), so vectors are near but not identical and
  *    centroid assignment/banding behave like fresh data.
  *
  * Output: one JSON line with per-query seconds at the source SF and
  * the scaled SF plus the ratio; paste into SCALE.md. Runs each query
  * SPARK_GRAFT_PROBE_RUNS times (default 2) and reports the per-query
  * MIN — the noise-floor estimator appropriate for ratio probes on a
  * shared host (medians need ≥3 runs; the suite-level Bench keeps that
  * job).
  *
  * Usage: runMain graft.ScaleProbe [srcSfDir] [workDir] [factor]
  */
object ScaleProbe {

  /** Heavy-tier probe set: the blocked/banded scale paths plus their
    * driver chains. The exact all-pairs baselines (q38/q40/q95) are
    * deliberately EXCLUDED — they are O(n²) by definition and
    * documented as exactness baselines, not scale paths. */
  val ProbeQueries: Seq[String] = Seq(
    "q34_exact_dedup_stats",
    "q39_minhash_lsh_pairs",
    "q41_lsh_bucket_histogram",
    "q42_bucketed_ann",
    "q55_ivf_full_probe",
    "q57_embedding_neardup",
    "q132_pq_adc_ann",
    "q135_ivf_pq_indexed",
    "q64_dup_clusters",
    "q82_neardup_removal",
    "q96_knn_graph_bucketed",
    "q106_duplicate_spans",
    "q123_bpe_merges",
    "q125_bpe_token_counts")

  /** CDC/mirror tier — the reference's core workload. Envelope
    * synthesis + dual-shape JSON round-trip (q45/q46) and the full
    * mirror merge with per-table delete routing (q120, two
    * `applyCdcBatch` merges internally). Reads the replicated
    * `events` table: ids remap into disjoint ranges, so the mirror's
    * key space and last-writer-wins group count grow linearly — what
    * 10× more CDC traffic over the same wall-clock window looks
    * like. */
  val CdcProbeQueries: Seq[String] = Seq(
    "q45_cdc_parse_route",
    "q46_cdc_deletes",
    "q120_mirror_delete_policy")

  /** Replicate documents+embeddings+events ×factor into `outDir`
    * (each table skipped if already present). */
  def materialize(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def missing(name: String): Boolean =
      !fs.exists(new org.apache.hadoop.fs.Path(s"$outDir/$name"))

    val reps = explode(sequence(lit(0), lit(factor - 1))).as("rep")

    if (missing("documents.parquet")) {
      val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      val docStride = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      docs.select(col("*"), reps)
        .select(
          (col("doc_id") + col("rep") * docStride).as("doc_id"),
          // replica-salted tokens: "$1rK" = regex group 1 + literal rK —
          // replica shingle/vocab spaces are pairwise disjoint
          when(col("rep") === 0, col("text"))
            .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"), col("rep")))).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }

    if (missing("embeddings.parquet")) {
      val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
      val vecStride = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
      emb.select(col("*"), reps)
        .select(
          (col("vec_id") + col("rep") * vecStride).as("vec_id"),
          // ±0.01 deterministic jitter so replicas are near, not equal
          when(col("rep") === 0, col("embedding"))
            .otherwise(transform(col("embedding"), (x, i) =>
              (x + (pmod(hash(col("vec_id") * 31 + i + col("rep")), lit(2000))
                - 1000).cast("float") / lit(100000.0f)).cast("float")))
            .as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }

    if (missing("events.parquet")) {
      // replicas keep the same time range (10× traffic density, not a
      // longer window) with event_id AND user_id remapped into
      // disjoint ranges: the CDC key space — and hence the mirror's
      // upsert/delete group count — scales like real growth. Read via
      // Tables.events so the ts normalization contract applies before
      // the rewrite.
      val ev = graft.sources.Tables.events(spark, srcDir)
      val evStride = ev.agg(max(col("event_id"))).head().getLong(0) + 1L
      val userStride = ev.agg(max(col("user_id"))).head().getLong(0) + 1L
      ev.select(col("*"), reps)
        .select(
          (col("event_id") + col("rep") * evStride).as("event_id"),
          col("ts"),
          (col("user_id") + col("rep") * userStride).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }
  }

  private def time(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_scaleprobe_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)

    materialize(spark, srcDir, workDir, factor)

    // footer/JVM warm-up at both scales, then the noop sink
    Seq(srcDir, workDir).foreach { d =>
      spark.read.parquet(s"$d/documents.parquet").count()
      spark.read.parquet(s"$d/embeddings.parquet").count()
      spark.read.parquet(s"$d/events.parquet").count()
    }
    spark.range(1).write.format("noop").mode("overwrite").save()

    val rows = (ProbeQueries ++ CdcProbeQueries).map { name =>
      val small = (1 to runs).map(_ => time(spark, name, srcDir)).min
      val big = (1 to runs).map(_ => time(spark, name, workDir)).min
      val ratio = big / small
      System.err.println(f"[probe] $name%-28s $small%8.2f s -> $big%8.2f s  (${ratio}%.1f×)")
      f""""$name":{"sf01":$small%.3f,"sf1":$big%.3f,"ratio":$ratio%.2f}"""
    }
    println(s"""{"metric":"scaleprobe","factor":$factor,"runs":$runs,""" +
      s""""queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
