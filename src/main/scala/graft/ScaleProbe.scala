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
    "q64_dup_clusters",
    "q82_neardup_removal",
    "q96_knn_graph_bucketed",
    "q106_duplicate_spans",
    "q123_bpe_merges",
    "q125_bpe_token_counts")

  /** Replicate documents+embeddings ×factor into `outDir` (skipped if
    * already present). Only the two tables the probe set reads. */
  def materialize(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$outDir/embeddings.parquet")))
      return

    val reps = explode(sequence(lit(0), lit(factor - 1))).as("rep")

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
    }
    spark.range(1).write.format("noop").mode("overwrite").save()

    val rows = ProbeQueries.map { name =>
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
