package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Index, Similarity}
import graft.sources.Tables

/** Reproduces SCALE.md's batched-ANN-serving cost table at any scale
  * factor: wall time of the per-query `search` loop vs ONE
  * `searchBatch` plan over the same persisted IVF-PQ index (preloaded
  * codebook; identical results both ways — SimilaritySpec pins
  * row-identity, this main measures the cost model).
  *
  * Usage: runMain graft.ServingBench [sfDir] [batchSizes]
  */
object ServingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val sizes = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 8, 32, 128))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.probeSession("graft-serving-bench", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val idx = java.nio.file.Files.createTempDirectory("servingbench").toString + "/index"
    Similarity.buildIvfPqIndex(emb, 16, idx)
    val h = Index.open(spark, idx).asInstanceOf[Index.IvfPq]
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once (JVM + parquet footers out of the numbers)
    h.search(0L, 10).collect()
    h.searchBatch(emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding")), 10).collect()
    for (b <- sizes) {
      val qids = (0L until math.min(b.toLong, n)).toSeq
      val loop = time(qids.foreach(q => h.search(q, 10).collect()))
      val batch = time(h.searchBatch(
        emb.filter(col("vec_id") < b)
          .select(col("vec_id").as("query_id"), col("embedding")), 10).collect())
      println(f"[serving] batch=$b%4d  loop=$loop%7.2f s  one-plan=$batch%6.2f s  " +
        f"speedup=${loop / batch}%5.1fx")
    }

    // Per-stage breakdown of the batch plan — where the ~flat latency
    // floor actually lives. Cumulative timings over the IDENTICAL
    // staged frames the serving call executes (Similarity
    // .ivfPqBatchStages): collecting `probes` runs stage 1 alone
    // (centroid broadcast + per-query probe window — the fixed
    // one-job floor); `shortlist` runs stages 1-2 (+ DPP-pruned code
    // scan + factored ADC + heap shortlist); `result` runs 1-3
    // (+ rerank against the lists partitions). Marginal columns are
    // the differences. min of `runs` (default 3) per cell.
    // same env var and clamp as Bench.scala — runs=0 would empty.min
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // the handle's own ratio-derived default, so the breakdown prices
    // exactly what a default `searchBatch` call runs
    val sl = Similarity.autoShortlist(n, 16, 4, 10)
    // pure job-scheduling floor: an empty one-job action, min of runs —
    // the share of the probe stage that no plan change can buy down
    val tNoop = (1 to runs).map(_ => time(spark.range(1).count())).min
    println(f"[stages] dir=$sfDir n=$n shortlist(auto)=$sl  noop-job floor=$tNoop%5.3f s")
    println("[stages] cumulative: probe | +adc_shortlist | +rerank(total); marginal in parens")
    // cold = centroid table re-read from the index per call (the
    // pre-r12 serving shape); warm = the handle's preloaded
    // LocalRelation geometry — the delta is what the warm handle buys
    for ((label, cents) <- Seq(
        "cold-centroids" -> None,
        "warm-handle   " -> Some(h.centroidsFrame))) {
      for (b <- sizes) {
        val qdf = emb.filter(col("vec_id") < b)
          .select(col("vec_id").as("query_id"), col("embedding"))
        def stages() = Similarity.ivfPqBatchStages(spark, idx, 4, qdf, 10, sl,
          Some(h.codebook), cents)
        val tProbe = (1 to runs).map(_ => time(stages().probes.collect())).min
        val tSl = (1 to runs).map(_ => time(stages().shortlistFrame.collect())).min
        val tFull = (1 to runs).map(_ => time(stages().result.collect())).min
        println(f"[stages] $label batch=$b%4d  probe=$tProbe%5.2f s  " +
          f"adc=$tSl%5.2f s (+${tSl - tProbe}%5.2f)  " +
          f"total=$tFull%5.2f s (+${tFull - tSl}%5.2f)")
      }
    }
    spark.stop()
  }
}
