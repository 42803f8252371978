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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serving-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
    spark.stop()
  }
}
