package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Quantization, Similarity}
import graft.sources.Tables

/** Reproduces SCALE.md's PQ recall ladder at any scale factor: exact
  * cosine top-k (brute force, the ground truth) recovered by the
  * two-stage ADC-shortlist → exact-rerank search, per codebook
  * construction (sampled / trained-N-rounds) × shortlist multiple.
  *
  * Usage: runMain graft.RecallLadder [sfDir] [k] [shortlistMultiples]
  * Prints one line per (codebook, shortlist) cell: mean recall over
  * the query set {0, 7, 42} plus the per-query cells.
  */
object RecallLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val mults = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(2, 5, 10))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-recall-ladder")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)

    val emb = Tables.embeddings(spark, sfDir).cache()
    val queries = Seq(0L, 7L, 42L)
    val truth: Map[Long, Set[Long]] = queries.map(q =>
      q -> Similarity.bruteForceTopK(emb, q, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet).toMap

    val ladders = Seq("sampled(r0)" -> 0, "trained(r1)" -> 1,
      "trained(r2,default)" -> 2, "trained(r3)" -> 3)
    val shortlists = mults
    for ((name, rounds) <- ladders) {
      val cb = Quantization.pqCodebook(emb, trainRounds = rounds)
      for (mult <- shortlists) {
        val cells = queries.map { q =>
          val got = Quantization.pqTwoStageTopK(emb, cb, q, k, mult * k)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          q -> (got & truth(q)).size
        }
        val mean = cells.map(_._2).sum.toDouble / cells.size
        println(f"$name%-22s shortlist=${mult}xk  mean=$mean%4.1f/$k  " +
          cells.map { case (q, r) => s"q$q=$r" }.mkString(" "))
      }
    }
    spark.stop()
  }
}
