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
  *
  * `--auto` (r13): instead of the multiple ladder, measure the
  * trained-2 codebook at the DERIVED whole-corpus shortlist
  * (Similarity.autoShortlist(n, 1, 1, k) — the ShortlistCap applies)
  * against the UNCAPPED 1/8-ratio target — the cap-boundary probe for
  * corpora past n = 8·ShortlistCap, where the two diverge and the
  * effective ratio starts falling below the measured recall band.
  */
object RecallLadder {

  /** Deterministic isotropic corpus: n 64-dim vectors with
    * hash-uniform elements in [-1,1) — the cap-boundary probe's data
    * (see `--auto`); shared with QuantizationSpec's cap pin. */
  private[graft] def syntheticIsotropic(spark: SparkSession, n: Long) =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (pmod(hash(col("id"), i, lit(7)), lit(2000)).cast("double") / 999.5 - 1.0)
          .cast("float")).as("embedding"),
      lit(0).as("label"))

  def main(args: Array[String]): Unit = {
    val auto = args.contains("--auto")
    MainFlags.requireKnown(args, Set("--auto"))
    val pos = MainFlags.positional(args)
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val k = pos.lift(1).map(_.toInt).getOrElse(10)
    val mults = pos.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(2, 5, 10))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.probeSession("graft-recall-ladder", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)

    // `syn:<n>` (r13): a deterministic ISOTROPIC corpus of n 64-dim
    // vectors (hash-uniform elements in [-1,1)) — the cap-boundary
    // probe needs a corpus with near-tie ADC margins at n ≫ 8·cap,
    // and replica-grown corpora can't provide one (their true
    // neighbors are near-duplicates that survive any shortlist —
    // measured 10/10 at a 2% ratio, SCALE.md r13). Synthetic on
    // purpose: no driver fixture has ≥ 80k independent vectors.
    val emb = (if (sfDir.startsWith("syn:"))
      syntheticIsotropic(spark, sfDir.stripPrefix("syn:").toLong)
    else Tables.embeddings(spark, sfDir)).cache()
    val queries = Seq(0L, 7L, 42L)
    val truth: Map[Long, Set[Long]] = queries.map(q =>
      q -> Similarity.bruteForceTopK(emb, q, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet).toMap

    if (auto) {
      val n = emb.count()
      val derived = Similarity.autoShortlist(n, 1, 1, k)
      val uncapped = math.max(Similarity.ShortlistFloor.toLong,
        math.ceil(n.toDouble / Similarity.ShortlistRatioDen).toLong).toInt
      val cb = Quantization.pqCodebook(emb) // trained-2 default
      // one cell when the cap isn't binding (derived == uncapped)
      for ((name, sl) <- Seq("auto(derived)" -> derived,
          "uncapped(n/8)" -> uncapped).distinctBy(_._2)) {
        val cells = queries.map { q =>
          val got = Quantization.pqTwoStageTopK(emb, cb, q, k, sl)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          q -> (got & truth(q)).size
        }
        val mean = cells.map(_._2).sum.toDouble / cells.size
        println(f"$name%-14s n=$n%-7d shortlist=$sl%-6d " +
          f"ratio=${100.0 * sl / n}%5.1f%%  mean=$mean%4.1f/$k  " +
          cells.map { case (q, r) => s"q$q=$r" }.mkString(" "))
      }
      spark.stop()
      return
    }
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
