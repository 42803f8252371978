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

  test("knn graph blocked: every edge stays inside its block") {
    val withLabelBlock = Similarity.knnGraph(emb.limit(100), 2, Some(col("label")))
    val labels = emb.limit(100).select(col("vec_id"), col("label"))
    val crossBlock = withLabelBlock
      .join(labels.withColumnRenamed("label", "la"), "vec_id")
      .join(labels.select(col("vec_id").as("nbr"), col("label").as("lb")), "nbr")
      .filter(col("la") =!= col("lb"))
    assert(crossBlock.count() == 0)
  }
}
