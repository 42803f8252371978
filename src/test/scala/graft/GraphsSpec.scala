package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** PageRank sanity on hand-built graphs: mass conservation (within the
  * un-redistributed dangling leak), hub dominance, determinism. */
class GraphsSpec extends SparkSuite {
  init()
  import spark.implicits._

  test("star graph: the hub out-ranks every spoke") {
    // 1..5 all link to 0; 0 links back to 1 (so 0 is not dangling)
    val edges = ((1L to 5L).map(i => (i, 0L)) :+ ((0L, 1L))).toDF("src", "dst")
    val pr = Graphs.pagerank(edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 6)
    val hub = pr(0L)
    (2L to 5L).foreach(i => assert(hub > pr(i), s"hub must outrank spoke $i"))
    // spokes 2..5 are structurally identical → identical rank
    assert((2L to 5L).map(pr).distinct.size == 1)
  }

  test("cycle graph: uniform ranks, total mass 1") {
    val n = 10L
    val edges = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val pr = Graphs.pagerank(edges).collect().map(_.getDouble(1))
    assert(pr.distinct.length == 1, "symmetric cycle must rank uniformly")
    // no dangling nodes → mass conserved up to the round-12 quantization
    assert(math.abs(pr.sum - 1.0) < 1e-9, s"mass ${pr.sum}")
  }

  test("pagerank equals a plain-Scala replica on a random graph") {
    // independent reimplementation of the operator's arithmetic
    // contract: contributions quantized to DECIMAL(38,18) (HALF_UP),
    // exact sum, then round-12 HALF_UP re-quantization per iteration
    val rnd = new scala.util.Random(99)
    val n = 40L
    val edges = (0 until 120).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = Graphs.pagerank(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    val nn = nodes.size
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    var p = nodes.map(_ -> r12(1.0 / nn)).toMap
    for (_ <- 1 to 3) {
      val sums = scala.collection.mutable.Map[Long, BigDecimal]().withDefaultValue(BigDecimal(0))
      edges.foreach { case (s, d) =>
        sums(d) += BigDecimal(p(s) / outdeg(s)).setScale(18, BigDecimal.RoundingMode.HALF_UP)
      }
      p = nodes.map(v => v -> r12((1.0 - 0.85) / nn + 0.85 * sums(v).toDouble)).toMap
    }
    assert(got == p, s"mismatch on ${got.keySet.filter(k => got(k) != p(k))}")
  }

  test("deterministic across repartitioning") {
    val edges = (0L until 60L).map(i => (i, (i * 7 + 1) % 60L)).toDF("src", "dst")
    val a = Graphs.pagerank(edges).collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    val b = Graphs.pagerank(edges.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(a.sameElements(b), "rank must not depend on physical partitioning")
  }
}
