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

  test("deterministic across repartitioning") {
    val edges = (0L until 60L).map(i => (i, (i * 7 + 1) % 60L)).toDF("src", "dst")
    val a = Graphs.pagerank(edges).collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    val b = Graphs.pagerank(edges.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(a.sameElements(b), "rank must not depend on physical partitioning")
  }
}
