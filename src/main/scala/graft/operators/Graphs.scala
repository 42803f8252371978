package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph operators for corpus curation. A link-graph centrality score
  * is the standard quality prior of web-corpus pipelines (rank the
  * crawl frontier / weight domains before sampling); the reference has
  * no graph tier, so this generalizes its per-key trend scoring to
  * graph-structured keys the same way the dedup family generalizes
  * `existsByLink`.
  *
  * Scale design: every iteration is pure DataFrame algebra — a join of
  * the edge list with the current rank vector (shuffle on src) and a
  * contribution rollup (shuffle on dst). No driver-side graph state,
  * no adjacency materialization beyond the edge list itself.
  */
object Graphs {

  /** Fixed-iteration PageRank over an edge list.
    *
    * Simplified form (the common SQL formulation): dangling-node mass
    * is not redistributed, nodes with no in-edges hold the teleport
    * term. Deterministic cross-engine by construction:
    *  - per-iteration contribution sums accumulate in DECIMAL(38,18)
    *    (order-independent — see functions.Exact for the pattern), so
    *    Spark's partial-aggregation order cannot change the result;
    *  - the rank is re-quantized with round(·, 12) after every
    *    iteration, pinning each engine to the same doubles.
    *
    * Returns (node, pr) for every node appearing as src or dst. */
  def pagerank(edges: DataFrame, src: String = "src", dst: String = "dst",
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val e = edges.select(col(src).as("src"), col(dst).as("dst")).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // materialize the loop-invariant tables once — every iteration
    // would otherwise re-derive the whole edge pipeline (the plan
    // census showed 95 exchanges for 3 iterations before this)
    val ew = e.join(outdeg, "src").localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val base = nodes.crossJoin(broadcast(nodes.agg(count(lit(1)).as("nn"))))
      .localCheckpoint()
    var p = base.withColumn("pr", round(lit(1.0) / col("nn"), 12))
    for (i <- 1 to iters) {
      val contrib = ew
        .join(p.select(col("node").as("src"), col("pr")), "src")
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
      val sums = contrib.groupBy(col("node"))
        .agg(sum(col("c").cast(DecimalType(38, 18))).cast("double").as("s"))
      p = base.join(sums, Seq("node"), "left")
        .withColumn("pr", round(
          (lit(1.0) - damping) / col("nn") +
            lit(damping) * coalesce(col("s"), lit(0.0)), 12))
        .select(col("node"), col("nn"), col("pr"))
      // Truncate lineage every few rounds so deep iteration counts
      // don't compound the plan (values are unchanged; the rank table
      // is node-sized, cheap to materialize).
      if (i % 4 == 0 && i < iters) p = p.localCheckpoint()
    }
    p.select(col("node"), col("pr"))
  }
}
