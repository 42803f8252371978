package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/** Count-min sketch — the constant-memory frequency estimator that
  * completes the engine's sketch tier (HLL++ distinct counts via the
  * ApproxDistinctRewrite rule, Bloom membership in
  * Curation.bloomContamination, MinHash/SimHash similarity). At
  * corpus scale a full token groupBy is a shuffle over billions of
  * distinct keys; a CMS is a depth×width integer grid that answers
  * point frequency queries with one-sided error (never under,
  * over by at most εN with ε = e/width at the usual depth=ln(1/δ)).
  *
  * The hash family is the engine's portable salted recipe
  * (rolling_hash64 ∘ md5) — the same construction the Bloom oracle
  * replays in DuckDB — so the WHOLE sketch, including collisions, is
  * bit-reproducible by an external engine.
  */
object Sketches {

  private def cell(item: Column, row: Int, width: Int): Column =
    pmod(GraftFunctions.rolling_hash64(
      md5(concat(lit(s"cms$row:"), item.cast("string")))), lit(width.toLong))

  /** Build the sketch: one row per non-empty cell — (row, col, c).
    * One explode (×depth) + one aggregation with map-side combine;
    * the result is at most depth·width rows regardless of input size,
    * and cell grids from disjoint corpus shards merge by addition
    * (the property that makes a CMS distributable). */
  def countMin(items: DataFrame, item: Column,
      width: Int = 1024, depth: Int = 3): DataFrame = {
    require(width > 0 && depth > 0)
    GraftFunctions.register(items.sparkSession)
    items.select(item.as("_it"))
      .select(posexplode(array((0 until depth).map(r =>
        cell(col("_it"), r, width)): _*)).as(Seq("row", "col")))
      .groupBy(col("row"), col("col")).agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimates for `queries` against a built sketch:
    * est(x) = min over rows of cell(row, h_row(x)). The sketch side
    * is ≤ depth·width rows — broadcast by construction — so querying
    * never shuffles the query stream. Missing cells read as 0. */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, item: Column,
      width: Int = 1024, depth: Int = 3): DataFrame = {
    GraftFunctions.register(queries.sparkSession)
    val keyed = queries.select(item.as("item"))
      .select(col("item"), posexplode(array((0 until depth).map(r =>
        cell(col("item"), r, width)): _*)).as(Seq("row", "col")))
    keyed.join(broadcast(sketch), Seq("row", "col"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }
}
