package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.sources.Tables

/** Count-min sketch guarantees: one-sided error, exactness without
  * collisions, additive mergeability across shards. */
class SketchesSpec extends SparkSuite {
  init()
  import spark.implicits._

  private lazy val toks = Tables.documents(spark, sf0001)
    .select(explode(graft.functions.Text.tokens(col("text"))).as("token"))

  private lazy val exact: Map[String, Long] = toks.groupBy("token").count()
    .as[(String, Long)].collect().toMap

  test("CMS never underestimates, any width") {
    val sketch = Sketches.countMin(toks, col("token"), width = 16, depth = 3)
    val est = Sketches.cmsEstimate(sketch, toks.distinct(), col("token"),
      width = 16, depth = 3).as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"token $t underestimated: ${est(t)} < $n")
    }
  }

  test("CMS is exact when the width eliminates collisions") {
    val w = 1 << 16
    val sketch = Sketches.countMin(toks, col("token"), width = w, depth = 3)
    val est = Sketches.cmsEstimate(sketch, toks.distinct(), col("token"),
      width = w, depth = 3).as[(String, Long)].collect().toMap
    assert(est == exact)
  }

  test("shard sketches merge by cell addition into the full-corpus sketch") {
    val docs = Tables.documents(spark, sf0001)
    def tk(f: org.apache.spark.sql.DataFrame) =
      f.select(explode(graft.functions.Text.tokens(col("text"))).as("token"))
    val s1 = Sketches.countMin(tk(docs.filter(col("doc_id") % 2 === 0)), col("token"), 64, 3)
    val s2 = Sketches.countMin(tk(docs.filter(col("doc_id") % 2 === 1)), col("token"), 64, 3)
    val merged = s1.union(s2).groupBy("row", "col").agg(sum("c").as("c"))
      .as[(Int, Long, Long)].collect().map { case (r, c, n) => (r, c) -> n }.toMap
    val full = Sketches.countMin(tk(docs), col("token"), 64, 3)
      .as[(Int, Long, Long)].collect().map { case (r, c, n) => (r, c) -> n }.toMap
    assert(merged == full)
  }
}
