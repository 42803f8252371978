package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{GraftOps, TopKPerGroupExec}
import graft.sources.Tables

/** The custom grouped-top-k operator must agree with the window
  * formulation exactly and actually plan through TopKPerGroupExec. */
class TopKSpec extends SparkSuite {
  init()

  private lazy val ev = Tables.events(spark, sf0001)

  private def windowTopK(k: Int): Set[Long] = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    ev.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("event_id").collect().map(_.getLong(0)).toSet
  }

  test("custom operator plans through TopKPerGroupExec") {
    val df = GraftOps.topKPerGroup(ev, Seq("user_id"), "value", 3)
    // AQE wraps executedPlan; the pre-adaptive physical plan shows the node
    val execs = df.queryExecution.sparkPlan.collect { case t: TopKPerGroupExec => t }
    assert(execs.nonEmpty, df.queryExecution.sparkPlan.toString)
  }

  test("top-3 per user equals the window formulation") {
    // value has no duplicate per user at this SF, so the sets match
    val custom = GraftOps.topKPerGroup(ev, Seq("user_id"), "value", 3)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(custom == windowTopK(3))
  }

  test("keeps schema, bounds group size, orders descending within group") {
    val df = GraftOps.topKPerGroup(ev, Seq("event_type"), "value", 5)
    assert(df.schema == ev.schema)
    val rows = df.collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    assert(byType.size == 5)
    byType.values.foreach { g =>
      assert(g.length == 5)
      val vals = g.map(_.getAs[Double]("value")).toSeq
      assert(vals == vals.sorted.reverse)
    }
  }

  test("k larger than group returns the whole group") {
    val one = ev.filter(col("user_id") === 3)
    val out = GraftOps.topKPerGroup(one, Seq("user_id"), "value", 100000)
    assert(out.count() == one.count())
  }
}
