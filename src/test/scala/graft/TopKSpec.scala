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

  test("composite ordering (value desc, event_id asc) matches the window formulation") {
    // event_type has few distinct values → heavy value ties are
    // impossible, so force ties by bucketing value to 1 decimal
    val bucketed = ev.withColumn("vb", round(col("value"), 0))
    val w = Window.partitionBy(col("user_id")).orderBy(col("vb").desc, col("event_id"))
    val expect = bucketed.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val got = GraftOps.topKPerGroupOrdered(bucketed, Seq("user_id"),
        Seq("vb" -> false, "event_id" -> true), 4)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("null ordering follows Spark defaults: DESC nulls last, ASC nulls first") {
    import spark.implicits._
    val df = Seq(("g", Some(5L), 1L), ("g", None, 2L), ("g", Some(9L), 3L),
      ("g", Some(1L), 4L)).toDF("grp", "v", "id")
    // DESC: nulls sort last → the null row is picked only when k
    // exceeds the non-null count
    val d2 = GraftOps.topKPerGroupOrdered(df, Seq("grp"), Seq("v" -> false), 2)
      .collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Long])).toSeq
    assert(d2 == Seq(Some(9L), Some(5L)), d2.toString)
    val d4 = GraftOps.topKPerGroupOrdered(df, Seq("grp"), Seq("v" -> false), 4)
      .collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Long])).toSeq
    assert(d4 == Seq(Some(9L), Some(5L), Some(1L), None), d4.toString)
    // ASC: nulls sort first → rank 1 is the null row
    val a2 = GraftOps.topKPerGroupOrdered(df, Seq("grp"), Seq("v" -> true), 2)
      .collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Long])).toSeq
    assert(a2 == Seq(None, Some(1L)), a2.toString)
  }

  test("long order keys beyond 2^53 compare exactly (no Double cast)") {
    import spark.implicits._
    val base = 1L << 53 // Double can no longer represent base+1 or base+3
    val df = Seq(
      ("g", base + 1L), ("g", base + 2L), ("g", base + 3L), ("g", base),
      ("h", base + 3L), ("h", base + 1L)).toDF("grp", "v")
    val top2 = GraftOps.topKPerGroupOrdered(df, Seq("grp"), Seq("v" -> false), 2)
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    assert(top2("g") == Seq(base + 3L, base + 2L), top2("g").toString)
    assert(top2("h") == Seq(base + 3L, base + 1L), top2("h").toString)
  }
}
