package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DSv2 connector contract: generated rows, filter pushdown narrowing
  * the generated range, column pruning reaching the reader. */
class CalendarSourceSpec extends SparkSuite {
  init()
  import spark.implicits._

  private def cal(days: Int = 30): DataFrame =
    spark.read.format("graft-calendar")
      .option("start", "2024-01-01").option("days", days).load()

  private def scanOf(df: DataFrame): BatchScanExec = {
    def all(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(all)
    }
    all(df.queryExecution.executedPlan).collectFirst { case b: BatchScanExec => b }.get
  }

  test("generates correct days: 2024-01-01 is a Monday, weekends flagged") {
    val rows = cal(7).orderBy("epoch_day")
      .select("day", "dow", "is_weekend")
      .as[(String, Int, Boolean)].collect().toSeq
    assert(rows.head == (("2024-01-01", 1, false)))
    assert(rows.map(_._1).toSeq == (1 to 7).map(d => f"2024-01-$d%02d"))
    assert(rows.filter(_._3).map(_._1) == Seq("2024-01-06", "2024-01-07"))
    assert(cal(365).count() == 365)
  }

  test("epoch_day range filters push into the generator (range narrowed, no residual rows)") {
    val jan1 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    val filtered = cal(30).filter(col("epoch_day") >= jan1 + 10 && col("epoch_day") < jan1 + 15)
    assert(filtered.count() == 5)
    val desc = scanOf(filtered).scan.description()
    assert(desc.contains(s"range=[${jan1 + 10}..${jan1 + 14}]"),
      s"pushdown must narrow the generated range: $desc")
    assert(desc.contains("GreaterThanOrEqual") && desc.contains("LessThan"))
  }

  test("column pruning reaches the reader") {
    val projected = cal().select("day")
    val scan = scanOf(projected)
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("day"))
    assert(projected.distinct().count() == 30)
  }

  test("non-range predicates stay as Spark-side residual filters") {
    val weekend = cal().filter(col("is_weekend"))
    assert(weekend.count() == 8, "Jan 2024: 4 full weekends in days 1..30")
    // the is_weekend predicate is not pushable: nothing lands in the
    // pushed list; Spark evaluates it post-scan
    assert(scanOf(weekend).scan.description().contains("pushed=[]"))
  }

  test("empty range after pushdown yields zero partitions, zero rows") {
    val jan1 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    assert(cal(30).filter(col("epoch_day") > jan1 + 100).count() == 0)
  }
}
