package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Physical-plan regression tests: the properties that make these
  * queries scale are asserted, not assumed. */
class PlanAssertionsSpec extends SparkSuite {
  init()

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf0001)

  test("dimension joins broadcast (no shuffle of the fact table)") {
    val p = plan(q("q08_brand_rollup"))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    assert(plan(q("q37_cosine_topk")).contains("TakeOrderedAndProject"))
    assert(plan(q("q23_top_users")).contains("TakeOrderedAndProject"))
  }

  test("predicates push into the parquet scan") {
    val p = q("q12_dynamic_filter").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("EqualTo(o_orderstatus,O)"))
    assert(p.contains("StringContains(o_orderpriority,URGENT)"))
  }

  test("column pruning reaches the scan") {
    val p = plan(q("q01_pricing_summary"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && !readSchema.contains("l_shipdate"))
  }

  test("aggregations are partial+final (map-side combine)") {
    val p = plan(q("q14_hourly_counts"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("no unpartitioned window over unbounded input in any shipped query") {
    // An empty PARTITION BY drags all rows to one task. Sanctioned
    // exceptions rank AFTER a top-k limit or over a key-bounded
    // aggregate (input provably small): pagination, wordcloud top-50,
    // rank-delta over the distinct-key snapshot.
    val bounded = Set("q11_pagination", "q44_wordcloud", "q22_rank_delta", "q54_api_trending")
    SparkEntry.queries.keys.filterNot(bounded).foreach { name =>
      val globals = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
      assert(globals.isEmpty, s"$name has unpartitioned window(s): $globals")
    }
  }

  test("bucketed co-located join is shuffle-free") {
    // warehouse.dir is a static conf — use explicit external-table
    // paths in a temp dir instead.
    val wh = Files.createTempDirectory("wh").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = graft.sources.Tables.orders(spark, sf0001)
      Bucketing.writeBucketed(o.select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", 4, Some(s"$wh/b_orders"))
      Bucketing.writeBucketed(
        graft.sources.Tables.lineitem(spark, sf0001)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines")),
        "b_lines", "l_orderkey", 4, Some(s"$wh/b_lines"))
      val joined = spark.table("b_orders").join(spark.table("b_lines"),
        col("o_orderkey") === col("l_orderkey"))
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
