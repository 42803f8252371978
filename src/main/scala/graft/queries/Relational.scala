package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Exact
import graft.sources.Tables

/** Relational operator inventory (SURVEY §2.2–§2.6) expressed over the
  * driver's TPC-H-ish testdata.
  *
  * Mapping to the reference (file:line cites are into /root/reference):
  *  - A10 category stats   — crawler-service/.../ArticleRepository.java:56-65
  *  - A11 count-by-category — ArticleRepository.java:32-33
  *  - A12 distinct counts  — ArticleRepository.java:38-45
  *  - A13 global max       — ArticleRepository.java:50-51
  *  - A14 daily counts     — ArticleRepository.java:70-79
  *  - J1/J2 FK joins       — init-postgres/init.sql:20,38
  *  - J5/F9 anti-join dedup — ArticleRepository.java:21
  *  - F6 dynamic predicates — ArticleServiceImpl.java:190-222
  *  - O2/O3 sort+pagination — ArticleController.java:30-37
  *
  * Scale notes: aggregations are partial+final (map-side combine free
  * from Catalyst); dimension joins broadcast the small side explicitly;
  * the customer rollup aggregates the fact table BEFORE joining so the
  * shuffle carries pre-reduced rows, not raw orders.
  */
object Relational {
  import QueryDef.sql

  private val one = lit(1).cast(DecimalType(18, 2))

  val q01 = sql(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        Exact.dsum(col("l_quantity"), 2).as("sum_qty"),
        Exact.msum(col("l_extendedprice")).as("sum_base"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (one - col("l_discount").cast(DecimalType(18, 2)))).cast("double").as("sum_disc"),
        (Exact.dsum(col("l_discount"), 2) / count(lit(1))).as("avg_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q02 = sql(
    "q02_priority_stats",
    """SELECT o_orderpriority, count(*) AS n,
      |  strftime(min(o_orderdate), '%Y-%m-%d') AS first_day,
      |  strftime(max(o_orderdate), '%Y-%m-%d') AS last_day,
      |  max(o_totalprice) AS max_price
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_day"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_day"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderpriority"))
  }

  val q03 = sql(
    "q03_status_counts",
    "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus") {
    (s, d) =>
      Tables.orders(s, d).groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
  }

  val q04 = sql(
    "q04_distinct_counts",
    """SELECT count(DISTINCT event_type) AS n_types, count(DISTINCT user_id) AS n_users,
      |count(*) AS n FROM events""".stripMargin) { (s, d) =>
    Tables.events(s, d).agg(
      countDistinct(col("event_type")).as("n_types"),
      countDistinct(col("user_id")).as("n_users"),
      count(lit(1)).as("n"))
  }

  val q05 = sql(
    "q05_global_max",
    """SELECT strftime(max(o_orderdate), '%Y-%m-%d') AS last_day, max(o_totalprice) AS max_price,
      |max(o_orderkey) AS max_key FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d).agg(
      date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_day"),
      max(col("o_totalprice")).as("max_price"),
      max(col("o_orderkey")).as("max_key"))
  }

  val q06 = sql(
    "q06_daily_counts",
    """SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY day DESC LIMIT 30""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day").desc)
      .limit(30)
  }

  // J1-style one-to-many rollup. Aggregate the fact table first so the
  // join input is one row per key, then join the (small) dimension —
  // at 100 TB the orders agg shuffles pre-reduced partials only.
  val q07 = sql(
    "q07_customer_order_rollup",
    """SELECT c_custkey, c_mktsegment, COALESCE(n_orders, 0) AS n_orders,
      |  COALESCE(sum_spend, CAST(0 AS DOUBLE)) AS sum_spend
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, count(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_spend
      |  FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val perCust = Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), Exact.msum(col("o_totalprice")).as("sum_spend"))
    Tables.customer(s, d)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"), col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("sum_spend"), lit(0.0)).as("sum_spend"))
      .orderBy(col("c_custkey"))
  }

  // J2-style dimension enrichment: both dims broadcast — zero shuffle
  // on the fact side beyond the final aggregation.
  val q08 = sql(
    "q08_brand_rollup",
    """SELECT p_brand, count(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_size < 15
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_size") < 15)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), Exact.dsum(col("l_quantity"), 2).as("sum_qty"))
      .orderBy(col("p_brand"))
  }

  // F9/J5 existence semantics (existsByLink dedup) as anti/semi joins.
  val q09 = sql(
    "q09_customers_without_urgent_orders",
    """SELECT c_mktsegment, count(*) AS n FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  val q10 = sql(
    "q10_customers_with_orders",
    """SELECT c_mktsegment, count(*) AS n FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  // O2/O3: dynamic sort + page-3/size-20 pagination. A global
  // row_number() window would sort ALL data on one partition; instead
  // take the distributed top (page+1)*size via orderBy+limit (Spark
  // plans TakeOrderedAndProject) and rank only those few rows.
  val q11 = sql(
    "q11_pagination",
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS day, o_totalprice, rn FROM (
      |  SELECT o_orderkey, o_orderdate, o_totalprice,
      |    row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey) AS rn
      |  FROM orders) t WHERE rn BETWEEN 41 AND 60 ORDER BY rn""".stripMargin) { (s, d) =>
    val w = Window.orderBy(col("o_orderdate").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
      .limit(60)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn").between(41, 60))
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        col("o_totalprice"), col("rn"))
      .orderBy(col("rn"))
  }

  // F6/F7: composable dynamic predicate builder.
  val q12 = sql(
    "q12_dynamic_filter",
    """SELECT count(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_orderstatus = 'O'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND o_orderpriority LIKE '%URGENT%'""".stripMargin) { (s, d) =>
    val conds = Seq(
      col("o_orderstatus") === "O",
      col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp"),
      col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"),
      col("o_orderpriority").like("%URGENT%"))
    Tables.orders(s, d).filter(conds.reduce(_ && _))
      .agg(count(lit(1)).as("n"), Exact.msum(col("o_totalprice")).as("sum_price"))
  }

  // W1-style top-K per group (word-cloud top-50 analog).
  val q13 = sql(
    "q13_topk_per_segment",
    """SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rk
      |  FROM customer) t WHERE rk <= 5 ORDER BY c_mktsegment, rk""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rk"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  val all: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13)
}
