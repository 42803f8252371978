package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.functions.Exact
import graft.sources.{Formats, Tables}

/** Interchange-format round-trips and the order-independence property
  * of the exact numeric aggregates. */
class FormatsSpec extends SparkSuite {
  init()
  import org.apache.spark.sql.functions._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("parquet/json/csv/orc round-trips preserve schema and values") {
    val base = Files.createTempDirectory("fmt").toString
    val orders = Tables.orders(spark, sf0001)
    val expected = rows(orders)
    Formats.supported.foreach { fmt =>
      Formats.write(orders, fmt, s"$base/$fmt")
      val back = Formats.read(spark, fmt, s"$base/$fmt", orders.schema)
      assert(back.schema == orders.schema, s"$fmt schema drift")
      assert(rows(back) == expected, s"$fmt value drift")
    }
  }

  test("decimal-accumulated sums are partition-order independent") {
    val li = Tables.lineitem(spark, sf0001)
    val layouts = Seq(
      li,
      li.repartition(17),
      li.repartition(3, col("l_returnflag")),
      li.orderBy(col("l_extendedprice").desc))
    val sums = layouts.map(
      _.agg(Exact.msum(col("l_extendedprice"))).collect().head.getDouble(0))
    assert(sums.distinct.size == 1, s"sums differ across layouts: $sums")
    // contrast: this is exactly what plain double sums do NOT guarantee
    val doubleSums = layouts.map(
      _.agg(sum(col("l_extendedprice"))).collect().head.getDouble(0))
    assert(doubleSums.forall(s => math.abs(s - sums.head) < 1e-4))
  }
}
