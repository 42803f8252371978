package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity
import graft.sources.Tables

/** The SQL front door: registered views + spark.sql must agree with
  * the DataFrame API; plus multi-probe LSH recall ordering. */
class SqlSurfaceSpec extends SparkSuite {
  init()
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("spark.sql over registered views matches the DataFrame plans") {
    Tables.registerAll(spark, sf0001)
    val sqlQ1 = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    assert(rows(sqlQ1) == rows(SparkEntry.queries("q01_pricing_summary")(spark, sf0001)))

    val sqlTop = spark.sql(
      "SELECT user_id, count(*) AS n FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20")
    assert(rows(sqlTop) == rows(SparkEntry.queries("q23_top_users")(spark, sf0001)))
  }

  test("registered events view carries the converted timestamp type") {
    Tables.registerAll(spark, sf0001)
    val t = spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType
    assert(t == org.apache.spark.sql.types.TimestampType)
  }

  test("multi-probe LSH: more probes, monotonically better-or-equal recall") {
    val emb = Tables.embeddings(spark, sf0001)
    val truth = Similarity.bruteForceTopK(emb, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    def recall(nProbe: Int): Double =
      Similarity.multiProbeTopK(emb, 64, 8, 0L, 10, nProbe)
        .select("vec_id").as[Long].collect().count(truth) / 10.0
    val r1 = recall(1)
    val r4 = recall(4)
    val r8 = recall(8)
    assert(r1 <= r4 && r4 <= r8, s"recall not monotone: $r1 $r4 $r8")
    assert(r8 > r1 || r1 == 1.0, "probing more buckets should help on this corpus")
  }
}
