package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** S5 JDBC source/sink exercised for real against embedded Derby —
  * the read path the reference serves from MySQL/JPA
  * (ArticleRepository.java:16-93), minus only the vendor URL. */
class JdbcSpec extends SparkSuite {
  init()

  private lazy val url = {
    val dir = Files.createTempDirectory("derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE articles (id BIGINT NOT NULL, title VARCHAR(100), views INT)")
      val ins = conn.prepareStatement("INSERT INTO articles VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"title-$i"); ins.setInt(3, i * 10)
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()
  }

  test("partitioned JDBC read fans out range predicates and round-trips") {
    seed()
    val df = Jdbc.read(spark, url, "articles", "ID", 1L, 100L, 4)
    assert(df.rdd.getNumPartitions == 4, "ranged read must produce one task per range")
    assert(df.count() == 100)
    assert(df.agg(sum(col("VIEWS"))).head.getLong(0) == (1 to 100).map(_ * 10).sum)

    // filter pushdown: the predicate must reach the JDBC scan
    val filtered = Jdbc.read(spark, url, "articles", "ID", 1L, 100L, 4)
      .filter(col("ID") > 90)
    assert(filtered.count() == 10)
    val plan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"),
      s"JDBC filter not pushed:\n$plan")

    // write back to a second table, read with the single-connection path
    Jdbc.write(df.filter(col("ID") <= 5), url, "articles_top", SaveMode.Overwrite)
    val back = Jdbc.readSingle(spark, url, "articles_top")
    assert(back.count() == 5)
    assert(back.select(sum(col("VIEWS"))).head.getLong(0) == 150)
  }
}
