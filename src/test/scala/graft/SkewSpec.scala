package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

/** Salted two-phase operators must be exactly equivalent to their
  * unsalted forms. */
class SkewSpec extends SparkSuite {
  init()

  private lazy val ev = Tables.events(spark, sf0001)

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("salted count == plain count") {
    val plain = toMap(ev.groupBy(col("event_type").as("key")).agg(count(lit(1)).as("cnt")))
    val salted = toMap(Skew.saltedCount(ev, col("event_type"), col("event_id")))
    assert(salted == plain)
  }

  test("salted sum == plain sum") {
    val plain = ev.groupBy(col("event_type")).agg(sum(col("user_id")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(ev, col("event_type"), col("user_id"), col("event_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join == plain join") {
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")))
      .withColumnRenamed("event_type", "t")
    val plain = ev.join(dim, col("event_type") === col("t")).count()
    val salted = Skew.saltedJoin(ev, dim, col("event_type"), col("t"), col("event_id")).count()
    assert(salted == plain)
  }

  test("zorder16: matches a reference Morton interleave bit-for-bit, bijective on the domain") {
    import spark.implicits._
    def refMorton(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    assert(refMorton(3L, 2L) == 13L) // sanity of the reference itself
    val samples = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val out = samples.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.operators.Bucketing.zorder16(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, z) =>
      assert(z == refMorton(a, b), s"zorder16($a,$b)")
    }
    assert(out.map(_._3).distinct.length == samples.length, "interleave must be injective")
  }
}
