package graft

import graft.operators.Joins

/** As-of join semantics pinned on a synthetic case: latest
  * at-or-before match per key, equal-timestamp rows match, keys with
  * no prior right row get null. */
class JoinsSpec extends SparkSuite {
  init()
  import spark.implicits._

  test("asof: latest at-or-before, equal-ts matches, missing -> null") {
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 8L, "pre"), (2L, 5L, "c"))
      .toDF("k", "ts", "ev")
    val right = Seq((1L, 8L, 100.0), (1L, 15L, 200.0))
      .toDF("k", "rts", "v")
    val out = Joins.asof(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .collect()
      .map(r => r.getAs[String]("ev") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble))
      .toMap
    assert(out == Map(
      "a" -> Some(100.0),  // 8 <= 10 < 15
      "b" -> Some(200.0),  // 15 <= 20
      "pre" -> Some(100.0), // equal ts matches (>= semantics)
      "c" -> None))         // no right rows for key 2
  }

  test("asof: left columns pass through unchanged") {
    val left = Seq((1L, 10L, "x")).toDF("k", "ts", "ev")
    val right = Seq((1L, 9L, 7.0)).toDF("k", "rts", "v")
    val out = Joins.asof(left, right, Seq("k"), "ts", "rts", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "ts", "ev", "asof_v"))
  }

  import org.apache.spark.sql.functions._

  private def tsDf(rows: Seq[(Long, Long)], tsName: String) =
    rows.toDF("k", "_ms")
      .withColumn(tsName, timestamp_micros(col("_ms") * 1000L))
      .drop("_ms")
      .withColumn("id", monotonically_increasing_id())

  test("range join: matches the brute-force theta join, inclusive bounds") {
    // deterministic pseudo-random ms offsets over ~100 s, 3 keys
    val lrows = (0 until 60).map(i => ((i % 3).toLong, (i.toLong * 7919) % 100000))
    val rrows = (0 until 80).map(i => ((i % 3).toLong, (i.toLong * 104729) % 100000))
    val l = tsDf(lrows, "lts")
    val r = tsDf(rrows, "rts")
    val got = Joins.rangeJoin(l, r, Seq("k"), "lts", "rts", 2000L, 12000L)
      .select(col("id"), col("r_id"))
      .as[(Long, Long)].collect().toSet
    val want = l.as("a").join(r.as("b"),
        col("a.k") === col("b.k") &&
          col("b.rts") >= col("a.lts") + expr("interval 2 seconds") &&
          col("b.rts") <= col("a.lts") + expr("interval 12 seconds"))
      .select(col("a.id"), col("b.id"))
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "degenerate test: brute force found no pairs")
    assert(got == want)
  }

  test("range join: exact boundary rows included, just-outside excluded") {
    val l = tsDf(Seq((1L, 10000L)), "lts")
    val r = tsDf(Seq((1L, 10000L), (1L, 15000L), (1L, 15001L), (2L, 12000L)), "rts")
    val got = Joins.rangeJoin(l, r, Seq("k"), "lts", "rts", 0L, 5000L)
      .select(unix_micros(col("r_rts"))).as[Long].collect().toSet
    // lower bound 0 → same-instant matches; upper 5000 ms inclusive; key 2 never
    assert(got == Set(10000000L, 15000000L))
  }
}
