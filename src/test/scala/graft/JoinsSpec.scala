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
}
