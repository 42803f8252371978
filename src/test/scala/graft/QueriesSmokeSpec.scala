package graft

/** Every declared query must run at sf0.001 and produce a readable
  * schema; every oracle key must have a matching query. */
class QueriesSmokeSpec extends SparkSuite {
  init()

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
