package graft

import org.apache.spark.sql.functions._

import graft.model.Cdc

/** Dual-shape envelope handling (FIXTURES A5): payload-wrapped, bare,
  * malformed JSON (dropped), delete with only `before` populated. */
class CdcSpec extends SparkSuite {
  init()
  import spark.implicits._

  private lazy val parsed = Cdc.parse(Seq(
    // wrapped insert
    """{"payload":{"op":"c","after":{"id":1,"title":"t1","value":1.5},"source":{"table":"articles"},"ts_ms":1000}}""",
    // bare update
    """{"op":"u","after":{"id":1,"value":2.5},"source":{"table":"articles"},"ts_ms":2000}""",
    // bare delete: only before populated
    """{"op":"d","before":{"id":1,"value":2.5},"source":{"table":"articles"},"ts_ms":3000}""",
    // other table routes separately
    """{"payload":{"op":"r","after":{"id":7},"source":{"table":"media"},"ts_ms":1500}}""",
    // malformed → dropped
    """this is not json"""
  ).toDF("value"), col("value")).cache()

  test("malformed JSON rows are dropped") {
    assert(parsed.count() == 4)
  }

  test("both envelope shapes normalize identically") {
    val ops = parsed.filter(col("table") === "articles")
      .select("op").as[String].collect().sorted.toSeq
    assert(ops == Seq("c", "d", "u"))
  }

  test("upsert filter keeps c/r/u only") {
    assert(Cdc.upserts(parsed).count() == 3)
  }

  test("delete branch carries before image, null after") {
    val d = Cdc.deletes(parsed).collect().head
    assert(d.getAs[org.apache.spark.sql.Row]("before").getAs[Long]("id") == 1L)
    assert(d.getAs[org.apache.spark.sql.Row]("after") == null)
  }

  test("table router") {
    assert(Cdc.route(parsed, "media").count() == 1)
    assert(Cdc.route(parsed, "unknown").count() == 0)
  }

  test("wrapped after-image values survive the round trip") {
    val r = parsed.filter(col("op") === "c").collect().head
    assert(r.getAs[org.apache.spark.sql.Row]("after").getAs[Double]("value") == 1.5)
    assert(r.getAs[Long]("ts_ms") == 1000L)
  }
}
