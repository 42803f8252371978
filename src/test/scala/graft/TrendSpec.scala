package graft

import org.apache.spark.sql.functions._

import graft.operators.{TimeSeries, Trend}

/** Edge-case semantics of the trend metrics (FIXTURES A8.3):
  * previous=0 velocity boost, flat-history z=0, momentum /0 guard,
  * direction ladder. */
class TrendSpec extends SparkSuite {
  init()
  import spark.implicits._

  private lazy val metrics = {
    // k1: history bucket 10 (cnt 5), current 11 (cnt 8);
    // k2: appears only at the anchor bucket 11.
    val hourly = Seq(
      (10L, "k1", 5L), (11L, "k1", 8L), (11L, "k2", 4L)
    ).toDF("bucket", "key", "cnt")
    Trend.metricsAtAnchor(hourly).collect().map(r => r.getString(0) -> r).toMap
  }

  test("velocity: delta vs previous bucket") {
    assert(metrics("k1").getDouble(4) == 3.0) // 8 - 5
  }
  test("velocity: previous=0 doubles current (new-key boost)") {
    assert(metrics("k2").getDouble(4) == 8.0) // 4 * 2.0
  }
  test("z: empty/flat trailing history → 0") {
    assert(metrics("k2").getDouble(5) == 0.0)
  }
  test("z: nonzero with real history") {
    assert(metrics("k1").getDouble(5) > 0.0)
  }
  test("momentum: min(c6h/c24h,5)*2 capped") {
    assert(metrics("k1").getDouble(6) == 2.0)
    assert(metrics("k2").getDouble(6) == 2.0)
  }
  test("direction ladder") {
    assert(metrics("k1").getString(7) == "rising") // v1h=3>2, v6h=13/6>1
    assert(metrics("k2").getString(7) == "stable") // v6h=4/6 < 1
  }
  test("compound is positive and bounded") {
    metrics.values.foreach { r =>
      val c = r.getDouble(8)
      assert(c > 0.0 && c <= 100.0)
    }
  }

  test("sliding window sums respect gaps (range frame, not rows)") {
    val m = Seq((0L, "k", 1L), (1L, "k", 2L), (40L, "k", 4L))
      .toDF("bucket", "key", "cnt")
    val out = TimeSeries.slidingSum(m, 30).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) == 1L)
    assert(out(1L) == 3L)  // 1+2 within 30 buckets
    assert(out(40L) == 4L) // gap > 30 → earlier buckets excluded
  }

  test("rank delta classifies new and stable keys") {
    val cur = Seq(("a", 10L), ("b", 5L), ("c", 1L)).toDF("key", "cnt")
    val prev = Seq(("a", 9L), ("b", 6L)).toDF("key", "cnt")
    val mv = TimeSeries.rankDelta(cur, prev).collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(mv("a") == "stable")
    assert(mv("b") == "stable")
    assert(mv("c") == "new")
  }
}
