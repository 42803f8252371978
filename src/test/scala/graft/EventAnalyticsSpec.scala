package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Funnel ordering semantics and cohort-retention arithmetic pinned on
  * hand-built event streams. */
class EventAnalyticsSpec extends SparkSuite {
  init()
  import spark.implicits._

  private val steps = Seq("signup", "view", "purchase")

  test("funnel: steps must complete in order; ties (>=) count") {
    val ev = Seq(
      // u1: full ordered chain
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 30L, "purchase"),
      // u2: purchase BEFORE view → chain stops at view
      (2L, 10L, "signup"), (2L, 30L, "view"), (2L, 20L, "purchase"),
      // u3: view before signup doesn't count; later view does
      (3L, 10L, "view"), (3L, 20L, "signup"), (3L, 40L, "view"),
      // u4: simultaneous signup+view (tie) counts, no purchase
      (4L, 10L, "signup"), (4L, 10L, "view"),
      // u5: never signs up → not in the frame at all
      (5L, 10L, "view"), (5L, 20L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val f = EventAnalytics.funnel(ev, col("user_id"), col("ts"), col("event_type"), steps)
    val reached = f.select(col("key"), col("reached")).as[(Long, Long)].collect().toMap
    assert(reached == Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    // u2's view at 30 is its t2; the earlier purchase at 20 must not match t2
    val t = f.filter(col("key") === 2L).select(col("t2"), col("t3")).head()
    assert(t.getLong(0) == 30L && t.isNullAt(1))
  }

  test("funnel: earliest qualifying timestamp wins at every step") {
    val ev = Seq(
      (1L, 5L, "signup"), (1L, 1L, "signup"), // min signup = 1
      (1L, 3L, "view"), (1L, 7L, "view"))     // min view >= 1 is 3, not 7
      .toDF("user_id", "ts", "event_type")
    val f = EventAnalytics.funnel(ev, col("user_id"), col("ts"), col("event_type"), steps)
    val r = f.head()
    assert(r.getAs[Long]("t1") == 1L && r.getAs[Long]("t2") == 3L)
  }

  test("cohort retention: offsets count distinct keys, cohort = first week") {
    val wk = 604800L
    val ev = Seq(
      // u1 active weeks 0,1,2 ; u2 active weeks 0,2 ; u3 active week 1 only
      (1L, 0L), (1L, wk + 5L), (1L, 2 * wk + 5L), (1L, 10L), // dup week-0 row collapses
      (2L, 5L), (2L, 2 * wk),
      (3L, wk + 1L))
      .toDF("user_id", "sec")
    val out = EventAnalytics.cohortRetention(ev, col("user_id"), col("sec"))
      .select(col("cohort_week"), col("week_offset"), col("n_users"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 0L, 2L),  // u1, u2 in cohort 0 at offset 0
      (0L, 1L, 1L),  // only u1 active week 1
      (0L, 2L, 2L),  // u1 and u2 active week 2
      (1L, 0L, 1L))) // u3's own cohort
  }
}
