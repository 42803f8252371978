package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an (actor, time, type) stream — the
  * funnel and cohort-retention operators every event pipeline grows
  * (the reference's alert topology is the "did X happen" degenerate
  * case; these are the ordered-sequence and lifecycle generalizations).
  *
  * Both are pure aggregation algebra: no per-actor driver loops, no
  * sort-the-whole-actor-history mapGroups. Scale notes inline.
  */
object EventAnalytics {

  /** Ordered funnel: for each key, the earliest time each step of
    * `steps` completes, where step i+1 must occur AT OR AFTER the
    * key's step-i completion (ties allowed — simultaneous events
    * count, matching the SQL `>=` the oracle replays).
    *
    * Returns one row per key that completed step 1: `(key, t1..tk)`
    * with `t<i>` null once the chain breaks, plus `reached` = number
    * of completed steps.
    *
    * Shape: one filtered min-aggregation per step joined back on the
    * key — k shuffles on the key column, each with map-side partial
    * mins, all inside whole-stage codegen. The classic alternative
    * (sort each key's full history in one task) holds an actor's
    * whole event list in memory; this never does, so a single hot
    * key (bot traffic) cannot OOM a task. */
  def funnel(events: DataFrame, key: Column, ts: Column, step: Column,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps, "steps must be distinct")
    val base = events.select(key.as("key"), ts.as("_ts"), step.as("_s"))
    var cur = base.filter(col("_s") === steps.head)
      .groupBy(col("key")).agg(min(col("_ts")).as("t1"))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      val prev = s"t${i + 1}"
      val nxt = s"t${i + 2}"
      val nextMin = base.filter(col("_s") === st)
        .join(cur.select(col("key"), col(prev)), "key")
        .filter(col("_ts") >= col(prev))
        .groupBy(col("key")).agg(min(col("_ts")).as(nxt))
      cur = cur.join(nextMin, Seq("key"), "left")
    }
    val reached = steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    cur.withColumn("reached", reached.cast("long"))
  }

  /** Weekly cohort retention: cohort = the key's first-ever activity
    * week, and for every (cohort, offset) the number of distinct keys
    * active `offset` weeks after their cohort week.
    *
    * Weeks are integer epoch-week indexes (`floor(epochSec/604800)`),
    * not calendar weeks — no timezone/week-start semantics to align
    * across engines, pure BIGINT arithmetic.
    *
    * Shape: distinct (key, week) first — collapses the raw stream to
    * at most |keys|·|weeks| rows before anything else; then a min per
    * key (map-side combined) and one equi-join back. The final count
    * needs no `countDistinct` because (key, week) is already unique. */
  def cohortRetention(events: DataFrame, key: Column, tsSec: Column): DataFrame = {
    val kw = events.select(key.as("key"), floor(tsSec / 604800L).cast("long").as("wk"))
      .distinct()
    val cohort = kw.groupBy(col("key")).agg(min(col("wk")).as("cohort_week"))
    kw.join(cohort, "key")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-group value percentiles (p50/p95/p99-style SLO metrics) —
    * EXACT linear-interpolated quantiles (the R-7 definition both
    * Spark's `percentile` and DuckDB's `quantile_cont` implement, so
    * the result is oracle-replayable), one column per requested
    * fraction, rounded to 6.
    *
    * Scale: exact Percentile buffers per-group value counts — right
    * for the gate and for bounded-cardinality values; at 100 TB of
    * raw doubles switch `spark.graft.approxPercentile=true` and the
    * [[graft.plans.ApproxPercentileRewrite]] optimizer rule swaps in
    * ApproximatePercentile (a fixed-size QuantileSummaries sketch
    * with map-side combine) for the SAME query text — the
    * exact-in-tests / approximate-in-production deployment choice the
    * approxDistinct flag already provides for COUNT(DISTINCT). */
  def valuePercentiles(events: DataFrame, group: Column, value: Column,
      ps: Seq[Double]): DataFrame =
    spreadPercentiles(events.groupBy(group.as("group")), value, ps)

  /** The windowed (SLO-dashboard) form: per (tumbling window, group)
    * percentiles. Batch/stream polymorphic — the same plan runs under
    * Structured Streaming (complete mode; the Percentile buffer lives
    * in the state store and re-emits per trigger), and the
    * MemoryStream replay spec pins stream == batch. The approx
    * rewrite flag applies identically: a GK sketch state is what a
    * production SLO stream would carry.
    *
    * Complete mode re-emits EVERY window ever opened on each trigger
    * and never expires state — right for replay/backfill and the
    * batch gate (q140), wrong for an unbounded production stream. The
    * long-running SLO deployment is [[windowedValuePercentilesAppend]],
    * whose state and output stay watermark-bounded. */
  def windowedValuePercentiles(events: DataFrame, ts: Column, group: Column,
      value: Column, ps: Seq[Double], windowDur: String = "1 hour"): DataFrame =
    spreadPercentiles(
      events.groupBy(window(ts, windowDur).as("w"), group.as("group")),
      value, ps)
      .withColumn("window_start", col("w.start")).drop("w")

  /** Watermarked APPEND-mode windowed percentiles — the production SLO
    * stream (the q19 epoch-window recipe applied to the percentile
    * agg): each (window, group) row is emitted EXACTLY ONCE, when the
    * event-time watermark passes the window end, and its Percentile /
    * GK-sketch state is evicted from the store at that point — both
    * per-trigger output and state-store size are bounded by the open
    * window count, not by stream lifetime (the complete-mode form
    * grows with every window ever seen).
    *
    * `tsCol` is a column NAME (withWatermark's contract). On batch
    * input the watermark is a no-op and the result equals
    * [[windowedValuePercentiles]]; under streaming the replay spec
    * pins stream == batch over closed windows and asserts eviction. */
  def windowedValuePercentilesAppend(events: DataFrame, tsCol: String,
      group: Column, value: Column, ps: Seq[Double],
      windowDur: String = "1 hour", watermark: String = "0 seconds"): DataFrame =
    spreadPercentiles(
      events.withWatermark(tsCol, watermark)
        .groupBy(window(col(tsCol), windowDur).as("w"), group.as("group")),
      value, ps)
      .withColumn("window_start", col("w.start")).drop("w")

  /** Column name for fraction p: p50, p95, p99, p99_5, p99_9 — the
    * full fraction, NOT a rounded integer (rounding would collide
    * 0.995 and 0.999 onto "p100" and the later withColumn would
    * silently overwrite the earlier percentile). */
  private def pName(p: Double): String =
    // shortest-decimal rendering (Double.toString), NOT BigDecimal(d)
    // which would expand the raw binary value to 34 digits
    "p" + BigDecimal(java.lang.Double.toString(p * 100)).underlying
      .stripTrailingZeros.toPlainString.replace(".", "_")

  private def spreadPercentiles(
      grouped: org.apache.spark.sql.RelationalGroupedDataset,
      value: Column, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val names = ps.map(pName)
    require(names.distinct == names, s"duplicate percentile columns: $names")
    val agged = grouped.agg(count(lit(1)).as("n_events"),
      percentile(value, typedlit(ps)).as("_p"))
    ps.zipWithIndex.foldLeft(agged) { case (df, (p, i)) =>
      df.withColumn(pName(p), round(element_at(col("_p"), i + 1), 6))
    }.drop("_p")
  }
}
