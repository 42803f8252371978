package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** ST6: explicit keyed state in the state store — the Spark analog of
  * the reference's in-memory per-keyword running maps with expiry
  * (realtime_keyword_aggregator.py:32-36,94-161). Built-in windowed
  * aggregations cover most of the surface; this operator exists for
  * state the built-ins can't express: a per-key running total that
  * lives across triggers and EVICTS after `ttl` of event-time silence
  * (the reference expires idle keyword entries the same way).
  *
  * Scale: state is per-key in the checkpointed state store (RocksDB
  * provider on a cluster), partitioned by the group key — no driver
  * state; eviction is watermark-driven so idle keys cannot accumulate
  * unboundedly.
  */
object Stateful {

  case class RunningTotal(key: String, total: Long)

  case class Keyed(key: String, ts: Timestamp)

  /** Per-key running event counts with event-time TTL (watermark
    * applied here, on the grouping input — a projection would drop a
    * caller-side watermark). Emits the updated total for a key
    * whenever the key receives events in a trigger; a key silent past
    * the watermark for longer than `ttlMs` is evicted (its next event
    * restarts from zero). */
  def runningCounts(events: DataFrame, keyCol: String, tsCol: String,
      ttlMs: Long, watermarkDelay: String = "0 seconds"): Dataset[RunningTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    // plain local val: the update closure runs on executors, where a
    // captured Dataset reference is unusable
    val streaming = events.isStreaming
    val projected = events.selectExpr(
      s"CAST($keyCol AS STRING) AS key",
      s"to_timestamp($tsCol) AS ts")
    val keyed = (if (streaming) projected.withWatermark("ts", watermarkDelay)
      else projected).as[Keyed]

    def update(key: String, rows: Iterator[Keyed],
        state: GroupState[Long]): Iterator[RunningTotal] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var n = 0L
        var maxTs = Long.MinValue
        rows.foreach { r => n += 1; maxTs = math.max(maxTs, r.ts.getTime) }
        val total = state.getOption.getOrElse(0L) + n
        state.update(total)
        // Evict when the watermark passes the key's newest event + ttl.
        // (Batch execution has no watermark/timeouts; setting one there
        // is meaningless and throws, hence the streaming guard.)
        if (streaming) state.setTimeoutTimestamp(maxTs + ttlMs)
        Iterator.single(RunningTotal(key, total))
      }
    }

    keyed.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** The same running totals on Spark 4's transformWithState — the
    * modern stateful API (SPARK-46815): typed per-key ValueState with
    * a NATIVE TTL (TTLConfig) instead of hand-rolled timeout
    * bookkeeping, plus composable list/map state and timers for richer
    * processors. Requires the RocksDB state store provider
    * (set `spark.sql.streaming.stateStore.providerClass`); the
    * flatMapGroupsWithState form above remains for HDFS-backed state
    * and event-time eviction semantics. */
  class RunningCountProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, Keyed, RunningTotal] {
    @transient private var total: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Long]("total", Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[Keyed],
        timerValues: TimerValues): Iterator[RunningTotal] = {
      val t = (if (total.exists()) total.get() else 0L) + rows.size
      total.update(t)
      Iterator.single(RunningTotal(key, t))
    }
  }

  /** runningCounts on the transformWithState tier. With `ttl` set,
    * a key idle (in processing time) longer than the duration is
    * evicted without any per-key timer code — BUT processing-time TTL
    * makes the engine schedule a wake-up micro-batch per trigger
    * interval, so pair it with a real `Trigger.ProcessingTime`
    * cadence in deployment (measured locally: trigger(0) busy-loops
    * hundreds of empty batches, each paying the checkpoint-log
    * write). `ttl = None` runs in TimeMode.None — batches fire only
    * on data — which is also what the replay spec exercises. */
  def runningCountsTws(events: DataFrame, keyCol: String, tsCol: String,
      ttl: Option[java.time.Duration] = None): Dataset[RunningTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (cfg, mode) = ttl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None => (TTLConfig.NONE, TimeMode.None())
    }
    events.selectExpr(
        s"CAST($keyCol AS STRING) AS key",
        s"to_timestamp($tsCol) AS ts").as[Keyed]
      .groupByKey(_.key)
      .transformWithState(new RunningCountProcessor(cfg), mode, OutputMode.Update())
  }
}
