package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
