package graft.streaming

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** A17 processing counters (ks/main.py:88,148 and
  * keyword_republisher.py:60-76,133-135): the reference mutates
  * per-service counters inline; here the engine's own
  * StreamingQueryListener supplies them without touching the dataflow.
  */
class Metrics extends StreamingQueryListener {
  val batches = new LongAdder
  val rows = new LongAdder
  @volatile var lastProgressJson: String = ""

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    batches.increment()
    rows.add(e.progress.numInputRows)
    lastProgressJson = e.progress.json
  }

  def snapshot: (Long, Long) = (batches.sum(), rows.sum())
}

object Metrics {
  def attach(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    m
  }
}
