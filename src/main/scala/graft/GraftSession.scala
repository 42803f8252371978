package graft

import org.apache.spark.sql.SparkSession

import graft.plans.{GraftExtensions, GraftFunctions}

/** Session factory with the engine's recommended configuration:
  * AQE (runtime re-plan + skew-join splitting), UTC, right-sized
  * shuffle parallelism, Graft optimizer rules and native functions.
  *
  * On a cluster, shuffle partitions scale with executors (2–3× total
  * cores is the usual starting point); AQE coalesces small partitions
  * at runtime either way.
  */
object GraftSession {
  def create(
      appName: String = "graft",
      master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // ns-timestamp parquet (events table) reads as raw int64; the
      // flag lives here, not inside a table loader, so no read path
      // mutates session state as a side effect.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark's default parquet timestamp encoding is INT96, whose
      // row groups carry NO usable min/max — a pushed time-range
      // predicate then prunes NOTHING, silently (measured r14: a
      // minute-sorted table scanned 100% under INT96, 1.1% as INT64
      // micros). Every graft writer emits INT64 micros so serving
      // tables keep time-range pruning; readers are unaffected.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    GraftFunctions.register(spark)
    spark
  }
}
