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
      // A pushed IN above this threshold silently degrades to a
      // min/max RANGE filter, which prunes nothing over
      // hash-distributed keys; the candidate-id probes of index
      // members (Dedup.prunedOldShingles) push up to 4096-value id
      // sets and need the literal set to reach parquet's row-group
      // dictionaries/stats (LayoutProbe --lsh).
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "5000")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    GraftFunctions.register(spark)
    spark
  }
}
