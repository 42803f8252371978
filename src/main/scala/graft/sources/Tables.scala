package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * At cluster scale these would be catalog tables (partitioned by date,
  * bucketed by join key); here they are plain parquet reads. Column
  * pruning and predicate pushdown still apply — callers select/filter
  * and Catalyst pushes into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across driver
    * generations — TIMESTAMP(NANOS) (readable only as int64 via
    * `spark.sql.legacy.parquet.nanosAsLong=true`), then TIMESTAMP(µs)
    * without UTC adjustment (inferred as TIMESTAMP_NTZ). Normalize
    * BY SCHEMA to one downstream contract: session-zoned TimestampType
    * at µs precision. Sessions run with timeZone=UTC (GraftSession /
    * Verify / Bench / test suite), so the NTZ→timestamp cast is
    * wall-clock-preserving and matches the DuckDB oracle's naive read
    * of the same file. The nanos branch floor-divides with integer DIV
    * (a double division would lose precision at ~1.7e18 ns). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos file read under nanosAsLong
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // the cast is wall-clock-preserving ONLY under a UTC session —
        // fail loudly (like the old nanosAsLong path) instead of
        // silently shifting every timestamp vs the oracle's naive read
        require(s.conf.get("spark.sql.session.timeZone", "") == "UTC",
          "events(): TimestampNTZ→Timestamp cast requires spark.sql.session.timeZone=UTC " +
            s"(session has '${s.conf.get("spark.sql.session.timeZone", "<unset>")}')")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => sys.error(s"unsupported events.ts type: $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so spark.sql(...) mirrors the
    * DuckDB oracle's table names. events goes through its converting
    * accessor (ns → µs timestamps). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
