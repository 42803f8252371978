package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.Bucketing
import graft.sources.Tables

/** Measures what the clustered layout (`Bucketing.writeClustered` over
  * a `zorder16` key) buys at the parquet reader: rows materialized by
  * the scan for a 2-D box predicate over events (user bucket × hour
  * bucket), clustered vs the same rows written unsorted. Row-group
  * min/max stats do the pruning — no partition column, no custom
  * reader. Results feed the SCALE.md layout table.
  *
  * AQE is off in this session so the executed plan exposes the
  * `FileSourceScanExec` metrics directly after a collect.
  *
  * Usage: runMain graft.LayoutProbe [sfDir] [replicate]
  *
  * `replicate` (default 1) unions k event_id-shifted copies of the
  * table before the layout writes — the sf1-style projection: row
  * groups stay at ~1/128 of the table, so rows-per-group grows with
  * the data while the box still covers the same FRACTION of groups —
  * the scan fraction (and so the skip factor) holds ~constant as the
  * table grows, while the unsorted baseline stays at 100% (measured:
  * 3.5% at sf0.1 → 4.3% at ×10, SCALE.md).
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val replicate = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-layout-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev0 = Tables.events(spark, sfDir)
    val ev =
      if (replicate <= 1) ev0
      else {
        // k copies, event_id shifted per copy so the decorrelating hash
        // differs; ub/hb distributions (and so the box selectivity) are
        // unchanged
        val span = ev0.agg(max("event_id")).collect()(0).getLong(0) + 1
        (0 until replicate).map(k => ev0.withColumn(
          "event_id", col("event_id") + lit(k * span))).reduce(_ unionByName _)
      }
    val ub = pmod(col("user_id"), lit(256L))
    val hb = (expr("unix_timestamp(ts) DIV 3600") % 1024).cast("long")
    // persisted: consumed five times (count, range-sampling pass +
    // clustered write, shuffled write, box-bounds agg) — without the
    // cache a replicate=k run re-unions the source table per consumer
    val base = ev.select(
      col("event_id"), col("user_id"), col("value"),
      ub.as("ub"), hb.as("hb"),
      Bucketing.zorder16(ub, hb).as("z")).persist()
    val n = base.count()
    // ~128 row groups either way: enough granularity for skipping to
    // show, few enough that footer/stat overhead stays negligible
    val perFile = math.max(1L, (n + 127) / 128)

    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    Bucketing.writeClustered(base, Seq(col("z")), s"$dir/clustered", 16, perFile)
    // unsorted baseline: same rows, placement AND order decorrelated
    // from both dims by a hash (round-robin would stride event_ids into
    // per-partition residue classes), same file/row-group geometry
    base.repartition(16, md5(col("event_id").cast("string")))
      .sortWithinPartitions(md5(col("event_id").cast("string")))
      .write.option("maxRecordsPerFile", perFile).parquet(s"$dir/shuffled")

    // 2-D box: an eighth of each dimension's observed range
    val Array(uLo, uHi, hLo, hHi) = base
      .agg(min("ub"), max("ub"), min("hb"), max("hb"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    val uCut = (uLo + math.max(1.0, (uHi - uLo) / 8)).toLong
    val hCut = (hLo + math.max(1.0, (hHi - hLo) / 8)).toLong
    def box(df: DataFrame): DataFrame =
      df.filter(col("ub") < uCut && col("hb") < hCut)

    def scanned(path: String): (Long, Long) = {
      val df = box(spark.read.parquet(path))
      val selected = df.collect().length.toLong
      val scan = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
      (selected, scan)
    }
    val (selC, scanC) = scanned(s"$dir/clustered")
    val (selS, scanS) = scanned(s"$dir/shuffled")
    require(selC == selS, s"layouts must agree on the box: $selC vs $selS")

    println(f"[layout] rows=$n%d  box=(ub<$uCut%d, hb<$hCut%d)  selected=$selC%d")
    println(f"[layout] clustered: scan materialized $scanC%d rows " +
      f"(${100.0 * scanC / n}%.1f%% of table)")
    println(f"[layout] shuffled:  scan materialized $scanS%d rows " +
      f"(${100.0 * scanS / n}%.1f%% of table)")
    println(f"[layout] row-group skip factor: ${scanS.toDouble / math.max(1L, scanC)}%.1fx")

    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
