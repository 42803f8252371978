package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

/** Salted two-phase operators must be exactly equivalent to their
  * unsalted forms. */
class SkewSpec extends SparkSuite {
  init()

  private lazy val ev = Tables.events(spark, sf0001)

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("salted count == plain count") {
    val plain = toMap(ev.groupBy(col("event_type").as("key")).agg(count(lit(1)).as("cnt")))
    val salted = toMap(Skew.saltedCount(ev, col("event_type"), col("event_id")))
    assert(salted == plain)
  }

  test("salted sum == plain sum") {
    val plain = ev.groupBy(col("event_type")).agg(sum(col("user_id")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(ev, col("event_type"), col("user_id"), col("event_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted join == plain join") {
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")))
      .withColumnRenamed("event_type", "t")
    val plain = ev.join(dim, col("event_type") === col("t")).count()
    val salted = Skew.saltedJoin(ev, dim, col("event_type"), col("t"), col("event_id")).count()
    assert(salted == plain)
  }

  test("zorder16: matches a reference Morton interleave bit-for-bit, bijective on the domain") {
    import spark.implicits._
    def refMorton(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    assert(refMorton(3L, 2L) == 13L) // sanity of the reference itself
    val samples = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    val out = samples.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.operators.Bucketing.zorder16(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, z) =>
      assert(z == refMorton(a, b), s"zorder16($a,$b)")
    }
    assert(out.map(_._3).distinct.length == samples.length, "interleave must be injective")
  }

  test("clustered z-order layout: row-group stats prune 2-D box predicates at the reader") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-spec").toString
    // deterministic 64×64 grid → 4096 rows, 16 files of 256 rows each
    val grid = spark.range(4096).select(
      (col("id") % 64).as("ub"), expr("id DIV 64").as("hb"), col("id").as("payload"))
    val z = graft.operators.Bucketing.zorder16(col("ub"), col("hb"))
    graft.operators.Bucketing.writeClustered(
      grid.withColumn("z", z), Seq(col("z")), s"$dir/clustered", 16, 256)
    // same rows, order decorrelated from both dims, same file geometry
    // hash-repartition (NOT round-robin: range ids stride into residue
    // classes per partition, which would let some "shuffled" row groups
    // legitimately prune) so every row group spans both dims
    grid.withColumn("z", z)
      .repartition(16, md5(col("payload").cast("string")))
      .sortWithinPartitions(md5(col("payload").cast("string")))
      .write.option("maxRecordsPerFile", 256).parquet(s"$dir/shuffled")

    // AQE off so the executed plan exposes the scan node's metrics
    val was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def probe(path: String): (Set[Long], Long) = {
        val df = spark.read.parquet(path).filter(col("ub") < 8 && col("hb") < 8)
        val ids = df.collect().map(_.getAs[Long]("payload")).toSet
        val scan = df.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s.metrics("numOutputRows").value
        }.sum
        (ids, scan)
      }
      val (idsC, scanC) = probe(s"$dir/clustered")
      val (idsS, scanS) = probe(s"$dir/shuffled")
      val expected = (for (u <- 0L until 8L; h <- 0L until 8L) yield h * 64 + u).toSet
      assert(idsC == expected && idsS == expected, "both layouts return the box exactly")
      // z < 64 covers exactly the 8×8 box; the clustered layout holds it
      // in one 256-row row group (ub,hb ∈ [0,16) there), every other row
      // group has ub or hb min ≥ 16 → skipped by the pushed range filter
      assert(scanC <= 512, s"clustered scan materialized $scanC rows — row groups not skipped")
      // each shuffled row group spans the full range of both dims → no skip
      assert(scanS >= 3500, s"shuffled scan materialized only $scanS rows — geometry changed?")
    } finally spark.conf.set("spark.sql.adaptive.enabled", was)
  }
}
