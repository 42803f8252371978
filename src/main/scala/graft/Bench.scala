package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query timed at the given
  * scale factor; one JSON line on stdout.
  *
  * Warm-up: each table's footer/schema is touched once before timing
  * so the first measured query doesn't absorb JVM + parquet-metadata
  * startup cost; queries themselves are timed cold (no caching of
  * inputs between queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)

    // Touch each table once (parquet footer + JVM warm-up) before
    // timing. Measured: fully caching the tables (cache().count())
    // is NOT faster here — the local NVMe parquet scans beat
    // InMemoryRelation's extra copy at this scale.
    graft.sources.Tables.names.foreach { n =>
      try {
        val df = if (n == "events") graft.sources.Tables.events(spark, sfDir)
        else graft.sources.Tables.load(spark, sfDir, n)
        df.count()
      } catch { case _: Throwable => () }
    }
    // Warm the noop sink too, so the alphabetically-first query doesn't
    // absorb its one-time initialization into its timing.
    spark.range(1).write.format("noop").mode("overwrite").save()

    // Timing materializes EVERY output column through the noop sink:
    // a .count() lets Catalyst prune computed columns, so projection-
    // only queries (fingerprints, token stats) would be timed as bare
    // scans. A failed query is reported as -1 plus an entry in
    // "errors" — never as a normal-looking timing.
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    // Optional dev filter: SPARK_GRAFT_ONLY=q60,q85 times just those
    // queries (prefix match). The driver never sets it — full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => errors += name; false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
