package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query timed at the given
  * scale factor; one JSON line on stdout, full JSON (incl. the
  * per-run matrix) to SPARK_GRAFT_BENCH_OUT (default
  * /root/repo/BENCH_FULL.json) — the stdout record gets tail-truncated
  * by the driver, the file never loses q01–q40.
  *
  * Noise control: the WHOLE suite runs SPARK_GRAFT_BENCH_RUNS times
  * (default 3) and each query reports its per-run MEDIAN. Repeating at
  * suite level (not per-query back-to-back) de-correlates shared-host
  * noise waves that travel through the alphabetical execution order —
  * three consecutive timings of one query would all sit inside the
  * same wave.
  *
  * Warm-up: each table's footer/schema is touched once before timing
  * so the first measured query doesn't absorb JVM + parquet-metadata
  * startup cost; queries themselves are timed cold (no caching of
  * inputs between queries).
  */
object Bench {

  /** ONE median definition for the full suite and the warm sweep —
    * averaging the middle pair on even counts. (The warm sweep's
    * first cut took the upper-middle element, so a warm table built
    * with an even SPARK_GRAFT_WARM_RUNS read biased-high vs the full
    * suite it arbitrates.) */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Table footer/schema + noop-sink warm-up shared by both modes —
    * the warm sweep must warm exactly like the suite it arbitrates. */
  private def warmTables(spark: SparkSession, sfDir: String): Unit = {
    graft.sources.Tables.names.foreach { n =>
      try {
        val df = if (n == "events") graft.sources.Tables.events(spark, sfDir)
        else graft.sources.Tables.load(spark, sfDir, n)
        df.count()
      } catch { case _: Throwable => () }
    }
    spark.range(1).write.format("noop").mode("overwrite").save()
  }

  /** `--warm` (r18): the warm-median arbitration protocol as a
    * standing mode instead of per-round reactive work. Three rounds
    * running (q131@r15, q120@r16, q148/q150@r17), one query's driver
    * bench number cost a round-open arbitration that always concluded
    * "host noise", resolved each time by the same hand-run recipe:
    * warm the query once, take a 5-run back-to-back median. This mode
    * IS that recipe: it reads the committed full-bench record
    * (SPARK_GRAFT_BENCH_OUT), picks the top SPARK_GRAFT_WARM_TOP
    * (default 10) queries by median wall time — the only ones whose
    * noise ever looked like a regression — and times each with 1
    * discarded warm-up + SPARK_GRAFT_WARM_RUNS (default 5) timed runs,
    * reporting per-query medians. Per-query BACK-TO-BACK on purpose,
    * opposite of the full suite's suite-level repetition: arbitration
    * wants minimum variance for one query, not de-correlation across
    * a 150-query sweep. The markdown table on stderr is the SCALE.md
    * round-close artifact; rounds compare warm-vs-warm tables and skip
    * per-query arbitration. SPARK_GRAFT_ONLY overrides the query set
    * (prefix match) for targeted A/Bs. */
  private def warmMain(spark: SparkSession, sfDir: String): Unit = {
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/BENCH_FULL.json")
    val topN = sys.env.getOrElse("SPARK_GRAFT_WARM_TOP", "10").toInt
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_WARM_RUNS", "5").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val names: Seq[String] = only match {
      case Some(pres) =>
        SparkEntry.queries.keys.toSeq.sorted.filter(n => pres.exists(n.startsWith))
      case None =>
        // the committed full-bench record names the top wall-time
        // queries; a hand JSON scan (no JSON lib in scope) bounded to
        // the flat "queries" object — refuses loudly rather than
        // warm-sweeping nothing
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(outPath)), "UTF-8")
        val tag = "\"queries\":{"
        val qstart = text.indexOf(tag)
        require(qstart >= 0,
          s"no queries object in $outPath — run a full Bench first or set SPARK_GRAFT_ONLY")
        text.substring(qstart + tag.length, text.indexOf('}', qstart))
          .split(",").toSeq
          .flatMap(_.split(":") match {
            case Array(k, v) => scala.util.Try(
              k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble).toOption
            case _ => None
          })
          .filter { case (k, v) => v >= 0 && SparkEntry.queries.contains(k) }
          .sortBy(-_._2).take(topN).map(_._1)
    }
    require(names.nonEmpty, "no queries selected for the warm sweep")
    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up, discarded
      val ts = (1 to nRuns).map(_ => once())
      val med = median(ts)
      System.err.println(
        f"[warm] $name%-34s median $med%6.2f s  (${ts.map(t => f"$t%.2f").mkString(" ")})")
      (name, med, ts)
    }
    // the SCALE.md paste-ready table
    System.err.println("| query | warm median (s) | runs (s) |")
    System.err.println("|---|---|---|")
    rows.foreach { case (n, med, ts) =>
      System.err.println(
        f"| $n | $med%.2f | ${ts.map(t => f"$t%.2f").mkString(", ")} |")
    }
    println(s"""{"metric":"warm","runs":$nRuns,"queries":{""" +
      rows.map { case (n, med, _) =>
        "\"" + n + "\":" + math.rint(med * 1000) / 1000 }.mkString(",") +
      s"""},"sf":"$sfDir"}""")
  }

  def main(args: Array[String]): Unit = {
    val warm = args.contains("--warm")
    MainFlags.requireKnown(args, Set("--warm"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.probeSession("graft-bench", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    if (warm) {
      warmTables(spark, sfDir) // exactly the full suite's warm-up
      warmMain(spark, sfDir)
      spark.stop()
      return
    }

    // Touch each table once (parquet footer + JVM warm-up) before
    // timing, plus the noop sink, so the alphabetically-first query
    // doesn't absorb one-time initialization. Measured: fully caching
    // the tables (cache().count()) is NOT faster here — the local
    // NVMe parquet scans beat InMemoryRelation's extra copy at this
    // scale.
    warmTables(spark, sfDir)

    // Timing materializes EVERY output column through the noop sink:
    // a .count() lets Catalyst prune computed columns, so projection-
    // only queries (fingerprints, token stats) would be timed as bare
    // scans. A failed query is reported as -1 plus an entry in
    // "errors" — never as a normal-looking timing.
    val errors = scala.collection.mutable.LinkedHashSet[String]()
    // Optional dev filter: SPARK_GRAFT_ONLY=q60,q85 times just those
    // queries (prefix match). The driver never sets it — full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val runs: Seq[Seq[(String, Double)]] = (1 to nRuns).map { _ =>
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => errors += name; false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    val medians = selected.map(_._1).zipWithIndex.map { case (name, i) =>
      name -> median(runs.flatMap(r => Some(r(i)._2).filter(_ >= 0)))
    }
    def qjson(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = medians.map(_._2).filter(_ >= 0).sum
    val runTotals = runs.map(_.map(_._2).filter(_ >= 0).sum)
      .mkString("[", ",", "]")
    // one record template for both sinks, differing only in the value
    // formatter — keeps the file and stdout records from diverging
    def mkHead(fmt: Double => Double): String =
      s""""metric":"total","value":${fmt(total)},"unit":"sec","runs":$nRuns,""" +
        s""""run_totals":$runTotals,"queries":${qjson(medians.map { case (k, v) => k -> fmt(v) })},""" +
        s""""errors":$errs,"sf":"$sfDir""""
    // Full record (per-run matrix) to a file the driver can't truncate.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_FULL.json")
    val detail = runs.map(qjson).mkString("[", ",", "]")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      s"""{${mkHead(identity)},"runs_detail":$detail}""")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    // stdout line rounded to ms: the driver tail-captures output, and a
    // full-precision 141-entry map has been observed to truncate
    // mid-line there ("parsed": null) — full precision lives in the file
    println(s"{${mkHead(v => math.rint(v * 1000) / 1000)}}")
    spark.stop()
  }
}
