package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** CPU-seconds vs wall-seconds probe (r22, VERDICT item 6).
  *
  * The racing-duplicate-evaluation question: a `.cache()`d subtree
  * consumed by several concurrently-launched AQE stages can be
  * COMPUTED more than once before the cache is populated (each racer
  * computes the partition; one wins the write). At local partition
  * counts the duplicates overlap on idle cores, so WALL time hides
  * them — but duplicated CPU is real cost on a busy cluster. Wall
  * time alone cannot arbitrate "racing duplication vs eager
  * materialization"; this probe counts both.
  *
  * Usage: runMain graft.CpuProbe <queryPrefix>[,<prefix>...] [runs]
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS — the bench contract).
  * Per run it reports wall seconds, summed task CPU seconds
  * (`executorCpuTime`), and summed task runtime; stderr carries a
  * paste-ready markdown table for SCALE.md.
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.getOrElse(
      sys.error("usage: CpuProbe <queryPrefix>[,..] [runs]")).split(",").toSeq
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3).max(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.probeSession("graft-cpuprobe", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    val cpuNs = new LongAdder
    val runMs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { cpuNs.add(m.executorCpuTime); runMs.add(m.executorRunTime) }
      }
    })
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    require(names.nonEmpty, s"no query matches $prefixes")
    System.err.println("| query | run | wall s | task CPU s | task run s |")
    System.err.println("|---|---|---|---|---|")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to runs).foreach { i =>
        cpuNs.reset(); runMs.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; flush before reading
        org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark, 30000)
        System.err.println(
          f"| $name | $i | $wall%.2f | ${cpuNs.sum() / 1e9}%.2f | ${runMs.sum() / 1e3}%.2f |")
      }
    }
    spark.stop()
  }
}
