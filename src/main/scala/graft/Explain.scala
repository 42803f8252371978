package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints a one-line shuffle/join/window census per
  * query (and the formatted plan with -v) so plan regressions are
  * visible without running anything.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val verbose = args.contains("-v")
    val names = args.drop(1).filterNot(_ == "-v") match {
      case Array() => SparkEntry.queries.keys.toSeq.sorted
      case sel => sel.toSeq
    }
    val spark = GraftSession.probeSession("graft-explain", "8")
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      def c(s: String) = s.r.findAllIn(p).size
      println(f"$n%-30s exchange=${c("Exchange")}%2d bcast_join=${c("BroadcastHashJoin")}" +
        f" smj=${c("SortMergeJoin")} window=${c("WindowExec| Window ")} udf=${c("ScalaUDF")}")
      if (verbose) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
