package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 surfaces here as a named
  * query over the driver's testdata, with a DuckDB oracle when the
  * semantics are ANSI-SQL-expressible.
  */
object SparkEntry {
  /** Full inventory; grows as operator groups land. */
  def defs: Seq[QueryDef] =
    Relational.all ++ TimeSeriesQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      TrendQueries.all ++ CdcQueries.all ++ MultimodalQueries.all ++ CoverageQueries.all ++
      ApiQueries.all ++ CurationQueries.all ++ ClusteringQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
