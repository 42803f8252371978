package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S5: JDBC source/sink — the reference's MySQL read path
  * (cs/repository/ArticleRepository.java:16-93) and mirror-table write
  * path (targetDB1/SyncService.py:87-146) as Spark JDBC relations.
  *
  * Scale design: `read` REQUIRES partitioning bounds — a bare
  * spark.read.jdbc(table) funnels the whole table through one
  * connection in one task, which is never what you want on a large
  * table. Partitioned reads fan out `numPartitions` range predicates
  * (WHERE col BETWEEN …) over the executors. `readSingle` exists for
  * genuinely small dimension tables and says so in its name.
  *
  * Exercised end-to-end against embedded Derby in JdbcSpec (the only
  * DB engine available offline in this environment); the same calls
  * take a MySQL URL + driver unchanged.
  */
object Jdbc {

  /** Parallel ranged read: numPartitions range predicates on
    * `partitionCol` (a numeric/indexed key column). */
  def read(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  /** Single-connection read — small dimension tables only. */
  def readSingle(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Batch write (each partition opens one connection and inserts in
    * batches). For upsert semantics against a live mirror, the engine's
    * path is the idempotent merge in streaming.Pipelines.applyCdcBatch;
    * plain JDBC append/overwrite covers the snapshot-export case. */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append,
      props: Properties = new Properties): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}
