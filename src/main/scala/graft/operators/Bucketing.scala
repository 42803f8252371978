package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout (SURVEY §7.4#6: "bucket by link hash for
  * dedup joins"). Writing both sides of a recurring join bucketed on
  * the join key makes every subsequent join shuffle-free: the scan is
  * already hash-partitioned and (with sortBy) sorted, so the planner
  * emits a SortMergeJoin with NO Exchange on either side. At 100 TB
  * this converts the nightly dedup/enrichment joins from full-shuffle
  * jobs into partition-local merges.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
