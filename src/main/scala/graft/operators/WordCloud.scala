package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word-cloud snapshot (SURVEY A7/W1/W9): top-K ranked tokens with the
  * reference's deterministic presentation attributes
  * (keyword-extraction/realtime_keyword_aggregator.py:163-181 totals,
  * :287-356 size/color/animation ladder, top-50 heap :166-172).
  *
  * Spark plans the top-K as TakeOrderedAndProject (the heap's moral
  * equivalent, distributed); window totals ride along as a broadcast
  * single-row aggregate instead of a second scan.
  */
object WordCloud {

  /** rank → size buckets with linear interpolation inside each bucket
    * (realtime_keyword_aggregator.py:302-326: rank 1 → 40-60 px down
    * to rank 100 → 10-15 px). */
  def sizeFor(rank: Column): Column =
    when(rank <= 10, lit(60) - (rank - 1) * 2)
      .when(rank <= 30, lit(40) - (rank - 11))
      .when(rank <= 50, lit(20) - floor((rank - 31) / lit(4.0)))
      .otherwise(lit(15))

  /** color bucket = rank/10 (realtime_keyword_aggregator.py:328-340). */
  def colorFor(rank: Column): Column = ((rank - 1) / 10).cast("int")

  /** animation tiers (realtime_keyword_aggregator.py:342-356). */
  def animationFor(rank: Column): Column =
    when(rank <= 3, "pulse").when(rank <= 10, "glow").otherwise("fade")

  /** Top-`k` word-cloud entries from (token, cnt) counts. */
  def snapshot(counts: DataFrame, k: Int = 50): DataFrame = {
    val totals = counts.agg(
      sum(col("cnt")).as("total_count"), count(lit(1)).as("unique_keywords"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
    top.crossJoin(broadcast(totals))
      .select(col("token"), col("cnt"), col("rank"),
        sizeFor(col("rank")).cast("int").as("size"),
        colorFor(col("rank")).as("color_idx"),
        animationFor(col("rank")).as("animation"),
        col("total_count"), col("unique_keywords"))
  }
}
