package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-in equi/cross family.
  *
  * As-of join (the time-series enrichment join: each left row picks
  * the LATEST right row with right.ts <= left.ts per key). Spark has
  * no native as-of; the classic scalable formulation is union + tag +
  * running `last(ignoreNulls)` window:
  *
  *  - one shuffle on the keys, one sort on (ts, tag) — never a range
  *    self-join (whose candidate volume is Σ per-key |L|·|R|), and no
  *    per-key driver loops;
  *  - right rows sort BEFORE left rows at equal ts (tag 0 < 1), so
  *    `right.ts == left.ts` matches, mirroring ASOF's >= semantics;
  *  - state per window frame is just the running value — Spark's
  *    window exec streams the frame, so memory per task is O(1) per
  *    value column regardless of key size.
  */
object Joins {

  /** As-of join `left` with `right` on equal `keys` and
    * `right(rightTs) <= left(leftTs)`, attaching each `valueCols`
    * column as `asof_<name>` (null when no prior right row exists).
    *
    * `right` must be unique per (keys, rightTs) — pre-aggregate
    * duplicates first, otherwise which same-timestamp row wins is
    * nondeterministic. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_ats", col(leftTs)).withColumn("_tag", lit(1))
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("_ats")) ++
        valueCols.map(c => col(c).as(s"asof_$c")): _*)
      .withColumn("_tag", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      (df, c) => df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1).drop("_ats", "_tag")
  }
}
