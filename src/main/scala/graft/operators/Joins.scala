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

  /** Interval (range) join: every (left, right) pair with equal `keys`
    * and `right(rightTs) − left(leftTs)` in `[lowerMs, upperMs]`
    * (inclusive, milliseconds; both timestamp columns).
    *
    * A naive `l.ts BETWEEN ...` theta-join plans as a per-key nested
    * loop — Σ per-key |L|·|R| comparisons, the classic range-join
    * blow-up. This is the standard BINNED formulation instead (the
    * same move Flink's interval join and Spark's own stream-stream
    * join state layout make): pick a bin width `w = upperMs − lowerMs`
    * (the window length), give each right row its bin
    * `floor(ts / w)`, and explode each left row to the bins its
    * window `[ts+lower, ts+upper]` can overlap — at most TWO, because
    * the window is exactly one bin wide. The join becomes an
    * equi-join on `(keys, bin)`:
    *
    *  - one shuffle per side, hash-partitioned on `(keys, bin)` — AQE
    *    can still pick broadcast if one side is small;
    *  - candidate volume is bounded by co-occupancy of a 2·w time
    *    span per key, never |L|·|R| per key;
    *  - the exact range predicate runs as a post-join filter on the
    *    (few) candidates.
    *
    * Left columns keep their names; right columns arrive as
    * `r_<name>`. Timestamps compare at MICROsecond precision
    * (`unix_micros`) so engines with finer source precision must
    * floor to µs to reproduce the pair set. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, lowerMs: Long, upperMs: Long): DataFrame = {
    require(upperMs > lowerMs, "empty interval")
    val wUs = (upperMs - lowerMs) * 1000L
    val loUs = lowerMs * 1000L
    val hiUs = upperMs * 1000L
    val l = left
      .withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_bin", explode(array_distinct(array(
        floor((col("_lus") + loUs) / wUs).cast("long"),
        floor((col("_lus") + hiUs) / wUs).cast("long")))))
    val r = right
      .withColumn("_rus", unix_micros(col(rightTs)))
      .withColumn("_bin", floor(col("_rus") / wUs).cast("long"))
      .select(col("_bin") +: col("_rus") +:
        (keys.map(col) ++
          right.columns.filterNot(keys.contains).map(c => col(c).as(s"r_$c"))): _*)
    l.join(r, keys :+ "_bin")
      .filter(col("_rus") >= col("_lus") + loUs && col("_rus") <= col("_lus") + hiUs)
      .drop("_bin", "_lus", "_rus")
  }
}
