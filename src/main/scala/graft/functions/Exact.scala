package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers that make aggregate results bit-identical across
  * engines (Spark vs the DuckDB oracle).
  *
  * Summing IEEE doubles is order-dependent; Spark's partial aggregation
  * order differs run-to-run and engine-to-engine. Casting the inputs to
  * decimal makes the sum exact (and therefore order-independent); the
  * final cast back to double is a single deterministic rounding. This
  * also mirrors what a production engine should do with money columns
  * at 100 TB: decimal accumulate, not float accumulate.
  */
object Exact {
  /** Exact order-independent sum of a 2-decimal "money" column. */
  def msum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum at the given decimal scale, returned as double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(27, scale))).cast("double")

  /** Exact sum of products of two 2-decimal columns (scale 4 result). */
  def prodSum(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 2)) * b.cast(DecimalType(18, 2))).cast("double")

  /** Mean computed as exact-sum / count — identical in any engine that
    * evaluates the same double division. */
  def dmean(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)
}
