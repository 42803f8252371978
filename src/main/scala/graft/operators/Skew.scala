package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7.4#6: "salting for hot keywords in
  * skewed windows").
  *
  * AQE's skew-join splitting covers joins; aggregations over a hot key
  * (one keyword dominating a window) still funnel that key's rows into
  * one reducer. Salted two-phase aggregation fans the hot key over
  * `buckets` partial groups first, so no single task sees more than
  * ~1/buckets of the hot key's rows; the final reduce then combines
  * `buckets` pre-reduced rows per key.
  *
  * The salt derives from a hash of stable row attributes — NOT rand()
  * — so replays and retries are deterministic.
  */
object Skew {

  private def salt(on: Column, buckets: Int): Column = pmod(xxhash64(on), lit(buckets))

  /** Salted count per key: exact same result as groupBy(key).count(). */
  def saltedCount(df: DataFrame, key: Column, saltSource: Column, buckets: Int = 16): DataFrame =
    df.groupBy(key.as("key"), salt(saltSource, buckets).as("_salt"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("key"))
      .agg(sum(col("_c")).as("cnt"))

  /** Salted sum — algebraic, so two-phase is exact. */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltSource: Column,
      buckets: Int = 16): DataFrame =
    df.groupBy(key.as("key"), salt(saltSource, buckets).as("_salt"))
      .agg(sum(value).as("_s"))
      .groupBy(col("key"))
      .agg(sum(col("_s")).as("sum"))

  /** Replicated broadcast join for a skewed build side is unnecessary
    * in Spark (broadcast already replicates); for sort-merge joins on
    * a skewed key, explode the small side over the salt range and salt
    * the big side to co-partition. Exact join semantics preserved. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column, smallKey: Column,
      bigSaltSource: Column, buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(bigSaltSource, buckets))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedBig.join(replicatedSmall,
      bigKey === smallKey && saltedBig("_salt") === replicatedSmall("_salt"))
      .drop("_salt")
  }
}
