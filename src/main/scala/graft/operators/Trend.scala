package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trend-metric bundle (SURVEY §2.5 W3–W7, U4): the compound ranking
  * metric behind the reference's /trending-keywords-advanced endpoint
  * (keyword-extraction/advanced_trend_analyzer.py:93-236).
  *
  * The reference recomputes these per keyword with ~400 sequential
  * Redis reads per query (SURVEY §3.3); here the whole bundle is ONE
  * aggregation pass over the hourly state table: every horizon and the
  * anomaly window are conditional sums against a broadcast anchor, so
  * the job shuffles pre-reduced (key, bucket) rows once regardless of
  * corpus size.
  *
  * Formula provenance (file:line into /root/reference):
  *  - velocity + new-key boost  advanced_trend_analyzer.py:148-169
  *  - z-score over trailing 168 h, std=0 → 0        :171-197
  *  - momentum min(c6/c24,5)·2 with /0 guard        :222-228
  *  - direction thresholds                          :199-206
  *  - compound weights .25/.30/.25/.20 and norms    :208-236
  */
object Trend {

  /** Full metric bundle per key, anchored at the newest hour bucket.
    * Input: epoch-hour counts (bucket: Long, key, cnt). Missing hours
    * count as zero — the anomaly window divides by the full 168. */
  def metricsAtAnchor(hourly: DataFrame): DataFrame = {
    val anchor = hourly.agg(max(col("bucket")).as("anchor"))
    val b = col("bucket")
    val a = col("anchor")
    val m = hourly.crossJoin(broadcast(anchor))
      .groupBy(col("key"))
      .agg(
        sum(when(b === a, col("cnt")).otherwise(0L)).as("c1h"),
        sum(when(b === a - 1, col("cnt")).otherwise(0L)).as("cprev"),
        sum(when(b > a - 6, col("cnt")).otherwise(0L)).as("c6h"),
        sum(when(b > a - 12 && b <= a - 6, col("cnt")).otherwise(0L)).as("prev6"),
        sum(when(b > a - 24, col("cnt")).otherwise(0L)).as("c24h"),
        sum(when(b >= a - 168 && b <= a - 1, col("cnt")).otherwise(0L)).as("s1"),
        sum(when(b >= a - 168 && b <= a - 1, col("cnt") * col("cnt")).otherwise(0L)).as("s2"))
    val velocity = when(col("cprev") === 0, col("c1h") * 2.0)
      .otherwise((col("c1h") - col("cprev")) * 1.0)
    val vel6 = (col("c6h") - col("prev6")) / 6.0
    val variance = (col("s2") - col("s1") * col("s1") / 168.0) / 168.0
    val zraw = when(variance <= 0, 0.0)
      .otherwise((col("c1h") - col("s1") / 168.0) / sqrt(variance))
    val momentum = when(col("c24h") === 0, 0.0)
      .otherwise(least(col("c6h") / col("c24h").cast("double"), lit(5.0)) * 2.0)
    val x = m.select(col("key"), col("c1h"), col("c6h"), col("c24h"),
      velocity.as("velocity"), vel6.as("vel6"), zraw.as("zraw"), momentum.as("momentum"))
    x.select(
      col("key"), col("c1h"), col("c6h"), col("c24h"), col("velocity"),
      round(col("zraw"), 6).as("z"), col("momentum"),
      when(col("velocity") > 2 && col("vel6") > 1, "rising")
        .when(col("velocity") < -1 && col("vel6") < -0.5, "falling")
        .otherwise("stable").as("direction"),
      round((least(col("c1h") / 10.0, lit(10.0)) * 0.25
        + least(greatest(col("velocity"), lit(0.0)) / 5.0, lit(10.0)) * 0.30
        + least(abs(col("zraw")) / 3.0, lit(1.0)) * 10.0 * 0.25
        + col("momentum") * 0.20) * 10.0, 6).as("compound"))
  }

  /** Seasonally-adjusted anomalies: the reference's z-score (W3) uses
    * a trailing window, which flags every rush hour as anomalous; the
    * seasonal form scores each (key, date, hour) cell against that
    * key's SAME-HOUR-OF-DAY baseline across days, so "busy at 9am" is
    * normal and only "busier than 9am usually is" fires. Input rows:
    * (key, date, hour, cnt) — one row per observed cell; missing cells
    * count as zero via the dense (key×date×hour) spine, which matters:
    * a key silent at an hour it is usually active IS the signal shape.
    *
    * Determinism: integer sums → one IEEE mean/std chain (population
    * form), std=0 → z=0 (the W3 convention), round6 output. Scale:
    * the spine is |keys|·|dates|·24 pre-reduced cells (state-table
    * sized, not event-sized); baseline is a second aggregation of the
    * same cells; both shuffle on the key. */
  def seasonalAnomalies(cells: DataFrame, nStd: Double = 2.0): DataFrame = {
    val spark = cells.sparkSession
    val keys = cells.select(col("key")).distinct()
    val dates = cells.select(col("date")).distinct()
    val hours = spark.range(24).select(col("id").cast("int").as("hour"))
    val dense = keys.crossJoin(dates).crossJoin(hours)
      .join(cells, Seq("key", "date", "hour"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val baseline = dense.groupBy(col("key"), col("hour"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("ss"))
      .withColumn("mean", col("s").cast("double") / col("n"))
      .withColumn("sd", sqrt(col("ss").cast("double") / col("n")
        - col("mean") * col("mean")))
    dense.join(baseline, Seq("key", "hour"))
      .withColumn("z", when(col("sd") === 0, 0.0)
        .otherwise((col("cnt").cast("double") - col("mean")) / col("sd")))
      .filter(abs(col("z")) > nStd)
      .select(col("key"), col("date"), col("hour"), col("cnt"),
        round(col("mean"), 6).as("hour_mean"), round(col("z"), 6).as("z"))
  }
}
