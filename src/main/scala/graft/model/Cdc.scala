package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-style CDC envelope model (SURVEY §1.1/§1.3, FIXTURES A5).
  *
  * The reference consumes schemaless JSON envelopes
  * (infra/connector-config.json:20-21) in two shapes — wrapped in
  * `payload` or bare — and does defensive dynamic access
  * (keyword-extraction/main.py:110; targetDB1/SyncService.py:165-171).
  * Here the envelope is declared once as an explicit StructType (never
  * schema-inference on a stream) and both shapes are normalized with
  * coalesce at the source layer.
  */
object Cdc {

  /** Row image carried in before/after (subset of FIXTURES A1 that the
    * testdata-synthesized envelopes populate). */
  val rowImage: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("content", StringType),
    StructField("category", StringType),
    StructField("source", StringType),
    StructField("views_count", IntegerType),
    StructField("stored_date", StringType),
    StructField("value", DoubleType),
    StructField("is_deleted", BooleanType)))

  private val core: Seq[StructField] = Seq(
    StructField("op", StringType),
    StructField("before", rowImage),
    StructField("after", rowImage),
    StructField("source", StructType(Seq(StructField("table", StringType)))),
    StructField("ts_ms", LongType))

  /** Dual-shape envelope: bare fields plus an optional payload wrapper
    * holding the same fields. */
  val envelope: StructType = StructType(core :+ StructField("payload", StructType(core)))

  /** S4/F1/F2: parse JSON, normalize both envelope shapes, expose
    * op/table/ts_ms/after/before. Malformed JSON → from_json yields
    * null → dropped (ks/main.py:355-357). */
  def parse(df: DataFrame, json: Column): DataFrame = {
    val p = from_json(json, envelope)
    // Malformed JSON → null envelope → null op, so the single op-null
    // filter covers both cases; a separate envelope-null filter would
    // evaluate from_json a second time in the Filter operator.
    df.withColumn("_env", p)
      .select(
        coalesce(col("_env.payload.op"), col("_env.op")).as("op"),
        coalesce(col("_env.payload.source.table"), col("_env.source.table")).as("table"),
        coalesce(col("_env.payload.ts_ms"), col("_env.ts_ms")).as("ts_ms"),
        coalesce(col("_env.payload.after"), col("_env.after")).as("after"),
        coalesce(col("_env.payload.before"), col("_env.before")).as("before"))
      .filter(col("op").isNotNull)
  }

  /** F1: upsert-path ops — insert/snapshot-read/update. */
  def upserts(parsed: DataFrame): DataFrame = parsed.filter(col("op").isin("c", "r", "u"))

  /** F1 delete branch: only `before` is populated (SyncService.py:186-189). */
  def deletes(parsed: DataFrame): DataFrame = parsed.filter(col("op") === "d")

  /** F2 table router (SyncService.py:198-220): known tables only. */
  def route(parsed: DataFrame, table: String): DataFrame =
    parsed.filter(col("table") === table)
}
