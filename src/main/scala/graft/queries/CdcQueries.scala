package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Cdc
import graft.sources.Tables

/** CDC envelope machinery end-to-end (S4/F1/F2/SC12): envelopes are
  * synthesized from `events` in BOTH wire shapes (payload-wrapped and
  * bare — FIXTURES A5), serialized to JSON, then parsed, normalized,
  * op-filtered and table-routed by graft.model.Cdc. The oracle checks
  * the round-trip result against the direct mapping.
  *
  * op mapping: signup→c, view→r, click/purchase→u, error→d;
  * table routing key: user_id mod 3.
  */
object CdcQueries {
  import QueryDef.sql

  /** Build dual-shape JSON envelopes from events. */
  def synthesized(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val op = when(col("event_type") === "signup", "c")
      .when(col("event_type") === "view", "r")
      .when(col("event_type") === "error", "d")
      .otherwise("u")
    val table = element_at(
      array(lit("articles"), lit("media"), lit("article_changes")),
      (col("user_id") % 3).cast("int") + 1)
    val image = struct(col("event_id").as("id"), col("value").as("value"))
    val noImage = lit(null).cast("struct<id:bigint,value:double>")
    val core = struct(
      op.as("op"),
      when(op === "d", image).otherwise(noImage).as("before"),
      when(op =!= "d", image).otherwise(noImage).as("after"),
      struct(table.as("table")).as("source"),
      (unix_timestamp(col("ts")) * 1000).as("ts_ms"))
    ev.select(
      when(col("event_id") % 2 === 0, to_json(struct(core.as("payload"))))
        .otherwise(to_json(core)).as("value"))
  }

  // Upsert path: parse both shapes, keep c/r/u, route, count.
  val q45 = sql(
    "q45_cdc_parse_route",
    """SELECT CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'articles' WHEN 1 THEN 'media'
      |    ELSE 'article_changes' END AS tbl,
      |  CASE event_type WHEN 'signup' THEN 'c' WHEN 'view' THEN 'r' ELSE 'u' END AS op,
      |  count(*) AS n
      |FROM events WHERE event_type <> 'error' GROUP BY 1, 2 ORDER BY tbl, op""".stripMargin) {
    (s, d) =>
      Cdc.upserts(Cdc.parse(synthesized(s, d), col("value")))
        .groupBy(col("table").as("tbl"), col("op")).agg(count(lit(1)).as("n"))
        .orderBy(col("tbl"), col("op"))
  }

  // Delete branch: only `before` populated; soft-delete bookkeeping.
  val q46 = sql(
    "q46_cdc_deletes",
    """SELECT CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'articles' WHEN 1 THEN 'media'
      |    ELSE 'article_changes' END AS tbl,
      |  count(*) AS n_del,
      |  min(CAST(floor(epoch(ts)) AS BIGINT) * 1000) AS min_ts,
      |  max(CAST(floor(epoch(ts)) AS BIGINT) * 1000) AS max_ts
      |FROM events WHERE event_type = 'error' GROUP BY 1 ORDER BY tbl""".stripMargin) { (s, d) =>
    Cdc.deletes(Cdc.parse(synthesized(s, d), col("value")))
      .filter(col("before.id").isNotNull && col("after").isNull)
      .groupBy(col("table").as("tbl"))
      .agg(count(lit(1)).as("n_del"), min(col("ts_ms")).as("min_ts"), max(col("ts_ms")).as("max_ts"))
      .orderBy(col("tbl"))
  }

  val all: Seq[QueryDef] = Seq(q45, q46)
}
