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
    // fan-out (r21): the to_json/from_json round-trip runs in the scan
    // stage — a single-split events file serializes 100k-row JSON
    // codec work on one core; no-op on already-parallel inputs.
    // KEPT after the r22 arbitration (VERDICT item 5): re-A/B'd under
    // the warm protocol on a quiet host at 32 cores — q45 1.55 s with
    // fan-out vs 2.04 s without (7-run medians), q46 1.58 vs 1.63;
    // the r21 driver numbers that read flat/slower were taken during
    // documented host-contention waves.
    val ev = Tables.fanOutForKernels(Tables.events(s, d))
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

  /** Envelopes keyed by user_id (so ids collide across events and the
    * mirror merge has real last-writer-wins work to do), routed over
    * FOUR tables — the fourth is unsupported, exercising the
    * skip-unknown branch of the reference policy. */
  def synthesizedKeyed(s: SparkSession, d: String): DataFrame = {
    // fan-out re-A/B'd (r22): r21 rejected it when the build paid two
    // merge+write batches that dwarfed the JSON round-trip; with the
    // single-pass build (see buildReferenceMirror) the parse is a
    // bigger fraction, re-measured under the warm protocol
    val ev = Tables.fanOutForKernels(Tables.events(s, d))
    val op = when(col("event_type") === "signup", "c")
      .when(col("event_type") === "view", "r")
      .when(col("event_type") === "error", "d")
      .otherwise("u")
    val table = element_at(
      array(lit("articles"), lit("media"), lit("article_changes"), lit("unknown_tbl")),
      (col("user_id") % 4).cast("int") + 1)
    val image = struct(col("user_id").as("id"), col("value").as("value"))
    val noImage = lit(null).cast("struct<id:bigint,value:double>")
    ev.select(to_json(struct(
      op.as("op"),
      when(op === "d", image).otherwise(noImage).as("before"),
      when(op =!= "d", image).otherwise(noImage).as("after"),
      struct(table.as("table")).as("source"),
      (unix_timestamp(col("ts")) * 1000).as("ts_ms"))).as("value"))
  }

  // S8 per-table delete routing (SyncService.py:143-145,224,257):
  // upsert batch then delete batch through the mirror sink under the
  // reference policy — articles tombstone (soft), media rows vanish
  // (hard), article_changes d-events are ignored, the unknown table
  // never lands. The oracle replays last-writer-wins + routing in SQL
  // directly over events. (`value` is deliberately NOT asserted: ties
  // on (table,id,ts_ms,is_deleted) keep an arbitrary row's value, by
  // design — the reference's ON DUPLICATE KEY UPDATE has the same
  // arbitrary-winner freedom within one poll batch.)
  val q120 = sql(
    "q120_mirror_delete_policy",
    """WITH ev AS (
      |  SELECT user_id AS id,
      |    CASE CAST(user_id % 4 AS INT) WHEN 0 THEN 'articles' WHEN 1 THEN 'media'
      |      WHEN 2 THEN 'article_changes' ELSE 'unknown_tbl' END AS tbl,
      |    CAST(floor(epoch(ts)) AS BIGINT) * 1000 AS ts_ms,
      |    (event_type = 'error') AS is_deleted
      |  FROM events),
      |routed AS (
      |  SELECT * FROM ev
      |  WHERE tbl IN ('articles', 'media')
      |     OR (tbl = 'article_changes' AND NOT is_deleted)),
      |last AS (
      |  SELECT tbl, id, is_deleted FROM (
      |    SELECT tbl, id, is_deleted,
      |      row_number() OVER (PARTITION BY tbl, id
      |        ORDER BY ts_ms DESC, is_deleted DESC) AS rn
      |    FROM (SELECT DISTINCT tbl, id, ts_ms, is_deleted FROM routed)) r
      |  WHERE rn = 1)
      |SELECT tbl, is_deleted, count(*) AS n, CAST(sum(id) AS BIGINT) AS id_sum
      |FROM last
      |WHERE NOT (tbl = 'media' AND is_deleted)
      |GROUP BY tbl, is_deleted
      |ORDER BY tbl, is_deleted""".stripMargin) { (s, d) =>
    val dir = java.nio.file.Files.createTempDirectory("graft-q120").toString + "/m"
    // ONE shared build definition (buildReferenceMirror, also behind
    // q145's cache and LayoutProbe --mirror); the deletes-against-live-
    // mirror path (hard deletes removing rows already on disk) is
    // covered by SyncMirrorSpec's multi-batch streaming rounds.
    buildReferenceMirror(s, d, dir)
    val out = s.read.parquet(dir)
      .groupBy(col("table").as("tbl"), col("is_deleted"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
      .orderBy(col("tbl"), col("is_deleted"))
      .localCheckpoint() // materialize before the temp mirror is removed
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p.getParent, true)
    out
  }

  /** THE reference-policy mirror build — one definition shared by the
    * q120 runner, the q145 cache and `LayoutProbe --mirror`, so the
    * "q145 is gated against exactly q120's build" claim cannot drift:
    * keyed envelopes parsed and applied as ONE batch under the
    * reference routing policy.
    *
    * r22 (guide §2.4, VERDICT item 4): formerly TWO applyCdcBatch
    * calls (upserts, then deletes) over an eager parse checkpoint —
    * the delete pass re-read every bucket the upsert pass had just
    * written and rewrote it. The merge is a max-by aggregation per
    * (table, id), and max is associative: max(max(U), max(D)) =
    * max(U ∪ D), the SkipTable/SkipDeletes pre-filters are per-row,
    * and the HardDelete post-filter ran only on the second pass — so
    * one combined batch produces the identical mirror rows while
    * paying one touched-bucket collect, one merge shuffle and one
    * bucket write instead of two of each plus a full mirror read-back.
    * The multi-batch delete path (hard deletes removing rows already
    * live on disk) stays covered by SyncMirrorSpec's streaming rounds.
    * The parse checkpoint is gone with the second consumer:
    * applyCdcBatch caches its routed input once. */
  private[graft] def buildReferenceMirror(s: SparkSession, d: String,
      mirrorDir: String, maxRecordsPerFile: Long = 0L): Unit = {
    import graft.streaming.Pipelines
    Pipelines.applyCdcBatch(s, Cdc.parse(synthesizedKeyed(s, d), col("value")),
      mirrorDir, Pipelines.MirrorBuckets, Pipelines.ReferenceTablePolicy,
      Pipelines.TablePolicy.SkipTable, maxRecordsPerFile)
  }

  /** Build-once mirror cache for q145 (atomic-rename publish, the
    * VectorQueries index pattern): [[buildReferenceMirror]] left on
    * disk so the range-read query pays only the read. The "1" in the
    * key is the mirror LAYOUT/SEMANTICS version (the graft-ivfpq2
    * lesson) — bump it with any applyCdcBatch merge/routing/layout
    * change or a stale cached mirror survives the content
    * fingerprint. */
  private[queries] def mirrorIdx(s: SparkSession, d: String): String = {
    // "2": r21 replaced the dropDuplicates+rank merge with the
    // struct-max aggregation — same winner per (table, id), but ties on
    // (ts_ms, is_deleted) now resolve by value-max instead of
    // arbitrarily, so the cached bytes may differ.
    // "3": r22 folded the upsert/delete passes into one batch — winners
    // provably identical (max is associative), but the build path
    // changed, so the key bumps per the documented contract.
    val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft-mirror3-" + QueryDef.sourceFingerprint(d, "events.parquet")).getPath
    if (!new java.io.File(idx).exists()) {
      val tmpRoot = new java.io.File(idx + ".build-" +
        java.util.UUID.randomUUID().toString.take(8))
      val tmp = new java.io.File(tmpRoot, "m")
      buildReferenceMirror(s, d, tmp.getPath)
      if (!tmp.renameTo(new java.io.File(idx))) QueryDef.deleteRecursively(tmpRoot)
      else { tmpRoot.delete(); () }
    }
    idx
  }

  // The mirror as a SERVING table — the reference's SyncService read
  // shape (one table, one key range) against the persisted mirror the
  // CDC sink maintains. This is the read path the r13 clustered mirror
  // write exists for: hash bucketing spreads every id range across ALL
  // bucket dirs, so dir-level pruning cannot serve a range read —
  // within-bucket (table, id) sort order gives the parquet reader
  // row-group min/max stats to skip instead (`LayoutProbe --mirror`
  // measures the skip; SCALE.md r13). Oracle: q120's last-writer-wins
  // + routing replay restricted to the served table and range — ts_ms
  // and the tombstone flag are deterministic (ties resolve
  // is_deleted-first), `value` stays excluded exactly as in q120.
  val q145 = sql(
    "q145_mirror_range_read",
    """WITH ev AS (
      |  SELECT user_id AS id,
      |    CASE CAST(user_id % 4 AS INT) WHEN 0 THEN 'articles' WHEN 1 THEN 'media'
      |      WHEN 2 THEN 'article_changes' ELSE 'unknown_tbl' END AS tbl,
      |    CAST(floor(epoch(ts)) AS BIGINT) * 1000 AS ts_ms,
      |    (event_type = 'error') AS is_deleted
      |  FROM events),
      |routed AS (
      |  SELECT * FROM ev
      |  WHERE tbl IN ('articles', 'media')
      |     OR (tbl = 'article_changes' AND NOT is_deleted)),
      |last AS (
      |  SELECT tbl, id, ts_ms, is_deleted FROM (
      |    SELECT tbl, id, ts_ms, is_deleted,
      |      row_number() OVER (PARTITION BY tbl, id
      |        ORDER BY ts_ms DESC, is_deleted DESC) AS rn
      |    FROM (SELECT DISTINCT tbl, id, ts_ms, is_deleted FROM routed)) r
      |  WHERE rn = 1)
      |SELECT id, ts_ms, is_deleted FROM last
      |WHERE tbl = 'articles' AND id BETWEEN 40 AND 120
      |ORDER BY id""".stripMargin) { (s, d) =>
    s.read.parquet(mirrorIdx(s, d))
      .filter(col("table") === "articles" && col("id").between(40L, 120L))
      .select(col("id"), col("ts_ms"), col("is_deleted"))
      .orderBy(col("id"))
  }

  val all: Seq[QueryDef] = Seq(q45, q46, q120, q145)
}
