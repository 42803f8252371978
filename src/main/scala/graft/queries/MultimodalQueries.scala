package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal binary-column plumbing: payload attach → partition-wise
  * feature extraction (stubbed decode) → frame-style sampling. The
  * oracle checks the byte-level results (length, md5) that don't
  * depend on the stub.
  */
object MultimodalQueries {
  import QueryDef.sql

  val q47 = sql(
    "q47_multimodal_features",
    """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_hash
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.extractFeatures(s, Multimodal.withBinaryPayload(Tables.documents(s, d)))
      .select(col("doc_id"), col("n_bytes"), col("content_hash"))
      .orderBy(col("doc_id"))
  }

  // Frame sampling: frames of 64 bytes, keep every 2nd → kept count is
  // derivable from the byte length alone.
  val q48 = sql(
    "q48_frame_sample",
    """SELECT doc_id,
      |  CAST((CAST(ceil(octet_length(CAST(text AS BLOB)) / 64.0) AS BIGINT) + 1) // 2 AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Multimodal.sampleFrames(s, Multimodal.withBinaryPayload(Tables.documents(s, d)), 64, 2)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[QueryDef] = Seq(q47, q48)
}
