package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Clustering
import graft.sources.Tables

/** Clustering + semantic-dedup inventory: quantized k-means and
  * SemDeDup under the hash gate. The DuckDB oracle replays Lloyd's
  * algorithm itself — init, every assignment pass, every centroid
  * update — which only works because the operator is integer-exact by
  * construction (see operators/Clustering.scala).
  */
object ClusteringQueries {
  import QueryDef.sql

  private val K = 8
  private val Passes = 2

  /** One assignment pass + one update in DuckDB, over the shared int8
    * quantizer CTE. `d{t}`/`a{t}` = distances/argmin of pass t;
    * `u{t}` = centroids updated from a{t}. */
  private def distSql: String =
    "CAST(list_sum(list_transform(range(1, 65), i -> " +
      "CAST(v.q8[i] - c.c[i] AS BIGINT) * (v.q8[i] - c.c[i]))) AS BIGINT)"

  private def assignSql(t: Int, centroids: String): String =
    s"""d$t AS (SELECT v.vec_id, c.cluster, $distSql AS dist FROM q v CROSS JOIN $centroids c),
       |a$t AS (SELECT vec_id, cluster, dist FROM (
       |  SELECT vec_id, cluster, dist,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
       |  FROM d$t) z WHERE rn = 1)""".stripMargin

  private def updateSql(t: Int): String =
    s"""u$t AS (SELECT cluster, list(ci ORDER BY pos) AS c FROM (
       |  SELECT a.cluster, p.pos,
       |    CAST(floor(sum(v.q8[p.pos]) / CAST(count(*) AS DOUBLE)) AS INT) AS ci
       |  FROM a$t a JOIN q v USING (vec_id) CROSS JOIN range(1, 65) p(pos)
       |  GROUP BY a.cluster, p.pos) t GROUP BY cluster)""".stripMargin

  /** The full Lloyd's replay: init from the K lowest ids, then
    * `Passes` assignment passes with updates between. Leaves the final
    * assignment in CTE `a$Passes`. */
  private def kmeansCtes: String = {
    val init =
      s"""init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, q8 AS c
         |  FROM (SELECT vec_id, q8 FROM q ORDER BY vec_id LIMIT $K) t)""".stripMargin
    val steps = (1 to Passes).map { t =>
      val cents = if (t == 1) "init" else s"u${t - 1}"
      if (t < Passes) assignSql(t, cents) + ",\n" + updateSql(t)
      else assignSql(t, cents)
    }
    (init +: steps).mkString(",\n")
  }

  // Quantized k-means (Lloyd's, integer-exact): the oracle replays the
  // entire algorithm — the strongest possible gate for an iterative
  // operator, available only because the arithmetic is
  // engine-portable by design.
  val q86 = sql(
    "q86_kmeans_clusters",
    s"""WITH ${VectorQueries.quantCte},
       |$kmeansCtes
       |SELECT a.vec_id, v.label, a.cluster, a.dist
       |FROM a$Passes a JOIN q v USING (vec_id) ORDER BY vec_id""".stripMargin) { (s, d) =>
    Clustering.kmeansInt8(Tables.embeddings(s, d), K, Passes)
      .orderBy(col("vec_id"))
  }

  // SemDeDup: exact-cosine near-dup pairs inside the k-means clusters
  // (cluster = blocking key). Oracle = Lloyd's replay + the q57
  // blocked-cosine pair formula.
  val q87 = sql(
    "q87_semantic_neardup",
    s"""WITH ${VectorQueries.quantCte},
       |$kmeansCtes,
       |wc AS (SELECT e.vec_id, a.cluster, e.embedding,
       |    sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
       |      i -> CAST(e.embedding[i] AS DOUBLE)*CAST(e.embedding[i] AS DOUBLE)))) AS nrm
       |  FROM embeddings e JOIN a$Passes a ON e.vec_id = a.vec_id),
       |pr AS (SELECT a.cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    round(list_sum(list_transform(range(1, len(a.embedding)+1),
       |        i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))
       |      / (a.nrm * b.nrm), 6) AS sim
       |  FROM wc a JOIN wc b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
       |SELECT cluster, vec_a, vec_b, sim FROM pr WHERE sim >= 0.35
       |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
    Clustering.semanticNearDupPairs(Tables.embeddings(s, d), K, Passes, 0.35)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // Cluster-balanced sampling (r19): the semantic-diversity selection
  // cut — the 15 lowest-hash members of each LEARNED cluster, so the
  // subset is balanced across semantic modes instead of mirroring the
  // corpus's mode skew. Oracle = the full Lloyd's replay (q86's CTEs)
  // + the q81 stratified-rank recipe with the learned cluster as the
  // stratum; the whole selection is a pure engine-replayable function
  // of the corpus because both stages are (integer k-means, portable
  // salted hash).
  val q157 = sql(
    "q157_cluster_balanced_sample",
    s"""WITH ${VectorQueries.quantCte},
       |$kmeansCtes,
       |h AS (SELECT a.vec_id, a.cluster, a.dist,
       |    ${CurationQueries.uSql("md5('cbal' || CAST(a.vec_id AS VARCHAR))")} AS u
       |  FROM a$Passes a),
       |sg AS (SELECT vec_id, cluster, dist, ${CurationQueries.signedSql("u")} AS hs FROM h),
       |r AS (SELECT vec_id, cluster, dist,
       |    row_number() OVER (PARTITION BY cluster ORDER BY hs, vec_id) AS rn
       |  FROM sg)
       |SELECT r.vec_id, v.label, r.cluster, r.dist
       |FROM r JOIN q v USING (vec_id) WHERE rn <= 15 ORDER BY vec_id""".stripMargin) {
    (s, d) =>
      Clustering.clusterBalancedSample(Tables.embeddings(s, d), K, Passes, 15)
        .orderBy(col("vec_id"))
  }

  // Cluster-balanced selection composed into the FACTORY tier (r20 —
  // q157 proved the operator standalone; this pins the production
  // shape, the embedding-curation recipe: curate → exact dedup → LSH
  // near-dup removal → cluster the SURVIVORS' embeddings → balanced
  // cut, selection AFTER dedup so near-dup floods cannot forge
  // semantic modes and buy slots). Oracle = q116's survivor CTEs
  // (shared verbatim — CurationQueries.corpusSurvivorCtes) feeding
  // the q86 Lloyd's replay restricted to survivor embeddings, then
  // the q157 stratified-rank cut, with each selected doc carrying its
  // q68 split. Row-level pin (every selected vec_id + cluster + dist
  // + split), the strongest gate the composition admits.
  val q159 = sql(
    "q159_factory_balanced_selection",
    s"""WITH RECURSIVE ${CurationQueries.corpusSurvivorCtes},
       |emb_s AS (SELECT e.vec_id, e.label, e.embedding
       |  FROM embeddings e JOIN s2 ON e.vec_id = s2.doc_id),
       |${VectorQueries.quantCte.replace("FROM embeddings", "FROM emb_s")},
       |$kmeansCtes,
       |hh AS (SELECT a.vec_id, a.cluster, a.dist,
       |    ${CurationQueries.uSql("md5('cbal' || CAST(a.vec_id AS VARCHAR))")} AS u
       |  FROM a$Passes a),
       |sg2 AS (SELECT vec_id, cluster, dist, ${CurationQueries.signedSql("u")} AS hs FROM hh),
       |r AS (SELECT vec_id, cluster, dist,
       |    row_number() OVER (PARTITION BY cluster ORDER BY hs, vec_id) AS rn
       |  FROM sg2),
       |sph AS (SELECT doc_id,
       |    ${CurationQueries.uSql("md5('split' || CAST(doc_id AS VARCHAR))")} AS u FROM s2),
       |spg AS (SELECT doc_id, ${CurationQueries.signedSql("u")} AS hs FROM sph),
       |sp AS (SELECT doc_id,
       |    CASE WHEN ${CurationQueries.pmodSql("hs", 100)} < 80 THEN 'train'
       |         WHEN ${CurationQueries.pmodSql("hs", 100)} < 90 THEN 'val'
       |         ELSE 'test' END AS split FROM spg)
       |SELECT r.vec_id, v.label, r.cluster, r.dist, sp.split
       |FROM r JOIN q v USING (vec_id) JOIN sp ON sp.doc_id = r.vec_id
       |WHERE rn <= 15 ORDER BY vec_id""".stripMargin) { (s, d) =>
    // r21: both consumers (the selection semi-join and the split side)
    // need only the survivor IDS — project once behind a lazy barrier
    // so the five-stage survivor chain executes exactly once instead
    // of once per consumer (and the barrier is a narrow id column, not
    // the text-bearing frame). Values unchanged; guide §5 + §2.3
    // (shuffle keys, not payloads).
    val s2ids = CurationQueries.corpusSurvivors(Tables.documents(s, d))
      .select(col("doc_id"))
      .localCheckpoint(eager = false)
    val sel = Clustering.corpusBalancedSelection(s2ids, col("doc_id"),
      Tables.embeddings(s, d), col("vec_id"), K, Passes, 15)
    val split = graft.operators.Curation.withSplit(
      s2ids, col("doc_id")).select(col("doc_id"), col("split"))
    sel.join(split, sel("vec_id") === split("doc_id"))
      .select(col("vec_id"), col("label"), col("cluster"), col("dist"), col("split"))
      .orderBy(col("vec_id"))
  }

  val all: Seq[QueryDef] = Seq(q86, q87, q157, q159)
}
