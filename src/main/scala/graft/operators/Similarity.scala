package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query
  * vector against a single scan of the corpus (embarrassingly
  * parallel, no shuffle except the final top-k, which Spark plans as
  * TakeOrderedAndProject).
  *
  * Scale path: sign-bit LSH bucketing (Vectors.lshBucket) — vectors
  * co-partition by bucket; a query probes only its own bucket
  * (optionally multi-probe neighboring buckets). At 100 TB the bucket
  * column becomes the table's partition/bucketing key so candidate
  * search never shuffles the corpus.
  */
object Similarity {

  /** Cosine top-k against one query vector taken from the corpus. */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    embeddings.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(Vectors.cosine(col("embedding"), col("q_emb")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Attach the LSH bucket id; downstream repartitions/bucketed-writes
    * on it for shuffle-free candidate generation. */
  def withLshBucket(embeddings: DataFrame, dim: Int, nBits: Int): DataFrame =
    embeddings.withColumn("bucket", Vectors.lshBucket(col("embedding"), dim, nBits))

  /** Bucketed ANN: top-k within the query vector's own bucket. Recall
    * is traded for a corpus-partition-local search. */
  def bucketedTopK(embeddings: DataFrame, dim: Int, nBits: Int,
      queryId: Long, k: Int): DataFrame = {
    val bucketed = withLshBucket(embeddings, dim, nBits)
    val q = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
    bucketed.filter(col("vec_id") =!= queryId)
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .select(col("vec_id"), col("label"), col("bucket"),
        round(Vectors.cosine(col("embedding"), col("q_emb")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
