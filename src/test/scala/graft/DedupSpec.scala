package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Near-dup detection against the corpus's planted near-duplicates
  * (FIXTURES A8.5 generalized): LSH+verify must equal the all-pairs
  * ground truth; SimHash must have full recall at its default radius.
  */
class DedupSpec extends SparkSuite {
  init()

  private lazy val docs = Tables.documents(spark, sf0001)
  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val truth = pairSet(
    Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text")))

  test("planted near-dups exist in the corpus") {
    assert(truth.nonEmpty)
  }

  test("minhash LSH + verification equals all-pairs ground truth") {
    val lsh = pairSet(Dedup.minhashLshPairs(docs, col("doc_id"), col("text")))
    assert(lsh == truth)
  }

  test("simhash candidates have full recall on very-close pairs (j >= 0.95)") {
    val close = pairSet(
      Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), threshold = 0.95))
    val sim = pairSet(Dedup.simhashPairs(docs, col("doc_id"), col("text")))
    assert(close.subsetOf(sim),
      s"missing: ${close -- sim}")
  }

  test("exact dedup drops identical rows only") {
    val doubled = docs.union(docs)
    assert(Dedup.exact(doubled, Seq("text")).count() == docs.count())
  }

  test("shingle sets are distinct per doc") {
    val sh = Dedup.shingleSet(docs, col("doc_id"), col("text"))
    assert(sh.count() == sh.distinct().count())
  }
}
