package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE merge training: hand-computed merges on a classic fixture,
  * overlap (parity) semantics, and determinism under repartitioning.
  */
class BpeSpec extends SparkSuite {
  init()
  import spark.implicits._

  test("learns the classic low/lower/lowest merge sequence with deterministic ties") {
    val docs = Seq("low low lower lowest").toDF("text")
    val got = Bpe.trainMerges(docs, col("text"), 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toList
    // counts: (l,o)=4 ties (o,w)=4 → sym_a tiebreak picks (l,o);
    // round 4: all pairs cnt=1 → (lowe,r) < (lowe,s) on sym_b
    assert(got == List(
      (1, "l", "o", "lo", 4L),
      (2, "lo", "w", "low", 4L),
      (3, "low", "e", "lowe", 2L),
      (4, "lowe", "r", "lower", 1L),
      (5, "lowe", "s", "lowes", 1L)))
  }

  test("greedy left-to-right: overlapping run aaaa merges to [aa, aa], not [aa, a, a]") {
    val docs = Seq("aaaa").toDF("text")
    val vocab = Bpe.vocabAfterMerges(docs, col("text"), 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == Map("aa" -> 2L), s"got $vocab")
    // and the learned pair counted overlapping occurrences (3, not 2)
    val m = Bpe.trainMerges(docs, col("text"), 1).collect().head
    assert((m.getString(1), m.getString(2), m.getLong(4)) == (("a", "a", 3L)))
  }

  test("early exhaustion: single-char words yield no merges beyond the possible") {
    val docs = Seq("a b a b").toDF("text")
    assert(Bpe.trainMerges(docs, col("text"), 5).count() == 0)
  }

  test("merge list is invariant under repartitioning") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    def m(df: org.apache.spark.sql.DataFrame) =
      Bpe.trainMerges(df, col("text"), 3).collect()
        .map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toList
    assert(m(docs) == m(docs.repartition(13)))
  }
}
