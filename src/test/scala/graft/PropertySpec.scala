package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Text
import graft.model.Cdc
import graft.operators.TimeSeries

/** Property-style tests (SURVEY §5): seeded ScalaCheck generators
  * produce one input batch per property; expectations are computed in
  * plain Scala and checked row-by-row against the column
  * implementations — one Spark job per property.
  */
class PropertySpec extends SparkSuite {
  init()
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("property: velocity formula over random count series") {
    val counts = sample(Gen.chooseNum(0L, 50L), 200, 7L)
    // one key, consecutive buckets; reference semantics prev==0 → cnt*2
    val df = counts.zipWithIndex.map { case (c, i) => (i.toLong, "k", c) }
      .toDF("bucket", "key", "cnt")
    val got = TimeSeries.velocity(df).orderBy("bucket")
      .select("cnt", "velocity").as[(Long, Double)].collect()
    var prev = 0L
    got.foreach { case (c, v) =>
      val expected = if (prev == 0L) c * 2.0 else (c - prev) * 1.0
      assert(v == expected, s"cnt=$c prev=$prev got=$v")
      prev = c
    }
  }

  test("property: extracted keywords always satisfy the validity filter") {
    val tokenGen = Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(12)),
      Gen.numStr.map(_.take(5)),
      Gen.oneOf(Text.stopwords))
    val docGen = Gen.listOfN(30, tokenGen).map(_.filter(_.nonEmpty).mkString(" "))
    val docs = sample(docGen, 100, 11L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = Text.extractKeywords(docs, col("id"), col("text"))
      .groupBy("doc_id")
      .agg(collect_list("token").as("toks"), count(lit(1)).as("n"))
      .as[(Long, Seq[String], Long)].collect()
    out.foreach { case (_, toks, n) =>
      assert(n <= 6)
      assert(toks.distinct == toks)
      toks.foreach { t =>
        assert(t.length >= 2 && t.length <= 8 && !t.matches("^[0-9]+$") &&
          !Text.stopwords.contains(t), s"invalid keyword '$t'")
      }
    }
  }

  test("property: wrapped and bare CDC envelopes parse identically") {
    val opGen = Gen.oneOf("c", "r", "u", "d")
    val idGen = Gen.chooseNum(1L, 1000000L)
    val tblGen = Gen.oneOf("articles", "media", "article_changes")
    val cases = sample(Gen.zip(opGen, idGen, tblGen), 100, 13L)
    def img(op: String, id: Long) =
      if (op == "d") s""""before":{"id":$id},"after":null"""
      else s""""before":null,"after":{"id":$id}"""
    val bare = cases.map { case (op, id, t) =>
      s"""{"op":"$op",${img(op, id)},"source":{"table":"$t"},"ts_ms":${id * 7}}"""
    }
    val wrapped = cases.map { case (op, id, t) =>
      s"""{"payload":{"op":"$op",${img(op, id)},"source":{"table":"$t"},"ts_ms":${id * 7}}}"""
    }
    def parse(rows: Seq[String]) =
      Cdc.parse(rows.toDF("value"), col("value"))
        .select(col("op"), col("table"), col("ts_ms"),
          coalesce(col("after.id"), col("before.id")).as("id"))
        .collect().map(_.toString).sorted.toSeq
    assert(parse(bare) == parse(wrapped))
    assert(parse(bare).size == cases.size)
  }

  test("property: sliding sum equals brute-force window sum") {
    val entries = sample(Gen.zip(Gen.chooseNum(0L, 100L), Gen.chooseNum(1L, 9L)), 150, 17L)
      .distinctBy(_._1)
    val df = entries.map { case (b, c) => (b, "k", c) }.toDF("bucket", "key", "cnt")
    val got = TimeSeries.slidingSum(df, 30)
      .select("bucket", "sliding_cnt").as[(Long, Long)].collect().toMap
    val byBucket = entries.toMap
    byBucket.foreach { case (b, _) =>
      val expected = byBucket.filter { case (b2, _) => b2 <= b && b2 > b - 30 }.values.sum
      assert(got(b) == expected, s"bucket=$b")
    }
  }

  test("property: q105's integer ntile decomposition equals ntile() for random sizes") {
    // the scale-safe decile path replaces ntile(10) OVER (global sort)
    // with rank-from-histogram + an integer bucket formula; pin the
    // formula against Spark's own ntile on assorted row counts,
    // including N < 10, N % 10 == 0, and N % 10 != 0
    for (n <- Seq(1, 7, 10, 23, 100, 101, 109)) {
      val df = (1 to n).map(_.toLong).toDF("r")
        .crossJoin(Seq(n.toLong).toDF("n_total"))
      val viaFormula = df
        .withColumn("base", expr("n_total div 10"))
        .withColumn("rem", col("n_total") % 10)
        .withColumn("decile",
          when(col("r") <= col("rem") * (col("base") + 1),
            expr("(r + base) div (base + 1)"))
            .otherwise(col("rem") + expr("(r - rem*(base+1) + base - 1) div base"))
            .cast("int"))
        .select("r", "decile").as[(Long, Int)].collect().toMap
      val viaNtile = (1 to n).map(_.toLong).toDF("r")
        .withColumn("decile", ntile(10).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("r"))))
        .select("r", "decile").as[(Long, Int)].collect().toMap
      assert(viaFormula == viaNtile, s"n=$n")
    }
  }

  test("property: duplicateSpans equals a brute-force window scan on random corpora") {
    val k = 4
    val tokGen = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val corpus = sample(docGen, 60, 23L).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
    val got = graft.operators.Dedup.duplicateSpans(
      corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), k = k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // brute force in plain Scala
    val wins = corpus.flatMap { case (id, text) =>
      val ts = text.split(" ").filter(_.nonEmpty)
      ts.sliding(k).filter(_.length == k).map(w => (id, w.mkString(" "))).toSeq
    }
    val dupGrams = wins.groupBy(_._2).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expected = wins.groupBy(_._1).map { case (id, ws) =>
      id -> ((ws.size.toLong, ws.count(w => dupGrams(w._2)).toLong))
    }
    assert(got == expected,
      s"mismatch: extra=${got.keySet -- expected.keySet} missing=${expected.keySet -- got.keySet}")
  }

  test("property: dupClusters equals union-find on random graphs") {
    import graft.operators.Dedup
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 39L); b <- Gen.chooseNum(0L, 39L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    for (trial <- 0 until 5) {
      val edges = sample(edgeGen, 60, 100L + trial * 31).distinct
      // plain-Scala union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      val got = Dedup.dupClusters(edges.toDF("doc_a", "doc_b"))
        .select("doc_id", "cluster").as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: ${got.toSet -- expected.toSet} " +
        s"vs ${expected.toSet -- got.toSet}")
      // csize consistency: sizes sum to node count
      val sizes = Dedup.dupClusters(edges.toDF("doc_a", "doc_b"))
        .select("cluster", "csize").distinct().as[(Long, Long)].collect()
      assert(sizes.map(_._2).sum == expected.size)
    }
  }

  test("property: BPE merge application equals a sequential greedy merger") {
    import graft.operators.Bpe
    // random short words over a 3-letter alphabet → adversarial overlap
    val wordGen = Gen.listOfN(6, Gen.oneOf("a", "b", "c")).map(_.mkString)
    for (trial <- 0 until 3) {
      val words = sample(wordGen, 40, 500L + trial * 17).filter(_.nonEmpty)
      val docs = Seq(words.mkString(" ")).toDF("text")
      val merges = 4
      val got = Bpe.trainMerges(docs, col("text"), merges)
        .select("rank", "sym_a", "sym_b", "cnt")
        .as[(Int, String, String, Long)].collect().toList
      // sequential reference: exact greedy BPE on a word-frequency map
      var wf = words.groupBy(identity).map { case (w, ws) =>
        w.split("").toList -> ws.size.toLong
      }.toList
      val expected = scala.collection.mutable.ListBuffer[(Int, String, String, Long)]()
      for (r <- 1 to merges) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        wf.foreach { case (syms, fr) =>
          syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + fr)
        }
        if (counts.nonEmpty) {
          val ((a, b), c) = counts.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.head
          expected += ((r, a, b, c))
          wf = wf.map { case (syms, fr) =>
            val out = scala.collection.mutable.ListBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.toList -> fr
          }
        }
      }
      assert(got == expected.toList, s"trial $trial: $got vs ${expected.toList}")
    }
  }

  test("property: josa stripping only removes listed suffixes") {
    val base = Seq("삼성전자", "기술", "한국", "서울")
    val josa = Seq("이", "가", "을", "를", "은", "는", "에서", "로", "만")
    val words = for (b <- base; j <- josa) yield (b + j, b)
    val got = words.map(_._1).toDF("w")
      .select(Text.stripJosa(col("w"))).as[String].collect().toSeq
    assert(got == words.map(_._2))
    // non-josa endings untouched
    val keep = Seq("spark", "데이터").toDF("w")
      .select(Text.stripJosa(col("w"))).as[String].collect().toSeq
    assert(keep == Seq("spark", "데이터"))
  }
}
