package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.multimodal.Multimodal

/** Keyword-filter edge cases (F10), quality bounds, multimodal
  * plumbing shapes. */
class TextSpec extends SparkSuite {
  init()
  import spark.implicits._

  test("keyword filter: length 2-8, no digits, no stopwords") {
    val out = Seq("x aa 12345 the spark abcdefghi join 7 ok")
      .toDF("text")
      .select(Text.validKeywords(col("text")).as("kw"))
      .as[Seq[String]].collect().head
    assert(out == Seq("aa", "spark", "join", "ok"))
  }

  test("keyword extraction caps at 6 in first-occurrence order") {
    val df = Seq((1L, "z9 y8 x7 w6 v5 u4 t3 s2 z9 y8")).toDF("id", "text")
    val rows = Text.extractKeywords(df, col("id"), col("text"))
      .orderBy("krank").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[String]("token")).toSeq ==
      Seq("z9", "y8", "x7", "w6", "v5", "u4"))
  }

  test("quality score stays in [0,1]") {
    val scores = graft.sources.Tables.documents(spark, sf0001)
      .select(Text.qualityScore(col("text")).as("q")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("normalize strips punctuation and squeezes spaces") {
    val n = Seq("  Hello,   WORLD!! 42 ").toDF("t")
      .select(Text.normalize(col("t"))).as[String].collect().head
    assert(n == "hello world 42")
  }

  test("langGuess falls back to und without markers") {
    val g = Seq("xyzzy plugh", "the cat and dog").toDF("t")
      .select(Text.langGuess(col("t"))).as[String].collect().toSeq
    assert(g == Seq("und", "en"))
  }

  test("korean extractor: hangul-only, josa-stripped, title-weighted order, capped") {
    val df = Seq(
      (1L, "삼성전자가 AI 반도체 기술을 발표", // FIXTURES A5-style title
        "삼성전자는 오늘 새로운 반도체 기술과 인공지능 플랫폼을 공개했다 Samsung 123")
    ).toDF("id", "title", "content")
    val rows = Text.extractKeywordsKorean(df, col("id"), col("title"), col("content"))
      .orderBy("krank").collect()
    val toks = rows.map(_.getAs[String]("token")).toSeq
    // title tokens come first (3x weighting => earliest positions);
    // josa stripped: 삼성전자가→삼성전자, 기술을→기술; ASCII/digits never match
    assert(toks.take(3) == Seq("삼성전자", "반도체", "기술"))
    assert(toks.length <= 6)
    assert(!toks.exists(t => t.exists(c => c < '가' || c > '힣')))
    assert(!toks.contains("오늘")) // korean stopword
  }

  test("approx_percentile tracks the exact percentile within its accuracy bound") {
    // The 100 TB path for q67: approx_percentile is single-pass
    // mergeable (no global sort). Pin its deviation from the exact
    // interpolated percentile on the real quality distribution.
    import org.apache.spark.sql.functions._
    val q = graft.sources.Tables.documents(spark, sf0001)
      .select(Text.qualityScore(col("text")).as("quality"))
    val r = q.agg(
      expr("percentile(quality, 0.5)").as("exact"),
      expr("approx_percentile(quality, 0.5, 10000)").as("approx")).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(exact - approx) <= 0.02,
      s"approx p50 $approx drifted from exact $exact")
  }

  test("multimodal feature extraction preserves byte counts") {
    val docs = graft.sources.Tables.documents(spark, sf0001).limit(10)
    val feats = Multimodal.extractFeatures(spark, Multimodal.withBinaryPayload(docs))
    val joined = feats.join(docs, "doc_id")
      .select(col("n_bytes"), length(col("text")).cast("long").as("len"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // HeaderDecoder emits [len, 0, 0] for non-media payloads — fixed width
    assert(feats.select("features").as[Seq[Double]].collect().forall(_.length == 3))
  }

  test("frame sampling: chunk count follows byte length") {
    val one = Seq((1L, "a" * 200)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, Multimodal.withBinaryPayload(one), 64, 2)
    // 200 bytes → frames 0..3 (64,64,64,8) → keep idx 0 and 2
    assert(frames.count() == 2)
    assert(frames.select("frame_bytes").as[Int].collect().sorted.toSeq == Seq(64, 64))
  }

  test("unigram surprisal: rare-token docs score higher than common-token docs") {
    val df = Seq(
      (1L, "common common common common"),
      (2L, "common common rareword common"),
      (3L, "rareword oddity unusual singular")).toDF("doc_id", "text")
    val out = Text.unigramSurprisal(df, col("doc_id"), col("text"))
      .select("doc_id", "surprisal").as[(Long, Double)].collect().toMap
    assert(out(1L) < out(2L) && out(2L) < out(3L),
      s"surprisal must rank rare-token docs higher: $out")
    // hand-check doc 1: corpus has common=7, rareword=2, three 1-count
    // rares -> total=12, V=5; p(common) = (7+1)/(12+5); all four tokens
    // identical so surprisal = -ln(8/17)
    val expected = -math.log(8 / 17.0)
    assert(math.abs(out(1L) - expected) < 1e-5)
  }

  test("bigrams: adjacent pairs; <2 tokens -> empty") {
    val out = Seq("a b c", "solo", "", "x  y").toDF("t")
      .select(Text.bigrams(Text.tokens(col("t"))).as("bg"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("a b", "b c"), Seq(), Seq(), Seq("x y")))
  }

  test("bigram surprisal: hand-checked add-V model") {
    // corpus bigrams: doc1 "a b","b a","a b"; doc2 "b a" -> c(a b)=2,
    // c(b a)=2, c(a .)=2, c(b .)=2; V=3 (a, b, only) -> every
    // -ln p = -ln((2+1)/(2+3))
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "only")).toDF("doc_id", "text")
    val out = Text.bigramSurprisal(df, col("doc_id"), col("text"))
      .select("doc_id", "n_bigrams", "surprisal").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L), "docs with <2 tokens drop out")
    assert(out(1L)._1 == 3 && out(2L)._1 == 1)
    val exp = -math.log(3 / 5.0)
    assert(math.abs(out(1L)._2 - exp) < 1e-5 && math.abs(out(2L)._2 - exp) < 1e-5)
  }

  test("bm25: higher tf of a matching term outranks; non-matching docs absent") {
    val df = Seq((1L, "x x x y"), (2L, "x y y y"), (3L, "z z z z")).toDF("id", "text")
    val rows = Text.bm25TopK(df, col("id"), col("text"), Seq("x"), k = 10).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(rows.forall(_.getAs[Long]("n_terms") == 1L))
    // d2: tf=1, dl=4=avgdl -> denom = 1+k1 -> contrib = idf exactly
    val idf = math.log(1.0 + (3 - 2 + 0.5) / 2.5)
    assert(math.abs(rows(1).getAs[Double]("score") - idf) < 1e-5)
  }

  test("pmi pairs: hand-checked collocation scores, floor respected") {
    // bigrams: "a b" x2, "b a", "b c", "c d" -> T=5
    val df = Seq((1L, "a b a b c d")).toDF("id", "text")
    val rows = Text.pmiTopPairs(df, col("id"), col("text"), minCount = 2, k = 5).collect()
    assert(rows.length == 1, "only (a,b) reaches minCount=2")
    val r = rows.head
    assert(r.getAs[String]("h") == "a" && r.getAs[String]("w") == "b")
    assert(r.getAs[Long]("cb") == 2L)
    // pmi = ln(cb*T / (cl(a) * cr(b))) = ln(2*5 / (2*2))
    assert(math.abs(r.getAs[Double]("pmi") - math.log(10 / 4.0)) < 1e-5)
  }

  test("char entropy: constant text scores 0, uniform alphabet scores ln k") {
    val df = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd")).toDF("doc_id", "text")
    val out = Text.charEntropy(df, col("doc_id"), col("text"))
      .select("doc_id", "entropy").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L)) < 1e-9)
    assert(math.abs(out(2L) - math.log(2)) < 1e-5)
    assert(math.abs(out(3L) - math.log(4)) < 1e-5)
  }

  test("vocab build: min-count floor, ids ranked by (count desc, token)") {
    val df = Seq((1L, "b b b a a c"), (2L, "a b rare")).toDF("id", "text")
    val v = Text.buildVocab(df, col("text"), minCount = 2L)
      .select("token_id", "token", "cnt").as[(Long, String, Long)].collect().toSeq
    // b:4, a:3 pass; c:1 and rare:1 are cut; hottest token gets id 0
    assert(v == Seq((0L, "b", 4L), (1L, "a", 3L)))
  }

  test("vocab coverage: OOV counted against the vocab, empty docs report zero") {
    val corpus = Seq((1L, "b b a zzz"), (2L, "a b"), (3L, "")).toDF("id", "text")
    val vocab = Text.buildVocab(corpus, col("text"), minCount = 2L) // {a, b}
    val out = Text.vocabCoverage(corpus, col("id"), col("text"), vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((4L, 1L, 250000L)), s"doc1: ${out(1L)}") // zzz is OOV
    assert(out(2L) == ((2L, 0L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L)), "zero-token doc must survive with zeros")
  }

  test("inverted index: doc-ordered postings, df/tf exact") {
    val df = Seq((2L, "x y x"), (1L, "x z")).toDF("id", "text")
    val idx = Text.invertedIndex(df, col("id"), col("text")).collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("total_tf"), r.getAs[String]("postings"))))
      .toMap
    assert(idx("x") == ((2L, 3L, "1:1,2:2"))) // doc order, not input order
    assert(idx("y") == ((1L, 1L, "2:1")))
    assert(idx("z") == ((1L, 1L, "1:1")))
  }

  test("nb filter: hand-checked llr/prior/default, weak-label separation, single-class rejected") {
    // training set: 2 positive docs of "good" tokens, 1 negative of
    // "bad" — hand-countable: n1=4, n0=2, V=3 (good, fine, bad)
    val train = Seq(
      (1L, "good fine good", 1), (2L, "good", 1), (3L, "bad bad", 0))
      .toDF("id", "text", "y")
    val m = Text.nbTrain(train, col("text"), col("y"))
    // prior = ln(2/1); default (OOV) = ln((n0+V)/(n1+V)) = ln(5/7)
    assert(m.priorLogOdds == math.log(2.0))
    assert(m.defaultLlr == math.log(5.0 / 7.0))
    val w = m.weights.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // Spark's round(col, 6) semantics exactly (catalyst Round =
    // BigDecimal HALF_UP — math.round would differ on negative .5s)
    def d6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = d6(x).toDouble
    // llr(good) = ln((3+1)/(4+3)) − ln((0+1)/(2+3)) = ln(4/7)−ln(1/5)
    assert(w("good") == r6(math.log(4.0 / 7) - math.log(1.0 / 5)))
    assert(w("bad") == r6(math.log(1.0 / 7) - math.log(3.0 / 5)))
    assert(w("good") > 0 && w("bad") < 0, "signs must follow the classes")
    // scoring separates held-out docs of each vocabulary, OOV tokens
    // take the constant default, zero-token docs drop
    val score = Text.nbScore(
      Seq((10L, "good good fine"), (11L, "bad bad unseen"), (12L, " "))
        .toDF("id", "text"),
      col("id"), col("text"), m)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(score(10L)._3 && !score(11L)._3, s"$score")
    assert(score(10L)._1 == 3L && score(11L)._1 == 3L)
    // hand-compute doc 11: 2·llr(bad) + default as the EXACT decimal
    // sum nbScore performs, + rounded prior, final round-6
    val s11 = (d6(w("bad")) * 2 + d6(m.defaultLlr)).toDouble
    assert(score(11L)._2 == r6(s11 + r6(m.priorLogOdds)))
    assert(!score.contains(12L), "zero-token docs drop")
    // a single-class training set cannot fit a prior — loud, not NaN
    val err = intercept[IllegalArgumentException](Text.nbTrain(
      train.filter(col("y") === 1), col("text"), col("y")))
    assert(err.getMessage.contains("both classes"))
  }

  test("nbTrain: NULL and out-of-range labels are named requires, never an NPE / silent corruption") {
    // a NON-EMPTY set whose labels are all NULL used to pass the
    // count>0 require and NPE on the null sum (r19, advisor); now a
    // named require
    val allNull = Seq((1L, "some text here"), (2L, "other text"))
      .toDF("id", "text").withColumn("y", lit(null).cast("int"))
    val e1 = intercept[IllegalArgumentException](
      Text.nbTrain(allNull, col("text"), col("y")))
    assert(e1.getMessage.contains("non-NULL"), e1.getMessage)
    // one NULL among valid labels is equally loud — a silent drop
    // would skew the prior
    val oneNull = Seq((1L, "good text", "1"), (2L, "bad text", "0"),
      (3L, "mystery", null)).toDF("id", "text", "y")
    val e2 = intercept[IllegalArgumentException](
      Text.nbTrain(oneNull, col("text"), col("y")))
    assert(e2.getMessage.contains("non-NULL"), e2.getMessage)
    // labels outside 0/1 corrupt the class counts (sum(y) is no longer
    // a class-1 count) — named, not silent
    val outOfRange = Seq((1L, "good text", 1), (2L, "bad text", 0),
      (3L, "weighted", 2)).toDF("id", "text", "y")
    val e3 = intercept[IllegalArgumentException](
      Text.nbTrain(outOfRange, col("text"), col("y")))
    assert(e3.getMessage.contains("0/1"), e3.getMessage)
  }
}
