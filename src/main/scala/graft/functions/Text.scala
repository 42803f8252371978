package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis primitives (SURVEY §2.8 SC1–SC7, §2.10 U1/U3/U5) plus
  * the training-data-pipeline text operators (language ID, quality
  * scoring, token counting, fingerprinting).
  *
  * Everything here is built from codegen'd builtin column functions —
  * no UDFs — so the hot path stays inside whole-stage codegen. The
  * reference's keyword extractor
  * (keyword-extraction/hybrid_keyword_extractor.py:56-188) is regex +
  * stopword + length filtering; its semantics map 1:1 onto array
  * higher-order functions.
  */
object Text {

  /** Stopword lexicon (hybrid_keyword_extractor.py:124-130 analog —
    * the Korean list is replaced by an English one matching the
    * testdata corpus). */
  val stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  /** SC1 tokenize: lowercase, split on whitespace, drop empties
    * (AlertTopology.java:119-120). */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => length(t) > 0)

  /** F10 keyword validity (hybrid_keyword_extractor.py:173-188):
    * length 2–8, not all-digits, not a stopword. */
  def keywordFilter(tok: Column): Column =
    length(tok).between(2, 8) && !tok.rlike("^[0-9]+$") && !tok.isin(stopwords: _*)

  def validKeywords(text: Column): Column = filter(tokens(text), keywordFilter(_))

  /** U1/U5 per-document keyword extraction with the reference's
    * first-occurrence ordering and top-`cap` cap
    * (hybrid_keyword_extractor.py:119). Pure DataFrame pipeline:
    * posexplode → validity filter → first-position dedup → rank ≤ cap.
    * Scales as one shuffle on (doc, token); no per-row UDF state. */
  def extractKeywords(docs: DataFrame, id: Column, text: Column, cap: Int = 6): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("first_pos"))
    docs.select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "token")))
      .filter(keywordFilter(col("token")))
      .groupBy(col("doc_id"), col("token"))
      .agg(min(col("pos")).as("first_pos"))
      .withColumn("krank", row_number().over(w))
      .filter(col("krank") <= cap)
  }

  /** Language-ID heuristic: argmax of per-language marker-token hits
    * with deterministic tie-breaking, 'und' when nothing matches.
    * (A real n-gram profile model plugs in behind the same column
    * contract; markers keep the oracle SQL-expressible.) */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and"),
    "es" -> Seq("el", "la", "los"),
    "fr" -> Seq("le", "les", "et"))

  def langGuess(text: Column): Column = {
    val toks = tokens(text)
    val counts = langMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms: _*)))
    }
    val Seq(en, es, fr) = counts.map(_._2)
    when(en > 0 && en >= greatest(es, fr), "en")
      .when(es > 0 && es >= fr, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Quality score in [0,1]: 0.4·length-score + 0.4·(1 − stopword
    * ratio) + 0.2·lexical diversity. Mirrors the reference's
    * length/stopword gating (ks/main.py:121-131 quality filter)
    * extended to a graded score for training-data curation. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val stopRatio = size(filter(toks, t => t.isin(stopwords: _*))) / nTok
    val uniqRatio = size(array_distinct(toks)) / nTok
    val lenScore = least(length(text) / 500.0, lit(1.0))
    // zero-token guard (r20): a 0-token document (empty or
    // whitespace-only text) made both ratios divide by zero — an
    // ANSI-mode CRASH, not a wrong number, and one empty document
    // would kill the whole curation batch (found by the curateStream
    // NULL/empty spec arm; the testdata corpus happens to contain
    // none). Nothing to score → worst quality, 0.0 — the funnel's
    // drop:short gate attributes first anyway, but the COLUMN must
    // evaluate on every row (Catalyst does not short-circuit across
    // columns). NULL text keeps returning NULL (the when-condition is
    // NULL, and the formula over NULLs is NULL).
    when(nTok === 0.0, lit(0.0)).otherwise(
      round(lenScore * 0.4 + (lit(1.0) - stopRatio) * 0.4 + uniqRatio * 0.2, 6))
  }

  /** Whitespace token count + BPE-ish subword count via regex. */
  def wsTokenCount(text: Column): Column = size(tokens(text))
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z0-9]+"), lit(0)))

  /** SC4 normalization: lowercase, strip non-alphanumerics, squeeze
    * whitespace (hybrid_keyword_extractor.py:96-97). */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Document fingerprint: md5 of the NFC-normalized then
    * regex-normalized text. NFC first matters even though the regex
    * strips non-ASCII: a precomposed accent is removed as one char
    * while a decomposed one leaves its base letter behind, so the two
    * encodings of the same text would fingerprint differently without
    * it. Stable across engines (DuckDB: nfc_normalize + the same
    * regex chain); requires GraftFunctions.register on the session.
    * The rolling-hash variant lives in Dedup.simhash. */
  def fingerprint(text: Column): Column =
    md5(normalize(graft.plans.GraftFunctions.nfc(text)))

  /** SC6 breaking-lexicon containment (keyword_republisher.py:148-176):
    * does the text mention any lexicon term as a token? */
  def containsAny(text: Column, lexicon: Seq[String]): Column =
    size(array_intersect(tokens(text), array(lexicon.map(lit): _*))) > 0

  /** SC3 Korean particle (josa) suffix stripping — the reference's four
    * chained alternation patterns (hybrid_keyword_extractor.py:56-69).
    * Applied repeatedly in the same order, one regexp_replace each. */
  private val josaPatterns = Seq(
    "(이|가|을|를|은|는)$",          // subject/object/topic markers
    "(에서|에게|한테|부터|까지)$",    // locative/source/limit
    "(와|과|도|만|의|로|으로)$",      // conjunctive/possessive/directional
    "(하다|되다|있다|없다)$")        // verb-suffix stems (F10 filter twin)

  def stripJosa(token: Column): Column =
    josaPatterns.foldLeft(token)((c, p) => regexp_replace(c, p, ""))

  /** SC5 title-weighted extraction text: title counted 3×, content
    * truncated to 1000 chars (hybrid_keyword_extractor.py:85-99,207). */
  def titleWeighted(title: Column, content: Column): Column =
    concat_ws(" ", title, title, title, substring(content, 1, 1000))

  /** TF-IDF top-k terms per document (smooth idf, the sklearn form:
    * idf = ln((N+1)/(df+1)) + 1). Extends the reference's
    * frequency-only extraction (U1) with corpus-level weighting.
    * Ranking key is the ROUNDED score (plus token tiebreak): ln
    * differs in the last ulp across libm implementations, so ranking
    * on the raw double would be engine-ambiguous exactly where two
    * scores collide; round-6 collapses those collisions into the
    * deterministic token tiebreak.
    *
    * Scale: one shuffle on (doc, token) for tf, one on token for df —
    * df is a COUNT WINDOW over tf partitioned by token, not a
    * separate aggregate joined back (which would recompute the whole
    * tokenize+aggregate lineage: measured 8 exchanges vs 3) — and a
    * doc-partitioned rank window. The corpus count joins as a
    * broadcast single row. */
  def tfidfTopK(docs: DataFrame, id: Column, text: Column, k: Int = 3): DataFrame = {
    val tf = docs.select(id.as("doc_id"), explode(tokens(text)).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val nDocs = docs.select(id).agg(count(lit(1)).as("n_docs"))
    val scored = tf
      // df = rows per token in tf ≡ number of docs containing the token
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(
        col("tf").cast("double") *
          (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1.0), 6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("token"), col("score"), col("rank").cast("int").as("rank"))
  }

  /** Unigram surprisal per document: mean −ln p(token) under an
    * add-1-smoothed unigram model fitted on the corpus itself — the
    * CCNet/Wenzek-et-al perplexity-filter shape (arXiv:1911.00359)
    * with a unigram LM standing in for KenLM (an external n-gram model
    * plugs into the same join: (token → logprob) table). High
    * surprisal = rare-token soup (boilerplate, garbled text); low =
    * repetitive filler. One (doc,token) shuffle + a token-keyed join
    * against the (vocabulary-sized, AQE-broadcastable) frequency
    * table; corpus totals ride along as broadcast single rows. */
  def unigramSurprisal(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = docs.select(id.as("doc_id"), explode(tokens(text)).as("token"))
    // token frequency as a count window (not aggregate+join-back, which
    // would shuffle the token stream twice — the q77 lesson); corpus
    // total/vocabulary come from ONE direct aggregate over tok.
    val withCnt = tok.withColumn("cnt",
      count(lit(1)).over(Window.partitionBy(col("token"))))
    val totals = tok.agg(count(lit(1)).as("total"), countDistinct(col("token")).as("v"))
    withCnt.crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round(sum(-log((col("cnt") + 1).cast("double") / (col("total") + col("v"))))
          / count(lit(1)), 6).as("surprisal"))
  }

  /** BM25 retrieval scoring (Robertson–Spärck Jones; the Okapi form
    * with the standard k1/b defaults) for a fixed query term set —
    * the inverted-index ranking function every retrieval pipeline
    * needs next to the TF-IDF extractor above. Returns the top-`k`
    * documents by summed per-term contribution.
    *
    * Cross-engine exactness: each term's contribution is rounded to 6
    * before an EXACT decimal sum (Exact.dsum), so the doc score is
    * order-independent — ln ulps are absorbed by round-6 (the q77
    * recipe), and the sum can't reorder them back into ambiguity.
    *
    * Scale: the (doc, token) stream is filtered to the query terms
    * BEFORE its groupBy — the tf shuffle carries only matching
    * postings, the inverted-index slice, never the corpus. Doc lengths
    * are one doc-keyed aggregation (reused across queries in a real
    * serving setup); corpus stats broadcast as one row; per-term df is
    * a count window over the postings, not a join-back. */
  def bm25TopK(docs: DataFrame, id: Column, text: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, k: Int = 10): DataFrame = {
    val tok = docs.select(id.as("doc_id"), explode(tokens(text)).as("token"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_tok"))
    val tf = tok.filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("tot_tok").cast("double") / col("n_docs"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib", round(
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))), 6))
      .groupBy(col("doc_id"))
      .agg(graft.functions.Exact.dsum(col("contrib"), 6).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Shannon entropy (nats) of the document's character distribution —
    * the standard gibberish/boilerplate detector next to qualityScore:
    * repeated-character junk and template boilerplate score low,
    * natural text high. H = ln n − (Σ c·ln c)/n over the per-character
    * counts (the algebraic form with a single division, so both
    * engines evaluate identical ln/÷ sequences); rounded to 6 after
    * the final expression (libm ln + float-sum ulps — the q83 recipe).
    *
    * Scale: one (doc, char) shuffle with map-side combine; character
    * alphabets are tiny so the second per-doc aggregation is nearly
    * free. */
  def charEntropy(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(split(text, "")).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_chars"),
        round(log(sum(col("c")).cast("double"))
          - sum(col("c").cast("double") * log(col("c").cast("double"))) / sum(col("c")),
          6).as("entropy"))

  /** Vocabulary build — the tokenizer-prep step of a training-data
    * pipeline: corpus token frequencies, a `minCount` floor, a
    * `maxVocab` size cap (every real tokenizer has a target vocab
    * size), and contiguous 0-based ids assigned by (count desc,
    * token asc) rank so the hottest token is id 0 in every engine.
    * Returns (token_id, token, cnt).
    *
    * Scale: the frequency pass is one shuffle with map-side combine
    * over the exploded token stream. The `maxVocab` cap plans as
    * TakeOrderedAndProject (per-partition top-k, then merge), so the
    * global id-assignment rank only ever sees ≤ maxVocab rows — the
    * unbounded token space never funnels through one task even if
    * the minCount cut alone would leave billions of distinct keys. */
  def buildVocab(docs: DataFrame, text: Column, minCount: Long,
      maxVocab: Int = 1 << 20): DataFrame = {
    val counts = docs.select(explode(tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token"))
      .limit(maxVocab)
    counts.withColumn("token_id",
      (row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("token"))) - 1).cast("long"))
      .select(col("token_id"), col("token"), col("cnt"))
  }

  /** Inverted-index build: one row per token with document frequency,
    * corpus term frequency, and the posting list serialized as
    * "doc:tf,doc:tf,…" in doc-id order — the text-retrieval batch
    * artifact BM25/keyword search would serve from.
    *
    * Scale: two aggregations — (doc, token) tf with map-side combine,
    * then per-token collect. The posting payload concentrates on hot
    * tokens by nature of the data (stopword postings ARE corpus-sized);
    * a production index bounds that with the same move the reference's
    * word-cloud takes: cap or stoplist the head before collecting. The
    * sort guaranteeing the doc-order payload is array_sort on the
    * collected structs (per-token, inside the aggregation), never a
    * global sort of the token stream. */
  def invertedIndex(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(tokens(text)).as("token"))
      .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("tf")))),
          s => concat(s.getField("doc_id"), lit(":"), s.getField("tf"))), ",")
          .as("postings"))

  /** Vocabulary coverage / OOV profile per document against a
    * `buildVocab` output — the tokenizer-readiness report a
    * training-data pipeline runs before committing to a vocab: what
    * fraction of each document's tokens fall outside the vocabulary.
    * Returns (doc_id, n_tok, n_oov, oov_ppm); zero-token docs report
    * (0, 0, 0).
    *
    * Scale: the vocab side is ≤ maxVocab rows BY CONSTRUCTION
    * (buildVocab caps it), so the membership join broadcasts — the
    * token stream is never shuffled, only scanned and locally
    * hash-probed. */
  def vocabCoverage(docs: DataFrame, id: Column, text: Column,
      vocab: DataFrame): DataFrame =
    docs.select(id.as("doc_id"), explode_outer(tokens(text)).as("token"))
      .join(org.apache.spark.sql.functions.broadcast(
        vocab.select(col("token"), lit(true).as("in_vocab"))), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("token")).as("n_tok"),
        sum(when(col("token").isNotNull && col("in_vocab").isNull, 1L)
          .otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm",
        when(col("n_tok") === 0, 0L)
          .otherwise(floor(lit(1000000L) * col("n_oov") / col("n_tok")).cast("long")))

  /** Adjacent-bigram list of a token array: ["a b", "b c", ...]; empty
    * for docs with fewer than two tokens. */
  def bigrams(toks: Column): Column = {
    val n = size(toks)
    when(n < 2, array().cast("array<string>"))
      .otherwise(zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (x, y) => concat_ws(" ", x, y)))
  }

  /** Bigram surprisal per document: mean −ln p(w|h) under an
    * add-V-smoothed bigram model fitted on the corpus — the
    * next-order refinement of unigramSurprisal (the q83 CCNet
    * perplexity-filter shape): p(w|h) = (c(h,w)+1) / (c(h·)+V) where
    * c(h·) counts bigrams starting with h and V is the unigram
    * vocabulary. Docs with <2 tokens have no bigrams and drop out.
    *
    * Scale: ONE (doc, bigram) shuffle; both the pair count and the
    * history count are count windows over that same stream (the q77/q83
    * lesson — no aggregate-and-join-back recomputing the tokenize
    * lineage), and V rides along as a broadcast single row. */
  def bigramSurprisal(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val bg = docs.select(id.as("doc_id"), explode(bigrams(tokens(text))).as("bigram"))
      .withColumn("h", split(col("bigram"), " ").getItem(0))
    val withCnt = bg
      .withColumn("cb", count(lit(1)).over(Window.partitionBy(col("bigram"))))
      .withColumn("ch", count(lit(1)).over(Window.partitionBy(col("h"))))
    val vocab = docs.select(explode(tokens(text)).as("token"))
      .agg(countDistinct(col("token")).as("v"))
    withCnt.crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(-log((col("cb") + 1).cast("double") / (col("ch") + col("v"))))
          / count(lit(1)), 6).as("surprisal"))
  }

  /** Corpus-level collocations: top pairs of adjacent tokens by
    * pointwise mutual information over the bigram stream —
    * PMI(a,b) = ln(c(a,b)·T / (cL(a)·cR(b))) with T total bigrams and
    * cL/cR the left/right marginal counts (so all probabilities share
    * one denominator and the score is a single ln over exact integer
    * ratios). `minCount` floors the pair count — PMI is famously
    * unstable on rare pairs. Ranking key is the ROUNDED score with a
    * (pair) tiebreak, the engine-unambiguous ordering recipe.
    *
    * Scale: one (h,w) pair aggregation; marginals are count-sum
    * windows over the pair table (vocabulary-sized, not corpus-sized);
    * T broadcasts; the final rank is TakeOrderedAndProject. */
  def pmiTopPairs(docs: DataFrame, id: Column, text: Column,
      minCount: Int = 5, k: Int = 20): DataFrame = {
    val bg = docs.select(explode(bigrams(tokens(text))).as("bigram"))
      .select(split(col("bigram"), " ").getItem(0).as("h"),
        split(col("bigram"), " ").getItem(1).as("w"))
    val pairs = bg.groupBy(col("h"), col("w")).agg(count(lit(1)).as("cb"))
    val total = pairs.agg(sum(col("cb")).as("t"))
    pairs
      .withColumn("cl", sum(col("cb")).over(Window.partitionBy(col("h"))))
      .withColumn("cr", sum(col("cb")).over(Window.partitionBy(col("w"))))
      .filter(col("cb") >= minCount)
      .crossJoin(broadcast(total))
      .withColumn("pmi", round(
        log(col("cb").cast("double") * col("t") /
          (col("cl").cast("double") * col("cr"))), 6))
      .orderBy(col("pmi").desc, col("h"), col("w"))
      .limit(k)
      .select(col("h"), col("w"), col("cb"), col("pmi"))
  }

  /** SC7 keyword classification ladder
    * (keyword_republisher.py:245-253): digits → numeric, length ≤ 2 →
    * short, otherwise general. */
  def classifyKeyword(kw: Column): Column =
    when(kw.rlike("[0-9]"), "numeric")
      .when(length(kw) <= 2, "short")
      .otherwise("general")

  /** U1 full Korean extractor parity
    * (hybrid_keyword_extractor.py:56-171): Hangul word extraction
    * `[가-힣]{2,8}` (SC2) over the title-weighted text (SC5), josa
    * stripping (SC3), re-filtered for length/stopwords after the strip
    * (F10 twin), first-occurrence dedup, top-6 cap. Korean stopword
    * list per :124-130. Pure column/DataFrame ops — no UDF. */
  val koreanStopwords: Seq[String] = Seq(
    "기자", "뉴스", "오늘", "내일", "어제", "이번", "지난", "관련", "대한", "통해")

  def extractKeywordsKorean(docs: DataFrame, id: Column, title: Column,
      content: Column, cap: Int = 6): DataFrame = {
    val words = regexp_extract_all(titleWeighted(title, content),
      lit("[가-힣]{2,8}"), lit(0))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("first_pos"))
    docs.select(id.as("doc_id"), posexplode(words).as(Seq("pos", "raw")))
      .withColumn("token", stripJosa(col("raw")))
      .filter(length(col("token")).between(2, 8) &&
        !col("token").isin(koreanStopwords: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(min(col("pos")).as("first_pos"))
      .withColumn("krank", row_number().over(w))
      .filter(col("krank") <= cap)
  }

  // ---- model-based filtering: multinomial Naive Bayes (r18) --------
  // The classical linear quality/language filter of production corpus
  // pipelines — "train a cheap classifier on weak labels, score the
  // whole crawl" (the CCNet/GPT-3-shaped step the heuristic tier
  // above feeds): NB's closed form trains in ONE counting pass, no
  // iteration, no driver loop, which is exactly what makes a model
  // pass over 100 TB one Spark job instead of an optimizer loop.

  /** A trained NB filter: the vocab-sized per-token weights table
    * (token, llr — add-1-smoothed log-likelihood ratio, ROUNDED to 6
    * decimals so downstream sums can be exact decimals), the class
    * prior log-odds, and the weight an out-of-vocabulary token scores
    * (the smoothing mass ratio — a constant, since an unseen token's
    * smoothed ratio does not depend on the token). */
  final case class NbModel(weights: DataFrame, priorLogOdds: Double,
      defaultLlr: Double)

  /** Train on weak labels: `label` must be 0/1 (castable), both
    * classes non-empty, and the corpus must tokenize to SOMETHING —
    * every degenerate input is a loud require, never an NPE off a
    * null sum. Counts stay integer until the final log.
    * Scale: one token-keyed count shuffle over the labeled subset +
    * two one-row aggregates — the q77/q83 token-stream shape. */
  def nbTrain(docs: DataFrame, text: Column, label: Column): NbModel = {
    val lab = docs.select(label.cast("int").as("y"), text.as("_t"))
    // count(y) < count(*) (NULL labels) and labels outside 0/1 are
    // named failures here, not an NPE off a NULL sum / corrupted class
    // counts three lines down — the same one-aggregation probe pays
    // for all three checks
    val d = lab.agg(sum(col("y")), count(lit(1)), count(col("y")),
      min(col("y")), max(col("y"))).head()
    require(d.getLong(1) > 0, "nbTrain: empty training set")
    require(d.getLong(2) == d.getLong(1),
      s"nbTrain: label must be non-NULL on every training row, got " +
        s"${d.getLong(1) - d.getLong(2)} NULLs of ${d.getLong(1)}")
    require(d.getInt(3) >= 0 && d.getInt(4) <= 1,
      s"nbTrain: labels must be 0/1, got range [${d.getInt(3)}, ${d.getInt(4)}]")
    val (d1, dAll) = (d.getLong(0), d.getLong(1))
    require(d1 > 0 && d1 < dAll,
      s"nbTrain needs both classes in the training set, got $d1 of " +
        s"$dAll positive")
    val tok = lab.select(col("y"), explode(tokens(col("_t"))).as("token"))
    val t = tok.agg(sum(col("y")).as("n1"), count(lit(1)).as("n"),
      count_distinct(col("token")).as("v")).head()
    require(t.getLong(1) > 0,
      "nbTrain: training texts tokenize to nothing — no counts to fit")
    val (n1, n0, v) = (t.getLong(0), t.getLong(1) - t.getLong(0), t.getLong(2))
    // per-token llr rounded to 6 BEFORE it ever reaches a sum — ln
    // ulps are absorbed here (the q83/q93 recipe), and the scoring
    // side's decimal sum is then exact and order-independent
    val weights = tok.groupBy(col("token"))
      .agg(sum(col("y")).as("c1"), (count(lit(1)) - sum(col("y"))).as("c0"))
      .select(col("token"),
        round(log((col("c1") + 1).cast("double") / (n1 + v)) -
          log((col("c0") + 1).cast("double") / (n0 + v)), 6).as("llr"))
    NbModel(weights,
      priorLogOdds = math.log(d1.toDouble / (dAll - d1)),
      defaultLlr = math.log((n0 + v).toDouble / (n1 + v)))
  }

  /** Score every document: (doc_id, n_tok, score, predicted) — score
    * = prior + Σ llr(token) with multiplicity (OOV tokens take the
    * model's default), predicted = score > 0. Docs with zero tokens
    * drop (no token rows — nothing to score).
    *
    * Cross-engine exactness: the per-doc sum is an EXACT decimal sum
    * of already-rounded weights (Exact.dsum — order-independent, so
    * the gate hash cannot flake on float-sum order); the final round
    * re-snaps the one double addition of the prior.
    *
    * Scale: the postings stream joins the vocab-sized weights table —
    * the TF join shape (AQE broadcasts below threshold, shuffles on
    * token above; Zipf skew rides the same skew handling as every
    * token-keyed aggregate here) — then one doc-keyed aggregation. */
  def nbScore(docs: DataFrame, id: Column, text: Column,
      model: NbModel): DataFrame =
    docs.select(id.as("doc_id"), explode(tokens(text)).as("token"))
      .join(model.weights, Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        Exact.dsum(
          coalesce(col("llr"), round(lit(model.defaultLlr), 6)), 6).as("_s"))
      .select(col("doc_id"), col("n_tok"),
        round(col("_s") + round(lit(model.priorLogOdds), 6), 6).as("score"))
      .withColumn("predicted", col("score") > 0)

  /** The trained model COLLECTED for per-row scoring: the vocab map
    * (token → round-6 llr) plus prior/default in their ROUNDED form
    * (Spark round semantics — BigDecimal HALF_UP). `cap` defaults to
    * the BPE inline-map budget (4096): the vocab rides into the
    * scoring expression as LITERALS, so the cap bounds plan size /
    * serialization and driver memory (r19: per-row scan cost is no
    * longer the binding constraint — [[nbScoreExpr]]'s native kernel
    * probes a constant hash map O(1) per token; pre-r19 the
    * element_at map-literal lookup was a linear vocab scan). Corpus
    * vocabularies exceed any literal budget regardless — past the
    * cap, score with the distributed [[nbScore]] join form — in a
    * stream, inside a foreachBatch stage (each micro-batch is a
    * plain DataFrame there, so the explode/join/groupBy form runs
    * as-is per trigger). ONE collect serves both the cap check and
    * the map (the Bpe.collectWordTokenCounts recipe — a count()
    * first would run the whole training shuffle twice). */
  final case class NbModelLocal(weights: Map[String, Double],
      prior6: Double, defaultLlr6: Double)

  def collectNbModel(model: NbModel, cap: Int = 4096): NbModelLocal = {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = model.weights.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"NB vocabulary exceeds cap $cap — the collected model rides " +
        "into the scoring expression as literals (plan size + driver " +
        "memory), so the per-row form is for lexicon-sized models; " +
        "use nbScore's distributed join form (per micro-batch via " +
        "foreachBatch in a stream)")
    NbModelLocal(
      rows.map(r => r.getString(0) -> r.getDouble(1)).toMap,
      r6(model.priorLogOdds), r6(model.defaultLlr))
  }

  /** Per-ROW scoring column — the STREAMING-legal form of [[nbScore]]
    * (no explode/join/groupBy, so it composes into any stateless
    * stream stage, e.g. ahead of the curation funnel's keep gate):
    * one pass over the token array, BIT-EQUAL to the batch form's
    * exact decimal sum — stream==batch is equality, not ulp tolerance
    * (StreamingConsistencySpec pins it).
    *
    * r19: the pass is the native [[graft.plans.GraftFunctions
    * .nbScoreMicros]] kernel — the vocab as an expression-constant
    * HASH map of exact integer micros. The original spelling
    * (DECIMAL(27,6) `aggregate` + `element_at` over a map literal)
    * was a LINEAR key scan per token — O(doc_len · vocab) per row,
    * ~16M comparisons on a web-length doc at the 4096 cap; the
    * kernel is one O(1) probe per token, and a scale-6 decimal sum
    * IS an integer micro sum, so the value is unchanged bit-for-bit
    * (KernelFuzzSpec pins kernel == the decimal HOF; the final
    * round-6 stays Catalyst's own Round). [[collectNbModel]]'s cap
    * now guards literal/plan size and driver memory, not scan cost;
    * corpus-scale models still score through [[nbScore]]'s join (per
    * micro-batch via foreachBatch in a stream). NULL for zero-token
    * docs: the batch form DROPS them (no token rows); a row-level
    * column cannot drop, so it signals with NULL instead. Requires
    * GraftFunctions.register (curateStream registers; standalone
    * users call it once). */
  def nbScoreExpr(text: Column, model: NbModelLocal): Column = {
    val toks = tokens(text)
    // round-6 doubles → exact integer micros (toLongExact: a non-6-
    // decimal weight would be a construction bug, not data to absorb)
    def micros(x: Double): Long =
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(1000000)).toLongExact
    val entries = model.weights.toSeq.sortBy(_._1)
    when(size(toks) === 0, lit(null).cast("double"))
      .otherwise(round(
        graft.plans.GraftFunctions.nbScoreMicros(toks,
          entries.map(_._1), entries.map(e => micros(e._2)),
          micros(model.defaultLlr6), model.prior6), 6))
  }
}
