package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Text-analysis inventory over the `documents` table: tokenization,
  * keyword extraction (U1/U5/F10), language ID, quality scoring, token
  * counting, fingerprinting, exact dedup, breaking-lexicon flags.
  */
object TextQueries {
  import QueryDef.sql

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // SC1/A8/W1: corpus token counts, top 50 (word-cloud candidate pool).
  val q28 = sql(
    "q129_token_counts",
    """SELECT t AS token, count(*) AS n FROM (
      |  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents) u
      |WHERE t <> '' GROUP BY t ORDER BY n DESC, token LIMIT 50""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(50)
  }

  // U1/U5: per-document top-6 keywords in first-occurrence order.
  val q29 = sql(
    "q29_keywords_per_doc",
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(lower(text),' '))+1),
      |    i -> {'pos': i, 'token': string_split(lower(text),' ')[i]})) AS u
      |  FROM documents),
      |flat AS (SELECT doc_id, u.token AS token, u.pos AS pos FROM toks),
      |valid AS (SELECT doc_id, token, min(pos) AS first_pos FROM flat
      |  WHERE length(token) BETWEEN 2 AND 8 AND NOT regexp_matches(token, '^[0-9]+$')
      |    AND token NOT IN ('the','a','an','of','and','to','in','is','on','for')
      |  GROUP BY doc_id, token)
      |SELECT doc_id, token, CAST(krank AS INT) AS krank FROM (
      |  SELECT doc_id, token, row_number() OVER (PARTITION BY doc_id ORDER BY first_pos) AS krank
      |  FROM valid) r WHERE krank <= 6 ORDER BY doc_id, krank""".stripMargin) { (s, d) =>
    Text.extractKeywords(docs(s, d), col("doc_id"), col("text"))
      .select(col("doc_id"), col("token"), col("krank").cast("int").as("krank"))
      .orderBy(col("doc_id"), col("krank"))
  }

  // U5 fan-out + A6: corpus counts of extracted (capped) keywords.
  val q30 = sql(
    "q30_keyword_corpus_counts",
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(lower(text),' '))+1),
      |    i -> {'pos': i, 'token': string_split(lower(text),' ')[i]})) AS u
      |  FROM documents),
      |flat AS (SELECT doc_id, u.token AS token, u.pos AS pos FROM toks),
      |valid AS (SELECT doc_id, token, min(pos) AS first_pos FROM flat
      |  WHERE length(token) BETWEEN 2 AND 8 AND NOT regexp_matches(token, '^[0-9]+$')
      |    AND token NOT IN ('the','a','an','of','and','to','in','is','on','for')
      |  GROUP BY doc_id, token),
      |capped AS (SELECT doc_id, token FROM (
      |  SELECT doc_id, token, row_number() OVER (PARTITION BY doc_id ORDER BY first_pos) AS krank
      |  FROM valid) r WHERE krank <= 6)
      |SELECT token, count(*) AS n FROM capped GROUP BY token
      |ORDER BY n DESC, token LIMIT 50""".stripMargin) { (s, d) =>
    Text.extractKeywords(docs(s, d), col("doc_id"), col("text"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(50)
  }

  // Language-ID heuristic vs labeled lang column.
  val q31 = sql(
    "q31_langid_confusion",
    """WITH g AS (SELECT lang,
      |  CASE WHEN c_en > 0 AND c_en >= greatest(c_es, c_fr) THEN 'en'
      |       WHEN c_es > 0 AND c_es >= c_fr THEN 'es'
      |       WHEN c_fr > 0 THEN 'fr' ELSE 'und' END AS guess
      |FROM (SELECT lang,
      |  len(list_filter(string_split(lower(text),' '), t -> t IN ('the','a','and'))) AS c_en,
      |  len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los'))) AS c_es,
      |  len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','et'))) AS c_fr
      |  FROM documents) c)
      |SELECT lang, guess, count(*) AS n FROM g GROUP BY lang, guess
      |ORDER BY lang, guess""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("lang"), Text.langGuess(col("text")).as("guess"))
      .groupBy(col("lang"), col("guess")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("guess"))
  }

  /** q32's quality formula as a DuckDB expression (shared with q67). */
  private val qualitySql =
    """round(least(length(text) / 500.0, 1.0) * 0.4
      |    + (1.0 - len(list_filter(string_split(lower(text),' '),
      |        t -> t IN ('the','a','an','of','and','to','in','is','on','for')))
      |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE)) * 0.4
      |    + len(list_distinct(list_filter(string_split(lower(text),' '), t -> t <> '')))
      |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE) * 0.2
      |  , 6)""".stripMargin

  // Quality scoring for curation (graded form of the F4 quality gate).
  val q32 = sql(
    "q32_quality_scores",
    s"""SELECT doc_id, $qualitySql AS quality
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("doc_id"), Text.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  // Percentile cuts over the quality distribution — the curation move
  // "keep docs above per-language p50". NEAREST-RANK percentiles
  // (value at row ceil(p·n) in sorted order): the emitted value is an
  // actual data point, so there is no interpolation arithmetic whose
  // tie-rounding/ulp behavior could differ across engines — an
  // interpolated median of round-6 values lands on .xxxxxx5 midpoints
  // where Spark's HALF_UP and DuckDB's rounding disagree. The 100 TB
  // path swaps in approx_percentile, whose error bound is pinned in
  // TextSpec against the exact form.
  val q67 = sql(
    "q67_quality_percentiles",
    s"""WITH q AS (SELECT lang, $qualitySql AS quality FROM documents),
       |r AS (SELECT lang, quality,
       |  row_number() OVER (PARTITION BY lang ORDER BY quality) AS rn,
       |  count(*) OVER (PARTITION BY lang) AS n FROM q)
       |SELECT lang, count(*) AS n,
       |  max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN quality END) AS p50,
       |  max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN quality END) AS p90
       |FROM r GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("quality"))
    val wn = Window.partitionBy(col("lang"))
    docs(s, d)
      .select(col("lang"), Text.qualityScore(col("text")).as("quality"))
      .withColumn("rn", row_number().over(w))
      .withColumn("nn", count(lit(1)).over(wn))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        max(when(col("rn") === ceil(col("nn") * 0.5).cast("long"), col("quality"))).as("p50"),
        max(when(col("rn") === ceil(col("nn") * 0.9).cast("long"), col("quality"))).as("p90"))
      .orderBy(col("lang"))
  }

  // Token counting: whitespace + BPE-ish subword regex.
  val q33 = sql(
    "q33_token_stats",
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS INT) AS n_ws,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS n_bpe
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("doc_id"),
        Text.wsTokenCount(col("text")).as("n_ws"),
        Text.bpeTokenCount(lower(col("text"))).as("n_bpe"))
      .orderBy(col("doc_id"))
  }

  // Exact dedup stats per lang (hash-groupBy; dropDuplicates analog F9).
  val q34 = sql(
    "q34_exact_dedup_stats",
    """SELECT lang, count(*) AS n, count(DISTINCT md5(text)) AS n_unique
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    docs(s, d).groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), countDistinct(md5(col("text"))).as("n_unique"))
      .orderBy(col("lang"))
  }

  // Document fingerprints (md5 of NFC- then regex-normalized text;
  // the oracle replays the full chain including nfc_normalize so the
  // contract holds on non-ASCII corpora too).
  val q35 = sql(
    "q35_fingerprints",
    """SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  // SC6/U3 breaking-lexicon flags per source.
  val q36 = sql(
    "q36_lexicon_flags",
    """SELECT source, count(*) AS n,
      |  CAST(SUM(CASE WHEN len(list_intersect(string_split(lower(text),' '),
      |    ['dup','error','alert'])) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    docs(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(Text.containsAny(col("text"), Seq("dup", "error", "alert")), 1L)
          .otherwise(0L)).as("n_flagged"))
      .orderBy(col("source"))
  }

  /** Deterministic Korean word pool for in-query synthesis (the
    * CdcQueries pattern — testdata has no Hangul, so the inputs are
    * derived from doc_id arithmetic and the oracle rebuilds them).
    * Chosen to exercise every josa branch plus the edge cases:
    * "관련이"/"뉴스는" strip to Korean stopwords (filtered after
    * stripping), "것" is single-char (never matched by the {2,8}
    * extraction regex). */
  private val koWords = Seq(
    "서울이", "경제가", "뉴스는", "대통령을", "시장에서", "정부의",
    "한국과", "기술하다", "투자부터", "회사도", "관련이", "것")

  private def koWordsSqlList =
    koWords.map(w => s"'$w'").mkString("[", ",", "]")
  private def koPickSql(expr: String) =
    s"($koWordsSqlList)[CAST(($expr) % 12 AS INT) + 1]"

  private def koPick(e: org.apache.spark.sql.Column) =
    element_at(array(koWords.map(lit): _*), (e % 12).cast("int") + 1)

  /** Synthesized Korean articles: 3-word title, 10-word content. */
  private def koreanDocs(s: SparkSession, d: String) =
    docs(s, d).select(
      col("doc_id"),
      concat_ws(" ", (0 until 3).map(j => koPick(col("doc_id") * 7 + j * 3)): _*).as("title"),
      concat_ws(" ", (0 until 10).map(j => koPick(col("doc_id") + j * 5)): _*).as("content"))

  // U1 Korean extractor parity (hybrid_keyword_extractor.py:56-171):
  // SC2 Hangul word regex, SC5 title×3 weighting, SC3 josa stripping,
  // post-strip stopword/length re-filter, first-occurrence top-6 cap —
  // the full chain under the hash gate via synthesized Hangul inputs.
  val q60 = sql(
    "q60_korean_keywords", {
      val title = s"concat_ws(' ', ${(0 until 3).map(j => koPickSql(s"doc_id*7 + ${j * 3}")).mkString(", ")})"
      val content = s"concat_ws(' ', ${(0 until 10).map(j => koPickSql(s"doc_id + ${j * 5}")).mkString(", ")})"
      s"""WITH base AS (SELECT doc_id, $title AS title, $content AS content FROM documents),
         |wtd AS (SELECT doc_id, concat_ws(' ', title, title, title, substring(content, 1, 1000)) AS wt FROM base),
         |words AS (SELECT doc_id, regexp_extract_all(wt, '[가-힣]{2,8}') AS ws FROM wtd),
         |pos AS (SELECT doc_id, unnest(range(1, len(ws)+1)) AS pos, ws FROM words),
         |stripped AS (SELECT doc_id, pos,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(ws[pos],
         |    '(이|가|을|를|은|는)$$', ''), '(에서|에게|한테|부터|까지)$$', ''),
         |    '(와|과|도|만|의|로|으로)$$', ''), '(하다|되다|있다|없다)$$', '') AS token
         |  FROM pos),
         |valid AS (SELECT doc_id, token, min(pos) AS first_pos FROM stripped
         |  WHERE length(token) BETWEEN 2 AND 8
         |    AND token NOT IN ('기자','뉴스','오늘','내일','어제','이번','지난','관련','대한','통해')
         |  GROUP BY doc_id, token)
         |SELECT doc_id, token, CAST(krank AS INT) AS krank FROM (
         |  SELECT doc_id, token, row_number() OVER (PARTITION BY doc_id ORDER BY first_pos) AS krank
         |  FROM valid) r WHERE krank <= 6 ORDER BY doc_id, krank""".stripMargin
    }) { (s, d) =>
    Text.extractKeywordsKorean(koreanDocs(s, d), col("doc_id"), col("title"), col("content"))
      .select(col("doc_id"), col("token"), col("krank").cast("int").as("krank"))
      .orderBy(col("doc_id"), col("krank"))
  }

  /** English title pool for SC5: "7777" is all-digits (filtered),
    * "the" is a stopword (filtered), "beta42" is mixed (kept). */
  private val enTitleWords = Seq("alpha", "beta42", "7777", "the", "gamma", "delta")

  // SC5 title×3 weighting on the English path: the title occupies the
  // earliest token positions (three times over), steering the
  // first-occurrence ranking ahead of the 1000-char-truncated content.
  val q61 = sql(
    "q61_title_weighted_keywords", {
      val lst = enTitleWords.map(w => s"'$w'").mkString("[", ",", "]")
      s"""WITH base AS (SELECT doc_id, text,
         |    ($lst)[CAST(doc_id % 6 AS INT) + 1] || ' ' || ($lst)[CAST((doc_id*5 + 2) % 6 AS INT) + 1] AS title
         |  FROM documents),
         |wtd AS (SELECT doc_id, concat_ws(' ', title, title, title, substring(text, 1, 1000)) AS wt FROM base),
         |toks AS (SELECT doc_id, unnest(list_transform(range(1, len(string_split(lower(wt),' '))+1),
         |    i -> {'pos': i, 'token': string_split(lower(wt),' ')[i]})) AS u FROM wtd),
         |flat AS (SELECT doc_id, u.token AS token, u.pos AS pos FROM toks),
         |valid AS (SELECT doc_id, token, min(pos) AS first_pos FROM flat
         |  WHERE length(token) BETWEEN 2 AND 8 AND NOT regexp_matches(token, '^[0-9]+$$')
         |    AND token NOT IN ('the','a','an','of','and','to','in','is','on','for')
         |  GROUP BY doc_id, token)
         |SELECT doc_id, token, CAST(krank AS INT) AS krank FROM (
         |  SELECT doc_id, token, row_number() OVER (PARTITION BY doc_id ORDER BY first_pos) AS krank
         |  FROM valid) r WHERE krank <= 6 ORDER BY doc_id, krank""".stripMargin
    }) { (s, d) =>
    val titled = docs(s, d).select(
      col("doc_id"), col("text"),
      concat_ws(" ",
        element_at(array(enTitleWords.map(lit): _*), (col("doc_id") % 6).cast("int") + 1),
        element_at(array(enTitleWords.map(lit): _*), ((col("doc_id") * 5 + 2) % 6).cast("int") + 1))
        .as("title"))
    Text.extractKeywords(titled, col("doc_id"),
      Text.titleWeighted(col("title"), col("text")))
      .select(col("doc_id"), col("token"), col("krank").cast("int").as("krank"))
      .orderBy(col("doc_id"), col("krank"))
  }

  // TF-IDF top-3 per doc (smooth idf) — corpus-weighted extension of
  // the frequency-only U1 extractor. Rank key is the rounded score
  // (ln ulps differ across libm; see Text.tfidfTopK).
  val q77 = sql(
    "q77_tfidf_topk",
    """WITH tf AS (SELECT doc_id, t AS token, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS t
      |    FROM documents) u GROUP BY 1, 2),
      |idf AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |s AS (SELECT doc_id, token, round(CAST(tf AS DOUBLE)
      |    * (ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) + 1.0), 6) AS score
      |  FROM tf JOIN idf USING (token) CROSS JOIN n),
      |r AS (SELECT doc_id, token, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rank
      |  FROM s)
      |SELECT doc_id, token, score, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
    Text.tfidfTopK(docs(s, d), col("doc_id"), col("text"))
      .orderBy(col("doc_id"), col("rank"))
  }

  // Unigram surprisal (the perplexity-filter shape): mean −ln p(token)
  // under the corpus's own add-1 unigram model. round6 after the
  // per-doc mean (the q52 recipe for libm log + float-sum ulps).
  val q83 = sql(
    "q83_unigram_surprisal",
    """WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), t -> t <> '')) AS token
      |  FROM documents),
      |tf AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS v FROM tf)
      |SELECT doc_id, count(*) AS n_tok,
      |  round(sum(-ln(CAST(cnt + 1 AS DOUBLE) / (total + v))) / count(*), 6) AS surprisal
      |FROM tok JOIN tf USING (token) CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    Text.unigramSurprisal(docs(s, d), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  // Corpus bigram counts, top 30 — gates Text.bigrams (the adjacent-
  // pair primitive the surprisal/PMI operators build on) directly.
  val q91 = sql(
    "q91_bigram_counts",
    """WITH toks AS (SELECT list_filter(string_split(lower(text),' '), t -> t <> '') AS ts
      |  FROM documents),
      |bg AS (SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bigram
      |  FROM toks)
      |SELECT bigram, count(*) AS n FROM bg
      |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 30""".stripMargin) { (s, d) =>
    docs(s, d)
      .select(explode(Text.bigrams(Text.tokens(col("text")))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram")).limit(30)
  }

  // Bigram surprisal: mean −ln p(w|h) under the corpus's add-V-smoothed
  // bigram model — q83's next-order refinement. round6 after the mean
  // (libm ln + float-sum ulps), integer counts everywhere else.
  val q92 = sql(
    "q92_bigram_surprisal",
    """WITH toks AS (SELECT doc_id, list_filter(string_split(lower(text),' '), t -> t <> '') AS ts
      |  FROM documents),
      |bh AS (SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS h FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bigram
      |  FROM toks) u),
      |cb AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cb FROM bh GROUP BY 1),
      |ch AS (SELECT h, CAST(count(*) AS BIGINT) AS ch FROM bh GROUP BY 1),
      |vv AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(ts) AS t FROM toks) u)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(sum(-ln(CAST(cb + 1 AS DOUBLE) / (ch + v))) / count(*), 6) AS surprisal
      |FROM bh JOIN cb USING (bigram) JOIN ch USING (h) CROSS JOIN vv
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    Text.bigramSurprisal(docs(s, d), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  // BM25 top-10 over a fixed term set (k1=1.2, b=0.75) — the
  // inverted-index ranking function, gated end-to-end: idf, length
  // normalization, exact-decimal score sum, top-k.
  val q93 = sql(
    "q93_bm25_topk",
    """WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), t -> t <> '')) AS token
      |  FROM documents),
      |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_tok FROM dl),
      |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok
      |  WHERE token IN ('join', 'hash', 'spark', 'window') GROUP BY 1, 2),
      |wd AS (SELECT doc_id, token, tf, CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS df FROM tf),
      |c AS (SELECT w.doc_id,
      |    round(ln(CAST(1.0 AS DOUBLE) + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      |      * tf * (CAST(1.2 AS DOUBLE) + 1.0)
      |      / (tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - 0.75
      |          + CAST(0.75 AS DOUBLE) * dl / (CAST(tot_tok AS DOUBLE) / n_docs))), 6) AS contrib
      |  FROM wd w JOIN dl USING (doc_id) CROSS JOIN stats)
      |SELECT doc_id, CAST(sum(CAST(contrib AS DECIMAL(27,6))) AS DOUBLE) AS score,
      |  CAST(count(*) AS BIGINT) AS n_terms
      |FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
    Text.bm25TopK(docs(s, d), col("doc_id"), col("text"),
      Seq("join", "hash", "spark", "window"))
  }

  // PMI collocations: top adjacent-token pairs by pointwise mutual
  // information (minCount=5). Rank key is the ROUNDED score with an
  // (h, w) tiebreak — the engine-unambiguous ordering recipe.
  val q94 = sql(
    "q94_pmi_pairs",
    """WITH toks AS (SELECT list_filter(string_split(lower(text),' '), t -> t <> '') AS ts
      |  FROM documents),
      |hw AS (SELECT string_split(bigram, ' ')[1] AS h, string_split(bigram, ' ')[2] AS w FROM (
      |  SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bigram
      |  FROM toks) u),
      |pairs AS (SELECT h, w, CAST(count(*) AS BIGINT) AS cb FROM hw GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(cb) AS BIGINT) AS t FROM pairs),
      |m AS (SELECT h, w, cb,
      |    CAST(sum(cb) OVER (PARTITION BY h) AS BIGINT) AS cl,
      |    CAST(sum(cb) OVER (PARTITION BY w) AS BIGINT) AS cr
      |  FROM pairs)
      |SELECT h, w, cb, round(ln(CAST(cb AS DOUBLE) * t / (CAST(cl AS DOUBLE) * cr)), 6) AS pmi
      |FROM m CROSS JOIN tot WHERE cb >= 5
      |ORDER BY pmi DESC, h, w LIMIT 20""".stripMargin) { (s, d) =>
    Text.pmiTopPairs(docs(s, d), col("doc_id"), col("text"))
  }

  // Character-distribution Shannon entropy (gibberish/boilerplate
  // detector): H = ln n − (Σ c·ln c)/n, one algebraic form on both
  // engines, round6 after the final expression.
  val q98 = sql(
    "q98_char_entropy",
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      |cc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
      |  round(ln(CAST(sum(c) AS DOUBLE))
      |    - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / sum(c), 6) AS entropy
      |FROM cc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    Text.charEntropy(docs(s, d), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  // Vocabulary build (Text.buildVocab): min-count floor, maxVocab
  // size cap (TakeOrderedAndProject — per-partition top-k — so the
  // global id rank only sees ≤ maxVocab rows), contiguous ids by
  // (count desc, token) rank. The oracle's post-rank token_id cut is
  // equivalent to limit-then-rank because both use the same total
  // order.
  val q102 = sql(
    "q102_vocab_build",
    """WITH c AS (SELECT t AS token, count(*) AS cnt FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents) u
      |  WHERE t <> '' GROUP BY t HAVING count(*) >= 5),
      |r AS (SELECT row_number() OVER (ORDER BY cnt DESC, token) - 1 AS token_id, token, cnt
      |  FROM c)
      |SELECT token_id, token, cnt FROM r WHERE token_id < 1048576 ORDER BY token_id""".stripMargin) { (s, d) =>
    Text.buildVocab(docs(s, d), col("text"), minCount = 5L)
      .orderBy(col("token_id"))
  }

  // Exact duplicate-SPAN profile (Dedup.duplicateSpans): every 8-token
  // window keyed by its text; a window is duplicated when the same
  // k-gram occurs in ≥2 distinct docs. Substring-level dedup — catches
  // boilerplate repeating INSIDE otherwise-distinct documents, which
  // whole-doc near-dup (q38-q40) structurally misses.
  val q106 = sql(
    "q106_duplicate_spans",
    """WITH toks AS (SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ts FROM documents),
      |w AS (SELECT doc_id, array_to_string(list_slice(ts, i, i+7), ' ') AS gram
      |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts)-6)) AS i
      |        FROM toks WHERE len(ts) >= 8)),
      |df AS (SELECT gram, (count(DISTINCT doc_id) >= 2) AS is_dup FROM w GROUP BY gram),
      |p AS (SELECT doc_id, count(*) AS n_win,
      |    CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      |  FROM w JOIN df USING (gram) GROUP BY doc_id)
      |SELECT doc_id, n_win, n_dup,
      |  CAST(floor(CAST(1000000.0 AS DOUBLE) * n_dup / n_win) AS BIGINT) AS dup_ppm
      |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Dedup.duplicateSpans(docs(s, d), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  // Over-duplicated span REMOVAL (Dedup.removeDuplicateSpans, r20 —
  // the transform twin of q106's detection; Lee et al. 2022
  // arXiv:2107.06499 ExactSubstr): every 3-token window occurring in
  // MORE than 5 distinct docs is boilerplate; covered token positions
  // drop (overlapping windows union) and the document reassembles in
  // order. Row-level pin: per-doc before/after counts + the md5 of
  // the REBUILT text — the strongest gate a rewrite admits. Oracle
  // replays the rebuild with 1-BASED positions throughout (both
  // sides of `p <= i < p+k` shift together, so the kept set is
  // identical to Spark's 0-based form).
  val q160 = sql(
    "q160_span_removal",
    """WITH tk AS (SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks FROM documents),
      |g AS (SELECT doc_id, i AS pos, array_to_string(list_slice(toks, i, i+2), ' ') AS gram
      |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks)-1)) AS i
      |        FROM tk WHERE len(toks) >= 3)),
      |f AS (SELECT gram FROM (
      |    SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1) t WHERE nd > 5),
      |st AS (SELECT doc_id, list(pos ORDER BY pos) AS starts
      |  FROM g JOIN f USING (gram) GROUP BY doc_id),
      |rb AS (SELECT tk.doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
      |    list_filter(toks, (x, i) ->
      |      len(list_filter(coalesce(st.starts, []), p -> p <= i AND i < p + 3)) = 0) AS kept
      |  FROM tk LEFT JOIN st USING (doc_id))
      |SELECT doc_id, n_tok, CAST(len(kept) AS BIGINT) AS n_kept,
      |  md5(array_to_string(kept, ' ')) AS cleaned_fp
      |FROM rb ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Dedup.removeDuplicateSpans(docs(s, d), col("doc_id"), col("text"),
        k = 3, maxDocs = 5)
      .select(col("doc_id"), col("n_tok"), col("n_kept"),
        md5(col("cleaned")).as("cleaned_fp"))
      .orderBy(col("doc_id"))
  }

  // Vocab coverage / OOV profile (Text.vocabCoverage) against the
  // q102 vocabulary — the tokenizer-readiness report. The vocab side
  // is ≤ maxVocab by construction, so the membership join broadcasts;
  // the token stream is never shuffled.
  val q107 = sql(
    "q107_vocab_coverage",
    """WITH c AS (SELECT t AS token, count(*) AS cnt FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents) u
      |  WHERE t <> '' GROUP BY t HAVING count(*) >= 5),
      |tk AS (SELECT doc_id, t AS token FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents) u
      |  WHERE t <> ''),
      |p AS (SELECT d.doc_id, count(tk.token) AS n_tok,
      |    CAST(sum(CASE WHEN tk.token IS NOT NULL AND c.token IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      |  FROM documents d LEFT JOIN tk ON tk.doc_id = d.doc_id
      |    LEFT JOIN c ON c.token = tk.token
      |  GROUP BY d.doc_id)
      |SELECT doc_id, n_tok, n_oov,
      |  CASE WHEN n_tok = 0 THEN 0
      |       ELSE CAST(floor(CAST(1000000.0 AS DOUBLE) * n_oov / n_tok) AS BIGINT) END AS oov_ppm
      |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    Text.vocabCoverage(docs(s, d), col("doc_id"), col("text"),
      Text.buildVocab(docs(s, d), col("text"), minCount = 5L))
      .orderBy(col("doc_id"))
  }

  // Inverted-index build (Text.invertedIndex): per-token df / corpus
  // tf / doc-ordered "doc:tf" posting payload, serialized identically
  // by array_sort+concat (Spark) and ordered string_agg (DuckDB).
  val q103 = sql(
    "q103_inverted_index",
    """WITH tf AS (SELECT t AS token, doc_id, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents) u
      |  WHERE t <> '' GROUP BY t, doc_id)
      |SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
      |  string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
      |FROM tf GROUP BY token ORDER BY token""".stripMargin) { (s, d) =>
    Text.invertedIndex(docs(s, d), col("doc_id"), col("text"))
      .orderBy(col("token"))
  }

  // Length-decile profile with ntile(10)-exact bucketing (first n%10
  // buckets one row larger) — but WITHOUT the global-sort window the
  // naive form implies. The global rank decomposes as
  //   r = (#rows with smaller n_chars) + (rank among ties by doc_id):
  // the first term comes from a per-n_chars histogram (bounded: one
  // row per distinct length) cumulated via a broadcast non-equi
  // self-join, the second from a window PARTITIONED by n_chars. The
  // ntile bucket is then a pure integer function of (r, N), so no
  // unpartitioned window ever sees the full table.
  val q105 = sql(
    "q105_length_decile_profile",
    """WITH t AS (SELECT doc_id, n_chars,
      |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tok
      |  FROM documents),
      |d AS (SELECT *, ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile FROM t)
      |SELECT decile, count(*) AS n, CAST(min(n_chars) AS BIGINT) AS min_chars,
      |  CAST(max(n_chars) AS BIGINT) AS max_chars, CAST(sum(n_tok) AS BIGINT) AS tok_sum
      |FROM d GROUP BY decile ORDER BY decile""".stripMargin) { (s, d) =>
    val t = docs(s, d).select(col("doc_id"), col("n_chars"),
      Text.wsTokenCount(col("text")).cast("long").as("n_tok"))
    val hist = t.groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
    // rows strictly below each length; left join keeps the smallest
    // length (no rows below → 0)
    val cum = hist.as("a")
      .join(broadcast(hist.select(col("n_chars").as("nc_b"), col("c").as("c_b"))),
        col("nc_b") < col("a.n_chars"), "left")
      .groupBy(col("a.n_chars").as("n_chars"))
      .agg(coalesce(sum(col("c_b")), lit(0L)).as("cum_below"))
    val totals = t.agg(count(lit(1)).as("n_total"))
    val tieW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_chars")).orderBy(col("doc_id"))
    t.withColumn("tie_rank", row_number().over(tieW))
      .join(broadcast(cum), "n_chars")
      .crossJoin(broadcast(totals))
      .withColumn("r", col("cum_below") + col("tie_rank"))
      // ntile(10): base = N div 10, rem = N mod 10; the first rem
      // buckets hold base+1 rows. Integer-exact ceil-divisions.
      .withColumn("base", expr("n_total div 10"))
      .withColumn("rem", col("n_total") % 10)
      .withColumn("decile",
        when(col("r") <= col("rem") * (col("base") + 1),
          expr("(r + base) div (base + 1)"))
          .otherwise(col("rem") + expr("(r - rem*(base+1) + base - 1) div base"))
          .cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"), sum(col("n_tok")).as("tok_sum"))
      .orderBy(col("decile"))
  }

  // Unicode NFC normalization (native NfcNormalize expression vs
  // DuckDB's nfc_normalize — both implement UAX #15 canonical
  // composition): decomposed and precomposed variants of the same
  // word, synthesized per doc, must collapse to ONE normalized form
  // (n_raw_forms = 2 per group) — the pre-dedup canonicalization step
  // without which fingerprint dedup silently misses cross-crawler
  // pairs.
  val q118 = sql(
    "q118_nfc_normalization",
    """WITH v AS (SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN 'cafe' || chr(769) || ' latte'
      |      WHEN 1 THEN 'caf' || chr(233) || ' latte'
      |      WHEN 2 THEN 'o' || chr(776) || 'l'
      |      ELSE chr(246) || 'l' END AS raw
      |  FROM documents),
      |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM v)
      |SELECT norm, count(*) AS n_docs,
      |  count(DISTINCT raw) AS n_raw_forms,
      |  count(DISTINCT md5(raw)) AS n_raw_fps,
      |  count(DISTINCT md5(norm)) AS n_norm_fps
      |FROM n GROUP BY norm ORDER BY norm""".stripMargin) { (s, d) =>
    graft.plans.GraftFunctions.register(s)
    val v = docs(s, d).select(col("doc_id"),
      when(col("doc_id") % 4 === 0, lit("café latte"))
        .when(col("doc_id") % 4 === 1, lit("café latte"))
        .when(col("doc_id") % 4 === 2, lit("öl"))
        .otherwise(lit("öl")).as("raw"))
      .withColumn("norm", graft.plans.GraftFunctions.nfc(col("raw")))
    v.groupBy(col("norm"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("raw")).as("n_raw_forms"),
        countDistinct(md5(col("raw"))).as("n_raw_fps"),
        countDistinct(md5(col("norm"))).as("n_norm_fps"))
      .orderBy(col("norm"))
  }

  /** One unrolled BPE merge round in DuckDB — identical semantics to
    * Bpe.applyMerge: frequency-weighted overlapping pair counts,
    * (cnt desc, sym_a, sym_b) winner, greedy left-to-right application
    * via odd-parity islands over matched positions. */
  private def bpeRound(r: Int): String =
    s"""p$r AS MATERIALIZED (SELECT a.sym AS sa, b.sym AS sb, CAST(sum(a.fr) AS BIGINT) AS cnt
       |  FROM w$r a JOIN w$r b ON a.word = b.word AND b.pos = a.pos + 1 GROUP BY 1, 2),
       |t$r AS MATERIALIZED (SELECT sa, sb, cnt FROM p$r ORDER BY cnt DESC, sa, sb LIMIT 1),
       |f$r AS MATERIALIZED (SELECT w.word, w.fr, w.pos, w.sym, t.sa, t.sb,
       |    lead(w.sym) OVER (PARTITION BY w.word ORDER BY w.pos) AS nxt
       |  FROM w$r w CROSS JOIN t$r t),
       |m$r AS MATERIALIZED (SELECT word, pos, row_number() OVER (PARTITION BY word ORDER BY pos) AS rn
       |  FROM f$r WHERE nxt IS NOT NULL AND sym = sa AND nxt = sb),
       |k$r AS MATERIALIZED (SELECT word, pos FROM (
       |    SELECT word, pos, row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS kk
       |    FROM m$r) z WHERE kk % 2 = 1),
       |w${r + 1} AS MATERIALIZED (
       |  SELECT word, fr, CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT) AS pos,
       |    CASE WHEN kept THEN sa || sb ELSE sym END AS sym
       |  FROM (SELECT f.word, f.fr, f.pos, f.sym, f.sa, f.sb,
       |      k1.pos IS NOT NULL AS kept, k2.pos IS NOT NULL AS consumed
       |    FROM f$r f
       |    LEFT JOIN k$r k1 ON f.word = k1.word AND f.pos = k1.pos
       |    LEFT JOIN k$r k2 ON f.word = k2.word AND f.pos = k2.pos + 1) x
       |  WHERE NOT consumed)""".stripMargin

  /** Shared oracle prefix: word frequencies, char-level symbol table,
    * and `n` unrolled merge rounds ending at CTE w{n+1}. */
  private def bpePrefix(n: Int): String = {
    val rounds = (1 to n).map(bpeRound).mkString(",\n")
    s"""WITH tokw AS (SELECT unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS word
       |  FROM documents),
       |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS fr FROM tokw GROUP BY word),
       |wc AS (SELECT word, fr, unnest(range(1, length(word)+1)) AS pos0 FROM wf),
       |w1 AS MATERIALIZED (SELECT word, fr, CAST(pos0 AS BIGINT) AS pos,
       |    word[CAST(pos0 AS INT)] AS sym FROM wc),
       |$rounds""".stripMargin
  }

  // In-engine BPE tokenizer training (arXiv:1508.07909): the first 5
  // learned merges over the corpus. The oracle unrolls 5 full
  // count-pick-apply rounds in SQL — winner order, overlap counting,
  // and greedy left-to-right application all replayed exactly.
  val q123 = sql(
    "q123_bpe_merges", {
      val heads = (1 to 5).map(r =>
        s"SELECT $r AS merge_rank, sa AS sym_a, sb AS sym_b, sa || sb AS merged, cnt FROM t$r")
        .mkString("\n  UNION ALL ")
      s"""${bpePrefix(5)}
         |SELECT * FROM (
         |  $heads) m
         |ORDER BY merge_rank""".stripMargin
    }) { (s, d) =>
    graft.operators.Bpe.trainMerges(docs(s, d), col("text"), 5)
      .select(col("rank").as("merge_rank"), col("sym_a"), col("sym_b"),
        col("merged"), col("cnt"))
      .orderBy(col("merge_rank"))
  }

  // The trained tokenizer's VOCABULARY: distinct symbols of the final
  // word table with frequency-weighted occurrence counts — what ships
  // with the merge list. Segmentation is per DISTINCT word (vocab-
  // sized work), never per corpus occurrence.
  val q124 = sql(
    "q124_bpe_vocab",
    s"""${bpePrefix(5)}
       |SELECT sym, CAST(sum(fr) AS BIGINT) AS occurrences
       |FROM w6 GROUP BY sym ORDER BY occurrences DESC, sym""".stripMargin) { (s, d) =>
    graft.operators.Bpe.vocabAfterMerges(docs(s, d), col("text"), 5)
      .orderBy(col("occurrences").desc, col("sym"))
  }

  // Corpus tokenization under the trained tokenizer: per-doc token
  // counts after 5 merges. Segmentation is per DISTINCT word (the
  // final training state), corpus pays one broadcast join.
  val q125 = sql(
    "q125_bpe_token_counts",
    s"""${bpePrefix(5)},
       |wl AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sym FROM w6 GROUP BY word),
       |dw AS (SELECT doc_id,
       |    unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS word
       |  FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(wl.n_sym) AS BIGINT) AS n_tok
       |FROM dw JOIN wl USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.operators.Bpe.tokenCounts(docs(s, d), col("doc_id"), col("text"), 5)
      .orderBy(col("doc_id"))
  }

  // BPE-token-budgeted admission — the corpus factory's trained-
  // tokenizer gate (Pipelines.applyCorpusFactoryBatch `bpeGate`) made
  // oracle-checkable: per-doc BPE token count evaluated through the
  // STREAMING-LEGAL literal-map column (Bpe.bpeTokenCount — token
  // lookup in an inline word→n_sym map, no join, no aggregation
  // state) must equal the batch recompute (the oracle re-trains the
  // tokenizer in SQL and re-derives every count through the join
  // form). The admitted flag is the gate's verdict at a 300-token
  // budget. Empty/whitespace-only docs are part of the contract: the
  // engine column counts them 0 (never admitted), so the oracle
  // left-joins from documents (coalesce to 0) rather than dropping
  // them at the word join.
  val q127 = sql(
    "q127_bpe_admission",
    s"""${bpePrefix(5)},
       |wl AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sym FROM w6 GROUP BY word),
       |dw AS (SELECT doc_id,
       |    unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS word
       |  FROM documents),
       |dwc AS (SELECT doc_id, CAST(sum(wl.n_sym) AS BIGINT) AS n_tok
       |  FROM dw JOIN wl USING (word) GROUP BY doc_id)
       |SELECT d.doc_id, CAST(coalesce(dwc.n_tok, 0) AS BIGINT) AS n_tok_bpe,
       |  CAST(coalesce(dwc.n_tok, 0) >= 300 AS BOOLEAN) AS admitted
       |FROM documents d LEFT JOIN dwc ON d.doc_id = dwc.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val state = graft.operators.Bpe.trainState(docs(s, d), col("text"), 5)
    val wordMap = state.collectWordTokenCounts()
    docs(s, d)
      .select(col("doc_id"),
        graft.operators.Bpe.bpeTokenCount(col("text"), wordMap).as("n_tok_bpe"))
      .withColumn("admitted", col("n_tok_bpe") >= 300L)
      .orderBy(col("doc_id"))
  }

  // Model-based quality/language filtering (r18): multinomial Naive
  // Bayes trained on WEAK LABELS — the classical "train a cheap
  // linear classifier, score the whole crawl" curation step the
  // heuristic tier (q31/q32) feeds. Train on the even-id half
  // (label: lang = 'en'), score EVERY doc. The oracle replays the
  // full closed form: class/token counts (integer), add-1-smoothed
  // per-token log-likelihood ratios rounded to 6 (ln ulps absorbed —
  // the q83/q93 recipe), per-doc EXACT decimal sums (order-
  // independent), OOV tokens at the constant smoothing-mass ratio,
  // prior log-odds, and the >0 decision on the ROUNDED score so the
  // boolean can never disagree with the gated score column.
  val q154 = sql(
    "q154_nb_quality_filter",
    """WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), t -> t <> '')) AS token
      |  FROM documents),
      |lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents WHERE doc_id % 2 = 0),
      |ttok AS (SELECT t.token, l.y FROM tok t JOIN lab l USING (doc_id)),
      |tot AS (SELECT CAST(sum(y) AS BIGINT) AS n1,
      |    CAST(count(*) - sum(y) AS BIGINT) AS n0,
      |    CAST(count(DISTINCT token) AS BIGINT) AS v FROM ttok),
      |cnt AS (SELECT token, CAST(sum(y) AS BIGINT) AS c1,
      |    CAST(count(*) - sum(y) AS BIGINT) AS c0 FROM ttok GROUP BY 1),
      |pri AS (SELECT round(ln(CAST(sum(y) AS DOUBLE) / (count(*) - sum(y))), 6) AS prior FROM lab),
      |w AS (SELECT token,
      |    round(ln(CAST(c1 + 1 AS DOUBLE) / (n1 + v)) - ln(CAST(c0 + 1 AS DOUBLE) / (n0 + v)), 6) AS llr
      |  FROM cnt CROSS JOIN tot),
      |dflt AS (SELECT round(ln(CAST(n0 + v AS DOUBLE) / (n1 + v)), 6) AS d FROM tot),
      |sc AS (SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
      |    round(CAST(sum(CAST(coalesce(w.llr, dflt.d) AS DECIMAL(27,6))) AS DOUBLE)
      |      + any_value(pri.prior), 6) AS score
      |  FROM tok LEFT JOIN w USING (token) CROSS JOIN dflt CROSS JOIN pri
      |  GROUP BY tok.doc_id)
      |SELECT doc_id, n_tok, score, score > 0 AS predicted
      |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
    val dd = docs(s, d)
    val model = Text.nbTrain(dd.filter(col("doc_id") % 2 === 0),
      col("text"), (col("lang") === "en").cast("int"))
    Text.nbScore(dd, col("doc_id"), col("text"), model)
      .orderBy(col("doc_id"))
  }

  // Token-BUDGET context packing (r19 — closes the tokenizer tier the
  // BPE family started): packIntoContexts cutting the per-shard token
  // stream at 256 TRAINED-TOKENIZER tokens, not whitespace words —
  // the budget a trainer actually pays (q69 packs the same layout by
  // ws-tokens; q125/q127 price docs in BPE tokens; this composes
  // them). The per-doc count flows through the STREAMING-LEGAL
  // literal-map column (Bpe.bpeTokenCount), the oracle re-derives
  // every count through the trained join form (the q127 equivalence)
  // and replays the same integer window arithmetic — empty/
  // whitespace-only docs count 0 tokens (coalesce in the oracle) and
  // occupy a pack slot without advancing the offset, same as q69's
  // contract.
  val q156 = sql(
    "q156_bpe_context_packing",
    s"""${bpePrefix(5)},
       |wl AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sym FROM w6 GROUP BY word),
       |dw AS (SELECT doc_id,
       |    unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) AS word
       |  FROM documents),
       |dwc AS (SELECT doc_id, CAST(sum(wl.n_sym) AS BIGINT) AS n_tok
       |  FROM dw JOIN wl USING (word) GROUP BY doc_id),
       |nt AS (SELECT d.doc_id, d.source,
       |    CAST(coalesce(dwc.n_tok, 0) AS BIGINT) AS n_tok
       |  FROM documents d LEFT JOIN dwc ON d.doc_id = dwc.doc_id),
       |c AS (SELECT source, doc_id, n_tok,
       |    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
       |  FROM nt)
       |SELECT source, CAST(strt // 256 AS BIGINT) AS pack_id,
       |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens
       |FROM c GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin) { (s, d) =>
    val state = graft.operators.Bpe.trainState(docs(s, d), col("text"), 5)
    val wordMap = state.collectWordTokenCounts()
    graft.operators.Curation.packIntoContexts(docs(s, d),
        col("source"), col("doc_id"),
        graft.operators.Bpe.bpeTokenCount(col("text"), wordMap), 256)
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("pack_tokens"))
      .orderBy(col("source"), col("pack_id"))
  }

  val all: Seq[QueryDef] = Seq(q28, q29, q30, q31, q32, q33, q34, q35, q36, q60, q61, q123, q124, q125,
    q127, q67, q77, q83, q91, q92, q93, q94, q98, q102, q103, q105, q106, q107, q118, q154, q156,
    q160)
}
