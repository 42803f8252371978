package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Curation
import graft.plans.GraftFunctions
import graft.sources.Tables

/** Training-data curation inventory (operators/Curation.scala) under
  * the oracle gate: deterministic split/shuffle (reproduced in DuckDB
  * via the portable RollingHash64 HUGEINT fold), context packing,
  * decontamination, repetition stats, PII scrubbing, and the combined
  * curation funnel.
  */
object CurationQueries {
  import QueryDef.sql

  /** RollingHash64 as an unsigned HUGEINT fold (the q49 recipe);
    * `expr` must be a parenthesizable ASCII varchar expression. */
  private[queries] def uSql(expr: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS HUGEINT),
       |    list_transform(range(1, length($expr)+1), i -> CAST(ascii(($expr)[i]) AS HUGEINT))),
       |  (acc, b) -> (acc * 1000003 + b) % CAST('18446744073709551616' AS HUGEINT))""".stripMargin

  /** Map the unsigned fold back to Spark's signed two's-complement. */
  private[queries] def signedSql(u: String): String =
    s"""CAST(CASE WHEN $u >= CAST('9223372036854775808' AS HUGEINT)
       |  THEN $u - CAST('18446744073709551616' AS HUGEINT) ELSE $u END AS BIGINT)""".stripMargin

  /** Spark's pmod over the signed hash. */
  private[queries] def pmodSql(h: String, m: Int): String = s"((($h) % $m) + $m) % $m"

  // Deterministic train/val/test split — membership is a pure function
  // of the key (stable under corpus growth, joinable downstream).
  val q68 = sql(
    "q68_hash_split",
    s"""WITH h AS (SELECT n_chars,
       |    ${uSql("md5('split' || CAST(doc_id AS VARCHAR))")} AS u FROM documents),
       |sg AS (SELECT n_chars, ${signedSql("u")} AS hs FROM h),
       |b AS (SELECT n_chars, ${pmodSql("hs", 100)} AS bucket FROM sg)
       |SELECT CASE WHEN bucket < 80 THEN 'train'
       |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM b GROUP BY 1 ORDER BY split""".stripMargin) { (s, d) =>
    Curation.withSplit(Tables.documents(s, d), col("doc_id"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"))
  }

  // Concat-and-chunk context packing: per (source-shard, 256-token
  // window) document counts and token sums.
  val q69 = sql(
    "q69_context_packing",
    """WITH t AS (SELECT source, doc_id,
      |    len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS n_tok
      |  FROM documents),
      |c AS (SELECT source, n_tok,
      |    COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
      |  FROM t)
      |SELECT source, CAST(strt // 256 AS BIGINT) AS pack_id,
      |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens
      |FROM c GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin) { (s, d) =>
    Curation.packIntoContexts(Tables.documents(s, d), col("source"), col("doc_id"),
      Text.wsTokenCount(col("text")), 256)
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("pack_tokens"))
      .orderBy(col("source"), col("pack_id"))
  }

  // Benchmark decontamination: every 50th doc plays the eval set; the
  // rest of the corpus is scored by distinct shared 3-gram shingles.
  val q70 = sql(
    "q70_decontamination",
    """WITH toks AS (SELECT doc_id, list_filter(string_split(lower(text),' '), t -> t <> '') AS tk FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) >= 3
      |    THEN list_transform(range(1, len(tk)-1), i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])
      |    ELSE [array_to_string(tk, ' ')] END)) AS shingle FROM toks),
      |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
      |SELECT s.doc_id, count(*) AS n_shared
      |FROM sh s JOIN bench b USING (shingle)
      |WHERE s.doc_id % 50 <> 0
      |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Curation.contaminationScores(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0),
      col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  // Bloom-filter decontamination (constant-memory q70): the bench
  // shingle set folds into an 8192-bit bitmap (BloomBitmapAgg), the
  // corpus probes it with 3 portable salted hashes. The oracle replays
  // membership as a positions semi-join — exactly equivalent to the
  // bitmap test, INCLUDING false positives, because the hash family is
  // the same md5-mixed RollingHash64 both sides.
  val q89 = sql(
    "q89_bloom_decontamination",
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split(lower(text),' '), t -> t <> '') AS tk FROM documents),
       |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) >= 3
       |    THEN list_transform(range(1, len(tk)-1), i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])
       |    ELSE [array_to_string(tk, ' ')] END)) AS shingle FROM toks),
       |bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
       |bpos AS (SELECT DISTINCT ${pmodSql(signedSql(uSql("md5('bloom' || CAST(j AS VARCHAR) || shingle)")), 8192)} AS pos
       |  FROM bsh CROSS JOIN range(0, 3) r(j)),
       |cp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
       |cpos AS (SELECT doc_id, shingle, j,
       |    ${pmodSql(signedSql(uSql("md5('bloom' || CAST(j AS VARCHAR) || shingle)")), 8192)} AS pos
       |  FROM cp CROSS JOIN range(0, 3) r(j)),
       |hits AS (SELECT doc_id, shingle FROM cpos JOIN bpos USING (pos)
       |  GROUP BY doc_id, shingle HAVING count(DISTINCT j) = 3),
       |agg AS (SELECT doc_id, count(*) AS n_shingles FROM cp GROUP BY 1),
       |h AS (SELECT doc_id, count(*) AS n_hits FROM hits GROUP BY 1)
       |SELECT a.doc_id, a.n_shingles, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_bloom_hits
       |FROM agg a LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Curation.bloomContamination(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0),
      col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  // Gopher repetition stats in exact integer ppm.
  val q71 = sql(
    "q71_repetition_stats",
    """WITH toks AS (SELECT doc_id, list_filter(string_split(lower(text),' '), t -> t <> '') AS tk FROM documents),
      |bg AS (SELECT doc_id, tk, CASE WHEN len(tk) >= 2
      |    THEN list_transform(range(1, len(tk)), i -> tk[i]||' '||tk[i+1]) ELSE [] END AS b
      |  FROM toks),
      |per AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
      |    len(b) AS total2, len(list_distinct(b)) AS d2 FROM bg),
      |tok AS (SELECT doc_id, unnest(tk) AS token FROM toks),
      |tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
      |top AS (SELECT doc_id, max(c) AS topc, CAST(sum(c) AS BIGINT) AS ntok FROM tc GROUP BY 1)
      |SELECT p.doc_id, p.n_tokens,
      |  CAST(floor(1000000.0 * (CAST(t.topc AS DOUBLE) / t.ntok)) AS BIGINT) AS top_token_ppm,
      |  CASE WHEN p.total2 > 0
      |    THEN CAST(floor(1000000.0 * (1.0 - CAST(p.d2 AS DOUBLE) / p.total2)) AS BIGINT)
      |    ELSE 0 END AS dup_bigram_ppm
      |FROM per p JOIN top t USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.repetitionStats(Tables.documents(s, d), col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
  }

  // PII scrubbing over synthesized PII (the corpus has none, so
  // deterministic emails/phones are appended in-query — the CdcQueries
  // pattern — and the oracle rebuilds the same text).
  val q72 = sql(
    "q72_pii_scrub",
    s"""WITH base AS (SELECT doc_id, text ||
       |    (CASE WHEN doc_id % 3 = 0
       |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) ||
       |    (CASE WHEN doc_id % 5 = 0
       |      THEN ' tel 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-1234' ELSE '' END) AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '${Curation.emailPattern}'))
       |     + len(regexp_extract_all(t, '${Curation.phonePattern}')) AS BIGINT) AS n_pii,
       |  md5(regexp_replace(regexp_replace(t, '${Curation.emailPattern}', '[EMAIL]', 'g'),
       |    '${Curation.phonePattern}', '[PHONE]', 'g')) AS scrub_md5
       |FROM base ORDER BY doc_id""".stripMargin) { (s, d) =>
    val withPii = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" tel 010-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit("-1234"))).otherwise(lit(""))).as("t"))
    withPii.select(col("doc_id"),
      Curation.piiCount(col("t")).as("n_pii"),
      md5(Curation.scrubPii(col("t"))).as("scrub_md5"))
      .orderBy(col("doc_id"))
  }

  // Domain mixture sampling: per-language kept docs/tokens under a
  // 15k-token budget with target weights — fr's share exceeds its
  // supply (rate clamps to 1), the rest downsample. The oracle
  // replays thresholds and membership exactly (integer ppm + the
  // salted-hash recipe).
  val q90 = sql(
    "q90_mixture_sampling", {
      val caseW = "CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 0.1 WHEN 'es' THEN 0.1 " +
        "WHEN 'fr' THEN 0.45 WHEN 'zh' THEN 0.05 ELSE 0.0 END"
      s"""WITH t AS (SELECT doc_id, lang,
         |    len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS n_tok
         |  FROM documents),
         |dt AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS dom_tok FROM t GROUP BY 1),
         |th AS (SELECT lang, CAST(floor(CAST(1000000.0 AS DOUBLE) *
         |    least(CAST(1.0 AS DOUBLE), (CAST(15000.0 AS DOUBLE) * CAST(($caseW) AS DOUBLE))
         |      / CAST(dom_tok AS DOUBLE))) AS BIGINT) AS thresh FROM dt),
         |k AS (SELECT t.doc_id, t.lang, t.n_tok, th.thresh FROM t JOIN th USING (lang)
         |  WHERE ${pmodSql(signedSql(uSql("md5('mix' || CAST(doc_id AS VARCHAR))")), 1000000)} < th.thresh)
         |SELECT lang, count(*) AS n_kept, CAST(sum(n_tok) AS BIGINT) AS tok_kept,
         |  max(thresh) AS mix_thresh_ppm
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin
    }) { (s, d) =>
    val weights = Seq("en" -> 0.3, "de" -> 0.1, "es" -> 0.1, "fr" -> 0.45, "zh" -> 0.05)
    Curation.mixtureSample(Tables.documents(s, d), col("lang"), col("doc_id"),
      Text.wsTokenCount(col("text")), weights, 15000L)
      .filter(col("mix_keep"))
      .groupBy(col("mix_domain").as("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("mix_tok")).as("tok_kept"),
        max(col("mix_thresh_ppm")).as("mix_thresh_ppm"))
      .orderBy(col("lang"))
  }

  // The combined curation funnel: first-failing-gate attribution
  // (token floor → quality floor → language), the per-reason yield
  // report every data pipeline publishes.
  val q73 = sql(
    "q73_curation_funnel",
    """WITH t AS (SELECT
      |  len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS n_ws,
      |  round(least(length(text) / 500.0, 1.0) * 0.4
      |    + (1.0 - len(list_filter(string_split(lower(text),' '),
      |        t -> t IN ('the','a','an','of','and','to','in','is','on','for')))
      |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE)) * 0.4
      |    + len(list_distinct(list_filter(string_split(lower(text),' '), t -> t <> '')))
      |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE) * 0.2
      |    , 6) AS q,
      |  CASE WHEN len(list_filter(string_split(lower(text),' '), t -> t IN ('the','a','and'))) > 0
      |         AND len(list_filter(string_split(lower(text),' '), t -> t IN ('the','a','and')))
      |          >= greatest(len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los'))),
      |                      len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','et')))) THEN 'en'
      |       WHEN len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los'))) > 0
      |         AND len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los')))
      |          >= len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','et'))) THEN 'es'
      |       WHEN len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','et'))) > 0 THEN 'fr'
      |       ELSE 'und' END AS g
      |FROM documents)
      |SELECT CASE WHEN n_ws < 30 THEN 'drop:short'
      |            WHEN q < 0.65 THEN 'drop:quality'
      |            WHEN g <> 'en' THEN 'drop:lang'
      |            ELSE 'keep' END AS verdict,
      |  count(*) AS n
      |FROM t GROUP BY 1 ORDER BY verdict""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(Text.wsTokenCount(col("text")).as("n_ws"),
        Text.qualityScore(col("text")).as("q"),
        Text.langGuess(col("text")).as("g"))
      .select(
        when(col("n_ws") < 30, "drop:short")
          .when(col("q") < 0.65, "drop:quality")
          .when(col("g") =!= "en", "drop:lang")
          .otherwise("keep").as("verdict"))
      .groupBy(col("verdict")).agg(count(lit(1)).as("n"))
      .orderBy(col("verdict"))
  }

  // Deterministic sharded epoch shuffle: shard + in-shard position are
  // pure functions of (salt, key); a new salt is a new permutation.
  val q74 = sql(
    "q74_shuffle_shards",
    s"""WITH h AS (SELECT doc_id,
       |    ${uSql("md5('epoch0' || CAST(doc_id AS VARCHAR))")} AS u FROM documents),
       |sg AS (SELECT doc_id, ${signedSql("u")} AS hs FROM h),
       |sh AS (SELECT doc_id, ${pmodSql("hs", 8)} AS shard, hs FROM sg)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hs, doc_id) AS INT) AS pos
       |FROM sh ORDER BY shard, pos""".stripMargin) { (s, d) =>
    Curation.shuffleShards(Tables.documents(s, d).select(col("doc_id")),
      col("doc_id"), 8, "epoch0")
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  // Overlapping character chunking (RAG splitter): 200-char windows,
  // 50-char overlap; boundaries are pure integer arithmetic so the
  // oracle reproduces every chunk byte-for-byte.
  val q80 = sql(
    "q80_char_chunks",
    """WITH p AS (SELECT doc_id, text, length(text) AS L FROM documents),
      |n AS (SELECT doc_id, text,
      |    CASE WHEN L <= 200 THEN 1 ELSE ((L - 200 + 149) // 150) + 1 END AS nc
      |  FROM p),
      |c AS (SELECT doc_id, text, unnest(range(0, nc)) AS chunk_id FROM n)
      |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
      |  substring(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    Curation.chunkByChars(Tables.documents(s, d), col("doc_id"), col("text"), 200, 50)
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  // Weighted sampling (Efraimidis–Spirakis): top-50 priorities
  // u^(1/n_tok) — token count as the weight, so long documents are
  // proportionally likelier. The oracle replays u from the salted
  // hash and ranks the same ROUNDED priority with the id tiebreak.
  val q97 = sql(
    "q97_weighted_sample",
    s"""WITH t AS (SELECT doc_id, lang,
       |    len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS n_tok
       |  FROM documents),
       |h AS (SELECT doc_id, lang, n_tok,
       |    ${pmodSql(signedSql(uSql("md5('wsamp' || CAST(doc_id AS VARCHAR))")), 1 << 20)} AS hb
       |  FROM t),
       |p AS (SELECT doc_id, lang, n_tok,
       |    round(pow((CAST(hb AS DOUBLE) + 0.5) / ${(1 << 20).toDouble},
       |      CAST(1.0 AS DOUBLE) / n_tok), 6) AS wpri FROM h)
       |SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok, wpri FROM p
       |ORDER BY wpri DESC, doc_id LIMIT 50""".stripMargin) { (s, d) =>
    Curation.weightedSample(
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        Text.wsTokenCount(col("text")).cast("long").as("n_tok")),
      col("doc_id"), col("n_tok"), 50)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("_wpri").as("wpri"))
  }

  // Stratified sampling: the 15 lowest-hash docs per language — a
  // balanced eval slice; the oracle re-ranks with the same signed
  // hash (md5-mixed, q68's recipe) per stratum.
  val q81 = sql(
    "q81_stratified_sample",
    s"""WITH h AS (SELECT doc_id, lang,
       |    ${uSql("md5('strat' || CAST(doc_id AS VARCHAR))")} AS u FROM documents),
       |sg AS (SELECT doc_id, lang, ${signedSql("u")} AS hs FROM h),
       |r AS (SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY hs, doc_id) AS rn
       |  FROM sg)
       |SELECT doc_id, lang FROM r WHERE rn <= 15 ORDER BY lang, doc_id""".stripMargin) {
    (s, d) =>
      Curation.stratifiedSample(Tables.documents(s, d), col("lang"), col("doc_id"), 15)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id"))
  }

  // Split-leakage audit: near-duplicate pairs that STRADDLE
  // train/val/test are evaluation contamination — the check every
  // dedup-aware pipeline runs after splitting. Composition: LSH pair
  // detection × the deterministic split, counted per split pair
  // (split_a ≤ split_b normalized so (train,test) and (test,train)
  // collapse).
  val q85 = sql(
    "q85_split_leakage_audit",
    s"""WITH gt AS (SELECT doc_a, doc_b FROM (${VectorQueries.jaccardOracle}) g),
       |h AS (SELECT doc_id, ${uSql("md5('split' || CAST(doc_id AS VARCHAR))")} AS u FROM documents),
       |sg AS (SELECT doc_id, ${signedSql("u")} AS hs FROM h),
       |sp AS (SELECT doc_id, CASE WHEN ${pmodSql("hs", 100)} < 80 THEN 'train'
       |    WHEN ${pmodSql("hs", 100)} < 90 THEN 'val' ELSE 'test' END AS split FROM sg),
       |j AS (SELECT least(a.split, b.split) AS split_a, greatest(a.split, b.split) AS split_b
       |  FROM gt JOIN sp a ON gt.doc_a = a.doc_id JOIN sp b ON gt.doc_b = b.doc_id)
       |SELECT split_a, split_b, count(*) AS n_pairs
       |FROM j GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val split = Curation.withSplit(docs, col("doc_id")).select(col("doc_id"), col("split"))
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, col("doc_id"), col("text"))
    pairs
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("split_a"), col("split_b"))
  }

  // Leakage-safe split (Curation.leakageSafeSplit): near-dup clusters
  // co-assign — the split key is the connected-component label (min
  // member) for clustered docs, the doc's own id otherwise, so the
  // q85 cross-split near-dup count is zero BY CONSTRUCTION rather
  // than audited after the fact. Oracle: recursive-CTE closure over
  // the exact pair ground truth (the set q39 proves the LSH path
  // recovers) + the portable split-hash recipe over the group key.
  val q108 = sql(
    "q108_leakage_safe_split",
    s"""WITH RECURSIVE gt AS (SELECT doc_a, doc_b FROM (${VectorQueries.jaccardOracle}) g),
       |edges AS MATERIALIZED (SELECT doc_a AS x, doc_b AS y FROM gt UNION SELECT doc_b, doc_a FROM gt),
       |nodes AS MATERIALIZED (SELECT DISTINCT x AS node FROM edges),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.x, r.lbl FROM edges e JOIN reach r ON e.y = r.node),
       |cc AS (SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node),
       |k AS (SELECT d.doc_id, coalesce(cc.cluster, d.doc_id) AS split_key
       |  FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id),
       |h AS (SELECT doc_id, split_key,
       |    ${uSql("md5('split' || CAST(split_key AS VARCHAR))")} AS u FROM k),
       |sg AS (SELECT doc_id, split_key, ${signedSql("u")} AS hs FROM h),
       |sp AS (SELECT doc_id, split_key,
       |    CASE WHEN ${pmodSql("hs", 100)} < 80 THEN 'train'
       |         WHEN ${pmodSql("hs", 100)} < 90 THEN 'val' ELSE 'test' END AS split FROM sg)
       |SELECT split, count(*) AS n_docs,
       |  count(DISTINCT split_key) AS n_groups
       |FROM sp GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, col("doc_id"), col("text"))
    Curation.leakageSafeSplit(docs, col("doc_id"), pairs)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("split_key")).as("n_groups"))
      .orderBy(col("split"))
  }

  // Link-graph PageRank (Graphs.pagerank) — the web-corpus quality
  // prior — over a deterministic synthetic link graph (3 out-edges per
  // doc, arithmetic targets mod n). The oracle unrolls the 3
  // iterations; cross-engine determinism comes from DECIMAL(38,18)
  // contribution sums and the round-12 re-quantization each step
  // (doubles pinned explicitly — DuckDB literals default to DECIMAL).
  val q110 = sql(
    "q110_pagerank", {
      def c(i: Int, prev: String) =
        s"""c$i AS (SELECT ew.dst AS node,
           |    CAST(SUM(CAST($prev.pr / ew.outdeg AS DECIMAL(38,18))) AS DOUBLE) AS s
           |  FROM ew JOIN $prev ON $prev.node = ew.src GROUP BY ew.dst)""".stripMargin
      def r(i: Int) =
        s"""r$i AS (SELECT b.node, b.nn, round(
           |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / b.nn
           |      + CAST(0.85 AS DOUBLE) * coalesce(c$i.s, CAST(0 AS DOUBLE)), 12) AS pr
           |  FROM base b LEFT JOIN c$i USING (node))""".stripMargin
      s"""WITH n AS (SELECT count(*) AS nn FROM documents),
         |e0 AS (SELECT doc_id AS src, (doc_id*7 + j*13 + 1) % n.nn AS dst
         |  FROM documents CROSS JOIN n CROSS JOIN range(0, 3) t(j)),
         |e AS (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src),
         |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |ew AS (SELECT e.src, e.dst, od.outdeg FROM e JOIN od USING (src)),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |base AS (SELECT node, n.nn AS nn FROM nodes CROSS JOIN n),
         |r0 AS (SELECT node, nn, round(CAST(1.0 AS DOUBLE) / nn, 12) AS pr FROM base),
         |${c(1, "r0")}, ${r(1)},
         |${c(2, "r1")}, ${r(2)},
         |${c(3, "r2")}, ${r(3)}
         |SELECT node, round(pr, 6) AS pr FROM r3 ORDER BY node""".stripMargin
    }) { (s, d) =>
    val dcs = Tables.documents(s, d).select(col("doc_id"))
    val edges = dcs.crossJoin(broadcast(dcs.agg(count(lit(1)).as("nn"))))
      .select(col("doc_id").as("src"),
        explode(array((0 until 3).map(j =>
          (col("doc_id") * 7 + j * 13 + 1) % col("nn")): _*)).as("dst"))
      .filter(col("dst") =!= col("src"))
    graft.operators.Graphs.pagerank(edges)
      .select(col("node"), round(col("pr"), 6).as("pr"))
      .orderBy(col("node"))
  }

  // Snapshot diff (Curation.snapshotDiff): two deterministic synthetic
  // versions of the corpus (v_old drops doc_id%50==0, v_new drops
  // doc_id%49==0 and edits text where doc_id%31==0), diffed by md5
  // fingerprint → per-status counts. The incremental-crawl delta.
  val q111 = sql(
    "q111_snapshot_diff",
    """WITH v_old AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 50 <> 0),
      |v_new AS (SELECT doc_id,
      |    md5(CASE WHEN doc_id % 31 = 0 THEN text || ' v2' ELSE text END) AS fp
      |  FROM documents WHERE doc_id % 49 <> 0),
      |d AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |    CASE WHEN o.fp IS NULL THEN 'added'
      |         WHEN n.fp IS NULL THEN 'removed'
      |         WHEN o.fp <> n.fp THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM v_old o FULL OUTER JOIN v_new n ON o.doc_id = n.doc_id)
      |SELECT status, count(*) AS n FROM d GROUP BY status ORDER BY status""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val vOld = docs.filter(col("doc_id") % 50 =!= 0)
    val vNew = docs.filter(col("doc_id") % 49 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 31 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    Curation.snapshotDiff(vOld, vNew, "doc_id", md5(col("text")))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }

  // Count-min sketch heavy-hitter estimates (Sketches.countMin /
  // cmsEstimate): width 16 FORCES collisions on the synthetic vocab,
  // and the oracle replays the full grid — including every collision —
  // because the hash family is the portable salted recipe. CMS error
  // is one-sided: cms_est ≥ n always (asserted in the spec).
  val q112 = sql(
    "q112_cms_heavy_hitters", {
      val h = (expr: String) =>
        pmodSql(signedSql(uSql(s"md5('cms' || CAST(r AS VARCHAR) || ':' || ($expr))")), 16)
      s"""WITH tok AS (SELECT t AS token FROM (
         |    SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents) u
         |  WHERE t <> ''),
         |cells AS (SELECT r, ${h("token")} AS col, count(*) AS c
         |  FROM tok CROSS JOIN range(0, 3) t(r) GROUP BY 1, 2),
         |top AS (SELECT token, count(*) AS n FROM tok GROUP BY token
         |  ORDER BY n DESC, token LIMIT 20),
         |q AS (SELECT token, n, r, ${h("token")} AS col
         |  FROM top CROSS JOIN range(0, 3) t(r)),
         |est AS (SELECT token, n, min(coalesce(c.c, 0)) AS cms_est
         |  FROM q LEFT JOIN cells c USING (r, col) GROUP BY token, n)
         |SELECT token, n, CAST(cms_est AS BIGINT) AS cms_est
         |FROM est ORDER BY n DESC, token""".stripMargin
    }) { (s, d) =>
    val toks = Tables.documents(s, d)
      .select(explode(Text.tokens(col("text"))).as("token"))
    val sketch = graft.operators.Sketches.countMin(toks, col("token"), width = 16, depth = 3)
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20)
    val est = graft.operators.Sketches.cmsEstimate(sketch, top, col("token"),
      width = 16, depth = 3)
    top.join(est, col("token") === col("item"))
      .select(col("token"), col("n"), col("cms_est"))
      .orderBy(col("n").desc, col("token"))
  }

  // Mixture schedule (Curation.mixtureSchedule): stride-scheduled
  // interleaving order — every prefix of the vt order is a
  // weight-faithful domain mixture. The oracle replays rank → vt →
  // bounded prefix; the prefix is a LIMIT (TakeOrderedAndProject on
  // the Spark side), never a global sort.
  val q113 = sql(
    "q113_mixture_schedule", {
      val caseW = "CASE lang WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.15 WHEN 'es' THEN 0.15 " +
        "WHEN 'fr' THEN 0.2 WHEN 'zh' THEN 0.1 END"
      s"""WITH h AS (SELECT doc_id, lang,
         |    ${signedSql(uSql("md5('sched' || CAST(doc_id AS VARCHAR))"))} AS hs
         |  FROM documents),
         |r AS (SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY hs, doc_id) AS rk FROM h),
         |v AS (SELECT doc_id, lang,
         |    CAST(rk AS DOUBLE) / CAST(($caseW) AS DOUBLE) AS vt FROM r),
         |s AS (SELECT * FROM v ORDER BY vt, lang, doc_id LIMIT 300)
         |SELECT lang, count(*) AS n_scheduled, CAST(max(vt) AS DOUBLE) AS max_vt
         |FROM s GROUP BY lang ORDER BY lang""".stripMargin
    }) { (s, d) =>
    val weights = Seq("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.2, "zh" -> 0.1)
    Curation.mixtureSchedule(Tables.documents(s, d), col("lang"), col("doc_id"), weights)
      .orderBy(col("sched_vt"), col("sched_domain"), col("doc_id")).limit(300)
      .groupBy(col("sched_domain").as("lang"))
      .agg(count(lit(1)).as("n_scheduled"), max(col("sched_vt")).as("max_vt"))
      .orderBy(col("lang"))
  }

  // DSIR-style importance selection (arXiv:2302.03169): hashed-bigram
  // log likelihood ratio against a target corpus (here: the en slice),
  // weights as exact integer micro-nats (order-free sums — the float
  // Σ would break cross-engine hash parity), selection = top-100 by
  // weight. The oracle replays tokenization, the portable bucket
  // hash, add-1 smoothing, and the micro-nat fixing in SQL.
  val q121 = sql(
    "q121_dsir_selection", {
      val bucket = pmodSql(signedSql(uSql("md5('dsir' || gram)")), 1024)
      s"""WITH t AS (SELECT doc_id, lang,
         |    list_filter(string_split(lower(text),' '), x -> x <> '') AS tk
         |  FROM documents),
         |g AS (SELECT doc_id, lang,
         |    unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS gram
         |  FROM t WHERE len(tk) >= 2),
         |b AS (SELECT doc_id, lang, $bucket AS bucket FROM g),
         |qc AS (SELECT bucket, count(*) AS cq FROM b GROUP BY 1),
         |tc AS (SELECT bucket, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY 1),
         |tot AS (SELECT (SELECT count(*) FROM b WHERE lang = 'en') AS nt,
         |               (SELECT count(*) FROM b) AS nq),
         |r AS (SELECT qc.bucket,
         |    CAST(round((ln((COALESCE(tc.ct, 0) + 1.0) / (tot.nt + 1024.0))
         |      - ln((qc.cq + 1.0) / (tot.nq + 1024.0))) * 1000000.0) AS BIGINT) AS lmicro
         |  FROM qc LEFT JOIN tc USING (bucket) CROSS JOIN tot),
         |w AS (SELECT b.doc_id, min(b.lang) AS lang, count(*) AS n_grams,
         |    CAST(sum(r.lmicro) AS BIGINT) AS w_micro
         |  FROM b JOIN r ON b.bucket = r.bucket GROUP BY b.doc_id),
         |sel AS (SELECT * FROM w ORDER BY w_micro DESC, doc_id LIMIT 100)
         |SELECT lang, count(*) AS n_selected, CAST(sum(w_micro) AS BIGINT) AS w_micro_sum
         |FROM sel GROUP BY lang ORDER BY lang""".stripMargin
    }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val w = Curation.dsirWeights(docs, col("doc_id"), col("text"),
      docs.filter(col("lang") === "en"), col("text"))
    w.join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .orderBy(col("dsir_w_micro").desc, col("doc_id")).limit(100)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_selected"), sum(col("dsir_w_micro")).as("w_micro_sum"))
      .orderBy(col("lang"))
  }

  // Sequence-length buckets with padding-waste accounting
  // (Curation.lengthBuckets) — the dynamic-batching prep report.
  val q114 = sql(
    "q114_length_buckets",
    """WITH t AS (SELECT
      |    len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tok
      |  FROM documents),
      |b AS (SELECT CAST(n_tok // 32 AS BIGINT) AS len_bucket, count(*) AS n_docs,
      |    CAST(sum(n_tok) AS BIGINT) AS tok_sum, CAST(max(n_tok) AS BIGINT) AS tok_max
      |  FROM t GROUP BY 1)
      |SELECT len_bucket, n_docs, tok_sum, tok_max,
      |  (len_bucket + 1) * 32 AS bucket_ceil,
      |  CAST(floor(CAST(1000000.0 AS DOUBLE) * (n_docs * ((len_bucket + 1) * 32) - tok_sum)
      |    / (n_docs * ((len_bucket + 1) * 32))) AS BIGINT) AS padding_ppm
      |FROM b ORDER BY len_bucket""".stripMargin) { (s, d) =>
    Curation.lengthBuckets(Tables.documents(s, d),
      Text.wsTokenCount(col("text")).cast("long"), 32)
      .orderBy(col("len_bucket"))
  }

  // The corpus factory — the COMPOSITION proof: quality gates (q73's
  // exact formulas) → deterministic exact dedup (keep min doc per
  // fingerprint) → LSH near-dup removal (q39/q64/q82's machinery over
  // the SURVIVOR set) → hash split (q68's recipe) → per-(split, lang)
  // yield report. Every stage reuses an operator already gated on its
  // own; this query pins that they chain without semantic drift.
  // The survivor chain (both sides, up to CTE `s2`) is factored so
  // q159's post-landing selection splices after the SAME chain.

  /** q116's oracle chain through near-dup removal: CTEs `t` → `kept`
    * → `fp`/`mn`/`s1` (exact dedup) → `gt`/…/`s2` (LSH-ground-truth
    * near-dup removal). The enclosing query supplies `WITH RECURSIVE`
    * and everything after `s2`. */
  private[queries] val corpusSurvivorCtes: String = {
    val pairsOverSurvivors = VectorQueries.jaccardOracle
      .replace("FROM documents", "FROM s1")
    s"""t AS (SELECT doc_id, lang, text,
       |  len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS n_ws,
       |  round(least(length(text) / 500.0, 1.0) * 0.4
       |    + (1.0 - len(list_filter(string_split(lower(text),' '),
       |        t -> t IN ('the','a','an','of','and','to','in','is','on','for')))
       |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE)) * 0.4
       |    + len(list_distinct(list_filter(string_split(lower(text),' '), t -> t <> '')))
       |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE) * 0.2
       |    , 6) AS q
       |  FROM documents),
       |kept AS (SELECT doc_id, lang, text, n_ws FROM t WHERE n_ws >= 30 AND q >= 0.65),
       |fp AS (SELECT doc_id, lang, text, n_ws, md5(text) AS f FROM kept),
       |mn AS (SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY f),
       |s1 AS (SELECT doc_id, lang, text, n_ws FROM fp JOIN mn
       |  ON fp.f = mn.f AND fp.doc_id = mn.keep_id),
       |gt AS (SELECT doc_a, doc_b FROM ($pairsOverSurvivors) g),
       |edges AS MATERIALIZED (SELECT doc_a AS x, doc_b AS y FROM gt UNION SELECT doc_b, doc_a FROM gt),
       |nodes AS MATERIALIZED (SELECT DISTINCT x AS node FROM edges),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.x, r.lbl FROM edges e JOIN reach r ON e.y = r.node),
       |cc AS (SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node),
       |drop AS (SELECT doc_id FROM cc WHERE doc_id <> cluster),
       |s2 AS (SELECT s1.* FROM s1 LEFT JOIN drop d ON s1.doc_id = d.doc_id
       |  WHERE d.doc_id IS NULL)""".stripMargin
  }

  /** q116's Spark chain through near-dup removal — the survivor set
    * (doc_id, lang, text, _nws) the oracle's `s2` CTE mirrors. */
  private[queries] def corpusSurvivors(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // r21: the heuristic gate (tokenize + quality kernels) and the md5
    // fingerprint are evaluated ONCE behind a lazy checkpoint barrier —
    // the gated frame feeds the fingerprint agg, the keep-min join and
    // both near-dup stages, and without the barrier each consumer
    // re-executed the whole gate (the q158 plan showed 3 evaluations
    // of the quality filter; guide §5). Values unchanged: the barrier
    // is a plan boundary, not a semantic change.
    val kept = docs
      .withColumn("_nws", Text.wsTokenCount(col("text")))
      .withColumn("_q", Text.qualityScore(col("text")))
      .filter(col("_nws") >= 30 && col("_q") >= 0.65)
      .withColumn("_f", md5(col("text")))
      .localCheckpoint(eager = false)
    // deterministic exact dedup: keep the min doc per content fingerprint
    val mn = kept.groupBy(col("_f")).agg(min(col("doc_id")).as("_keep_id"))
    val s1 = kept.join(mn, "_f")
      .filter(col("doc_id") === col("_keep_id"))
      .select(col("doc_id"), col("lang"), col("text"), col("_nws"))
      .localCheckpoint(eager = false) // read twice: pair mining + keep-one
    val pairs = graft.operators.Dedup.minhashLshPairs(s1, col("doc_id"), col("text"))
    graft.operators.Dedup.keepOnePerCluster(s1, col("doc_id"), pairs)
  }

  val q116 = sql(
    "q116_corpus_factory",
    s"""WITH RECURSIVE $corpusSurvivorCtes,
       |h AS (SELECT doc_id, lang, n_ws,
       |    ${uSql("md5('split' || CAST(doc_id AS VARCHAR))")} AS u FROM s2),
       |sg AS (SELECT doc_id, lang, n_ws, ${signedSql("u")} AS hs FROM h),
       |sp AS (SELECT lang, n_ws,
       |    CASE WHEN ${pmodSql("hs", 100)} < 80 THEN 'train'
       |         WHEN ${pmodSql("hs", 100)} < 90 THEN 'val' ELSE 'test' END AS split FROM sg)
       |SELECT split, lang, count(*) AS n_docs, CAST(sum(n_ws) AS BIGINT) AS tok_sum
       |FROM sp GROUP BY split, lang ORDER BY split, lang""".stripMargin) { (s, d) =>
    val s2 = corpusSurvivors(Tables.documents(s, d))
    Curation.withSplit(s2, col("doc_id"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nws")).as("tok_sum"))
      .orderBy(col("split"), col("lang"))
  }

  // The curation funnel WITH the learned gate (r19, the q154 operator
  // composed where production runs it — CCNet's "heuristics first,
  // cheap learned filter after"): NB trains on weak labels (even ids,
  // label = lang=='en', the q154 recipe), and docs surviving every
  // heuristic gate (token floor → quality → language → repetition)
  // are scored by the STREAMING-LEGAL per-row column
  // (Text.nbScoreExpr via curateStream's nbModel stage — bit-equal to
  // the batch join form, so ONE oracle pins both; CurationSpec's
  // stream==batch arm pins the keep-set equality). Yield report per
  // verdict with first-failing-gate attribution — drop:model rows are
  // exactly the heuristic survivors the model rejects. The oracle
  // replays the full chain: q73's quality/lang formulas, q71's
  // top-token ppm, q154's closed-form NB, and the ladder.
  val q155 = sql(
    "q155_nb_curation_funnel",
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
      |sc AS (SELECT tok.doc_id,
      |    round(CAST(sum(CAST(coalesce(w.llr, dflt.d) AS DECIMAL(27,6))) AS DOUBLE)
      |      + any_value(pri.prior), 6) AS score
      |  FROM tok LEFT JOIN w USING (token) CROSS JOIN dflt CROSS JOIN pri
      |  GROUP BY tok.doc_id),
      |tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
      |tp AS (SELECT doc_id,
      |    CAST(floor(1000000.0 * (CAST(max(c) AS DOUBLE) / sum(c))) AS BIGINT) AS tppm
      |  FROM tc GROUP BY 1),
      |feat AS (SELECT doc_id,
      |  len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS n_ws,
      |  round(least(length(text) / 500.0, 1.0) * 0.4
      |    + (1.0 - len(list_filter(string_split(lower(text),' '),
      |        t -> t IN ('the','a','an','of','and','to','in','is','on','for')))
      |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE)) * 0.4
      |    + len(list_distinct(list_filter(string_split(lower(text),' '), t -> t <> '')))
      |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE) * 0.2
      |    , 6) AS q,
      |  CASE WHEN len(list_filter(string_split(lower(text),' '), t -> t IN ('the','a','and'))) > 0
      |         AND len(list_filter(string_split(lower(text),' '), t -> t IN ('the','a','and')))
      |          >= greatest(len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los'))),
      |                      len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','et')))) THEN 'en'
      |       WHEN len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los'))) > 0
      |         AND len(list_filter(string_split(lower(text),' '), t -> t IN ('el','la','los')))
      |          >= len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','et'))) THEN 'es'
      |       WHEN len(list_filter(string_split(lower(text),' '), t -> t IN ('le','les','et'))) > 0 THEN 'fr'
      |       ELSE 'und' END AS g
      |  FROM documents),
      |v AS (SELECT f.doc_id, f.n_ws,
      |    CASE WHEN f.n_ws < 30 THEN 'drop:short'
      |         WHEN f.q < 0.65 THEN 'drop:quality'
      |         WHEN f.g <> 'en' THEN 'drop:lang'
      |         WHEN tp.tppm > 300000 THEN 'drop:repetition'
      |         WHEN sc.score < 0 THEN 'drop:model'
      |         ELSE 'keep' END AS verdict
      |  FROM feat f LEFT JOIN tp USING (doc_id) LEFT JOIN sc USING (doc_id))
      |SELECT verdict, count(*) AS n_docs, CAST(sum(n_ws) AS BIGINT) AS tok_sum
      |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val model = Text.nbTrain(docs.filter(col("doc_id") % 2 === 0),
      col("text"), (col("lang") === "en").cast("int"))
    Curation.curateStream(docs, col("doc_id"), col("text"),
        nbModel = Some(Text.collectNbModel(model)), nbMinScore = 0.0)
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"))
      .orderBy(col("verdict"))
  }

  // The FULL production recipe in one gated chain (r19): heuristics →
  // LEARNED filter → exact dedup → LSH near-dup removal → hash split
  // (the CCNet order end-to-end — q116 proves the chain without the
  // learned tier, q155 proves heuristics+model; this composes all
  // five stages). The model gate runs through the JOIN form
  // (Text.nbScore — the at-scale path the corpus factory's nbGate
  // uses for corpus vocabularies), so both scoring forms are now
  // oracle-gated in composition: q155 pins the per-row column, this
  // pins the join. Oracle: q154's closed-form NB CTEs spliced between
  // q116's heuristic and dedup stages.
  val q158 = sql(
    "q158_factory_learned_gate", {
      val pairsOverSurvivors = VectorQueries.jaccardOracle
        .replace("FROM documents", "FROM s1")
      s"""WITH RECURSIVE tok AS (SELECT doc_id, unnest(list_filter(string_split(lower(text),' '), t -> t <> '')) AS token
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
         |sc AS (SELECT tok.doc_id,
         |    round(CAST(sum(CAST(coalesce(w.llr, dflt.d) AS DECIMAL(27,6))) AS DOUBLE)
         |      + any_value(pri.prior), 6) AS score
         |  FROM tok LEFT JOIN w USING (token) CROSS JOIN dflt CROSS JOIN pri
         |  GROUP BY tok.doc_id),
         |t AS (SELECT doc_id, lang, text,
         |  len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS n_ws,
         |  round(least(length(text) / 500.0, 1.0) * 0.4
         |    + (1.0 - len(list_filter(string_split(lower(text),' '),
         |        t -> t IN ('the','a','an','of','and','to','in','is','on','for')))
         |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE)) * 0.4
         |    + len(list_distinct(list_filter(string_split(lower(text),' '), t -> t <> '')))
         |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE) * 0.2
         |    , 6) AS q
         |  FROM documents),
         |kept AS (SELECT doc_id, lang, text, n_ws FROM t WHERE n_ws >= 30 AND q >= 0.65),
         |keptm AS (SELECT k.* FROM kept k JOIN sc USING (doc_id) WHERE sc.score >= 0),
         |fp AS (SELECT doc_id, lang, text, n_ws, md5(text) AS f FROM keptm),
         |mn AS (SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY f),
         |s1 AS (SELECT doc_id, lang, text, n_ws FROM fp JOIN mn
         |  ON fp.f = mn.f AND fp.doc_id = mn.keep_id),
         |gt AS (SELECT doc_a, doc_b FROM ($pairsOverSurvivors) g),
         |edges AS MATERIALIZED (SELECT doc_a AS x, doc_b AS y FROM gt UNION SELECT doc_b, doc_a FROM gt),
         |nodes AS MATERIALIZED (SELECT DISTINCT x AS node FROM edges),
         |reach(node, lbl) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.x, r.lbl FROM edges e JOIN reach r ON e.y = r.node),
         |cc AS (SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node),
         |drop AS (SELECT doc_id FROM cc WHERE doc_id <> cluster),
         |s2 AS (SELECT s1.* FROM s1 LEFT JOIN drop d ON s1.doc_id = d.doc_id
         |  WHERE d.doc_id IS NULL),
         |h AS (SELECT doc_id, lang, n_ws,
         |    ${uSql("md5('split' || CAST(doc_id AS VARCHAR))")} AS u FROM s2),
         |sg AS (SELECT doc_id, lang, n_ws, ${signedSql("u")} AS hs FROM h),
         |sp AS (SELECT lang, n_ws,
         |    CASE WHEN ${pmodSql("hs", 100)} < 80 THEN 'train'
         |         WHEN ${pmodSql("hs", 100)} < 90 THEN 'val' ELSE 'test' END AS split FROM sg)
         |SELECT split, lang, count(*) AS n_docs, CAST(sum(n_ws) AS BIGINT) AS tok_sum
         |FROM sp GROUP BY split, lang ORDER BY split, lang""".stripMargin
    }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val model = Text.nbTrain(docs.filter(col("doc_id") % 2 === 0),
      col("text"), (col("lang") === "en").cast("int"))
    // r21 barriers (values unchanged, guide §5): the heuristic gate is
    // read by the NB scorer AND the semi-join probe side; the admitted
    // frame by the fingerprint agg AND the keep-min join — without the
    // lazy checkpoints each consumer re-executed the whole upstream
    // (the before-plan shows the NB-train subtree TWICE and the
    // quality filter three times).
    val kept = docs
      .withColumn("_nws", Text.wsTokenCount(col("text")))
      .withColumn("_q", Text.qualityScore(col("text")))
      .filter(col("_nws") >= 30 && col("_q") >= 0.65)
      .localCheckpoint(eager = false)
    // the learned gate, JOIN form — the corpus factory's nbGate shape
    val admit = Text.nbScore(kept, col("doc_id"), col("text"), model)
      .filter(col("score") >= 0.0).select(col("doc_id"))
    val keptm = kept.join(admit, Seq("doc_id"), "left_semi")
      .withColumn("_f", md5(col("text")))
      .localCheckpoint(eager = false)
    val mn = keptm.groupBy(col("_f")).agg(min(col("doc_id")).as("_keep_id"))
    val s1 = keptm.join(mn, "_f")
      .filter(col("doc_id") === col("_keep_id"))
      .select(col("doc_id"), col("lang"), col("text"), col("_nws"))
      .localCheckpoint(eager = false) // read twice: pair mining + keep-one
    val pairs = graft.operators.Dedup.minhashLshPairs(s1, col("doc_id"), col("text"))
    val s2 = graft.operators.Dedup.keepOnePerCluster(s1, col("doc_id"), pairs)
    Curation.withSplit(s2, col("doc_id"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nws")).as("tok_sum"))
      .orderBy(col("split"), col("lang"))
  }

  // Boilerplate removal composed BEFORE near-dup dedup (r20 — q160
  // proved the rewrite standalone; this pins the ORDER production
  // cares about: shared boilerplate inflates shingle similarity, so
  // the span pass must run first or near-dup dedup merges docs whose
  // only overlap is the banner). Chain: heuristics → fit the
  // over-duplicated trigram table on survivors (corpus-RELATIVE
  // threshold: a gram in > corpus/100 distinct docs is boilerplate —
  // an absolute cap either starves at small SFs or mass-empties at
  // big ones) → rewrite → MinHash near-dup on the CLEANED text → CC
  // keep-one → split → per-(split, lang) yield in POST-removal
  // tokens. Oracle: the q160 rebuild CTEs spliced between q116's
  // heuristic stage and the jaccard ground truth re-pointed at the
  // cleaned docs.
  val q161 = sql(
    "q161_boilerplate_neardup_chain", {
      val pairsOverCleaned = VectorQueries.jaccardOracle
        .replace("FROM documents", "FROM cleaned_docs")
      s"""WITH RECURSIVE t AS (SELECT doc_id, lang, text,
         |  len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS n_ws,
         |  round(least(length(text) / 500.0, 1.0) * 0.4
         |    + (1.0 - len(list_filter(string_split(lower(text),' '),
         |        t -> t IN ('the','a','an','of','and','to','in','is','on','for')))
         |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE)) * 0.4
         |    + len(list_distinct(list_filter(string_split(lower(text),' '), t -> t <> '')))
         |      / CAST(len(list_filter(string_split(lower(text),' '), t -> t <> '')) AS DOUBLE) * 0.2
         |    , 6) AS q
         |  FROM documents),
         |kept AS (SELECT doc_id, lang, text FROM t WHERE n_ws >= 30 AND q >= 0.65),
         |nn AS (SELECT greatest(count(*)//100, 1) AS cap FROM documents),
         |tk AS (SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS toks FROM kept),
         |g AS (SELECT doc_id, j AS pos, array_to_string(toks[j:j+2], ' ') AS gram
         |  FROM tk, LATERAL (SELECT unnest(range(1, len(toks)-1)) AS j)),
         |f AS (SELECT gram FROM (
         |    SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1) z, nn
         |  WHERE nd > nn.cap),
         |st AS (SELECT doc_id, list(pos ORDER BY pos) AS starts
         |  FROM g JOIN f USING (gram) GROUP BY doc_id),
         |rb AS (SELECT tk.doc_id,
         |    list_filter(toks, (x, i) ->
         |      len(list_filter(coalesce(st.starts, []), p -> p <= i AND i < p + 3)) = 0) AS kept_t
         |  FROM tk LEFT JOIN st USING (doc_id)),
         |cleaned_docs AS (SELECT doc_id, array_to_string(kept_t, ' ') AS text FROM rb),
         |gt AS (SELECT doc_a, doc_b FROM ($pairsOverCleaned) g2),
         |edges AS MATERIALIZED (SELECT doc_a AS x, doc_b AS y FROM gt UNION SELECT doc_b, doc_a FROM gt),
         |nodes AS MATERIALIZED (SELECT DISTINCT x AS node FROM edges),
         |reach(node, lbl) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.x, r.lbl FROM edges e JOIN reach r ON e.y = r.node),
         |cc AS (SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node),
         |drop AS (SELECT doc_id FROM cc WHERE doc_id <> cluster),
         |s2 AS (SELECT rb.doc_id, k2.lang, len(rb.kept_t) AS n_kept
         |  FROM rb JOIN kept k2 USING (doc_id)
         |  LEFT JOIN drop d ON rb.doc_id = d.doc_id WHERE d.doc_id IS NULL),
         |h AS (SELECT doc_id, lang, n_kept,
         |    ${uSql("md5('split' || CAST(doc_id AS VARCHAR))")} AS u FROM s2),
         |sg AS (SELECT doc_id, lang, n_kept, ${signedSql("u")} AS hs FROM h),
         |sp AS (SELECT lang, n_kept,
         |    CASE WHEN ${pmodSql("hs", 100)} < 80 THEN 'train'
         |         WHEN ${pmodSql("hs", 100)} < 90 THEN 'val' ELSE 'test' END AS split FROM sg)
         |SELECT split, lang, count(*) AS n_docs, CAST(sum(n_kept) AS BIGINT) AS tok_sum
         |FROM sp GROUP BY split, lang ORDER BY split, lang""".stripMargin
    }) { (s, d) =>
    val docs = Tables.documents(s, d)
    // r21 barrier (values unchanged, guide §5): the gated frame feeds
    // the span FIT, the span APPLY and the lang join — three full
    // re-evaluations of the tokenize+quality gate without it.
    val kept = docs
      .withColumn("_nws", Text.wsTokenCount(col("text")))
      .withColumn("_q", Text.qualityScore(col("text")))
      .filter(col("_nws") >= 30 && col("_q") >= 0.65)
      .select(col("doc_id"), col("lang"), col("text"))
      .localCheckpoint(eager = false)
    // corpus-relative boilerplate threshold — bounded driver state
    // (one long), the same sanctioned class as the k-means collect
    val cap = (docs.count() / 100L).max(1L).toInt
    val flagged = graft.operators.Dedup.flaggedSpans(
      kept, col("doc_id"), col("text"), k = 3, maxDocs = cap)
    val cleaned = graft.operators.Dedup.removeSpans(
        kept, col("doc_id"), col("text"), flagged, k = 3)
      .join(kept.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("cleaned").as("text"), col("n_kept"))
      .localCheckpoint(eager = false) // read twice: pair mining + keep-one
    val pairs = graft.operators.Dedup.minhashLshPairs(cleaned, col("doc_id"), col("text"))
    val s2 = graft.operators.Dedup.keepOnePerCluster(cleaned, col("doc_id"), pairs)
    Curation.withSplit(s2, col("doc_id"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_kept")).as("tok_sum"))
      .orderBy(col("split"), col("lang"))
  }

  val all: Seq[QueryDef] = Seq(q68, q69, q70, q71, q72, q73, q74, q80, q81, q85, q89, q90,
    q97, q108, q110, q111, q112, q113, q114, q116, q121, q155, q158, q161)
}
