package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.plans.GraftFunctions

/** Corpus-curation operators for LLM training-data pipelines — the
  * steps between "raw crawled documents" (the reference's crawler
  * output, SURVEY §1.1) and "training batches": splitting, sampling,
  * context packing, benchmark decontamination, repetition filtering
  * (the Gopher quality rules), PII scrubbing, and epoch shuffling.
  *
  * Design rule: every source of "randomness" is the portable
  * RollingHash64 of a salted key, never rand()/sample(). That makes
  * each operator (a) reproducible across runs, retries and cluster
  * sizes, (b) joinable — membership is a pure function of the key, so
  * a later pipeline stage can recompute the split instead of carrying
  * it, and (c) oracle-checkable in any engine with 64-bit arithmetic.
  *
  * Scale notes inline; nothing here collects to the driver, and the
  * only windows are partitioned by shard/key columns whose cardinality
  * the caller controls.
  */
object Curation {

  /** Signed 64-bit deterministic hash of (salt ‖ key) — the randomness
    * primitive. The rolling hash runs over md5 hex of the salted key,
    * NOT the raw key: a base-1000003 polynomial of sequential numeric
    * keys is a small linear function of the digits modulo small
    * bucket counts (1000003 ≡ 3 mod 100 — measured 199/500 docs in a
    * "20%" sample), while 32 i.i.d. hex chars give uniform residues.
    * md5 hex is pure ASCII, so the hash stays engine-portable.
    * Requires GraftFunctions.register on the session (the
    * DataFrame-level entry points below do it themselves). */
  def saltedHash(key: Column, salt: String): Column =
    GraftFunctions.rolling_hash64(md5(concat(lit(salt), key.cast("string"))))

  /** Uniform bucket in [0, buckets) from the salted hash. */
  def hashBucket(key: Column, salt: String, buckets: Int): Column =
    pmod(saltedHash(key, salt), lit(buckets.toLong))

  /** Deterministic train/val/test split: bucket = hash mod 100,
    * train < trainPct ≤ val < trainPct+valPct ≤ test. Stable under
    * data growth — a document's split never changes when the corpus
    * around it does (contrast randomSplit, which reshuffles
    * membership on every change of input partitioning). */
  def withSplit(df: DataFrame, key: Column, salt: String = "split",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    // Overwrites any existing `split` column (withColumn semantics).
    // To keep GROUPS intact (no leakage between near-identical rows
    // of one source/domain), pass the group key — e.g. col("source") —
    // instead of the row id; membership is then per group.
    require(trainPct + valPct <= 100)
    GraftFunctions.register(df.sparkSession)
    val b = hashBucket(key, salt, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic pct% sample. Unlike df.sample this is stable,
    * repeatable, and consistent across tables sharing the key — the
    * standard way to cut a fixed dev subset out of a 100 TB corpus. */
  def sampleByHash(df: DataFrame, key: Column, pct: Int,
      salt: String = "sample"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.filter(hashBucket(key, salt, 100) < pct)
  }

  /** Leakage-safe split: near-duplicate documents MUST land in the
    * same split, or the held-out set silently overlaps training (the
    * q85 audit measures exactly that failure). Given a near-dup pair
    * list (LSH output), documents are first grouped into connected
    * components; the split key is then the CLUSTER label (min member
    * id) for clustered docs and the doc's own id otherwise — so split
    * membership stays a pure function of (salt, content neighborhood)
    * and the q85 cross-split near-dup count is zero by construction.
    *
    * Scale: the cluster side is pair-graph-sized ≪ corpus (only docs
    * with at least one near-dup appear) — typically broadcast-sized,
    * but the hint is left to AQE: a forced `broadcast()` FAILS (driver
    * OOM) instead of degrading when the dup graph is pathologically
    * large, while AQE picks the broadcast plan whenever the runtime
    * size fits and falls back to a shuffle join otherwise — same shape
    * as `Dedup.keepOnePerCluster`. */
  def leakageSafeSplit(docs: DataFrame, id: Column, pairs: DataFrame,
      salt: String = "split", trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val clusters = Dedup.dupClusters(pairs)
      .select(col("doc_id").as("_ls_id"), col("cluster").as("_ls_cluster"))
    val keyed = docs.join(clusters, id === col("_ls_id"), "left")
      .withColumn("split_key", coalesce(col("_ls_cluster"), id))
      .drop("_ls_id", "_ls_cluster")
    withSplit(keyed, col("split_key"), salt, trainPct, valPct)
  }

  /** Snapshot diff between two versions of a keyed table: per-key
    * status — added (new only), removed (old only), changed (both,
    * fingerprint differs), unchanged. The table-version delta every
    * incremental corpus pipeline publishes between crawls (what must
    * be re-embedded / re-deduped / re-packed this round).
    *
    * `fp` is the content fingerprint expression evaluated against
    * each side's columns (md5(text) is the portable default choice).
    * One full-outer shuffle join on the key; at 100 TB both sides
    * bucket by the same key so the join co-locates. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      key: String, fp: Column): DataFrame = {
    val o = oldDf.select(col(key), fp.as("_fp_old"))
    val n = newDf.select(col(key), fp.as("_fp_new"))
    o.join(n, Seq(key), "full_outer")
      .select(col(key),
        when(col("_fp_old").isNull, "added")
          .when(col("_fp_new").isNull, "removed")
          .when(col("_fp_old") =!= col("_fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Concat-and-chunk context packing (the GPT-style pretraining
    * layout): documents are laid head-to-tail per shard in `ord`
    * order, and the resulting token stream is cut into fixed
    * `budget`-token context windows. Each document gets the window
    * index (`pack_id`) and in-window offset (`pack_offset`) where it
    * STARTS, plus its own `n_tok`.
    *
    * Scale: one window aggregation partitioned by shard — shards bound
    * the sort size, so at 100 TB you pick enough shards (e.g. a hash
    * bucket of the key) that each fits an executor; no global sort. */
  def packIntoContexts(df: DataFrame, shard: Column, ord: Column,
      tokenCount: Column, budget: Int): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(shard).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tok", tokenCount)
      .withColumn("_start", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"_start DIV $budget"))
      .withColumn("pack_offset", (col("_start") % budget).cast("long"))
      .drop("_start")
  }

  /** Benchmark decontamination: for each corpus document, the number
    * of distinct n-gram shingles it shares with the benchmark set —
    * the Brown et al. (GPT-3, arXiv:2005.14165 §C) / Gao et al. (Pile)
    * n-gram-overlap test. Returns (doc_id, n_shared); docs sharing
    * nothing are absent (callers anti-join or threshold).
    *
    * Scale: benchmark shingle sets are tiny next to the corpus (eval
    * suites, not crawls) — broadcast them and the corpus-side scan
    * stays shuffle-free: no pair join ever forms. */
  def contaminationScores(corpus: DataFrame, bench: DataFrame, id: Column,
      text: Column, n: Int = 3): DataFrame = {
    val cs = Dedup.shingleSet(corpus, id, text, n)
    val bs = Dedup.shingleSet(bench, id, text, n).select(col("shingle")).distinct()
    // shingleSet emits DISTINCT shingles per doc, so count(*) counts
    // distinct shared shingles without a countDistinct.
    cs.join(broadcast(bs), "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Bloom-filter decontamination — the constant-memory form of
    * contaminationScores for when even the benchmark shingle set is
    * too big to broadcast as rows (a full eval-suite union): the
    * bench side folds into an m-bit bitmap via BloomBitmapAgg (m/8
    * bytes regardless of cardinality), the bitmap broadcasts, and the
    * corpus probe is pure column arithmetic — no join at all on the
    * corpus side. One-sided error: every truly shared shingle is hit
    * (no false negatives); false positives are bounded by
    * (set_bits/m)^k. */

  /** Bloom hash j of a shingle: saltedHash mod m — same md5-mixed
    * portable primitive as the split/sample operators, so any engine
    * replays the exact bit positions. */
  def bloomPos(shingle: Column, j: Int, m: Int): Column =
    pmod(saltedHash(shingle, s"bloom$j"), lit(m.toLong))

  /** Bit test against a packed long-array bitmap column. pos must be
    * non-negative (bloomPos guarantees it), so the double-division
    * word index truncates correctly. shiftright goes through
    * call_function because the Scala DSL only takes a literal shift. */
  def bloomTest(bitmap: Column, pos: Column): Column =
    call_function("shiftright",
      element_at(bitmap, (pos / 64).cast("int") + 1), (pos % 64).cast("int"))
      .bitwiseAND(lit(1L)) === lit(1L)

  /** Per-document count of shingles that hit the benchmark Bloom
    * filter. Returns every corpus doc: (doc_id, n_shingles,
    * n_bloom_hits). k hash functions, m bits. */
  def bloomContamination(corpus: DataFrame, bench: DataFrame, id: Column,
      text: Column, n: Int = 3, k: Int = 3, m: Int = 8192): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val benchPos = Dedup.shingleSet(bench, id, text, n)
      .select(col("shingle")).distinct()
      .select(explode(array((0 until k).map(j => bloomPos(col("shingle"), j, m)): _*)).as("pos"))
    val bitmap = benchPos.agg(GraftFunctions.bloom_agg(col("pos"), m).as("bm"))
    val cs = Dedup.shingleSet(corpus, id, text, n)
    cs.crossJoin(broadcast(bitmap))
      .withColumn("_hit",
        (0 until k).map(j => bloomTest(col("bm"), bloomPos(col("shingle"), j, m)))
          .reduce(_ && _))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_hit"), 1L).otherwise(0L)).as("n_bloom_hits"))
  }

  /** Gopher-style repetition statistics (Rae et al., arXiv:2112.11446
    * A1.1): fraction of the doc that is its single most frequent token,
    * and the duplicate-bigram ratio (1 − distinct/total). Emitted as
    * integer parts-per-million (floor(1e6·x)) — exact integers avoid
    * cross-engine round-half ambiguity on ratios like 1/128.
    *
    * One shuffle on (doc_id, token) for the mode; the bigram stats are
    * computed columnar inside the row (no explode). */
  def repetitionStats(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = Text.tokens(text)
    val bigrams = filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => when(a.isNull || b.isNull, lit(null)).otherwise(concat(a, lit(" "), b))),
      g => g.isNotNull)
    val perDoc = docs.select(id.as("doc_id"), toks.as("tk"), bigrams.as("bg"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(col("bg")).as("total2"),
        size(array_distinct(col("bg"))).as("d2"))
    val topTok = docs.select(id.as("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("topc"), sum(col("c")).as("ntok"))
    perDoc.join(topTok, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        floor(lit(1000000.0) * (col("topc").cast("double") / col("ntok")))
          .cast("long").as("top_token_ppm"),
        when(col("total2") > 0,
          floor(lit(1000000.0) * (lit(1.0) - col("d2").cast("double") / col("total2")))
            .cast("long"))
          .otherwise(0L).as("dup_bigram_ppm"))
  }

  /** PII patterns: kept RE2-and-Java-compatible (no lookaround, no
    * \b) so the same pattern text runs in Spark, DuckDB, and any
    * downstream scrub audit. */
  val emailPattern = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
  val phonePattern = "[0-9]{2,3}-[0-9]{3,4}-[0-9]{4}"

  /** Number of PII matches in the text (email + phone). */
  def piiCount(text: Column): Column =
    (size(regexp_extract_all(text, lit(emailPattern), lit(0))) +
      size(regexp_extract_all(text, lit(phonePattern), lit(0)))).cast("long")

  /** Redact PII in place. Emails first: a redacted [EMAIL] token can
    * never spuriously match the phone pattern, so the order is safe. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "[EMAIL]"),
      phonePattern, "[PHONE]")

  /** Domain mixture sampling (the DoReMi/Pile-style "hit the target
    * mixture" step): given target mixture weights w_d and a global
    * token budget B, each domain keeps a deterministic
    * rate_d = min(1, B·w_d / T_d) fraction of its documents, where
    * T_d is the domain's token total — oversized domains downsample
    * to their share, undersized ones pass through whole. Membership
    * is the usual salted-hash threshold (integer ppm), so the sample
    * is stable, repeatable, and engine-replayable; every arithmetic
    * step is a single IEEE op on exact integers, so the thresholds
    * are too. Domains missing from `weights` get weight 0 (dropped).
    *
    * Adds `mix_domain`, `mix_tok`, `mix_thresh_ppm` and `mix_keep`;
    * filter on `mix_keep` for the sampled corpus. Scale: one
    * aggregation for T_d (domain cardinality rows) joined back
    * broadcast — the corpus is scanned once, never shuffled. */
  def mixtureSample(df: DataFrame, domain: Column, key: Column,
      tokenCount: Column, weights: Seq[(String, Double)], budgetTokens: Long,
      salt: String = "mix"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val wmap = map(weights.flatMap { case (d, w) => Seq(lit(d), lit(w)) }: _*)
    val withTok = df.withColumn("mix_domain", domain).withColumn("mix_tok", tokenCount)
    val totals = withTok.groupBy(col("mix_domain"))
      .agg(sum(col("mix_tok")).as("_dom_tok"))
    withTok.join(broadcast(totals), "mix_domain")
      .withColumn("_w", coalesce(element_at(wmap, col("mix_domain")), lit(0.0)))
      .withColumn("mix_thresh_ppm",
        floor(lit(1000000.0) *
          least(lit(1.0), lit(budgetTokens.toDouble) * col("_w") / col("_dom_tok")))
          .cast("long"))
      .withColumn("mix_keep",
        hashBucket(key, salt, 1000000) < col("mix_thresh_ppm"))
      .drop("_w", "_dom_tok")
  }

  /** Sequence-length bucketing — the dynamic-batching prep step: docs
    * grouped into fixed-width length buckets so a batch pads only to
    * its bucket ceiling, plus the padding-waste accounting that
    * justifies the bucket width (padded = n·ceil − Σlen; waste_ppm =
    * the fraction of a padded batch that is padding). One groupBy on
    * the derived bucket key; integer-exact everywhere. */
  def lengthBuckets(df: DataFrame, tokenCount: Column, width: Int): DataFrame = {
    require(width > 0)
    df.withColumn("_tok", tokenCount)
      .withColumn("len_bucket", (col("_tok") / width).cast("long"))
      .groupBy(col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_tok")).as("tok_sum"),
        max(col("_tok")).as("tok_max"))
      .withColumn("bucket_ceil", (col("len_bucket") + 1) * width)
      .withColumn("padding_ppm",
        floor(lit(1000000L) * (col("n_docs") * col("bucket_ceil") - col("tok_sum"))
          / (col("n_docs") * col("bucket_ceil"))).cast("long"))
  }

  /** Deterministic stride-scheduled mixture ORDER — the training-time
    * complement of mixtureSample (which decides WHAT to keep, this
    * decides in WHAT ORDER domains interleave): each doc gets a
    * virtual time vt = rank_d / w_d, where rank_d is its salted-hash
    * rank within its domain and w_d the domain weight. Reading docs
    * in vt order interleaves domains proportionally to their weights
    * at every prefix (stride scheduling) — a prefix of the schedule
    * IS a weight-faithful mixture, which is what curriculum/epoch
    * loaders consume.
    *
    * Deterministic and engine-replayable (portable salted hash, one
    * IEEE division). Adds (sched_domain, sched_rank, sched_vt).
    * Scale: the rank window partitions by domain; no global sort —
    * consumers either range-partition on vt or take bounded prefixes
    * (TakeOrderedAndProject). Domains absent from `weights` are
    * dropped. */
  def mixtureSchedule(df: DataFrame, domain: Column, key: Column,
      weights: Seq[(String, Double)], salt: String = "sched"): DataFrame = {
    require(weights.forall(_._2 > 0))
    GraftFunctions.register(df.sparkSession)
    val wmap = map(weights.flatMap { case (d, w) => Seq(lit(d), lit(w)) }: _*)
    val w = Window.partitionBy(col("sched_domain"))
      .orderBy(saltedHash(key, salt), key)
    df.withColumn("sched_domain", domain)
      .withColumn("_w", element_at(wmap, col("sched_domain")))
      .filter(col("_w").isNotNull)
      .withColumn("sched_rank", row_number().over(w).cast("long"))
      .withColumn("sched_vt", col("sched_rank").cast("double") / col("_w"))
      .drop("_w")
  }

  /** Stratified deterministic sample: the `n` lowest-hash rows per
    * stratum — balanced subsets (equal-size per-language eval slices)
    * from one stratum-partitioned window, no global sort. Same
    * stability contract as sampleByHash: membership is a pure
    * function of (salt, key, the stratum's contents ranked by hash),
    * so reruns and engines agree exactly. */
  /** Weighted sample without replacement (Efraimidis–Spirakis A-Res):
    * each row gets priority u^(1/w) — u a deterministic salted-hash
    * unit in (0,1), w its weight — and the n highest priorities win.
    * Higher weight → priority closer to 1 → likelier kept, with the
    * exact ES inclusion distribution. Deterministic: a row's priority
    * is a pure function of (salt, key, weight), so the same corpus and
    * salt reproduce the same sample in any engine (the q68-style
    * portable-hash recipe; priorities are ROUNDED to 6 before ranking
    * so libm pow ulps can't flip the order, id tiebreak after).
    *
    * Scale: no shuffle at all — priorities are row-local and the
    * global top-n plans as TakeOrderedAndProject (per-partition heaps
    * + driver merge of n·parts rows). Weights must be > 0. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, n: Int,
      salt: String = "wsamp"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val m = 1L << 20
    val u = (pmod(saltedHash(key, salt), lit(m)).cast("double") + 0.5) / m.toDouble
    df.withColumn("_wpri", round(pow(u, lit(1.0) / weight.cast("double")), 6))
      .orderBy(col("_wpri").desc, key)
      .limit(n)
  }

  def stratifiedSample(df: DataFrame, stratum: Column, key: Column, n: Int,
      salt: String = "strat"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val w = Window.partitionBy(stratum).orderBy(saltedHash(key, salt), key)
    df.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= n)
      .drop("_r")
  }

  /** Overlapping character chunking (the RAG/embedding-prep splitter):
    * chunk i covers [i·(size−overlap), i·(size−overlap)+size). Chunk
    * count uses pure INTEGER arithmetic (⌈(L−size)/step⌉+1 via
    * (L−size+step−1) div step) so any engine reproduces the boundaries
    * exactly. Stateless row fan-out — streaming-legal, no shuffle.
    * Null text → null chunk count → the explode drops the row: a
    * null-text document contributes no chunks (filter upstream if
    * such rows must be surfaced instead). */
  def chunkByChars(docs: DataFrame, id: Column, text: Column,
      size: Int, overlap: Int): DataFrame = {
    require(size > overlap && overlap >= 0)
    val step = size - overlap
    val nChunks = when(col("_len") <= size, lit(1))
      .otherwise(expr(s"(_len - $size + $step - 1) DIV $step") + 1)
    docs.select(id.as("doc_id"), text.as("_text"), length(text).as("_len"))
      .withColumn("_nc", nChunks.cast("int"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("_nc") - 1)).as("chunk_id"), col("_text"))
      .select(col("doc_id"), col("chunk_id"),
        col("_text").substr(col("chunk_id") * step + 1, lit(size)).as("chunk"))
  }

  /** Per-row top-token fraction in ppm from a tokens column — the
    * streaming-safe form of repetitionStats' mode computation (no
    * aggregation, so it runs inside any streaming select). r19: the
    * native one-pass kernel ([[GraftFunctions.topTokenPpm]] —
    * O(n) hash counting) replaced the original HOF spelling
    * (array_distinct + one filter-count per distinct token,
    * O(distinct·n) comparisons per document — measurable in the
    * funnel's per-row hot path on long documents); bit-equality with
    * the HOF form is pinned by KernelFuzzSpec, equality with the
    * shuffle-based repetitionStats by CurationSpec. The coalesce
    * keeps the HOF form's null contract: NULL tokens array → 0 (the
    * `when`'s null-condition arm fell through to `otherwise(0)`).
    * Requires GraftFunctions.register on the session (curateStream
    * registers itself; standalone users call it once). */
  def topTokenPpmInline(toks: Column): Column =
    coalesce(GraftFunctions.topTokenPpm(toks), lit(0L))

  /** The full curation funnel as a STREAMING pipeline: stateless
    * per-document gates (token floor, quality, language, repetition,
    * and optionally a TRAINED model — the CCNet/GPT-3 "heuristics
    * first, learned filter after" order) plus PII scrubbing, with
    * first-failing-gate attribution — works unchanged on batch and
    * streaming inputs (the stream-batch consistency rule of
    * graft.streaming.Pipelines). Compose with Pipelines.dedupByKey
    * upstream for cross-batch near-real-time dedup.
    *
    * `nbModel`: a collected Naive-Bayes quality/language model
    * ([[Text.collectNbModel]], trained on weak labels by
    * [[Text.nbTrain]]). When present, docs surviving every heuristic
    * gate are scored per-row ([[Text.nbScoreExpr]] — pure column, no
    * join/aggregation, so the funnel stays streaming-legal; the
    * score column `nb_score` is BIT-EQUAL to the batch join form
    * [[Text.nbScore]]) and drop as `drop:model` below `nbMinScore`.
    * The model gate sits LAST in the verdict's first-failing-gate
    * ladder — the production funnel ORDER (a doc failing a heuristic
    * attributes to the heuristic, never to the model). Cost-wise the
    * `nb_score` COLUMN is still computed for every row, dropped or
    * not: Catalyst does not short-circuit across projected columns,
    * and the funnel's contract is per-row attribution output, which
    * needs the score column present either way (r20 advisor note —
    * the former "heuristics shed volume before the model evaluates"
    * claim described the gate order, not the column cost).
    * Scored on the RAW text like every other gate —
    * train the model on raw text too. Vocab past the literal-map cap
    * → score each micro-batch with the nbScore join form inside
    * foreachBatch instead (the corpus factory's nbGate does). */
  def curateStream(docs: DataFrame, id: Column, text: Column,
      minTokens: Int = 30, minQuality: Double = 0.65,
      maxTopTokenPpm: Long = 300000L,
      nbModel: Option[Text.NbModelLocal] = None,
      nbMinScore: Double = 0.0): DataFrame = {
    GraftFunctions.register(docs.sparkSession) // the repetition kernel
    val base = docs.select(id.as("doc_id"), text.as("text"))
      .withColumn("_toks", Text.tokens(col("text")))
      // coalesce: a NULL text tokenizes to a NULL array and size()
      // yields NULL, which would NULL every when-condition and fall
      // through to 'keep' (r20 advisor fix) — a NULL document is a
      // zero-token document, so it takes the drop:short arm, which
      // also keeps the model-gate invariant below airtight (every
      // NULL nb_score row is short-gated first)
      .withColumn("n_tok", coalesce(size(col("_toks")), lit(0)))
      .withColumn("quality", Text.qualityScore(col("text")))
      .withColumn("lang_guess", Text.langGuess(col("text")))
      .withColumn("top_token_ppm", topTokenPpmInline(col("_toks")))
      .withColumn("n_pii", piiCount(col("text")))
      .withColumn("scrubbed", scrubPii(col("text")))
    val scored = nbModel.fold(base)(m =>
      base.withColumn("nb_score", Text.nbScoreExpr(col("text"), m)))
    val heuristics =
      when(col("n_tok") < minTokens, "drop:short")
        .when(col("quality") < minQuality, "drop:quality")
        .when(col("lang_guess") =!= "en", "drop:lang")
        .when(col("top_token_ppm") > maxTopTokenPpm, "drop:repetition")
    val verdict = nbModel.fold(heuristics.otherwise("keep"))(_ =>
      // nb_score is NULL only for zero-token and NULL-text docs, both
      // of which drop:short already caught (n_tok coalesced to 0 and
      // minTokens ≥ 1 required for the model gate)
      heuristics.when(col("nb_score") < nbMinScore, "drop:model")
        .otherwise("keep"))
    if (nbModel.isDefined) require(minTokens >= 1,
      "curateStream: the model gate needs minTokens >= 1 (a zero-token " +
        "doc has no NB score; the token floor must catch it first)")
    scored.withColumn("verdict", verdict).drop("_toks")
  }

  /** DSIR-style importance weights for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * arXiv:2302.03169 — public): score every raw document by how much
    * its hashed-bigram profile resembles a TARGET corpus. Feature =
    * token bigrams hashed into `m` buckets (the portable salted hash,
    * so any engine replays the bucketing); target and raw bucket
    * distributions are add-1-smoothed multinomials; a document's
    * weight is its bigram-multiset log likelihood ratio
    * Σ_g [ln p̂_target(b(g)) − ln p̂_raw(b(g))].
    *
    * Determinism: the per-bucket log ratio is computed ONCE (exact
    * integer counts → one IEEE divide → one ln) and immediately fixed
    * to integer MICRO-nats (round(l·1e6) as BIGINT), so each doc's
    * weight is an order-free exact integer sum — a float Σ over grams
    * would depend on aggregation order and break cross-engine hash
    * parity. Returns (doc_id, n_grams, dsir_w_micro); docs with <2
    * tokens have no bigrams and drop out.
    *
    * Scale: two m-row bucket-count aggregations (map-side combined),
    * the m-row ratio table broadcast onto the exploded gram stream,
    * one per-doc sum — nothing shuffles except the (doc, partial-sum)
    * reduce. NOTE the raw gram stream is produced twice in this
    * one-shot form (bucket histogram + per-doc rollup); the
    * production-scale path is fit-once/score-many — persist
    * `dsirRatios` (corpus-level, reusable across batches) and score
    * each batch with the single-scan stateless `dsirScore` column, as
    * the corpus factory's admission gate does. Selection is a
    * TakeOrderedAndProject over the weights (see q121), or a
    * threshold filter for streaming admission. */
  def dsirWeights(raw: DataFrame, id: Column, text: Column,
      target: DataFrame, targetText: Column, m: Int = 1024,
      salt: String = "dsir"): DataFrame = {
    require(m > 0)
    GraftFunctions.register(raw.sparkSession)
    def gramBuckets(df: DataFrame, cols: Seq[Column], t: Column): DataFrame =
      df.select(cols :+ explode(Text.bigrams(Text.tokens(t))).as("gram"): _*)
        .select(cols :+ hashBucket(col("gram"), salt, m).as("bucket"): _*)
    // input fan-out (r21): rawGr's tokenize+bigram kernel runs once in
    // the bucket-count map stage and once in the per-doc rollup map
    // stage, each inheriting the scan's split count — single-core on a
    // single-row-group input (no-op at real scale). The repartition
    // exchange is identical under both consumers, so AQE reuses it
    // (one scan), and each kernel pass parallelizes.
    val rawGr = gramBuckets(graft.sources.Tables.fanOutForKernels(raw),
      Seq(id.as("doc_id")), text)
    val tgtGr = gramBuckets(graft.sources.Tables.fanOutForKernels(target),
      Seq.empty, targetText)
    val rawCnt = rawGr.groupBy(col("bucket")).agg(count(lit(1)).as("_cq"))
    val tgtCnt = tgtGr.groupBy(col("bucket")).agg(count(lit(1)).as("_ct"))
    // corpus totals from the ≤m-row bucket tables, NOT a second scan
    // of the tokenized corpora
    val tgtTot = tgtCnt.agg(coalesce(sum(col("_ct")), lit(0L)).as("_nt"))
    val rawTot = rawCnt.agg(coalesce(sum(col("_cq")), lit(0L)).as("_nq"))
    // every bucket that occurs in raw docs gets a ratio row (≤ m rows);
    // target-absent buckets smooth to ct=0
    val ratios = rawCnt
      .join(tgtCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tgtTot)).crossJoin(broadcast(rawTot))
      .select(col("bucket"),
        round((log((coalesce(col("_ct"), lit(0L)) + lit(1.0)) / (col("_nt") + lit(m.toDouble)))
          - log((col("_cq") + lit(1.0)) / (col("_nq") + lit(m.toDouble)))) * lit(1000000.0))
          .cast("long").as("_lmicro"))
    rawGr.join(broadcast(ratios), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("_lmicro")).as("dsir_w_micro"))
  }

  /** The selection step: the `n` highest-weight raw docs (ties to the
    * lower id) — plans as TakeOrderedAndProject, never a global sort. */
  def dsirSelect(raw: DataFrame, id: Column, text: Column,
      target: DataFrame, targetText: Column, n: Int, m: Int = 1024): DataFrame = {
    val w = dsirWeights(raw, id, text, target, targetText, m)
      .withColumnRenamed("doc_id", "_dsir_id")
    raw.join(w, id === col("_dsir_id")).drop("_dsir_id")
      .orderBy(col("dsir_w_micro").desc, id)
      .limit(n)
  }

  /** The (bucket → micro-nat log-ratio) table of `dsirWeights` as a
    * reusable artifact — fit once on a batch corpus, persist like the
    * LSH index, apply to any future batch or STREAM. ≤ m rows. */
  def dsirRatios(raw: DataFrame, text: Column,
      target: DataFrame, targetText: Column, m: Int = 1024,
      salt: String = "dsir"): DataFrame = {
    // same construction as dsirWeights, without the per-doc rollup
    GraftFunctions.register(raw.sparkSession)
    def buckets(df: DataFrame, t: Column): DataFrame =
      df.select(explode(Text.bigrams(Text.tokens(t))).as("gram"))
        .select(hashBucket(col("gram"), salt, m).as("bucket"))
    val rawCnt = buckets(raw, text).groupBy(col("bucket")).agg(count(lit(1)).as("_cq"))
    val tgtCnt = buckets(target, targetText).groupBy(col("bucket")).agg(count(lit(1)).as("_ct"))
    val tgtTot = tgtCnt.agg(coalesce(sum(col("_ct")), lit(0L)).as("_nt"))
    val rawTot = rawCnt.agg(coalesce(sum(col("_cq")), lit(0L)).as("_nq"))
    rawCnt.join(tgtCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(tgtTot)).crossJoin(broadcast(rawTot))
      .select(col("bucket"),
        round((log((coalesce(col("_ct"), lit(0L)) + lit(1.0)) / (col("_nt") + lit(m.toDouble)))
          - log((col("_cq") + lit(1.0)) / (col("_nq") + lit(m.toDouble)))) * lit(1000000.0))
          .cast("long").as("lmicro"))
  }

  /** STREAMING-legal DSIR admission score: the fitted ratio table
    * (collected once — ≤ m rows of driver state, the same sanctioned
    * bound as k-means centroids) compiles into an expression-constant
    * hash map (r20: the native LongLookupSum kernel), and the
    * score is a pure column expression over the row's own bigrams —
    * no join, no state, stream==batch by construction. Buckets absent
    * from the fitted table (bigrams never seen at fit time) contribute
    * 0. Gate with `score >= thresholdMicro` in any funnel, including
    * `curateStream`-shaped streaming pipelines. Requires
    * GraftFunctions.register on the session (the DataFrame-level
    * entry points here register themselves). */
  def dsirScore(text: Column, ratios: Map[Long, Long], m: Int = 1024,
      salt: String = "dsir"): Column = {
    require(ratios.nonEmpty)
    // best-effort self-registration (r21, advisor): a standalone
    // caller that never called GraftFunctions.register would fail at
    // analysis with an unresolved graft_long_lookup_sum otherwise;
    // register is idempotent and cheap. r22 (advisor): also the
    // DEFAULT session — getActiveSession is thread-local, so an
    // off-thread builder could register against a session other than
    // the one that analyzes the plan (a Column carries no session; a
    // true multi-session caller registers on the session that runs
    // the plan).
    (org.apache.spark.sql.SparkSession.getActiveSession.toSeq ++
      org.apache.spark.sql.SparkSession.getDefaultSession).distinct
      .foreach(GraftFunctions.register)
    // r20: the per-gram lookup is the native LongLookupSum kernel (an
    // expression-constant hash map, O(1) per gram) instead of
    // element_at over an m-entry map LITERAL (a linear key scan —
    // O(grams · m) per row on the factory's DSIR admission gate). The
    // salted bucket hash stays column algebra (one portable
    // definition); unfitted buckets and NULL grams contribute 0
    // exactly as before (KernelFuzzSpec pins kernel == the HOF).
    val entries = ratios.toSeq.sortBy(_._1)
    val grams = Text.bigrams(Text.tokens(text))
    GraftFunctions.longLookupSum(
      transform(grams, g => hashBucket(g, salt, m)),
      entries.map(_._1), entries.map(_._2), default = 0L)
  }

  /** Collect a fitted ratio table into the literal-map form `dsirScore`
    * consumes (≤ m rows — bounded by construction). */
  def collectRatios(ratios: DataFrame): Map[Long, Long] =
    ratios.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Deterministic epoch shuffle, sharded: shard = hash mod nShards,
    * position within shard = rank of the hash. Reproduces "global
    * random training order" the way real pipelines ship it — as N
    * shard files each in scrambled order — without a global sort:
    * the window partitions by shard, so every shard ranks in
    * parallel. A new salt (epoch number) yields a fresh permutation. */
  def shuffleShards(df: DataFrame, key: Column, nShards: Int,
      salt: String): DataFrame = {
    require(nShards > 0)
    GraftFunctions.register(df.sparkSession)
    df.withColumn("_h", saltedHash(key, salt))
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)))
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(col("_h"), key)))
      .drop("_h")
  }
}
