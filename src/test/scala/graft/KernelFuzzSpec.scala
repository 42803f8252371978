package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Quantization
import graft.plans.GraftFunctions

/** ScalaCheck fuzz tier over the native Catalyst kernels — the
  * image-parser fuzz pattern (MultimodalSpec) applied to the r11
  * kernel tier. Seeded generators (failures reproduce) drive random
  * arrays — nulls, empties, length mismatches, extreme magnitudes —
  * through each kernel next to the HOF column formulation it
  * replaced, asserting bit-identical results via one null-safe
  * comparison per case; the corrupt-input contracts (PqEncode /
  * PqAdcLookup) must RAISE loudly, never emit garbage values that
  * would silently poison a downstream shortlist ordering. */
class KernelFuzzSpec extends SparkSuite {
  init()
  import spark.implicits._

  GraftFunctions.register(spark)

  /** Deterministic ScalaCheck sampling (the PropertySpec helper). */
  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def df(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)

  // ---- MinHashSig ------------------------------------------------------

  test("fuzz: minhash signature kernel == guarded HOF formulation on random shingle arrays") {
    val nH = 8
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(16)),
      Gen.listOfN(6, Gen.choose(0x20.toChar, 0x7e.toChar)).map(_.mkString),
      Gen.const(""), // empty SHINGLE is a legal value, hash of 0 bytes
      Gen.const("한국어 토큰"),
      Gen.const("a b c"))
    val elemGen: Gen[Option[String]] =
      Gen.frequency(9 -> strGen.map(Option(_)), 1 -> Gen.const(None))
    val arrGen: Gen[Option[Seq[Option[String]]]] = Gen.frequency(
      8 -> Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, elemGen)).map(Some(_)),
      1 -> Gen.const(None))
    val rows = sample(arrGen, 300, 41L).zipWithIndex.map { case (a, i) =>
      Row(i.toLong, a.map(_.map(_.orNull)).orNull)
    }
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("sh", ArrayType(StringType, containsNull = true))))
    val base = df(rows, schema)
    // the pre-r11 HOF formula, guarded to the kernel's documented
    // empty/null-element contract (NULL signature — DedupSpec pins it)
    val hof = when(col("sh").isNull || size(col("sh")) === 0 ||
        exists(col("sh"), _.isNull), lit(null))
      .otherwise(array((0 until nH).map(s =>
        array_min(transform(col("sh"), x => xxhash64(lit(s), x)))): _*))
    val diff = base
      .select(GraftFunctions.minhashSig(col("sh"), nH).as("k"), hof.as("h"))
      .filter(!(col("k") <=> col("h"))).count()
    assert(diff == 0, "minhash kernel diverged from the HOF formulation")
  }

  // ---- SimHashSig ------------------------------------------------------

  test("fuzz: simhash kernel == aggregation formulation on random token arrays; empty/null → NULL") {
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(16)),
      Gen.listOfN(6, Gen.choose(0x20.toChar, 0x7e.toChar)).map(_.mkString),
      Gen.const(""), // empty TOKEN is a legal value (hash of 0 bytes)
      Gen.const("한국어 토큰"),
      Gen.const("the")) // repeats exercise the ±count ≡ ±1-per-instance identity
    // non-empty, null-free arrays: the aggregation form drops empty
    // docs and SKIPS null hashes, while the kernel's contract for both
    // is a NULL signature — pinned separately below
    val arrGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, strGen))
    val rows = sample(arrGen, 300, 47L).zipWithIndex.map { case (a, i) => Row(i.toLong, a) }
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("toks", ArrayType(StringType, containsNull = true))))
    val base = df(rows, schema)
    val kernel = base.select(col("id"), GraftFunctions.simhashSig(col("toks")).as("ks"))
    val agg = base.select(col("id"), explode(col("toks")).as("token"))
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("w"))
      .withColumn("h", GraftFunctions.rolling_hash64(col("token")))
      .groupBy(col("id")).agg(GraftFunctions.simhash_agg(col("h"), col("w")).as("as"))
    val diff = kernel.join(agg, Seq("id"), "full_outer")
      .filter(!(col("ks") <=> col("as"))).count()
    assert(diff == 0, "simhash kernel diverged from the aggregation formulation")
    // documented contract: empty array → NULL; any null element → NULL
    val edge = df(Seq(Row(0L, Seq.empty[String]), Row(1L, Seq("a", null))), schema)
    assert(edge.select(GraftFunctions.simhashSig(col("toks")).as("s"))
      .collect().forall(_.isNullAt(0)))
  }

  // ---- TopTokenPpm -----------------------------------------------------

  test("fuzz: top-token-ppm kernel == HOF formulation on random token arrays incl. nulls") {
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const(""), // empty TOKEN is a legal value
      Gen.const("한국어"),
      Gen.const("the"), Gen.const("the"), // heavy repeats drive the mode
      Gen.const("a"))
    val elemGen: Gen[Option[String]] =
      Gen.frequency(9 -> strGen.map(Option(_)), 1 -> Gen.const(None))
    val arrGen: Gen[Option[Seq[Option[String]]]] = Gen.frequency(
      8 -> Gen.choose(0, 16).flatMap(n => Gen.listOfN(n, elemGen)).map(Some(_)),
      1 -> Gen.const(None))
    val rows = sample(arrGen, 300, 53L).zipWithIndex.map { case (a, i) =>
      Row(i.toLong, a.map(_.map(_.orNull)).orNull)
    }
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("toks", ArrayType(StringType, containsNull = true))))
    val base = df(rows, schema)
    // the pre-r19 HOF formula VERBATIM (array_distinct + one
    // filter-count per distinct token; null elements never the mode
    // but counted in the denominator; NULL/empty array → 0 via the
    // when's null-condition fall-through)
    val topCnt = array_max(transform(array_distinct(col("toks")),
      u => size(filter(col("toks"), t => t === u))))
    val hof = when(size(col("toks")) > 0,
      floor(lit(1000000.0) * (topCnt.cast("double") / size(col("toks")))).cast("long"))
      .otherwise(0L)
    val diff = base
      .select(graft.operators.Curation.topTokenPpmInline(col("toks")).as("k"),
        hof.as("h"))
      .filter(!(col("k") <=> col("h"))).count()
    assert(diff == 0, "top-token-ppm kernel diverged from the HOF formulation")
    // hand-pinned edges: all-null array → 0, single token → 1e6,
    // half-and-half → 500000
    val edge = df(Seq(
      Row(0L, Seq[String](null, null)),
      Row(1L, Seq("solo")),
      Row(2L, Seq("a", "a", "b", null))), schema)
    val got = edge.select(col("id"),
        graft.operators.Curation.topTokenPpmInline(col("toks")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1000000L, 2L -> 500000L), got.toString)
  }

  // ---- NbScoreMicros ---------------------------------------------------

  test("fuzz: nb-score kernel == decimal-aggregate HOF on random token arrays and vocab") {
    val rng = new scala.util.Random(59)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def micros(x: Double): Long =
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(1000000)).toLongExact
    // 40-token vocab with random round-6 llrs of both signs (the
    // nbTrain output shape), plus an OOV default and a prior
    val vocabTokens = (0 until 40).map(i => s"tok$i")
    val llrs6 = vocabTokens.map(_ => r6(rng.nextDouble() * 8 - 4))
    val default6 = r6(-1.2345678)
    val prior6 = r6(0.4054651)
    val kernel = GraftFunctions.nbScoreMicros(col("toks"),
      vocabTokens, llrs6.map(micros), micros(default6), prior6)
    // the pre-r19 decimal-aggregate spelling VERBATIM (element_at over
    // a map literal + DECIMAL(27,6) accumulator), compared PRE-round —
    // stronger than comparing the rounded column
    val dec = DataTypes.createDecimalType(27, 6)
    val w = typedLit(vocabTokens.zip(llrs6).toMap)
    val hof = aggregate(col("toks"), lit(0).cast(dec), (acc, t) =>
      (acc + coalesce(element_at(w, t), lit(default6)).cast(dec)).cast(dec))
      .cast("double") + lit(prior6)
    val elemGen: Gen[Option[String]] = Gen.frequency(
      6 -> Gen.choose(0, 39).map(i => Option(s"tok$i")),
      2 -> Gen.alphaNumStr.map(s => Option("oov" + s.take(8))),
      1 -> Gen.const(Option("")), // empty string is a legal OOV token
      1 -> Gen.const(None))
    val arrGen: Gen[Option[Seq[Option[String]]]] = Gen.frequency(
      8 -> Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, elemGen)).map(Some(_)),
      1 -> Gen.const(None))
    val rows = sample(arrGen, 300, 61L).zipWithIndex.map { case (a, i) =>
      Row(i.toLong, a.map(_.map(_.orNull)).orNull)
    }
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("toks", ArrayType(StringType, containsNull = true))))
    val diff = df(rows, schema)
      .select(kernel.as("k"), hof.as("h"))
      .filter(!(col("k") <=> col("h"))).count()
    assert(diff == 0, "nb-score kernel diverged from the decimal-aggregate HOF")
    // hand-pinned edges: empty array → prior exactly; all-OOV array →
    // 2·default + prior through the same arithmetic
    val edge = df(Seq(Row(0L, Seq.empty[String]),
      Row(1L, Seq("never-seen", "also-new"))), schema)
    val got = edge.select(col("id"), kernel.as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) == prior6)
    assert(got(1L) == (2 * micros(default6)).toDouble / 1e6 + prior6)
  }

  // ---- TokenCountSum ---------------------------------------------------

  test("fuzz: bpe-count kernel == literal-map HOF on random token arrays incl. OOV and nulls") {
    val rng = new scala.util.Random(83)
    // ~30-word trained vocab with small positive n_sym counts (the
    // BpeState.collectWordTokenCounts output shape)
    val vocabWords = (0 until 30).map(i => s"w$i")
    val nsyms = vocabWords.map(_ => 1L + rng.nextInt(6))
    val wordMap = vocabWords.zip(nsyms).toMap
    val kernel = GraftFunctions.tokenCountSum(col("toks"),
      vocabWords, vocabWords.map(wordMap))
    // the pre-r20 Bpe.bpeTokenCount spelling VERBATIM: aggregate +
    // element_at over a map literal, char-length OOV fallback
    val lookup = map(wordMap.toSeq.sortBy(_._1).flatMap { case (w, n) =>
      Seq(lit(w), lit(n)) }: _*)
    val hof = aggregate(col("toks"), lit(0L),
      (acc, w) => acc + coalesce(element_at(lookup, w), length(w).cast("long")))
    val elemGen: Gen[Option[String]] = Gen.frequency(
      6 -> Gen.choose(0, 29).map(i => Option(s"w$i")),
      2 -> Gen.alphaNumStr.map(s => Option("oov" + s.take(8))),
      1 -> Gen.const(Option("")), // empty word: OOV with length 0
      1 -> Gen.const(Option("한국어")), // numChars counts CODEPOINTS, not bytes
      1 -> Gen.const(None))
    val arrGen: Gen[Option[Seq[Option[String]]]] = Gen.frequency(
      8 -> Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, elemGen)).map(Some(_)),
      1 -> Gen.const(None))
    val rows = sample(arrGen, 300, 89L).zipWithIndex.map { case (a, i) =>
      Row(i.toLong, a.map(_.map(_.orNull)).orNull)
    }
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("toks", ArrayType(StringType, containsNull = true))))
    val diff = df(rows, schema)
      .select(kernel.as("k"), hof.as("h"))
      .filter(!(col("k") <=> col("h"))).count()
    assert(diff == 0, "bpe-count kernel diverged from the literal-map HOF")
    // hand-pinned edges: empty array → 0; a null ELEMENT poisons the
    // sum to NULL (the HOF's null accumulator); NULL array → NULL;
    // multi-byte OOV counts characters (3), not bytes (9)
    val edge = df(Seq(
      Row(0L, Seq.empty[String]),
      Row(1L, Seq("w0", null, "w1")),
      Row(2L, null),
      Row(3L, Seq("한국어"))), schema)
    val got = edge.select(col("id"), kernel.as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(0L -> Some(0L), 1L -> None, 2L -> None, 3L -> Some(3L)), got.toString)
  }

  // ---- LongLookupSum ---------------------------------------------------

  test("fuzz: long-lookup-sum kernel == literal-map HOF on random key arrays incl. nulls and nonzero default") {
    val rng = new scala.util.Random(97)
    // an m=64 fitted-ratio shape: hashed-bucket keys → signed micros
    val keys = rng.shuffle((0L until 64L).toList).take(40).toIndexedSeq
    val vals = keys.map(_ => rng.nextLong() % 2000000L)
    val ratioMap = keys.zip(vals).toMap
    for (default <- Seq(0L, -123456L)) {
      val kernel = GraftFunctions.longLookupSum(col("xs"), keys, vals, default)
      // the pre-r20 dsirScore lookup spelling VERBATIM (per-element
      // coalesce to the default, then the fold)
      val lookup = map(ratioMap.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        Seq(lit(k), lit(v)) }: _*)
      val hof = aggregate(
        transform(col("xs"), x => coalesce(element_at(lookup, x), lit(default))),
        lit(0L), (acc, x) => acc + x)
      val elemGen: Gen[java.lang.Long] = Gen.frequency(
        6 -> Gen.choose(0L, 63L).map(Long.box),       // mostly fitted range
        2 -> Gen.choose(64L, 1023L).map(Long.box),    // unfitted buckets
        1 -> Gen.const(null: java.lang.Long))         // NULL gram's NULL bucket
      val arrGen: Gen[Option[Seq[java.lang.Long]]] = Gen.frequency(
        8 -> Gen.choose(0, 24).flatMap(n => Gen.listOfN(n, elemGen)).map(Some(_)),
        1 -> Gen.const(None))
      val rows = sample(arrGen, 300, 101L).zipWithIndex.map { case (a, i) =>
        Row(i.toLong, a.orNull)
      }
      val schema = StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("xs", ArrayType(LongType, containsNull = true))))
      val diff = df(rows, schema)
        .select(kernel.as("k"), hof.as("h"))
        .filter(!(col("k") <=> col("h"))).count()
      assert(diff == 0,
        s"long-lookup-sum kernel diverged from the HOF (default=$default)")
    }
  }

  test("fuzz: kernel-backed dsirScore == pre-r20 HOF spelling end-to-end on random text") {
    import graft.operators.Curation
    val rng = new scala.util.Random(103)
    val m = 64
    // a fitted table over a fraction of the bucket space
    val ratios = (0 until 40).map(_ => rng.nextInt(m).toLong)
      .distinct.map(b => b -> (rng.nextLong() % 1000000L)).toMap
    val lookup = map(ratios.toSeq.sortBy(_._1).flatMap { case (b, l) =>
      Seq(lit(b), lit(l)) }: _*)
    def hof(text: org.apache.spark.sql.Column) = aggregate(
      transform(graft.functions.Text.bigrams(graft.functions.Text.tokens(text)),
        g => coalesce(element_at(lookup, Curation.hashBucket(g, "dsir", m)), lit(0L))),
      lit(0L), (acc, x) => acc + x)
    val wordGen = Gen.oneOf("the", "cat", "sat", "on", "한국어", "mat", "a")
    val textGen: Gen[String] = Gen.choose(0, 12)
      .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val rows = sample(Gen.frequency(9 -> textGen.map(Option(_)),
        1 -> Gen.const(None: Option[String])), 200, 107L)
      .zipWithIndex.map { case (t, i) => Row(i.toLong, t.orNull) }
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    val diff = df(rows, schema)
      .select(Curation.dsirScore(col("text"), ratios, m).as("k"),
        hof(col("text")).as("h"))
      .filter(!(col("k") <=> col("h"))).count()
    assert(diff == 0, "kernel-backed dsirScore diverged from the HOF spelling")
  }

  // ---- DotProduct ------------------------------------------------------

  test("fuzz: graft_dot == HOF fold on random double arrays incl. mismatched lengths and extremes") {
    val xGen = Gen.oneOf[java.lang.Double](0.0, -0.0, 1.5, -2.25, 1e300,
      -1e300, 1e-300, 12345.6789, -7.5e-12)
    val elemGen: Gen[java.lang.Double] =
      Gen.frequency(9 -> xGen, 1 -> Gen.const(null: java.lang.Double))
    // independent lengths → ~5/6 of pairs mismatch somewhere in 0..5
    val arrGen: Gen[Seq[java.lang.Double]] =
      Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, elemGen))
    val pairGen = Gen.zip(
      Gen.frequency(9 -> arrGen.map(Option(_)), 1 -> Gen.const(None)),
      Gen.frequency(9 -> arrGen.map(Option(_)), 1 -> Gen.const(None)))
    val rows = sample(pairGen, 400, 43L).map { case (a, b) =>
      Row(a.orNull, b.orNull)
    }
    val at = ArrayType(DoubleType, containsNull = true)
    val base = df(rows, StructType(Seq(StructField("a", at), StructField("b", at))))
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    // ±1e300 products overflow to ±Infinity in both forms; Inf + -Inf
    // accumulates to NaN identically (same element order) — but NaN
    // breaks <=>-equality, so NaN==NaN counts as agreement explicitly
    val diff = base
      .select(GraftFunctions.dot(col("a"), col("b")).as("k"), hof.as("h"))
      .filter(!(col("k") <=> col("h")) && !(isnan(col("k")) && isnan(col("h"))))
      .count()
    assert(diff == 0, "dot kernel diverged from the HOF fold")
  }

  // ---- LongDot / SqDistLong -------------------------------------------

  test("fuzz: graft_qdot / graft_sqdist == widen-first HOF folds on random int arrays") {
    // the kernels widen each element to long BEFORE combining (no int
    // wraparound), so the matching HOF reference casts FIRST; on the
    // documented int8-code domain the cast placement is immaterial.
    // Widen-first is pinned by ONE controlled extreme pair per row
    // whose int-space difference wraps but whose long-space square
    // still fits the accumulator — fully unbounded extremes can't be
    // fuzzed against the SQL reference at all (ANSI mode raises on
    // long overflow where the kernel's Java arithmetic wraps; the
    // wrap-on-unbounded-longs caveat is documented at the trait).
    val vGen = Gen.frequency(
      9 -> Gen.choose(-127, 127).map(Int.box),
      1 -> Gen.const(null: Integer))
    val extremePair: Gen[(Integer, Integer)] = Gen.oneOf(
      Seq(((1 << 30) + 1, -(1 << 30)), (-(1 << 30), (1 << 30) + 7),
        (Int.MaxValue, -1), (Int.MinValue, 1), (Int.MinValue, 0))
        .map { case (x, y) => (Int.box(x), Int.box(y)) })
    val arrGen: Gen[Seq[Integer]] =
      Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, vGen))
    val pairGen = for {
      a <- Gen.frequency(9 -> arrGen.map(Option(_)), 1 -> Gen.const(None))
      b <- Gen.frequency(9 -> arrGen.map(Option(_)), 1 -> Gen.const(None))
      inject <- Gen.frequency(2 -> Gen.some(extremePair), 3 -> Gen.const(None))
    } yield inject match {
      case Some((x, y)) if a.exists(_.nonEmpty) && b.exists(_.nonEmpty) =>
        (a.map(_.updated(0, x)), b.map(_.updated(0, y)))
      case _ => (a, b)
    }
    val rows = sample(pairGen, 400, 47L).map { case (a, b) =>
      Row(a.orNull, b.orNull)
    }
    val at = ArrayType(IntegerType, containsNull = true)
    val base = df(rows, StructType(Seq(StructField("a", at), StructField("b", at))))
    val hofDot = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)
    val hofSqd = aggregate(
      zip_with(col("a"), col("b"), (x, y) =>
        (x.cast("long") - y.cast("long")) * (x.cast("long") - y.cast("long"))),
      lit(0L), (acc, v) => acc + v)
    val diff = base
      .select(GraftFunctions.qdot(col("a"), col("b")).as("kd"), hofDot.as("hd"),
        GraftFunctions.sqdist(col("a"), col("b")).as("ks"), hofSqd.as("hs"))
      .filter(!(col("kd") <=> col("hd")) || !(col("ks") <=> col("hs")))
      .count()
    assert(diff == 0, "qdot/sqdist kernels diverged from the widen-first HOF folds")
  }

  // ---- UnitInt8Encode / MaxAbsInt8Encode ------------------------------

  test("fuzz: quantize kernels == guarded HOF formulas on random finite float arrays") {
    val xGen = Gen.oneOf[java.lang.Float](0.0f, -0.0f, 1.5f, -1.5f, 3.4e38f,
      -3.4e38f, 1e-30f, Float.MinPositiveValue, 127.0f, -126.5f, 0.333f)
    val elemGen: Gen[java.lang.Float] =
      Gen.frequency(9 -> xGen, 1 -> Gen.const(null: java.lang.Float))
    val arrGen: Gen[Option[Seq[java.lang.Float]]] = Gen.frequency(
      8 -> Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, elemGen)).map(Some(_)),
      1 -> Gen.const(None))
    val rows = sample(arrGen, 300, 53L).zipWithIndex.map { case (a, i) =>
      Row(i.toLong, a.orNull)
    }
    val schema = StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val base = df(rows, schema).cache()
    try {
      val degenerate = col("embedding").isNull || exists(col("embedding"), _.isNull)
      // unit-int8: kernel yields NULL for null array / null element;
      // empty arrays quantize to EMPTY codes (norm 0 branch)
      val hofUnit = base.withColumn("_nrm", sqrt(aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (a, x) => a + x)))
        .withColumn("h", when(degenerate, lit(null))
          .otherwise(when(col("_nrm") === 0.0, transform(col("embedding"), _ => lit(0)))
            .otherwise(transform(col("embedding"), x =>
              least(greatest(floor(x.cast("double") / col("_nrm") * 127.0 + 0.5),
                lit(-127.0)), lit(127.0)).cast("int")))))
      val unitDiff = Quantization.withUnitInt8(base)
        .join(hofUnit.select(col("vec_id"), col("h")), "vec_id")
        .filter(!(col("q8u") <=> col("h"))).count()
      assert(unitDiff == 0, "unit-int8 kernel diverged under fuzz")
      // max-abs: kernel yields NULL for empty arrays too (array_max of
      // nothing has no scale — the documented contract)
      val hofMax = base.withColumn("rscale",
          array_max(transform(col("embedding"), x => abs(x.cast("double")))) / 127.0)
        .withColumn("hq8", when(degenerate || size(col("embedding")) === 0, lit(null))
          .otherwise(when(col("rscale") === 0.0, transform(col("embedding"), _ => lit(0)))
            .otherwise(transform(col("embedding"), x =>
              least(greatest(floor(x.cast("double") / col("rscale") + 0.5), lit(-127.0)),
                lit(127.0)).cast("int")))))
        .withColumn("hscale", when(degenerate || size(col("embedding")) === 0,
          lit(null)).otherwise(col("rscale")))
      val maxDiff = Quantization.withInt8(base)
        .join(hofMax.select(col("vec_id"), col("hq8"), col("hscale")), "vec_id")
        .filter(!(col("q8") <=> col("hq8")) || !(col("scale") <=> col("hscale")))
        .count()
      assert(maxDiff == 0, "max-abs kernel diverged under fuzz")
    } finally base.unpersist()
  }

  test("fuzz: quantize kernels raise on ANY non-finite element, at any position") {
    val finite = Gen.oneOf[java.lang.Float](1.0f, -2.5f, 0.0f)
    val bad = Gen.oneOf[java.lang.Float](Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity)
    val caseGen = for {
      n <- Gen.choose(1, 5)
      pos <- Gen.choose(0, n - 1)
      pre <- Gen.listOfN(n, finite)
      b <- bad
    } yield pre.updated(pos, b)
    for (arr <- sample(caseGen, 25, 59L)) {
      val d = Seq((1L, arr.map(_.floatValue()).toArray)).toDF("vec_id", "embedding")
      val e1 = intercept[Exception](Quantization.withUnitInt8(d).collect())
      assert(e1.toString.contains("non-finite") ||
        Option(e1.getCause).exists(_.toString.contains("non-finite")),
        s"unit: $arr -> $e1")
      val e2 = intercept[Exception](Quantization.withInt8(d).collect())
      assert(e2.toString.contains("non-finite") ||
        Option(e2.getCause).exists(_.toString.contains("non-finite")),
        s"maxabs: $arr -> $e2")
    }
  }

  // ---- PqEncode / PqLut / PqAdcLookup ---------------------------------

  /** Scala reference: per-subspace argmin (ties → lowest t), the
    * published ADC construction re-derived independently of the
    * kernel's loop. */
  private def refEncode(v: Seq[Int], m: Int, subDim: Int, kEff: Int,
      flat: Seq[Int]): Seq[Int] =
    (0 until m).map { j =>
      (0 until kEff).minBy { t =>
        val base = (j * kEff + t) * subDim
        val d = (0 until subDim).map { i =>
          val dv = v(j * subDim + i).toLong - flat(base + i); dv * dv
        }.sum
        (d, t)
      }
    }

  test("fuzz: PqEncode == independent argmin reference across random codebook geometries") {
    val geomGen = for {
      m <- Gen.oneOf(1, 2, 4)
      subDim <- Gen.oneOf(1, 2, 3)
      kEff <- Gen.oneOf(1, 2, 5)
      flat <- Gen.listOfN(m * kEff * subDim, Gen.choose(-127, 127))
      vecs <- Gen.listOfN(8, Gen.listOfN(m * subDim, Gen.choose(-127, 127)))
    } yield (m, subDim, kEff, flat, vecs)
    for ((m, subDim, kEff, flat, vecs) <- sample(geomGen, 20, 61L)) {
      val d = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "q8u")
      val got = d.select(col("vec_id"),
          GraftFunctions.pqEncode(col("q8u"), m, subDim, flat).as("pq"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vecs.zipWithIndex.foreach { case (v, i) =>
        val want = refEncode(v, m, subDim, kEff, flat)
        assert(got(i.toLong) == want,
          s"m=$m subDim=$subDim kEff=$kEff vec=$v: ${got(i.toLong)} != $want")
      }
    }
  }

  test("fuzz: factored ADC (PqLut∘PqAdcLookup) == direct per-pair sum on valid random inputs") {
    val geomGen = for {
      m <- Gen.oneOf(1, 2, 4)
      subDim <- Gen.oneOf(1, 2)
      kEff <- Gen.oneOf(2, 5)
      flat <- Gen.listOfN(m * kEff * subDim, Gen.choose(-127, 127))
      q <- Gen.listOfN(m * subDim, Gen.choose(-127, 127))
      codes <- Gen.listOfN(8, Gen.listOfN(m, Gen.choose(0, kEff - 1)))
    } yield (m, subDim, kEff, flat, q, codes)
    for ((m, subDim, kEff, flat, q, codes) <- sample(geomGen, 20, 67L)) {
      val d = codes.zipWithIndex.map { case (pq, i) => (i.toLong, pq) }
        .toDF("vec_id", "pq")
        .withColumn("_lut", GraftFunctions.pqLut(
          typedlit(q), m, subDim, flat))
      val got = d.select(col("vec_id"),
          GraftFunctions.pqAdc(col("_lut"), col("pq"), kEff).as("dist"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      codes.zipWithIndex.foreach { case (pq, i) =>
        val want = (0 until m).map { j =>
          val base = (j * kEff + pq(j)) * subDim
          (0 until subDim).map { x =>
            val dv = q(j * subDim + x).toLong - flat(base + x); dv * dv
          }.sum
        }.sum
        assert(got(i.toLong) == want, s"m=$m kEff=$kEff pq=$pq")
      }
    }
  }

  test("fuzz: PqEncode/PqLut raise on wrong-length vectors; builders reject mis-tiled codebooks") {
    val caseGen = for {
      m <- Gen.oneOf(2, 4)
      subDim <- Gen.oneOf(2, 3)
      kEff <- Gen.const(2)
      flat <- Gen.listOfN(m * kEff * subDim, Gen.choose(-127, 127))
      wrongLen <- Gen.choose(0, 2 * m * subDim).suchThat(_ != m * subDim)
      v <- Gen.listOfN(wrongLen, Gen.choose(-127, 127))
    } yield (m, subDim, flat, v)
    for ((m, subDim, flat, v) <- sample(caseGen, 15, 71L)) {
      val d = Seq((1L, v)).toDF("vec_id", "q8u")
      val e = intercept[Exception](
        d.select(GraftFunctions.pqEncode(col("q8u"), m, subDim, flat)).collect())
      assert(e.toString.contains("dims") ||
        Option(e.getCause).exists(_.toString.contains("dims")), e.toString)
      val e2 = intercept[Exception](
        d.select(GraftFunctions.pqLut(col("q8u"), m, subDim, flat)).collect())
      assert(e2.toString.contains("dims") ||
        Option(e2.getCause).exists(_.toString.contains("dims")), e2.toString)
    }
    // a codebook that does not tile m×subDim fails at construction,
    // loudly, for every mis-sized literal
    for (badLen <- Seq(1, 7, 23)) {
      val d = Seq((1L, Seq(1, 2, 3, 4))).toDF("vec_id", "q8u")
      val e = intercept[Exception](
        d.select(GraftFunctions.pqEncode(col("q8u"), 2, 2,
          (1 to badLen))).collect())
      assert(e.toString.contains("tile") ||
        Option(e.getCause).exists(_.toString.contains("tile")), e.toString)
    }
  }

  test("fuzz: PqAdcLookup raises on ANY out-of-range or null code, at any position") {
    val m = 4; val kEff = 4
    val lut = (0 until m * kEff).map(_.toLong)
    val badCodeGen = for {
      pos <- Gen.choose(0, m - 1)
      bad <- Gen.oneOf(-1, kEff, kEff + 7, Int.MinValue, Int.MaxValue)
      good <- Gen.listOfN(m, Gen.choose(0, kEff - 1))
    } yield good.map(Int.box).updated(pos, Int.box(bad))
    val nullCodeGen = for {
      pos <- Gen.choose(0, m - 1)
      good <- Gen.listOfN(m, Gen.choose(0, kEff - 1))
    } yield good.map(Int.box).updated(pos, null: Integer)
    for (pq <- sample(badCodeGen, 15, 73L)) {
      val d = df(Seq(Row(lut, pq)), StructType(Seq(
        StructField("lut", ArrayType(LongType, containsNull = false)),
        StructField("pq", ArrayType(IntegerType, containsNull = true)))))
      val e = intercept[Exception](
        d.select(GraftFunctions.pqAdc(col("lut"), col("pq"), kEff)).collect())
      assert(e.toString.contains("corrupt") ||
        Option(e.getCause).exists(_.toString.contains("corrupt")), s"$pq -> $e")
    }
    for (pq <- sample(nullCodeGen, 10, 79L)) {
      val d = df(Seq(Row(lut, pq)), StructType(Seq(
        StructField("lut", ArrayType(LongType, containsNull = false)),
        StructField("pq", ArrayType(IntegerType, containsNull = true)))))
      val e = intercept[Exception](
        d.select(GraftFunctions.pqAdc(col("lut"), col("pq"), kEff)).collect())
      assert(e.toString.contains("NULL pq codes") ||
        Option(e.getCause).exists(_.toString.contains("NULL pq codes")), s"$pq -> $e")
    }
    // lut sized for the wrong m×kEff raises (a silent partial read
    // would return a wrong-but-plausible distance)
    val shortLut = (0 until (m - 1) * kEff).map(_.toLong)
    val d = df(Seq(Row(shortLut, (0 until m).map(Int.box))), StructType(Seq(
      StructField("lut", ArrayType(LongType, containsNull = false)),
      StructField("pq", ArrayType(IntegerType, containsNull = true)))))
    val e = intercept[Exception](
      d.select(GraftFunctions.pqAdc(col("lut"), col("pq"), kEff)).collect())
    assert(e.toString.contains("entries") ||
      Option(e.getCause).exists(_.toString.contains("entries")), e.toString)
  }
}
