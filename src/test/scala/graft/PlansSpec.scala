package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{ApproxDistinctRewrite, GraftFunctions, RollingHash64}

/** Native expression (codegen + interpreted + SQL registration) and
  * the approx-distinct optimizer rewrite. */
class PlansSpec extends SparkSuite {
  init()
  import spark.implicits._

  private def refHash(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))

  test("rolling_hash64: codegen path matches reference implementation") {
    GraftFunctions.register(spark)
    val inputs = Seq("", "a", "hello world", "ünïcodé ✓", "x" * 10000)
    val got = inputs.toDF("s")
      .select(GraftFunctions.rolling_hash64(col("s"))).as[Long].collect().toSeq
    assert(got == inputs.map(refHash))
  }

  test("rolling_hash64: interpreted eval matches too") {
    val e = RollingHash64(Literal(UTF8String.fromString("hello world")))
    assert(e.eval(null) == refHash("hello world"))
  }

  test("rolling_hash64: null in, null out") {
    GraftFunctions.register(spark)
    val got = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(GraftFunctions.rolling_hash64(col("s"))).collect()
    assert(got(0).isNullAt(0) && !got(1).isNullAt(0))
  }

  test("graft_dot: bit-identical to the HOF fold on real embeddings, null semantics match") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(200)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(5000)
    val mismatches = pairs.select(
      GraftFunctions.dot(col("a.embedding"), col("b.embedding")).as("native"),
      hofDot(col("a.embedding"), col("b.embedding")).as("hof"))
      .filter(!(col("native") <=> col("hof"))) // null-safe: both null is equal
      .count()
    assert(mismatches == 0, "native dot must be bit-identical to the HOF fold")

    // mixed element types (float embedding × double literal plane)
    val plane = typedlit(Seq.fill(64)(0.25))
    val planeMismatch = emb.select(
      GraftFunctions.dot(col("embedding"), plane).as("native"),
      hofDot(col("embedding"), plane).as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(planeMismatch == 0)

    // null array, null element, length mismatch → null (zip_with parity)
    val edge = Seq(
      (Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f)))),
      (None, Some(Seq(Some(1.0f)))),
      (Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(1.0f)))),
      (Some(Seq(Some(1.0f))), Some(Seq(Some(1.0f), Some(2.0f)))))
      .toDF("a", "b")
    val out = edge.select(GraftFunctions.dot(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(11.0), None, None, None))
  }

  test("graft_dot: nullable despite non-nullable children (length mismatch must not miscompile)") {
    GraftFunctions.register(spark)
    // array(lit..) children are non-nullable; pre-fix, DotProduct
    // inherited nullable=false from them, so the codegen null branch
    // assigned to a literal `false` (Janino error → fallback) and the
    // interpreted path leaked null through a nullable=false slot.
    val row = spark.range(1).select(
      GraftFunctions.dot(array(lit(1.0), lit(2.0)), array(lit(3.0))).as("mismatch"),
      GraftFunctions.dot(array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("ok"))
    val out = row.collect().head
    assert(out.isNullAt(0), "length mismatch must yield null")
    assert(out.getDouble(1) == 11.0)
    assert(row.schema("mismatch").nullable, "graft_dot must declare itself nullable")
  }

  test("graft_dot: decimal arrays are rejected at analysis, not at runtime") {
    GraftFunctions.register(spark)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(
        GraftFunctions.dot(
          array(lit(BigDecimal(1.5))), array(lit(BigDecimal(2.5))))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("decimal"))
  }

  test("graft_simhash_agg skips null-hash/null-weight rows (documented contract)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, Some(5L), Some(2L)),
      (1L, None, Some(7L)),      // null hash: skipped, NOT counted as 64 zero bits
      (1L, Some(9L), None),      // null weight: skipped
      (2L, Some(5L), Some(2L))).toDF("doc_id", "h", "w")
    val withNulls = rows.groupBy(col("doc_id"))
      .agg(GraftFunctions.simhash_agg(col("h"), col("w")).as("sig"))
    val withoutNulls = rows.filter(col("h").isNotNull && col("w").isNotNull)
      .groupBy(col("doc_id"))
      .agg(GraftFunctions.simhash_agg(col("h"), col("w")).as("sig"))
    val diff = withNulls.as("a").join(withoutNulls.as("b"), "doc_id")
      .filter(col("a.sig") =!= col("b.sig")).count()
    assert(diff == 0, "null-input rows must contribute nothing to the signature")
  }

  test("graft_simhash_agg equals the 64-column sum(when) formulation") {
    GraftFunctions.register(spark)
    val tok = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(graft.functions.Text.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("w"))
      .withColumn("h", GraftFunctions.rolling_hash64(col("token")))
    val viaAgg = tok.groupBy(col("doc_id"))
      .agg(GraftFunctions.simhash_agg(col("h"), col("w")).as("sig"))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, col("w"))
        .otherwise(-col("w"))).as(s"b$j")
    }
    val viaColumns = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("sig"))
    val diff = viaAgg.as("a").join(viaColumns.as("c"), "doc_id")
      .filter(col("a.sig") =!= col("c.sig")).count()
    assert(diff == 0, "custom aggregate must reproduce the column formulation exactly")
    assert(viaAgg.count() == 500)
  }

  test("graft_nfc: composes decomposed forms, idempotent, null-safe, codegen==interpreted") {
    GraftFunctions.register(spark)
    val cases = Seq(
      "e\u0301" -> "\u00e9",               // e + combining acute -> precomposed
      "cafe\u0301" -> "caf\u00e9",
      "\u00e9" -> "\u00e9",                 // already NFC
      "plain ascii" -> "plain ascii",
      "o\u0308o\u0308" -> "\u00f6\u00f6", // o + combining diaeresis x2
      "" -> "")
    val got = cases.map(_._1).toDF("s")
      .select(GraftFunctions.nfc(col("s"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
    // interpreted path
    val e = graft.plans.NfcNormalize(Literal(UTF8String.fromString("e\u0301")))
    assert(e.eval(null).toString == "\u00e9")
    // null in, null out
    val n = Seq[Option[String]](None).toDF("s")
      .select(GraftFunctions.nfc(col("s"))).collect()
    assert(n(0).isNullAt(0))
    // the fingerprint-unification use case: decomposed == precomposed after NFC
    val fp = Seq("cafe\u0301", "caf\u00e9").toDF("s")
      .select(GraftFunctions.rolling_hash64(GraftFunctions.nfc(col("s")))).as[Long]
      .collect()
    assert(fp(0) == fp(1), "NFC must unify the fingerprints")
  }

  test("rolling_hash64: SQL registration") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_rolling_hash64('hello world') AS h")
      .as[Long].collect().head
    assert(r == refHash("hello world"))
  }

  test("approx-distinct rewrite fires only under the flag") {
    val df = graft.sources.Tables.events(spark, sf0001)
      .agg(countDistinct(col("user_id")).as("n"))
    val analyzed = df.queryExecution.analyzed

    def hasHll(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.expressions.exists(_.exists(_.isInstanceOf[HyperLogLogPlusPlus]))

    spark.conf.set(ApproxDistinctRewrite.FLAG, "false")
    assert(!hasHll(ApproxDistinctRewrite(analyzed)))

    spark.conf.set(ApproxDistinctRewrite.FLAG, "true")
    try assert(hasHll(ApproxDistinctRewrite(analyzed)))
    finally spark.conf.set(ApproxDistinctRewrite.FLAG, "false")
  }

  test("approx-distinct rewrite end-to-end via extraOptimizations") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    spark.conf.set(ApproxDistinctRewrite.FLAG, "true")
    try {
      val exact = graft.sources.Tables.events(spark, sf0001)
        .select(col("user_id")).distinct().count()
      val approx = graft.sources.Tables.events(spark, sf0001)
        .agg(countDistinct(col("user_id")).as("n")).as[Long].collect().head
      // 15 distinct users at sf0.001; HLL++ at 5% SD is exact at this
      // cardinality, but allow sketch slack anyway
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.1).toLong))
    } finally {
      spark.conf.set(ApproxDistinctRewrite.FLAG, "false")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ApproxDistinctRewrite)
    }
  }

  test("approx-percentile rewrite fires only under the flag; sketch answer tracks exact") {
    import graft.plans.ApproxPercentileRewrite
    val events = graft.sources.Tables.events(spark, sf0001)
    val df = events.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.95)).as("p95"))
    val analyzed = df.queryExecution.analyzed
    def hasApprox(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile]))

    spark.conf.set(ApproxPercentileRewrite.FLAG, "false")
    assert(!hasApprox(ApproxPercentileRewrite(analyzed)))
    spark.conf.set(ApproxPercentileRewrite.FLAG, "true")
    try {
      assert(hasApprox(ApproxPercentileRewrite(analyzed)))
      // end-to-end: GK sketch at default accuracy vs the exact value
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxPercentileRewrite
      try {
        val approx = events.groupBy(col("event_type"))
          .agg(percentile(col("value"), lit(0.95)).as("p95"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        spark.conf.set(ApproxPercentileRewrite.FLAG, "false")
        val exact = events.groupBy(col("event_type"))
          .agg(percentile(col("value"), lit(0.95)).as("p95"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        exact.foreach { case (k, e) =>
          assert(math.abs(approx(k) - e) <= math.max(1.0, e * 0.05),
            s"$k: approx ${approx(k)} too far from exact $e")
        }
      } finally spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ApproxPercentileRewrite)
    } finally spark.conf.set(ApproxPercentileRewrite.FLAG, "false")
  }

  test("graft_qdot / graft_sqdist: identical to the HOF folds on int8 codes, null parity") {
    import spark.implicits._
    GraftFunctions.register(spark)
    def hofQdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, v) => acc + v)
    def hofSqd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y).cast("long") * (x - y).cast("long")),
        lit(0L), (acc, v) => acc + v)
    val q = graft.operators.Quantization.withInt8(
      graft.sources.Tables.embeddings(spark, sf0001).limit(100))
    val pairs = q.as("a").crossJoin(q.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(2000)
    val mismatches = pairs.select(
      GraftFunctions.qdot(col("a.q8"), col("b.q8")).as("nd"),
      hofQdot(col("a.q8"), col("b.q8")).as("hd"),
      GraftFunctions.sqdist(col("a.q8"), col("b.q8")).as("ns"),
      hofSqd(col("a.q8"), col("b.q8")).as("hs"))
      .filter(!(col("nd") <=> col("hd")) || !(col("ns") <=> col("hs")))
      .count()
    assert(mismatches == 0, "native integer kernels must match the HOF folds exactly")

    // null array, null element, length mismatch → null (zip_with parity)
    val edge = Seq(
      (Some(Seq(Some(1), Some(2))), Some(Seq(Some(3), Some(4)))),
      (None, Some(Seq(Some(1)))),
      (Some(Seq(Some(1), None)), Some(Seq(Some(1), Some(1)))),
      (Some(Seq(Some(1))), Some(Seq(Some(1), Some(2)))))
      .toDF("a", "b")
    val out = edge.select(
      GraftFunctions.qdot(col("a"), col("b")).as("d"),
      GraftFunctions.sqdist(col("a"), col("b")).as("s")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(out.toSeq == Seq((Some(11L), Some(8L)), (None, None), (None, None), (None, None)))
  }

  test("register(): all-names idempotence — a session missing ONE function re-registers the full set") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val fresh = spark.newSession()
    GraftFunctions.register(fresh)
    val reg = fresh.sessionState.functionRegistry
    // every declared native function resolves after one register()
    GraftFunctions.registrations.foreach { case (name, _) =>
      assert(reg.functionExists(FunctionIdentifier(name)), s"$name missing")
    }
    // simulate a session registered by an OLDER build that lacked one
    // function (any one - no positional marker contract exists now):
    // drop it and re-register; the full set must come back
    val victim = GraftFunctions.registrations.head._1
    reg.dropFunction(FunctionIdentifier(victim))
    assert(!reg.functionExists(FunctionIdentifier(victim)))
    GraftFunctions.register(fresh)
    GraftFunctions.registrations.foreach { case (name, _) =>
      assert(reg.functionExists(FunctionIdentifier(name)),
        s"$name missing after partial-registry re-register")
    }
  }
}
