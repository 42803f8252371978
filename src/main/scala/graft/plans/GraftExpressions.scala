package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY §7.3: "custom Expression beats
  * UDF"). A Scala UDF boxes/unboxes through the encoder and is opaque
  * to codegen; these participate in whole-stage codegen directly.
  */

/** 64-bit polynomial rolling hash (Rabin–Karp style, base 1000003)
  * over the UTF-8 bytes of a string — the document-fingerprinting
  * primitive (SURVEY §2.10 fingerprint family). Unlike md5 it is a
  * single fused loop with no allocation, and unlike xxhash64 the
  * definition is trivially portable to any engine for oracle parity.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // the companion's static forwarder — same single definition as
      // the interpreted path and SimHashSig
      s"${ev.value} = graft.plans.RollingHash64.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  /** THE hash definition — interpreted eval, the codegen template and
    * [[SimHashSig]] all call this one method, so the three call sites
    * cannot drift: unsigned 64-bit polynomial fold, base 1000003,
    * over raw bytes. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }
}

/** Unicode NFC normalization — the canonical-composition pass every
  * text-curation pipeline runs before hashing/dedup (the same logical
  * document arrives both precomposed and decomposed from different
  * crawlers; without NFC they fingerprint differently and every
  * downstream dedup silently misses the pair). Spark has no builtin;
  * a native expression keeps it inside whole-stage codegen (the JDK's
  * Normalizer is the implementation — Unicode canonical composition
  * is version-stable for assigned codepoints, and DuckDB's
  * nfc_normalize applies the same UAX #15 algorithm, which is what
  * makes the oracle comparison exact). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfcNormalize.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.NfcNormalize.normalize($c.toString()));")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Fast path: already-NFC strings (the overwhelming majority of a
    * real corpus — all of ASCII trivially) return without allocating. */
  def normalize(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}

/** Fused dot product over two numeric arrays in double precision —
  * sequential fold, identical arithmetic to
  * `aggregate(zip_with(a,b,*), 0.0, +)` but one codegen'd loop with no
  * per-element lambda dispatch or intermediate array. This is the hot
  * inner operation of every pair-join vector query (near-dup, ANN
  * verify): millions of 64-dim dots per query at bench scale.
  * Null semantics match the HOF form: null array OR any null element
  * → null. */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, NumericType}

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Can return null even for non-null inputs (length mismatch, null
  // element), so nullability must not be inherited from the children.
  override def nullable: Boolean = true

  // Fixed-width numerics only: Decimal is not a java.lang.Number and has
  // no primitive ArrayData getter, so both eval paths would miscompile.
  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(_: DecimalType, _) => None
    case ArrayType(t: NumericType, _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two fixed-width numeric arrays (decimal unsupported), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  private def elemAsDouble(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      i: Int, t: org.apache.spark.sql.types.NumericType): Double = t match {
    case org.apache.spark.sql.types.FloatType => arr.getFloat(i).toDouble
    case org.apache.spark.sql.types.DoubleType => arr.getDouble(i)
    case org.apache.spark.sql.types.IntegerType => arr.getInt(i).toDouble
    case org.apache.spark.sql.types.LongType => arr.getLong(i).toDouble
    case org.apache.spark.sql.types.ShortType => arr.getShort(i).toDouble
    case org.apache.spark.sql.types.ByteType => arr.getByte(i).toDouble
    case other => // unreachable: checkInputDataTypes rejects decimal
      throw new IllegalStateException(s"$prettyName: unsupported element type $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    // zip_with null-pads the shorter side → the HOF form yields null on
    // length mismatch; preserve that.
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val (tx, ty) = (elemType(left).get, elemType(right).get)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += elemAsDouble(x, i, tx) * elemAsDouble(y, i, ty)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (tx, ty) = (elemType(left).get, elemType(right).get)
    def getter(arr: String, t: NumericType, i: String) = t match {
      case org.apache.spark.sql.types.FloatType => s"(double) $arr.getFloat($i)"
      case org.apache.spark.sql.types.DoubleType => s"$arr.getDouble($i)"
      case org.apache.spark.sql.types.IntegerType => s"(double) $arr.getInt($i)"
      case org.apache.spark.sql.types.LongType => s"(double) $arr.getLong($i)"
      case org.apache.spark.sql.types.ShortType => s"(double) $arr.getShort($i)"
      case org.apache.spark.sql.types.ByteType => s"(double) $arr.getByte($i)"
      case other => // unreachable: checkInputDataTypes rejects decimal
        throw new IllegalStateException(s"$prettyName: unsupported element type $other")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |boolean ${ev.isNull}_sawNull = $n != $b.numElements();
         |for (int $i = 0; !${ev.isNull}_sawNull && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull}_sawNull = true; break; }
         |  $acc += ${getter(a, tx, i)} * ${getter(b, ty, i)};
         |}
         |if (${ev.isNull}_sawNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

/** SimHash signature as ONE custom aggregate: accumulates the 64
  * weighted bit sums in a primitive long[64] buffer and packs the sign
  * bits at eval — replacing a 64-column `sum(when(bit, w).otherwise(-w))`
  * formulation whose aggregation buffer is 64 boxed struct fields and
  * whose update path evaluates 64 shift/branch expression trees per
  * row. Bit semantics match (bit j set iff its weighted sum > 0), with
  * one DELIBERATE difference on null input: rows with a null hash or
  * null weight are skipped entirely (standard aggregate null handling),
  * whereas the naive column form's `otherwise(-w)` branch would count a
  * null-hash row as 64 zero bits. Skipping is the correct contract — a
  * null token hash carries no signal — and in-repo callers
  * (Dedup.simhashPairs) only feed non-null hashes, where the two forms
  * are identical; PlansSpec pins that equivalence on null-free data and
  * the skip behavior on nulls.
  *
  * Completes the extension-tier matrix: scalar Expression
  * (RollingHash64, DotProduct), optimizer Rule (ApproxDistinctRewrite),
  * Strategy+Exec (TopKPerGroup), and now a TypedImperativeAggregate.
  */
case class SimHashAgg(
    hash: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hash, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType && weight.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint hash, bigint weight), got " +
        s"${hash.dataType.catalogString}, ${weight.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long],
      row: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val h = hash.eval(row)
    val w = weight.eval(row)
    if (h != null && w != null) {
      val hv = h.asInstanceOf[Long]
      val wv = w.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (if (((hv >> j) & 1L) == 1L) wv else -wv)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(hash = newChildren(0), weight = newChildren(1))
}

/** One-pass 64-bit SimHash of a token ARRAY — the per-row form of
  * [[SimHashAgg]]. Summing ±1 per token INSTANCE is arithmetically
  * identical to summing ±count per distinct token, so the signature
  * needs no (doc, token)-count aggregation at all: one map pass, no
  * explode, no shuffle (the same move `MinHashSig` made for the
  * MinHash tier). Token hash is `RollingHash64.hash` — the shared
  * static definition, so kernel and hash expression cannot drift
  * (DedupSpec pins kernel == aggregation form on the real corpus,
  * KernelFuzzSpec on random arrays). NULL for an empty array (a doc
  * with no tokens has no
  * signature — matching the aggregation form, where such docs produce
  * no rows) and for a null element (loud, like [[MinHashSig]]).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StringType => ST}

  override def prettyName: String = "graft_simhash_sig"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ST, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  /** The one signature loop, shared by both eval paths. */
  def sig(toks: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val n = toks.numElements()
    if (n == 0) return null
    val acc = new Array[Long](64)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val h = RollingHash64.hash(toks.getUTF8String(i).getBytes)
      var j = 0
      while (j < 64) {
        acc(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    sig(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashSig", this, classOf[SimHashSig].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("sig")
      s"""
         |Object $tmp = $self.sig($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $tmp).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SimHashSig =
    copy(child = c)
}

/** Per-row top-token fraction in integer ppm over a tokens array —
  * the native ONE-PASS form of the repetition gate's per-row mode
  * computation (Curation.topTokenPpmInline's original HOF spelling
  * was array_distinct + one filter-count per distinct token:
  * O(distinct·n) comparisons per document, in the streaming curation
  * funnel's per-row hot path where every ingested doc pays it; this
  * kernel is one hash-counting pass, O(n)).
  *
  * Contract (BIT-equal to the HOF form — KernelFuzzSpec pins it on
  * adversarial arrays):
  *  - empty array → 0 (not null — the funnel's `otherwise(0)` arm);
  *  - null ELEMENTS are never the mode (the HOF's `t === u` is null
  *    on null, so the filter dropped them) but still count in the
  *    denominator (`size` counts nulls) — an all-null array is 0;
  *  - value = floor(1e6 · (maxCount / n)) through the same two IEEE
  *    double ops as the column form, so the integer can never differ.
  * NULL INPUT is null here (UnaryExpression contract); the operator
  * wrapper coalesces to 0, the HOF `when`'s null-condition arm. */
case class TopTokenPpm(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StringType => ST}

  override def prettyName: String = "graft_top_token_ppm"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ST, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  /** The one counting loop, shared by both eval paths. */
  def ppm(toks: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = toks.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer](Math.min(n * 2, 1 << 16))
    var max = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val u = toks.getUTF8String(i)
        val prev = counts.get(u)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(u, Integer.valueOf(c))
        if (c > max) max = c
      }
      i += 1
    }
    math.floor(1000000.0 * (max.toDouble / n)).toLong
  }

  override protected def nullSafeEval(input: Any): Any =
    ppm(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("topTokenPpm", this, classOf[TopTokenPpm].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.ppm($a);")
  }

  override protected def withNewChildInternal(c: Expression): TopTokenPpm =
    copy(child = c)
}

/** Streaming NB scoring as a native kernel — the per-row form of the
  * Naive-Bayes quality filter (graft.functions.Text.nbScoreExpr) with
  * the vocab as an EXPRESSION-CONSTANT hash map instead of an
  * element_at over a literal map: Spark's map-literal lookup is a
  * linear key scan, so the HOF spelling cost O(doc_len · vocab) per
  * row — at the 4096-entry cap and web-length documents that is ~16M
  * comparisons per row in the funnel's hot path; this kernel is one
  * O(1) hash probe per token.
  *
  * Exactness contract (bit-equal to the decimal-accumulator HOF form,
  * hence to the batch join form — KernelFuzzSpec pins the first,
  * StreamingConsistencySpec the chain):
  *  - per-token weights are EXACT INTEGER MICROS of the round-6 llrs
  *    (a scale-6 decimal IS an integer number of micros), summed in a
  *    long — identical to the HOF's exact DECIMAL(27,6) accumulation
  *    (no overflow: |llr| ≤ ~20 → 2e7 micros/token, 2^53/2e7 ≈ 4.5e8
  *    tokens before toDouble exactness is even at risk);
  *  - the sum converts via one exact long→double + one correctly-
  *    rounded division by 1e6 — the nearest double of the same exact
  *    rational that Decimal(27,6).toDouble produces;
  *  - + prior is the same single IEEE add; the final round-6 stays in
  *    the COLUMN wrapper (Catalyst's own Round — not reimplemented);
  *  - null tokens take the OOV default (the HOF's element_at(map,
  *    null) → null → coalesce arm); empty arrays return prior (the
  *    wrapper's when-guard answers NULL before the kernel runs). */
case class NbScoreMicros(child: Expression, tokens: IndexedSeq[UTF8String],
    micros: IndexedSeq[Long], defaultMicros: Long, prior: Double)
  extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType => ST}

  require(tokens.length == micros.length,
    s"NbScoreMicros: ${tokens.length} tokens vs ${micros.length} weights")

  override def prettyName: String = "graft_nb_score_micros"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ST, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](tokens.length * 2)
    var i = 0
    while (i < tokens.length) { m.put(tokens(i), java.lang.Long.valueOf(micros(i))); i += 1 }
    m
  }

  /** The one scoring loop, shared by both eval paths. */
  def score(toks: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = toks.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) sum += defaultMicros
      else {
        val w = lookup.get(toks.getUTF8String(i))
        sum += (if (w == null) defaultMicros else w.longValue())
      }
      i += 1
    }
    sum.toDouble / 1e6 + prior
  }

  override protected def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nbScoreMicros", this, classOf[NbScoreMicros].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.score($a);")
  }

  override protected def withNewChildInternal(c: Expression): NbScoreMicros =
    copy(child = c)
}

/** Per-row BPE token counting as a native kernel — the r20 close of
  * the literal-map-scan sweep [[NbScoreMicros]] opened: the trained
  * (word → n_sym) table as an expression-constant hash map, summed in
  * one O(1)-probe-per-word pass. The HOF spelling it replaces
  * (Bpe.bpeTokenCount's `aggregate` + `element_at` over a map
  * literal) was a LINEAR key scan per word — O(doc_len · vocab) per
  * row at the 4096-entry vocab cap, on the corpus factory's BPE
  * admission gate and the q156 token-budget packing path.
  *
  * Contract (BIT-equal to the HOF form — KernelFuzzSpec pins it):
  *  - a word in the map adds its n_sym; a word OUTSIDE the map adds
  *    its CHARACTER length (UTF8String.numChars — exactly Catalyst's
  *    Length on strings; the zero-merges-applicable upper bound);
  *  - a NULL element poisons the whole sum to NULL (the HOF's
  *    `acc + coalesce(element_at(map, null), length(null))` — both
  *    arms NULL, and a NULL accumulator stays NULL), hence
  *    `nullable` is unconditionally true and codegen manages isNull;
  *  - empty array → 0 (the fold's zero); NULL array → NULL
  *    (UnaryExpression contract);
  *  - the sum is a Java long with the HOF's wrap-on-overflow. */
case class TokenCountSum(child: Expression, words: IndexedSeq[UTF8String],
    counts: IndexedSeq[Long]) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StringType => ST}

  require(words.length == counts.length,
    s"TokenCountSum: ${words.length} words vs ${counts.length} counts")

  override def prettyName: String = "graft_token_count_sum"
  override def dataType: DataType = LongType
  // a null ELEMENT yields NULL even under a non-null input array
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ST, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](words.length * 2)
    var i = 0
    while (i < words.length) { m.put(words(i), java.lang.Long.valueOf(counts(i))); i += 1 }
    m
  }

  /** The one counting loop, shared by both eval paths; boxed so the
    * null-element poison can surface as a real NULL. */
  def sum(toks: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Long = {
    val n = toks.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null // the HOF's poisoned accumulator
      val w = toks.getUTF8String(i)
      val c = lookup.get(w)
      s += (if (c == null) w.numChars().toLong else c.longValue())
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def nullSafeEval(input: Any): Any =
    sum(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenCountSum", this, classOf[TokenCountSum].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Long ${ev.value}_r = $self.sum($a);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")
  }

  override protected def withNewChildInternal(c: Expression): TokenCountSum =
    copy(child = c)
}

/** Long-keyed lookup-sum as a native kernel — the DSIR admission
  * score's per-gram half (Curation.dsirScore). The fitted ratio
  * table (≤ m hashed-bucket keys → log-ratio micros) becomes an
  * expression-constant hash map; the per-row cost drops from
  * O(grams · m) — `element_at` over an m-entry map LITERAL is a
  * linear key scan — to one O(1) probe per gram. The salted
  * bucket hash itself STAYS column algebra upstream (md5 +
  * rolling_hash64 + pmod, already native and codegen'd): the kernel
  * consumes the hashed array<bigint>, so the portable hash recipe
  * keeps one definition.
  *
  * Contract (BIT-equal to the HOF form — KernelFuzzSpec pins it):
  *  - a key in the map adds its value; a key outside adds `default`
  *    (dsirScore passes 0 — bigrams never seen at fit time);
  *  - a NULL element adds `default` too (the HOF's
  *    `coalesce(element_at(map, null), default)` arm — a NULL gram
  *    hashed to a NULL bucket);
  *  - empty array → 0 + nothing = the fold zero... exactly 0 only
  *    when the fold zero is 0: the HOF starts at `lit(0L)`, so the
  *    kernel starts at 0 and `default` applies per-element only;
  *  - NULL array → NULL (UnaryExpression contract); long arithmetic
  *    wraps like the HOF's. */
case class LongLookupSum(child: Expression, keys: IndexedSeq[Long],
    values: IndexedSeq[Long], default: Long) extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  require(keys.length == values.length,
    s"LongLookupSum: ${keys.length} keys vs ${values.length} values")

  override def prettyName: String = "graft_long_lookup_sum"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  @transient private lazy val lookup: java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](keys.length * 2)
    var i = 0
    while (i < keys.length) {
      m.put(java.lang.Long.valueOf(keys(i)), java.lang.Long.valueOf(values(i))); i += 1 }
    m
  }

  /** The one summing loop, shared by both eval paths. */
  def sum(xs: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = xs.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) s += default
      else {
        val v = lookup.get(java.lang.Long.valueOf(xs.getLong(i)))
        s += (if (v == null) default else v.longValue())
      }
      i += 1
    }
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    sum(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("longLookupSum", this, classOf[LongLookupSum].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.sum($a);")
  }

  override protected def withNewChildInternal(c: Expression): LongLookupSum =
    copy(child = c)
}

/** Bloom-filter bitmap as a custom aggregate: collects BIGINT bit
  * positions (already reduced mod m by the caller) into a packed
  * long[m/64] bitmap — build the filter from the benchmark/blocklist
  * side with one aggregation, broadcast the (m/8)-byte result, and
  * probe it with pure column arithmetic (Curation.bloomTest). Null
  * positions are skipped (standard aggregate null handling).
  *
  * Membership is EXACTLY "this position was inserted" — the bitmap is
  * a set of integers — so an engine-portable oracle can replay
  * membership as a semi-join on positions; false-positive behavior of
  * the k-hash Bloom built on top is then a pure function of the hash
  * family, reproducible anywhere (CurationSpec pins bitmap == semi-join).
  *
  * m must be a foldable positive multiple of 64 (the packing width).
  */
case class BloomBitmapAgg(
    pos: Expression,
    mExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  private lazy val m: Int = mExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(pos, mExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (pos.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint position, got ${pos.dataType.catalogString}")
    else if (mExpr.dataType != IntegerType || !mExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal int bit count")
    else if (mExpr.eval() == null || mExpr.eval().asInstanceOf[Int] <= 0 ||
      mExpr.eval().asInstanceOf[Int] % 64 != 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName bit count must be a positive multiple of 64")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m / 64)

  override def update(buf: Array[Long],
      row: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val p = pos.eval(row)
    if (p != null) {
      val pv = p.asInstanceOf[Long]
      require(pv >= 0 && pv < m, s"position $pv out of [0,$m)")
      buf((pv / 64).toInt) |= (1L << (pv % 64))
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBitmapAgg =
    copy(pos = newChildren(0), mExpr = newChildren(1))
}

/** Shared shape of the fused integer-array pair reductions below:
  * long accumulate over two integer-typed arrays with HOF-equivalent
  * null semantics (null array, null element, or zip_with-style length
  * mismatch → null). Inputs are expected bounded (int8 codes), so the
  * long accumulator cannot overflow; unlike the ANSI HOF form this
  * wraps silently if fed unbounded longs — callers keep it on codes.
  */
sealed trait IntArrayPairReduce
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, ByteType, IntegerType, LongType => LT, ShortType}

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  protected def elemType(e: Expression) = e.dataType match {
    case ArrayType(t @ (ByteType | ShortType | IntegerType | LT), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two integer-typed arrays, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  protected def elemAsLong(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      i: Int, t: DataType): Long = t match {
    case IntegerType => arr.getInt(i).toLong
    case LT => arr.getLong(i)
    case ShortType => arr.getShort(i).toLong
    case ByteType => arr.getByte(i).toLong
    case other =>
      throw new IllegalStateException(s"$prettyName: unsupported element type $other")
  }

  protected def getterJava(arr: String, t: DataType, i: String): String = t match {
    case IntegerType => s"(long) $arr.getInt($i)"
    case LT => s"$arr.getLong($i)"
    case ShortType => s"(long) $arr.getShort($i)"
    case ByteType => s"(long) $arr.getByte($i)"
    case other =>
      throw new IllegalStateException(s"$prettyName: unsupported element type $other")
  }

  /** Per-element contribution in the interpreted path. */
  protected def combine(x: Long, y: Long): Long
  /** Per-element contribution as a Java expression over `$x`/`$y`. */
  protected def combineJava(x: String, y: String): String

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val (tx, ty) = (elemType(left).get, elemType(right).get)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += combine(elemAsLong(x, i, tx), elemAsLong(y, i, ty))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (tx, ty) = (elemType(left).get, elemType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |boolean ${ev.isNull}_sawNull = $n != $b.numElements();
         |for (int $i = 0; !${ev.isNull}_sawNull && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull}_sawNull = true; break; }
         |  long $xv = ${getterJava(a, tx, i)};
         |  long $yv = ${getterJava(b, ty, i)};
         |  $acc += ${combineJava(xv, yv)};
         |}
         |if (${ev.isNull}_sawNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })
  }
}

/** Exact integer dot product of two integer arrays (int8 codes) as one
  * codegen'd loop — the native replacement for
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0L, +)`, whose HOF nodes are
  * CodegenFallback (they break whole-stage codegen AND cost seconds of
  * analyzer/codegen time when repeated k× in a k-means argmin tree). */
case class LongDot(left: Expression, right: Expression) extends IntArrayPairReduce {
  override def prettyName: String = "graft_qdot"
  override protected def combine(x: Long, y: Long): Long = x * y
  override protected def combineJava(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongDot = copy(left = newLeft, right = newRight)
}

/** Exact integer squared L2 distance — the k-means assignment kernel.
  * Same arithmetic as `aggregate(zip_with(a,b,(x,y)=>(x-y)²), 0L, +)`
  * on bounded int8 codes, one fused loop per centroid. */
case class SqDistLong(left: Expression, right: Expression) extends IntArrayPairReduce {
  override def prettyName: String = "graft_sqdist"
  override protected def combine(x: Long, y: Long): Long = (x - y) * (x - y)
  override protected def combineJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDistLong = copy(left = newLeft, right = newRight)
}

/** Full PQ encode — the m-subspace argmin against a literal codebook
  * as ONE native looped kernel. The previous formulation unrolled
  * m × kPq graft_sqdist calls into the expression tree (256 fused
  * kernels for the default 16×16 codebook): values were right, but
  * the generated projection method crossed Janino's 64 KB limit and
  * the WHOLE projection silently fell back to interpreted eval
  * ("Code grows beyond 64 KB" in the logs). A loop over a referenced
  * int[] generates ~30 lines regardless of m/kPq and stays inside
  * whole-stage codegen.
  *
  * `child` = the unit-int8 vector (array<int>, length m·subDim);
  * `codes` = the flattened codebook, codeword dim i of (subspace j,
  * codeword t) at [(j·kPq + t)·subDim + i]. Output: array<int>,
  * length m — per subspace the 0-based nearest codeword by exact
  * integer squared-L2, ties to the LOWEST index (strict `<` keeps
  * the first minimum — identical to the lexicographic struct-min of
  * the unrolled form and to the DuckDB oracle's `ORDER BY d2, t`).
  * A wrong-length input raises: it can only mean a corrupt persisted
  * row or a codebook/corpus dimension mismatch, and an argmin over
  * garbage would be silently wrong. */
case class PqEncode(child: Expression, m: Int, subDim: Int, kEff: Int,
    codes: IndexedSeq[Int]) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  require(m > 0 && subDim > 0 && kEff > 0 && codes.length == m * kEff * subDim,
    s"PqEncode: ${codes.length} codebook ints do not tile m=$m kEff=$kEff subDim=$subDim" +
      " (an empty or mis-shaped codebook would emit all-zero codes silently)")

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${other.catalogString}")
  }

  private def checkLen(n: Int): Unit =
    if (n != m * subDim) throw new IllegalStateException(
      s"$prettyName: vector has $n dims, codebook expects ${m * subDim}")

  @transient private lazy val flat: Array[Int] = codes.toArray

  /** The ONE scoring loop, called from both eval paths (the
    * PqAdcLookup.score pattern — a duplicated generated-Java copy of
    * the loop is exactly how interpreted/codegen rows drift apart;
    * the JIT compiles this monomorphic call site identically). */
  def encode(v: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    checkLen(v.numElements())
    val res = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Long.MaxValue
      var t = 0
      while (t < kEff) {
        val base = (j * kEff + t) * subDim
        var d = 0L
        var i = 0
        while (i < subDim) {
          val dv = v.getInt(j * subDim + i).toLong - flat(base + i)
          d += dv * dv
          i += 1
        }
        if (d < bestD) { bestD = d; best = t }
        t += 1
      }
      res(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(res)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.encode($a);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** Per-row MinHash signature — numHashes mins over one pass of the
  * shingle array, replacing the HOF form `array((0 until
  * numHashes).map(s => array_min(transform(sh, xxhash64(lit(s),
  * x)))))`, which walked the array numHashes times through
  * CodegenFallback lambda dispatch and allocated numHashes
  * intermediate arrays per row. Bit-identical values: Spark's
  * `xxhash64(lit(s), x)` folds seed 42 → hashInt(s) → string bytes,
  * so the per-seed prefix `hashInt(s, 42)` is a CONSTANT — it is
  * precomputed once at construction, and each (shingle, seed) pays
  * exactly the same `XXH64.hashUnsafeBytes` call the Catalyst
  * expression made. Output array<long> length numHashes; a null or
  * EMPTY shingle array (array_min of nothing has no integer value)
  * and null elements → null result. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StringType => ST}

  require(numHashes > 0, s"MinHashSig: numHashes=$numHashes")

  override def prettyName: String = "graft_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ST, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  // xxhash64(lit(s), x) = hashBytes(x, hashInt(s, 42)) — the seed
  // prefixes are constants of the expression
  @transient private lazy val seedHashes: Array[Long] =
    Array.tabulate(numHashes)(s =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(s, 42L))

  /** The one signature loop, shared by both eval paths (the
    * PqAdcLookup.score pattern). Null for empty input / null
    * elements. */
  def sig(sh: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val n = sh.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (sh.isNullAt(i)) return null
      val u = sh.getUTF8String(i)
      var s = 0
      while (s < numHashes) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes, seedHashes(s))
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def nullSafeEval(input: Any): Any =
    sig(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("sig")
      s"""
         |Object $tmp = $self.sig($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** The query half of factored ADC: the m×kEff integer distance TABLE
  * of one query's unit-int8 vector against every codeword —
  * lut[(j·kEff)+t] = ‖sub_j(q8u) − cw(j,t)‖². Computed ONCE per query
  * row (a serving batch has few queries), so the per-candidate cost
  * drops from m·subDim multiply-adds ([[graft.operators.Quantization
  * .adcDistVsQuery]]'s per-pair form) to the m lookups of
  * [[PqAdcLookup]] — the classic ADC factoring (Jégou et al.), and
  * the arithmetic the single-query path's driver-side table already
  * uses. Same flattened-codebook layout and construction contract as
  * [[PqEncode]]. */
case class PqLut(child: Expression, m: Int, subDim: Int, kEff: Int,
    codes: IndexedSeq[Int]) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  require(m > 0 && subDim > 0 && kEff > 0 && codes.length == m * kEff * subDim,
    s"PqLut: ${codes.length} codebook ints do not tile m=$m kEff=$kEff subDim=$subDim")

  override def prettyName: String = "graft_pq_lut"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${other.catalogString}")
  }

  private def checkLen(n: Int): Unit =
    if (n != m * subDim) throw new IllegalStateException(
      s"$prettyName: vector has $n dims, codebook expects ${m * subDim}")

  @transient private lazy val flat: Array[Int] = codes.toArray

  /** The one table loop, shared by both eval paths (the
    * PqAdcLookup.score pattern). */
  def lut(v: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    checkLen(v.numElements())
    val res = new Array[Long](m * kEff)
    var j = 0
    while (j < m) {
      var t = 0
      while (t < kEff) {
        val base = (j * kEff + t) * subDim
        var d = 0L
        var i = 0
        while (i < subDim) {
          val dv = v.getInt(j * subDim + i).toLong - flat(base + i)
          d += dv * dv
          i += 1
        }
        res(j * kEff + t) = d
        t += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(res)
  }

  override protected def nullSafeEval(input: Any): Any =
    lut(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.lut($a);")
  }

  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(child = c)
}

/** The candidate half of factored ADC: Σ_j lut[j·kEff + pq_j] — m
  * array lookups per candidate against the joined per-query
  * [[PqLut]] column. Bit-identical to summing the per-pair sqdist
  * terms (same longs, same j-ascending order).
  *
  * Null/corruption contract (matches the replaced
  * `adcDistVsQuery`'s loud raise): a NULL `pq` ROW or a NULL `pq`
  * ELEMENT raises — default null-propagation would make the corrupt
  * row's adc_dist NULL, which sorts FIRST under the ascending
  * shortlist ordering and silently crowds out genuine candidates; a
  * code outside [0, kEff) raises for the same reason. A NULL `lut`
  * (a null query vector, which nulled the distance in the old form
  * too) propagates NULL. */
case class PqAdcLookup(left: Expression, right: Expression, kEff: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType => LT}

  require(kEff > 0, s"PqAdcLookup: kEff=$kEff")

  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LT, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<int>), got ${l.catalogString} / ${r.catalogString}")
  }

  private def corrupt(code: Int): Nothing = throw new IllegalStateException(
    s"$prettyName: corrupt pq code $code outside [0,$kEff)")
  def corruptJava(code: Int): Unit = corrupt(code)
  def nullCodesJava(): Unit = throw new IllegalStateException(
    s"$prettyName: NULL pq codes — corrupt code table (a NULL distance " +
      "would silently dominate the ascending shortlist)")
  def sizeMismatchJava(lutLen: Int, m: Int): Unit =
    throw new IllegalStateException(
      s"$prettyName: lut has $lutLen entries, codes expect ${m * kEff}")

  /** Shared scoring loop — the single definition both eval paths
    * call, so interpreted and codegen rows cannot diverge. */
  def score(lut: org.apache.spark.sql.catalyst.util.ArrayData,
      pq: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val m = pq.numElements()
    if (lut.numElements() != m * kEff) sizeMismatchJava(lut.numElements(), m)
    var acc = 0L
    var j = 0
    while (j < m) {
      if (pq.isNullAt(j)) nullCodesJava()
      val code = pq.getInt(j)
      if (code < 0 || code >= kEff) corrupt(code)
      acc += lut.getLong(j * kEff + code)
      j += 1
    }
    acc
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val pqv = right.eval(input)
    if (pqv == null) nullCodesJava()
    val lutv = left.eval(input)
    if (lutv == null) null
    else score(lutv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      pqv.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcLookup].getName)
    val lutCode = left.genCode(ctx)
    val pqCode = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${pqCode.code}
        ${lutCode.code}
        if (${pqCode.isNull}) { $self.nullCodesJava(); }
        boolean ${ev.isNull} = ${lutCode.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = $self.score(${lutCode.value}, ${pqCode.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcLookup = copy(left = newLeft, right = newRight)
}

/** Shared shape of the int8 quantization kernels: one looped pass
  * over a float/double array, bit-identical to the HOF formulas they
  * replace (double accumulation in element order, half-up `floor(x +
  * 0.5)`, clamp to ±127) — but inside whole-stage codegen, where the
  * transform/aggregate HOF nodes are CodegenFallback (interpreted
  * lambda dispatch per element; the LongDot lesson applied to the
  * encode side). Null array OR any null element → null result (the
  * arrays are machine-generated; a null element means corrupt data,
  * and per-element null-passthrough would let garbage flow into
  * integer distances downstream). A NaN/Infinity element RAISES:
  * the HOF formulas' NaN behavior rode Spark's NaN-largest ordering
  * (quietly producing degenerate codes), Java's comparisons treat
  * NaN differently, and either way a non-finite embedding is corrupt
  * input whose codes would silently poison integer distances — so
  * the kernels define the case loudly instead of matching either
  * silent variant. Inputs are array<float|double> (the old formulas
  * cast any numeric element; integer-typed arrays now fail analysis
  * — quantizing int arrays was never meaningful). */
sealed trait FloatArrayQuantize extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

  override def nullable: Boolean = true

  def nonFiniteJava(x: Double): Unit = throw new IllegalStateException(
    s"$prettyName: non-finite embedding element $x — corrupt input " +
      "(codes from NaN/Infinity would silently poison integer distances)")

  protected def isFloatElem: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  protected def elemD(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      i: Int): Double =
    if (isFloatElem) arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** Unit-normalize then quantize with the FIXED ×127 scale — the PQ
  * code space (`Quantization.withUnitInt8`'s column): q8u_i =
  * clamp(⌊x_i/‖x‖·127 + 0.5⌋, ±127), zero-norm vectors code to
  * zeros. Output array<int> length d. */
case class UnitInt8Encode(child: Expression) extends FloatArrayQuantize {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def prettyName: String = "graft_unit_int8"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** The one quantize loop, shared by both eval paths (the
    * PqAdcLookup.score pattern). Null for null elements. */
  def encode(v: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = elemD(v, i)
      if (!java.lang.Double.isFinite(x)) nonFiniteJava(x)
      ss += x * x
      i += 1
    }
    val nrm = math.sqrt(ss)
    val res = new Array[Int](n)
    if (nrm != 0.0) {
      i = 0
      while (i < n) {
        res(i) = math.min(math.max(
          math.floor(elemD(v, i) / nrm * 127.0 + 0.5), -127.0), 127.0).toInt
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(res)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unitInt8", this, classOf[UnitInt8Encode].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("q8u")
      s"""
         |Object $tmp = $self.encode($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): UnitInt8Encode =
    copy(child = c)
}

/** Per-vector max-abs symmetric quantization (the FAISS/ONNX SQ8
  * shape, `Quantization.withInt8`'s columns) as ONE kernel returning
  * struct(scale double, q8 array<int>): scale = max|x|/127, q8_i =
  * clamp(⌊x_i/scale + 0.5⌋, ±127), zero-scale vectors code to
  * zeros. An EMPTY array → null result (the HOF form's array_max
  * returned a NULL scale there; a whole-null row is the nearest
  * defined equivalent and keeps downstream scaled products
  * null-propagating instead of silently zero). */
case class MaxAbsInt8Encode(child: Expression) extends FloatArrayQuantize {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

  override def prettyName: String = "graft_maxabs_int8"
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q8", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** The one quantize loop, shared by both eval paths (the
    * PqAdcLookup.score pattern). Null for empty input / null
    * elements. */
  def encode(v: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val n = v.numElements()
    if (n == 0) return null
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = math.abs(elemD(v, i))
      if (!java.lang.Double.isFinite(x)) nonFiniteJava(x)
      if (x > mx) mx = x
      i += 1
    }
    val scale = mx / 127.0
    val res = new Array[Int](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        res(i) = math.min(math.max(
          math.floor(elemD(v, i) / scale + 0.5), -127.0), 127.0).toInt
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale,
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(res)))
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("maxAbsInt8", this, classOf[MaxAbsInt8Encode].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("q8s")
      s"""
         |Object $tmp = $self.encode($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MaxAbsInt8Encode =
    copy(child = c)
}

object GraftFunctions {
  /** Literal-argument extraction for registry builders (the codebook
    * and size arguments of the PQ/minhash functions must fold at
    * resolution so they become expression constants). */
  private def litInt(fn: String, e: Expression): Int = {
    require(e.foldable, s"$fn: argument $e must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }
  private def litIntArray(fn: String, e: Expression): IndexedSeq[Int] = {
    require(e.foldable, s"$fn: codebook must be a literal")
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toIndexedSeq
  }
  private def litLong(fn: String, e: Expression): Long = {
    require(e.foldable, s"$fn: argument $e must be a literal")
    e.eval().asInstanceOf[Number].longValue()
  }
  private def litDouble(fn: String, e: Expression): Double = {
    require(e.foldable, s"$fn: argument $e must be a literal")
    e.eval().asInstanceOf[Number].doubleValue()
  }
  private def litUtf8Array(fn: String, e: Expression): IndexedSeq[UTF8String] = {
    require(e.foldable, s"$fn: vocab must be a literal")
    val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // clone: literal ArrayData may expose views over a shared buffer;
    // the expression keeps these as map keys for its lifetime
    (0 until ad.numElements()).map(i => ad.getUTF8String(i).clone())
  }
  private def litLongArray(fn: String, e: Expression): IndexedSeq[Long] = {
    require(e.foldable, s"$fn: weights must be a literal")
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toIndexedSeq
  }

  /** The full native-function set, name → builder. Additions go
    * anywhere in this list — [[register]] checks EVERY name, so no
    * positional/marker contract exists to violate (PlansSpec asserts
    * registry completeness against this list). */
  private[graft] val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_rolling_hash64" -> (exprs => RollingHash64(exprs.head)),
    "graft_dot" -> (exprs => DotProduct(exprs.head, exprs(1))),
    "graft_simhash_agg" ->
      (exprs => SimHashAgg(exprs.head, exprs(1)).toAggregateExpression()),
    "graft_simhash_sig" -> (exprs => SimHashSig(exprs.head)),
    "graft_bloom_agg" ->
      (exprs => BloomBitmapAgg(exprs.head, exprs(1)).toAggregateExpression()),
    "graft_qdot" -> (exprs => LongDot(exprs.head, exprs(1))),
    "graft_nfc" -> (exprs => NfcNormalize(exprs.head)),
    "graft_sqdist" -> (exprs => SqDistLong(exprs.head, exprs(1))),
    "graft_pq_encode" -> (exprs => {
      // (q8u, flatCodes literal, m literal, subDim literal) — the
      // codebook rides in as a foldable array literal and is
      // extracted ONCE at resolution into the expression's constant
      val flat = litIntArray("graft_pq_encode", exprs(1))
      val (m, sub) = (litInt("graft_pq_encode", exprs(2)), litInt("graft_pq_encode", exprs(3)))
      require(m > 0 && sub > 0 && flat.nonEmpty && flat.length % (m * sub) == 0,
        s"graft_pq_encode: ${flat.length} codebook ints do not tile m=$m subDim=$sub")
      PqEncode(exprs.head, m, sub, flat.length / (m * sub), flat)
    }),
    "graft_minhash_sig" -> (exprs =>
      MinHashSig(exprs.head, litInt("graft_minhash_sig", exprs(1)))),
    "graft_pq_lut" -> (exprs => {
      val flat = litIntArray("graft_pq_lut", exprs(1))
      val (m, sub) = (litInt("graft_pq_lut", exprs(2)), litInt("graft_pq_lut", exprs(3)))
      require(m > 0 && sub > 0 && flat.nonEmpty && flat.length % (m * sub) == 0,
        s"graft_pq_lut: ${flat.length} codebook ints do not tile m=$m subDim=$sub")
      PqLut(exprs.head, m, sub, flat.length / (m * sub), flat)
    }),
    "graft_pq_adc" -> (exprs =>
      PqAdcLookup(exprs.head, exprs(1), litInt("graft_pq_adc", exprs(2)))),
    "graft_unit_int8" -> (exprs => UnitInt8Encode(exprs.head)),
    "graft_maxabs_int8" -> (exprs => MaxAbsInt8Encode(exprs.head)),
    "graft_top_token_ppm" -> (exprs => TopTokenPpm(exprs.head)),
    "graft_nb_score_micros" -> (exprs => NbScoreMicros(exprs.head,
      litUtf8Array("graft_nb_score_micros", exprs(1)),
      litLongArray("graft_nb_score_micros", exprs(2)),
      litLong("graft_nb_score_micros", exprs(3)),
      litDouble("graft_nb_score_micros", exprs(4)))),
    "graft_token_count_sum" -> (exprs => TokenCountSum(exprs.head,
      litUtf8Array("graft_token_count_sum", exprs(1)),
      litLongArray("graft_token_count_sum", exprs(2)))),
    "graft_long_lookup_sum" -> (exprs => LongLookupSum(exprs.head,
      litLongArray("graft_long_lookup_sum", exprs(1)),
      litLongArray("graft_long_lookup_sum", exprs(2)),
      litLong("graft_long_lookup_sum", exprs(3)))))

  /** Register the native functions; idempotent. (Spark 4's Column API
    * is ColumnNode-based and its Expression bridge is private[sql],
    * so the Column surface goes through the function registry.)
    * The skip test checks EVERY name, not a sentinel: a long-lived
    * session registered by an older build that lacked a
    * newly-appended function re-registers the full set instead of
    * silently missing it (the former last-registered-marker contract
    * was one forgotten move away from unresolved-function errors). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (registrations.forall { case (name, _) => reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)) }) return
    registrations.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in") }
  }

  /** Column-level access; requires register(spark) once per session. */
  def rolling_hash64(c: Column): Column =
    call_function("graft_rolling_hash64", c)

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def simhash_agg(hash: Column, weight: Column): Column =
    call_function("graft_simhash_agg", hash, weight)

  def simhashSig(toks: Column): Column =
    call_function("graft_simhash_sig", toks)

  def bloom_agg(pos: Column, m: Int): Column =
    call_function("graft_bloom_agg", pos, org.apache.spark.sql.functions.lit(m))

  def qdot(a: Column, b: Column): Column = call_function("graft_qdot", a, b)

  def nfc(c: Column): Column = call_function("graft_nfc", c)

  def sqdist(a: Column, b: Column): Column = call_function("graft_sqdist", a, b)

  def pqEncode(q8u: Column, m: Int, subDim: Int, flatCodes: Seq[Int]): Column =
    call_function("graft_pq_encode", q8u,
      org.apache.spark.sql.functions.typedlit(flatCodes),
      org.apache.spark.sql.functions.lit(m),
      org.apache.spark.sql.functions.lit(subDim))

  def minhashSig(sh: Column, numHashes: Int): Column =
    call_function("graft_minhash_sig", sh,
      org.apache.spark.sql.functions.lit(numHashes))

  def pqLut(q8u: Column, m: Int, subDim: Int, flatCodes: Seq[Int]): Column =
    call_function("graft_pq_lut", q8u,
      org.apache.spark.sql.functions.typedlit(flatCodes),
      org.apache.spark.sql.functions.lit(m),
      org.apache.spark.sql.functions.lit(subDim))

  def pqAdc(lut: Column, pq: Column, kEff: Int): Column =
    call_function("graft_pq_adc", lut, pq,
      org.apache.spark.sql.functions.lit(kEff))

  def unitInt8(v: Column): Column = call_function("graft_unit_int8", v)

  def maxAbsInt8(v: Column): Column = call_function("graft_maxabs_int8", v)

  def topTokenPpm(toks: Column): Column =
    call_function("graft_top_token_ppm", toks)

  def nbScoreMicros(toks: Column, tokens: Seq[String], micros: Seq[Long],
      defaultMicros: Long, prior: Double): Column =
    call_function("graft_nb_score_micros", toks,
      org.apache.spark.sql.functions.typedlit(tokens),
      org.apache.spark.sql.functions.typedlit(micros),
      org.apache.spark.sql.functions.lit(defaultMicros),
      org.apache.spark.sql.functions.lit(prior))

  def tokenCountSum(toks: Column, words: Seq[String], counts: Seq[Long]): Column =
    call_function("graft_token_count_sum", toks,
      org.apache.spark.sql.functions.typedlit(words),
      org.apache.spark.sql.functions.typedlit(counts))

  def longLookupSum(xs: Column, keys: Seq[Long], values: Seq[Long],
      default: Long): Column =
    call_function("graft_long_lookup_sum", xs,
      org.apache.spark.sql.functions.typedlit(keys),
      org.apache.spark.sql.functions.typedlit(values),
      org.apache.spark.sql.functions.lit(default))
}
