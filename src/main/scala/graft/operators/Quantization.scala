package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the memory lever
  * that makes 100 TB-scale ANN serveable: a 64-dim float32 vector
  * (256 B) becomes 64 int8 codes plus one scale (~68 B), a ~3.7×
  * reduction, and candidate scoring becomes INTEGER dot products —
  * exact arithmetic with no float accumulation-order concerns, and
  * SIMD-friendly on every runtime.
  *
  * Scheme: symmetric per-vector max-abs scaling (the FAISS/ONNX SQ8
  * shape): scale = max|v|/127, code_i = clamp(⌊v_i/scale + 0.5⌋,
  * ±127). Half-up via floor — floor of an identical IEEE double is
  * identical in every engine, so codes are bit-reproducible anywhere
  * (banker's rounding is not: engines disagree on ties).
  */
object Quantization {

  /** Adds `scale` (double) and `q8` (array<int>, each in [-127,127]),
    * overwriting columns of those names if present; a null embedding
    * yields null scale/codes (rows pass through, not dropped).
    * Two-step on purpose: `scale` is materialized as a column first so
    * the per-element lambda references it — Catalyst does not CSE
    * inside higher-order-function lambdas, and inlining the array_max
    * would recompute it per element (O(d²) per row). */
  def withInt8(emb: DataFrame, v: String = "embedding"): DataFrame =
    emb.withColumn("scale",
        array_max(transform(col(v), x => abs(x.cast("double")))) / 127.0)
      .withColumn("q8",
        when(col("scale") === 0.0, transform(col(v), _ => lit(0)))
          .otherwise(transform(col(v), x =>
            least(greatest(floor(x.cast("double") / col("scale") + 0.5), lit(-127.0)),
              lit(127.0)).cast("int"))))

  /** Exact integer dot product of two int8 code arrays (no overflow:
    * d·127² needs only ~24+log₂(d) bits). Multiply by scaleA·scaleB to
    * recover the approximate float dot. */
  def qdot(a: Column, b: Column): Column =
    graft.plans.GraftFunctions.qdot(a, b)

  /** Per-vector relative reconstruction error, integer ppm:
    * ⌊1e6 · ‖v − q·s‖ / ‖v‖⌋. sqrt is IEEE-correctly-rounded (unlike
    * libm log/exp), and floor discretizes exactly, so the value is
    * engine-identical. */
  def reconErrPpm(v: Column, q8: Column, scale: Column): Column = {
    val sse = aggregate(
      zip_with(v, q8, (x, q) =>
        (x.cast("double") - q.cast("double") * scale) *
          (x.cast("double") - q.cast("double") * scale)),
      lit(0.0), (acc, x) => acc + x)
    val ss = aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    when(ss === 0.0, lit(0L))
      .otherwise(floor(lit(1000000.0) * sqrt(sse) / sqrt(ss)).cast("long"))
  }

  /** Quantized brute-force top-k vs the corpus vector `queryId`:
    * candidates ranked by the rescaled integer dot. The 100 TB shape:
    * the int8 corpus is ~3.7× smaller to scan, the query side is a
    * broadcast single row, and ranking plans as TakeOrderedAndProject.
    * Use as the cheap first pass in a two-stage (quantized scan →
    * exact re-rank of the shortlist) retrieval. */
  /** Two-stage retrieval: quantized integer-dot scan selects a
    * `shortlist`-sized candidate set, then ONLY those candidates are
    * re-ranked with exact float cosine. At 100 TB the expensive exact
    * pass touches `shortlist` rows instead of the corpus; with a
    * shortlist ~5× k the result matches the exact scan in practice
    * (QuantizationSpec pins it on the testdata), and the operator's
    * own semantics — "exact rerank of the quantized shortlist" — are
    * deterministic regardless. */
  def twoStageTopK(emb: DataFrame, queryId: Long, k: Int, shortlist: Int): DataFrame = {
    import graft.functions.Vectors
    val candidates = quantizedTopK(emb, queryId, shortlist).select("vec_id")
    val target = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    emb.join(broadcast(candidates), "vec_id")
      .crossJoin(broadcast(target))
      .select(col("vec_id"), col("label"),
        round(Vectors.cosine(col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  def quantizedTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val q = withInt8(emb)
    val target = q.filter(col("vec_id") === queryId)
      .select(col("q8").as("tq8"), col("scale").as("tscale"))
    q.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(target))
      .select(col("vec_id"), col("label"),
        qdot(col("q8"), col("tq8")).as("qdot_raw"),
        (col("scale") * col("tscale")).as("_ss"))
      .withColumn("simq", col("qdot_raw").cast("double") * col("_ss"))
      .orderBy(col("simq").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("qdot_raw"),
        round(col("simq"), 6).as("simq"))
  }
}
