package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over ArrayType(FloatType) embedding columns.
  * Built on zip_with/aggregate (sequential fold → deterministic order,
  * codegen'd) with element-wise cast to double BEFORE multiplying so
  * results are engine-portable at full precision.
  */
object Vectors {

  /** Sequential-fold dot product in double precision — the native
    * codegen'd DotProduct expression (one fused loop; identical
    * arithmetic and null semantics to the
    * aggregate(zip_with(cast,cast)) HOF form it replaces, which paid a
    * lambda dispatch plus an intermediate array per row). Requires
    * GraftFunctions.register (done by every session constructor). */
  def dot(a: Column, b: Column): Column = graft.plans.GraftFunctions.dot(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0-norm guard returns null (no such vectors in
    * the testdata, but the guard costs nothing). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm2(a) * norm2(b)
    when(nn === 0.0, lit(null)).otherwise(d / nn)
  }

  /** Deterministic pseudo-random hyperplane component for LSH —
    * integer arithmetic only, so any engine reproduces it exactly:
    * h(j,i) = (((j*dim+i) * 2654435761) mod 1000) / 499.5 - 1  ∈ [-1,1).
    * (2654435761 = Knuth's multiplicative hash constant.) */
  def hyperplane(j: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(i => (((j.toLong * dim + i) * 2654435761L) % 1000L) / 499.5 - 1.0)

  /** Deterministic Johnson-Lindenstrauss random projection: `outDim`
    * dot products against the SAME integer-deterministic hyperplanes
    * the sign-bit LSH uses (so any engine reproduces the projection
    * exactly — the oracle replays it), scaled by 1/√outDim (the JL
    * normalization that preserves pairwise distances in expectation)
    * and rounded to 6 for cross-engine parity.
    *
    * The 100 TB use: shrink WIDE embeddings (≥512-dim, where JL's
    * (1±ε) distance bound has room — ε ~ √(ln n / outDim)) to a
    * cheaper sketch before clustering / blocking / k-NN passes;
    * per-row cost is outDim fused dot products, no shuffle, and
    * downstream pair work scales with the reduced width.
    *
    * HONEST LIMITS (measured on the 64-dim near-isotropic testdata,
    * which has no width to spare): projecting 64→16/32 destroys fine
    * neighbor structure — projected-space top-10 overlap with the
    * exact top-10 is 0-2/10, and even a 100-candidate projected
    * shortlist recovers only ~60% of the true top-10, where PQ at the
    * SAME byte budget recovers 9-10/10 (q132 ladder). For retrieval
    * over narrow embeddings use the PQ tier; reach for this only when
    * input width is large relative to intrinsic dimension. */
  def randomProject(emb: Column, inDim: Int, outDim: Int): Column =
    array((0 until outDim).map { j =>
      round(dot(emb, typedlit(hyperplane(j, inDim).toSeq)) /
        math.sqrt(outDim.toDouble), 6)
    }: _*)

  /** Sign-bit LSH bucket id from `nBits` deterministic hyperplanes.
    * At scale this is the shuffle key for bucketed ANN: vectors
    * co-partition by bucket and candidate search stays local. */
  def lshBucket(emb: Column, dim: Int, nBits: Int): Column =
    (0 until nBits).map { j =>
      // typedlit emits ONE array literal (vs array(lit...) building a
      // CreateArray of `dim` children that codegen re-assembles).
      val plane = typedlit(hyperplane(j, dim).toSeq)
      when(dot(emb, plane) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
