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
