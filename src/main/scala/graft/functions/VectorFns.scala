package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * higher-order functions so it stays inside codegen (no UDF).
  *
  * All arithmetic is done in double precision with a strict left-to-right
  * fold (`aggregate`), which makes results bit-deterministic and portable
  * across engines that fold arrays in order (e.g. DuckDB list lambdas) —
  * important for oracle-checked top-k where ranking ties matter.
  */
object VectorFns {

  /** Elementwise product then ordered sum: dot(a, b) in double.
    * Native codegen'd expression (`graft.plans.DotProductF`) — bit-identical
    * to the higher-order-function formulation `dotHof`, ~an order of
    * magnitude cheaper (no intermediate array, no lambda interpretation).
    */
  def dot(a: Column, b: Column): Column = graft.plans.DotProductF.dotF(a, b)

  /** Reference formulation of `dot` via built-in higher-order functions;
    * kept for cross-checking the native expression bit-for-bit.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na > 0 && nb > 0, d / (na * nb))
  }

  /** Sign-bit LSH bucket over `nBits` leading dimensions: bit i set iff
    * vec[i] > 0. Axis-aligned random-hyperplane LSH — deterministic,
    * engine-portable, and a real cosine LSH family. 2^nBits buckets.
    */
  def signBucket(a: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(a, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
