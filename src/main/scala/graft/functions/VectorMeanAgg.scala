package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: elementwise mean of `array<float>` vectors — the
  * centroid step of an IVF/k-means index build (SURVEY §2.9's
  * "custom Aggregator" tier).
  *
  * Buffer is (sum-vector in double, count); merge is elementwise — the
  * aggregation is associative/commutative so Spark computes partial
  * aggregates map-side and merges per partition, shipping one
  * (dim-doubles, long) buffer per group per partition instead of raw rows.
  *
  * Generic in the input row type: pass an extractor for the vector field,
  * e.g. `new VectorMean[(Int, Array[Float])](_._2).toColumn`.
  */
class VectorMean[IN](vec: IN => Array[Float])
    extends Aggregator[IN, (Array[Double], Long), Array[Double]] with Serializable {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  // dimensions must agree: silently truncating to the shorter vector
  // would make both the centroid length AND its values depend on which
  // row/partition arrived first — a nondeterministic result across runs.
  // Mixed-dimension input is a data bug; fail loudly where it's visible.
  private def requireSameDim(have: Int, got: Int): Unit =
    require(have == got,
      s"VectorMean: mixed vector dimensions in one group ($have vs $got)")

  override def reduce(b: (Array[Double], Long), row: IN): (Array[Double], Long) = {
    val a = vec(row)
    if (a == null) b
    else {
      val acc = if (b._1.isEmpty) new Array[Double](a.length) else b._1
      requireSameDim(acc.length, a.length)
      var i = 0
      while (i < acc.length) { acc(i) += a(i); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      requireSameDim(x._1.length, y._1.length)
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0) Array.empty[Double] else b._1.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(VectorMean.doubleArray, Encoders.scalaLong)
  override def outputEncoder: Encoder[Array[Double]] = VectorMean.doubleArray
}

object VectorMean {
  private[functions] val doubleArray: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
