package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: dot product of two `array<bigint>` columns
  * in pure long arithmetic — the integer sibling of [[DotProductF]].
  *
  * Built for the quantized-vector operators (emb_kmeans): squared-L2
  * distance expands to `|a|² − 2a·b + |b|²`, so one codegen'd dot-product
  * loop replaces the `aggregate(zip_with(...))` higher-order formulation,
  * which is CodegenFallback — per ROW it allocates an intermediate array
  * and interprets two lambdas per element (measured: the interpreted form
  * made emb_kmeans 40 s at the 100× SF; this loop + staged centroids take
  * it to ~3 s). Long accumulation is associative and overflow-free for
  * the ×2^20 quantization (per-term ≤ 2^42, 64-dim sum ≤ 2^48).
  *
  * Assumes non-null elements. Length mismatch throws: callers feed this
  * fixed-width vector columns (quantized embeddings, collect_list-built
  * centroids), where a width mismatch means upstream dimension drift —
  * truncating to the shorter array would yield a plausible-looking wrong
  * distance and silently corrupt every ranking built on it.
  */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_l expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_l"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"dot_l: array length mismatch (${n} vs ${y.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_l: array length mismatch (" + $n + " vs " +
         |    $b.numElements() + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductL =
    copy(left = newLeft, right = newRight)
}

object DotProductL {
  import org.apache.spark.sql.graft.Bridge

  /** Column-API entry point (Spark 4 Column <-> catalyst bridge). */
  def dotL(a: Column, b: Column): Column =
    Bridge.column(DotProductL(Bridge.expression(a), Bridge.expression(b)))
}
