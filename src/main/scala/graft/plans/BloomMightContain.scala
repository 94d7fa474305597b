package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Probabilistic membership test against a BROADCAST Bloom filter — the
  * executor side of [[graft.operators.BloomJoin]]'s pre-shuffle join
  * pruning.
  *
  * Why an Expression and not a UDF: the test sits on the fact-table scan's
  * hot path (every row, before any shuffle), so it must stay inside
  * whole-stage codegen. `doGenCode` resolves the broadcast ONCE into a
  * per-task mutable slot and emits a direct `mightContainLong` call — no
  * per-row broadcast lookups, no boxing, no codegen fence.
  *
  * Why a `Broadcast[BloomFilter]` and not inline bytes: the filter for a
  * 10⁸-key dimension is ~100 MB at 1% fpp; broadcast ships it once per
  * executor (torrent), while a literal in the expression tree would be
  * re-serialized into every task binary.
  *
  * May return false positives (callers MUST re-verify with an exact join);
  * never false negatives — that contract is what makes the pruned plan's
  * results exactly equal to the unpruned plan's.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a BIGINT key, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    // deserialize the broadcast value once per task, not once per row
    val filter = ctx.addMutableState(classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $filter.mightContainLong($k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graft.Bridge

  def mightContain(key: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(key), bloom))
}
