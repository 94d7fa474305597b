package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType}

/** Optimizer rule: turn a naive bounded-interval join into the bucketized
  * range join (see `operators/RangeJoin` for the algebra).
  *
  * A user writing the natural SQL —
  * {{{ a JOIN b ON a.k = b.k AND abs(a.ts - b.ts) <= INTERVAL 5 MINUTES }}}
  * — gets a plan where the interval predicate is a post-join filter over
  * the per-key cartesian: 10⁶ events on one hot key is 10¹² intermediate
  * rows. This rule adds a time-bin equi-key: the left side explodes into
  * its 3 candidate window bins (fixed 3× amplification, skew-independent)
  * and the bin becomes part of the hash-join key, making the cartesian a
  * hash join; the original predicate stays as the exact residual.
  *
  * Correctness: bin(t) = t div w has boundaries ≥ w apart, so two
  * timestamps within w cross at most one boundary — every true match
  * lands in exactly one of the left row's {b−1, b, b+1} bins (and the
  * three exploded bins are distinct, so no match duplicates). The rule
  * only ADDS a conjunct implied by the matched predicate; all original
  * conjuncts are preserved verbatim.
  *
  * Fires only when: inner batch join, a conjunct of shape
  * `abs(ts_l - ts_r) <= literal-window` spans the two sides (µs-long or
  * timestamp-subtract interval form), and NEITHER side is small enough
  * to broadcast (a broadcast nested-loop over a tiny side beats two
  * shuffles — the rewrite targets big⋈big, where BNLJ is the disaster).
  */
object RewriteBoundedIntervalJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val BinL = "__graft_bin_l"
  private val BinR = "__graft_bin_r"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.isStreaming && notYetRewritten(j) && neitherBroadcastable(j)
          && hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
      val conjuncts = splitConjunctivePredicates(cond)
      findIntervalPredicate(conjuncts, left, right) match {
        case Some((ltsTs, rtsTs, w)) if w > 0 =>
          val wLit = Literal(w, LongType)
          def bin(ts: Expression): Expression =
            IntegralDivide(UnixMicros(ts), wLit)
          val base = bin(ltsTs)
          val binLAttr = AttributeReference(BinL, LongType, nullable = true)()
          val exploded = Generate(
            Explode(CreateArray(Seq(
              Subtract(base, Literal(1L, LongType)),
              base,
              Add(base, Literal(1L, LongType))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binLAttr), child = left)
          val binRAlias = Alias(bin(rtsTs), BinR)()
          val projR = Project(right.output :+ binRAlias, right)
          val newCond = And(cond, EqualTo(binLAttr, binRAlias.toAttribute))
          Project(j.output.toSeq,
            Join(exploded, projR, Inner, Some(newCond), hint))
        case _ => j
      }
  }

  /** A conjunct `abs(Δt) <= w` with one timestamp per side, in either the
    * µs-long form (`abs(unix_micros(l) - unix_micros(r)) <= 3000000L`) or
    * the native interval form (`abs(l - r) <= INTERVAL 3 SECONDS`).
    * Returns (left-side ts, right-side ts, window µs).
    */
  private def findIntervalPredicate(
      conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] =
    conjuncts.iterator.map {
      case LessThanOrEqual(
            Abs(Subtract(UnixMicros(lt), UnixMicros(rt), _), _),
            Literal(w: Long, LongType)) =>
        orient(lt, rt, left, right).map { case (l, r) => (l, r, w) }
      case LessThanOrEqual(
            Abs(SubtractTimestamps(lt, rt, _, _), _),
            Literal(w: Long, _: DayTimeIntervalType)) =>
        orient(lt, rt, left, right).map { case (l, r) => (l, r, w) }
      case _ => None
    }.collectFirst { case Some(m) => m }

  /** Orient (a, b) so the first element references only `left` and the
    * second only `right` — `abs` makes the predicate symmetric.
    */
  private def orient(a: Expression, b: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[(Expression, Expression)] =
    if (a.references.subsetOf(left.outputSet)
      && b.references.subsetOf(right.outputSet)) Some((a, b))
    else if (b.references.subsetOf(left.outputSet)
      && a.references.subsetOf(right.outputSet)) Some((b, a))
    else None

  /** Re-entry guard for the fixed-point batch: the rewritten join carries
    * the bin attributes in its children's output.
    */
  private def notYetRewritten(j: Join): Boolean =
    !(j.left.output.exists(_.name == BinL)
      || j.right.output.exists(_.name == BinR))

  private def neitherBroadcastable(j: Join): Boolean = {
    val threshold = SQLConf.get.autoBroadcastJoinThreshold
    threshold < 0 ||
      (j.left.stats.sizeInBytes > threshold
        && j.right.stats.sizeInBytes > threshold)
  }
}
