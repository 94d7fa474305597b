package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule: turn a naive bounded-interval join into the bucketized
  * range join (see `operators/RangeJoin` for the algebra).
  *
  * A user writing the natural SQL —
  * {{{ a JOIN b ON a.k = b.k AND abs(a.ts - b.ts) <= INTERVAL 5 MINUTES }}}
  * — gets a plan where the interval predicate is a post-join filter over
  * the per-key cartesian: 10⁶ events on one hot key is 10¹² intermediate
  * rows. This rule adds a time-bin equi-key: one side explodes into its 2
  * candidate window bins (fixed 2× amplification, skew-independent) and
  * the bin becomes part of the hash-join key, making the cartesian a hash
  * join; the original predicate stays as the exact residual.
  *
  * Recognized predicate shapes, all normalized to a band
  * `lo ≤ l.ts − r.ts ≤ hi` on one timestamp per side:
  *  - `abs(ts_l − ts_r) <= w` (µs-long or timestamp-subtract interval
  *    form) → band [−w, w];
  *  - conjunct pairs / BETWEEN bounding the same difference from both
  *    sides, e.g. `r.ts BETWEEN l.ts − w AND l.ts` — the naive BOUNDED
  *    AS-OF candidate join (`operators/AsOf` is the unbounded rescue) —
  *    strict `<`/`>` tighten the µs bound by 1.
  *
  * Correctness: with W = hi − lo and floor-division bins, a true match
  * has bin(r.ts) ∈ {q, q+1} where q = bin(l.ts − hi) — the candidate
  * span [l.ts−hi, l.ts−lo] is exactly W long, so it crosses at most one
  * bin boundary. The exploded bins are distinct and the other side keeps
  * a single bin, so no match duplicates; the rule only ADDS a conjunct
  * implied by the matched band, preserving every original conjunct as the
  * exact residual. Floor division is implemented as
  * `(a − pmod(a, W)) div W` — exact for negative µs too, so the proof
  * needs no epoch-positivity assumption.
  *
  * Join types: INNER explodes the statistically smaller side; RIGHT
  * OUTER explodes the left (non-preserved) side; LEFT OUTER / LEFT SEMI
  * / LEFT ANTI explode the right side, so preserved-side rows are never
  * duplicated and null-extension stays 1:1. FULL OUTER is skipped —
  * either explosion would duplicate a preserved side's null-extensions.
  *
  * Fires only when NEITHER side is small enough to broadcast (a
  * broadcast nested-loop over a tiny side beats two shuffles — the
  * rewrite targets big⋈big, where BNLJ is the disaster).
  */
object RewriteBoundedIntervalJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val BinL = "__graft_bin_l"
  private val BinR = "__graft_bin_r"

  private def supported(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, jt, Some(cond), hint)
        if supported(jt) && !j.isStreaming && notYetRewritten(j)
          && neitherBroadcastable(j)
          && hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
      findBandPredicate(splitConjunctivePredicates(cond), left, right) match {
        case Some((lts, rts, lo, hi)) if hi > lo =>
          val w = hi - lo
          val wLit = Literal(w, LongType)
          val one = Literal(1L, LongType)
          // exact floor division (IntegralDivide truncates toward zero,
          // which would misbin negative µs by one)
          def fdiv(a: Expression): Expression =
            IntegralDivide(Subtract(a, Pmod(a, wLit)), wLit)
          val lBin = fdiv(Subtract(UnixMicros(lts), Literal(hi, LongType)))
          val rBin = fdiv(UnixMicros(rts))
          val explodeLeft = jt match {
            case Inner => left.stats.sizeInBytes <= right.stats.sizeInBytes
            case RightOuter => true
            case _ => false // LeftOuter | LeftSemi | LeftAnti
          }
          if (explodeLeft) {
            val binLAttr = AttributeReference(BinL, LongType, nullable = true)()
            val exploded = Generate(
              Explode(CreateArray(Seq(lBin, Add(lBin, one)))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binLAttr), child = left)
            val newCond = And(cond, EqualTo(binLAttr, rBin))
            Project(j.output.toSeq, Join(exploded, right, jt, Some(newCond), hint))
          } else {
            val binRAttr = AttributeReference(BinR, LongType, nullable = true)()
            val exploded = Generate(
              Explode(CreateArray(Seq(Subtract(rBin, one), rBin))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binRAttr), child = right)
            val newCond = And(cond, EqualTo(lBin, binRAttr))
            Project(j.output.toSeq, Join(left, exploded, jt, Some(newCond), hint))
          }
        case _ => j
      }
  }

  /** One bound on the µs difference of a timestamp pair: (lts, rts,
    * isUpper, bound) normalized to `D = lts − rts {≤|≥} bound` with lts
    * from `left` and rts from `right`. Every comparator is first
    * normalized to `lhs ≤ rhs` (swapping operands for ≥/>), then parsed
    * in any of the authored shapes:
    *   - `unix_micros(a) − unix_micros(b) ≤ c` (either operand order);
    *   - `a − b ≤ INTERVAL ...` (SubtractTimestamps form);
    *   - `a ≤ b + INTERVAL ...` / `a + INTERVAL ... ≤ b`
    *     (TimestampAddInterval — how the optimizer canonicalizes
    *     `b − INTERVAL w`);
    *   - plain `a ≤ b` on two timestamps (the as-of "not after" side).
    */
  private def diffBound(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Boolean, Long)] = {
    def isTs(x: Expression): Boolean = x.dataType == TimestampType
    // "a ≤ b" as Some((x, y, c)) meaning x − y ≤ c
    def le(a: Expression, b: Expression): Option[(Expression, Expression, Long)] =
      (a, b) match {
        case (Subtract(UnixMicros(x), UnixMicros(y), _), Literal(c: Long, LongType)) =>
          Some((x, y, c))
        case (Literal(c: Long, LongType), Subtract(UnixMicros(x), UnixMicros(y), _)) =>
          Some((y, x, -c))
        case (SubtractTimestamps(x, y, _, _), Literal(c: Long, _: DayTimeIntervalType)) =>
          Some((x, y, c))
        case (Literal(c: Long, _: DayTimeIntervalType), SubtractTimestamps(x, y, _, _)) =>
          Some((y, x, -c))
        case (x, TimestampAddInterval(y, Literal(i: Long, _: DayTimeIntervalType), _))
            if isTs(x) && isTs(y) =>
          Some((x, y, i))
        case (TimestampAddInterval(x, Literal(i: Long, _: DayTimeIntervalType), _), y)
            if isTs(x) && isTs(y) =>
          Some((x, y, -i))
        case (x, y) if isTs(x) && isTs(y) => Some((x, y, 0L))
        case _ => None
      }
    // (x − y ≤ c, strict tightens integer µs by 1)
    val parsed: Option[(Expression, Expression, Long)] = e match {
      case LessThanOrEqual(a, b) => le(a, b)
      case GreaterThanOrEqual(a, b) => le(b, a)
      case LessThan(a, b) => le(a, b).map { case (x, y, c) => (x, y, c - 1) }
      case GreaterThan(a, b) => le(b, a).map { case (x, y, c) => (x, y, c - 1) }
      case _ => None
    }
    parsed.flatMap { case (x, y, c) =>
      if (x.references.isEmpty || y.references.isEmpty) None // literal side: a scan filter, not a band
      else if (x.references.subsetOf(left.outputSet)
        && y.references.subsetOf(right.outputSet))
        Some((x, y, true, c)) // upper: D = x − y ≤ c
      else if (x.references.subsetOf(right.outputSet)
        && y.references.subsetOf(left.outputSet))
        Some((y, x, false, -c)) // x − y ≤ c  ⟺  D = y − x ≥ −c
      else None
    }
  }

  /** A band `lo ≤ lts − rts ≤ hi`: either a single `abs(Δt) <= w`
    * conjunct, or an upper AND a lower bound on the same timestamp pair.
    */
  private def findBandPredicate(
      conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long, Long)] = {
    val fromAbs = conjuncts.iterator.map {
      case LessThanOrEqual(
            Abs(Subtract(UnixMicros(lt), UnixMicros(rt), _), _),
            Literal(w: Long, LongType)) =>
        orient(lt, rt, left, right).map { case (l, r) => (l, r, -w, w) }
      case LessThanOrEqual(
            Abs(SubtractTimestamps(lt, rt, _, _), _),
            Literal(w: Long, _: DayTimeIntervalType)) =>
        orient(lt, rt, left, right).map { case (l, r) => (l, r, -w, w) }
      case _ => None
    }.collectFirst { case Some(m) => m }
    fromAbs.orElse {
      val bounds = conjuncts.flatMap(diffBound(_, left, right))
      // group by the timestamp pair; a band needs both bound directions
      bounds.groupBy { case (lts, rts, _, _) =>
        (lts.canonicalized, rts.canonicalized)
      }.valuesIterator.flatMap { bs =>
        val uppers = bs.collect { case (_, _, true, c) => c }
        val lowers = bs.collect { case (_, _, false, c) => c }
        if (uppers.nonEmpty && lowers.nonEmpty)
          Some((bs.head._1, bs.head._2, lowers.max, uppers.min))
        else None
      }.find { case (_, _, lo, hi) => hi > lo }
    }
  }

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
