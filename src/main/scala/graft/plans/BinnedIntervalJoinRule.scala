package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rewrite: inner joins whose condition carries a
  * [[RangeOverlap]] marker become the canonical-bin equi-join when both
  * sides are too large to broadcast (SURVEY §4 custom item 1, made
  * automatic).
  *
  * Shape produced (same as operators/RangeJoin.binnedOverlap, §7.3):
  *
  *   Join(cond && residual-overlap && canonical-bin)
  *     Generate(explode(sequence(floor(s1/B), floor(e1/B))), left)
  *     Generate(explode(sequence(floor(s2/B), floor(e2/B))), right)
  *
  * equi-key `binL = binR` turns the nested-loop join into a hash /
  * sort-merge join; the canonical-bin predicate
  * `binL == floor(max(s1,s2)/B)` de-duplicates pairs without a distinct.
  * Fallback-safe: when the rule does not fire (small side broadcastable,
  * non-inner join, non-numeric bounds) the marker simply evaluates as
  * the plain conjunction.
  */
case class BinnedIntervalJoinRule(binSize: Long = 1 << 16,
                                  broadcastThreshold: Long = 8L << 20)
  extends Rule[LogicalPlan] {

  private def floorDiv(e: Expression): Expression =
    Floor(Divide(Cast(e, org.apache.spark.sql.types.DoubleType), Literal(binSize.toDouble)))

  private def refsOf(e: Expression): AttributeSet = e.references

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty &&
          left.stats.sizeInBytes > BigInt(broadcastThreshold) &&
          right.stats.sizeInBytes > BigInt(broadcastThreshold) &&
          collectOverlap(cond, left, right).isDefined =>

      val (ro, s1, e1, s2, e2) = collectOverlap(cond, left, right).get

      val binL = AttributeReference("__bin_l", LongType, nullable = true)()
      val binR = AttributeReference("__bin_r", LongType, nullable = true)()

      // Sequence is TimeZoneAwareExpression: unresolved until a zone is set
      def binSeq(s: Expression, e: Expression) =
        new Sequence(floorDiv(s), floorDiv(e)).withTimeZone(conf.sessionLocalTimeZone)

      val genL = Generate(
        Explode(binSeq(s1, e1)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binL), child = left)
      val genR = Generate(
        Explode(binSeq(s2, e2)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binR), child = right)

      val canonical = EqualTo(binL, floorDiv(Greatest(Seq(s1, s2))))
      val newCond = And(And(replaceMarker(cond, ro), EqualTo(binL, binR)), canonical)

      Project(j.output,
        Join(genL, genR, Inner, Some(newCond), hint))
  }

  /** Find a RangeOverlap that is a TOP-LEVEL CONJUNCT of the join
    * condition (a marker under OR/NOT must not trigger the rewrite —
    * ANDing bin predicates would then drop valid pairs) with (s1,e1)
    * bound to `left` and (s2,e2) to `right` (or flipped — normalized).
    */
  private def collectOverlap(cond: Expression, left: LogicalPlan, right: LogicalPlan)
  : Option[(RangeOverlap, Expression, Expression, Expression, Expression)] = {
    val lOut = left.outputSet
    val rOut = right.outputSet
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other     => Seq(other)
    }
    conjuncts(cond).collectFirst {
      case ro @ RangeOverlap(s1, e1, s2, e2)
          if refsOf(s1).subsetOf(lOut) && refsOf(e1).subsetOf(lOut) &&
            refsOf(s2).subsetOf(rOut) && refsOf(e2).subsetOf(rOut) =>
        (ro, s1, e1, s2, e2)
      case ro @ RangeOverlap(s1, e1, s2, e2)
          if refsOf(s1).subsetOf(rOut) && refsOf(e1).subsetOf(rOut) &&
            refsOf(s2).subsetOf(lOut) && refsOf(e2).subsetOf(lOut) =>
        (ro, s2, e2, s1, e1)
    }
  }

  /** Swap the marker for its residual plain-predicate form. */
  private def replaceMarker(cond: Expression, target: RangeOverlap): Expression =
    cond.transform { case ro: RangeOverlap if ro.fastEquals(target) => ro.expanded }
}
