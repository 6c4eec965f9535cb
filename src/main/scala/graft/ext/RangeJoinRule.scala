package graft.ext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule that makes naive interval joins scale: an INNER join
  * whose only cross-side predicates are `pt >= start AND pt < end` (no
  * equi-key) can't hash-partition, so Spark executes it as a broadcast
  * nested loop — O(|P|·|I|) compares and a full broadcast, hopeless at
  * 100 TB. This rule rewrites the logical plan into the bucketized
  * form [[graft.ops.RangeJoin]] exposes as a helper:
  *
  *   points get `floor(pt/B)`; intervals are replicated to every
  *   bucket they overlap (`explode(sequence(...))`); the join becomes
  *   an equi-join on the bucket with the original predicate kept as a
  *   residual filter.
  *
  * After the rewrite `ExtractEquiJoinKeys` sees a hash key, so the
  * physical plan is a shuffled hash/sort-merge join — AQE-skewable,
  * codegen'd. The rewritten join carries a cross-side equality, which
  * the matcher rejects, so the rule is idempotent under the optimizer's
  * fixed-point driver.
  *
  * Bucket width comes from `spark.graft.rangejoin.bucketSize` (default
  * 64): set it near the typical interval span — each interval is
  * replicated `span/B + 1` times, so too small explodes the build side
  * and too large degrades bucket selectivity toward the nested loop.
  * Only integral (int/long) bounds are rewritten; anything else is
  * left untouched.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BucketSizeConf = "spark.graft.rangejoin.bucketSize"

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (point, lower, upper) with `point` side-local to one child and the
    * bounds side-local to the other — or None when the shape is absent. */
  private def matchBounds(conjuncts: Seq[Expression], left: LogicalPlan,
                          right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def sideOf(e: Expression): Option[Boolean] = // Some(true)=left-only
      if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
      else None
    // normalize every comparison to (smaller, larger, strict)
    val ordered = conjuncts.collect {
      case GreaterThanOrEqual(a, b) => (b, a, false)
      case LessThanOrEqual(a, b) => (a, b, false)
      case GreaterThan(a, b) => (b, a, true)
      case LessThan(a, b) => (a, b, true)
    }
    val lowers = ordered.collect { // start <= pt (inclusive)
      case (lo, pt, false) if sideOf(lo).isDefined && sideOf(pt).isDefined &&
        sideOf(lo) != sideOf(pt) => (pt, lo)
    }
    val uppers = ordered.collect { // pt < end (strict)
      case (pt, hi, true) if sideOf(hi).isDefined && sideOf(pt).isDefined &&
        sideOf(hi) != sideOf(pt) => (pt, hi)
    }
    (for {
      (pt, lo) <- lowers
      (pt2, hi) <- uppers
      if pt.semanticEquals(pt2) && sideOf(lo) == sideOf(hi)
      if integral(pt) && integral(lo) && integral(hi)
    } yield (pt, lo, hi)).headOption
  }

  /** True when any conjunct equates expressions across the two sides —
    * then a hash key already exists (or this rule produced the join). */
  private def hasEquiKey(conjuncts: Seq[Expression], left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && {
          val cs = splitConjunctivePredicates(cond)
          !hasEquiKey(cs, left, right) && matchBounds(cs, left, right).isDefined
        } =>
      val bucket = conf.getConfString(BucketSizeConf, "64").toLong max 1L
      val cs = splitConjunctivePredicates(cond)
      val Some((pt, lo, hi)) = matchBounds(cs, left, right)
      val ptOnLeft = pt.references.subsetOf(left.outputSet)
      val (pSide, iSide) = if (ptOnLeft) (left, right) else (right, left)

      def bucketOf(x: Expression): Expression =
        Floor(Divide(Cast(x, DoubleType), Literal(bucket.toDouble)))

      val pAlias = Alias(bucketOf(pt), "_graft_bucket_p")()
      val pPlan = Project(pSide.output :+ pAlias, pSide)
      val iAttr = AttributeReference("_graft_bucket_i", LongType,
        nullable = false)()
      // Sequence is TimeZoneAwareExpression — without an explicit zone it
      // stays unresolved and the optimizer's plan validator rejects it.
      val seq = Sequence(bucketOf(lo),
          bucketOf(Subtract(hi, Cast(Literal(1), hi.dataType))), None)
        .withTimeZone(conf.sessionLocalTimeZone)
      val iPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(iAttr),
        child = Filter(GreaterThan(hi, lo), iSide))

      val (newLeft, newRight) = if (ptOnLeft) (pPlan, iPlan) else (iPlan, pPlan)
      val newJoin = Join(newLeft, newRight, Inner,
        Some(And(EqualTo(pAlias.toAttribute, iAttr), cond)), hint)
      Project(j.output, newJoin)
  }
}
