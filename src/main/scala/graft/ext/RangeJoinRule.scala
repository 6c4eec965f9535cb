package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Exact floor-division bucket id: `floorDiv(x, bucket)` on longs.
  * Double math (`floor(x / B.toDouble)`) misassigns buckets once |x|
  * exceeds 2^53 (nanosecond epochs, hashed keys): the point and its
  * containing interval can land one bucket apart and the match is
  * silently dropped. `Math.floorDiv` is exact over the whole long
  * domain and rounds toward -infinity for negatives, so point and
  * interval bucketization always agree. Codegen'd — it runs per point
  * row, the hot side of the join. */
case class FloorDivBucket(child: Expression, bucket: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any): Any = x match {
    case i: java.lang.Integer => Math.floorDiv(i.longValue(), bucket)
    case l: java.lang.Long => Math.floorDiv(l.longValue(), bucket)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = java.lang.Math.floorDiv((long) $x, ${bucket}L);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Per-row router for the bucketized range join: an interval `[lo, hi)`
  * spanning `n` buckets is replicated `n` times by the rewrite, so one
  * open-ended sentinel row (`hi = Long.MaxValue`) would explode into
  * billions of generated rows and OOM a query the nested loop would
  * have completed. `keepNarrow = true` passes intervals spanning fewer
  * than `maxRep` buckets (the bucketized path); `keepNarrow = false`
  * passes the rest (kept on the original nested-loop path, where a
  * handful of pathological rows is harmless). Empty (`hi <= lo`) and
  * null-bounded intervals match no point and are dropped from both
  * paths. Also serves as the rewrite's idempotence marker: the rule
  * skips any join whose subtree already contains this guard.
  * Interpreted eval (CodegenFallback) — it runs once per interval row,
  * the cold side. */
case class RangeSpanGuard(lo: Expression, hi: Expression, bucket: Long,
    maxRep: Long, keepNarrow: Boolean)
    extends Expression with Predicate with CodegenFallback {
  override def children: Seq[Expression] = Seq(lo, hi)
  override def nullable: Boolean = false
  private def asLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long => l.longValue()
  }
  override def eval(input: InternalRow): Any = {
    val l = lo.eval(input)
    val h = hi.eval(input)
    if (l == null || h == null) false
    else {
      val lv = asLong(l)
      val hv = asLong(h)
      if (hv <= lv) false
      else {
        // buckets spanned minus one; saturate on (pathological) overflow
        val reps =
          try Math.subtractExact(
            Math.floorDiv(hv - 1L, bucket), Math.floorDiv(lv, bucket))
          catch { case _: ArithmeticException => Long.MaxValue }
        if (keepNarrow) reps < maxRep else reps >= maxRep
      }
    }
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(lo = c(0), hi = c(1))
}

/** Optimizer rule that makes naive interval joins scale: an INNER join
  * whose only cross-side predicates are `pt >= start AND pt < end` (no
  * equi-key) can't hash-partition, so Spark executes it as a broadcast
  * nested loop — O(|P|·|I|) compares and a full broadcast, hopeless at
  * 100 TB. This rule rewrites the logical plan into the bucketized
  * form [[graft.ops.RangeJoin]] exposes as a helper:
  *
  *   points get `floorDiv(pt, B)` ([[FloorDivBucket]] — exact integral
  *   math, correct beyond 2^53); intervals spanning fewer than
  *   `spark.graft.rangejoin.maxBuckets` buckets are replicated to every
  *   bucket they overlap (`explode(sequence(...))`); the join becomes
  *   an equi-join on the bucket with the original predicate kept as a
  *   residual filter. Wider intervals (open-ended sentinels, whole-
  *   domain ranges) stay on the original nested-loop path — routed
  *   per row by [[RangeSpanGuard]] and unioned back, so the rewrite
  *   never replicates an interval more than `maxBuckets` times and the
  *   result set is exactly the naive join's. The wide side carries a
  *   broadcast hint: by construction it holds only the handful of
  *   pathological rows. The union's wide branch does reference the
  *   point side a second time; in the common zero-wide-intervals case
  *   AQE's empty-relation propagation collapses that branch at runtime
  *   once the broadcast side materializes empty, so the steady-state
  *   cost is the interval-side guard scan, not a second point scan.
  *
  * After the rewrite `ExtractEquiJoinKeys` sees a hash key, so the
  * physical plan is a shuffled hash/sort-merge join — AQE-skewable,
  * codegen'd. The rewritten equi-join carries a cross-side equality
  * (rejected by the matcher) and both branches carry a
  * [[RangeSpanGuard]] (rejected by the subtree scan), so the rule is
  * idempotent under the optimizer's fixed-point driver even if another
  * rule reconstructs the join nodes.
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
  val MaxBucketsConf = "spark.graft.rangejoin.maxBuckets"

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
    conjuncts.exists { c =>
      // EqualNullSafe too: ExtractEquiJoinKeys plans `<=>` as a hash
      // key just like `=`, so such a join needs no bucket rewrite
      val pair = c match {
        case EqualTo(a, b) => Some((a, b))
        case EqualNullSafe(a, b) => Some((a, b))
        case _ => None
      }
      pair.exists { case (a, b) =>
        // both sides must actually REFERENCE their side: a literal's
        // empty reference set is a subset of anything, and `col = 5`
        // is a pushable filter, not a cross-side hash key
        (a.references.nonEmpty && b.references.nonEmpty) &&
          ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))
      }
    }

  /** True when THIS join is the wide-path join the rule created: its
    * interval child carries a [[RangeSpanGuard]] filter above any
    * nested join. Traversal stops at Join boundaries on purpose — a
    * guard inside a nested join belongs to a DIFFERENT (already
    * rewritten) range join, and treating it as ours would leave a
    * second range join stacked above the first one un-rewritten (a
    * silent nested-loop regression). Predicates only move down a plan,
    * so the wide join's own guard stays above its child joins in all
    * but the pathological case of the guard being pushable below a
    * join inside the interval side — where a re-rewrite produces a
    * redundant (empty-narrow) but still correct plan. */
  private def containsGuard(p: LogicalPlan): Boolean = p match {
    case _: Join => false
    case f: Filter if f.condition.exists(_.isInstanceOf[RangeSpanGuard]) => true
    case other => other.children.exists(containsGuard)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !containsGuard(left) && !containsGuard(right) =>
      // split + match ONCE, branch on the result: the old shape re-ran
      // the full matcher in both the pattern guard and the body, with an
      // irrefutable destructure that would MatchError if they drifted
      val cs = splitConjunctivePredicates(cond)
      val bounds =
        if (hasEquiKey(cs, left, right)) None
        else matchBounds(cs, left, right)
      bounds match {
        case None => j
        case Some((pt, lo, hi)) =>
      val bucket = conf.getConfString(BucketSizeConf, "64").toLong max 1L
      val maxRep = conf.getConfString(MaxBucketsConf, "256").toLong max 1L
      val ptOnLeft = pt.references.subsetOf(left.outputSet)
      val (pSide, iSide) = if (ptOnLeft) (left, right) else (right, left)

      def bucketOf(x: Expression): Expression =
        FloorDivBucket(if (x.dataType == LongType) x else Cast(x, LongType),
          bucket)

      // narrow path: bucketized equi-join
      val pAlias = Alias(bucketOf(pt), "_graft_bucket_p")()
      val pPlan = Project(pSide.output :+ pAlias, pSide)
      val iAttr = AttributeReference("_graft_bucket_i", LongType,
        nullable = false)()
      // Sequence is TimeZoneAwareExpression — without an explicit zone it
      // stays unresolved and the optimizer's plan validator rejects it.
      // Evaluated above the narrow guard, so hi > lo holds and hi-1 is
      // overflow-safe; length is < maxBuckets by the guard.
      val seq = Sequence(bucketOf(lo),
          bucketOf(Subtract(hi, Cast(Literal(1), hi.dataType))), None)
        .withTimeZone(conf.sessionLocalTimeZone)
      val iPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(iAttr),
        child = Filter(
          RangeSpanGuard(lo, hi, bucket, maxRep, keepNarrow = true), iSide))
      val (nl, nr) = if (ptOnLeft) (pPlan, iPlan) else (iPlan, pPlan)
      val narrowJoin = Join(nl, nr, Inner,
        Some(And(EqualTo(pAlias.toAttribute, iAttr), cond)), hint)

      // wide path: the (few) intervals too wide to replicate keep the
      // original nested-loop join, broadcast from the wide side. Both
      // subtrees are re-aliased to fresh exprIds first — reusing the
      // narrow branch's instances would give the Union a self-union
      // shape (identical attribute ids in both children), which rules
      // that assume per-branch-unique ids can mis-rewrite.
      val pAliases = pSide.output.map(a => Alias(a, a.name)())
      val iAliases = iSide.output.map(a => Alias(a, a.name)())
      val remap = AttributeMap((pSide.output ++ iSide.output).zip(
        (pAliases ++ iAliases).map(_.toAttribute)))
      def rm(e: Expression): Expression = e.transform {
        case a: Attribute => remap.getOrElse(a, a)
      }
      val wideI = Filter(
        rm(RangeSpanGuard(lo, hi, bucket, maxRep, keepNarrow = false)),
        Project(iAliases, iSide))
      val bHint = Some(HintInfo(strategy = Some(BROADCAST)))
      val pFresh = Project(pAliases, pSide)
      val (wl, wr) = if (ptOnLeft) (pFresh, wideI) else (wideI, pFresh)
      val wideHint = if (ptOnLeft) JoinHint(None, bHint) else JoinHint(bHint, None)
      val wideJoin = Join(wl, wr, Inner, Some(rm(cond)), wideHint)

      Union(Seq(Project(j.output, narrowJoin),
        Project(j.output.map(a => remap.getOrElse(a, a)), wideJoin)))
      }
  }
}
