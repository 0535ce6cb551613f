package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite band (time-proximity) joins into the
  * Δ-bucketed equi-join form — the same transformation
  * [[graft.operators.BandJoin]] applies by hand, surfaced to every
  * plain-SQL query through `SparkSessionExtensions.injectOptimizerRule`
  * (registered by [[graft.functions.GraftExtensions]]).
  *
  * Pattern: an inner join whose condition contains, for one attribute
  * pair (e from one side, l from the other),
  *   - a lower bound `l > e` / `l >= e` (either comparison direction),
  *   - an upper bound `l < e + δ` (any of: `l < e + δ`, `l - e < δ`,
  *     `e + δ > l`, ≤ variants; δ a positive literal — long, or an
  *     interval on timestamps).
  * Those bounds pin `l − e ∈ [0, δ]`, so `floor-ish(l/δ)` can differ
  * from `floor-ish(e/δ)` by at most one — the rewrite projects
  * `bucket = value div δ` on the later side, explodes
  * `[bucket, bucket+1]` on the earlier side, and adds the bucket
  * equality to the join keys, keeping EVERY original conjunct as the
  * residual. Output columns are unchanged (the buckets are projected
  * away), so results are identical row-for-row; the join stops
  * materializing every same-key pair (n² per key) and produces only
  * adjacent-bucket candidates. With no equi keys at all the win is
  * bigger still: a nested-loop/cartesian band join becomes a hash join
  * on the bucket.
  *
  * The `div` adjacency holds for NEGATIVE values too, truncating
  * division included: div is monotone and div(x + δ) ≤ div(x) + 1 for
  * every long x (asserted over negatives in BandJoinRewriteSpec), so
  * pre-1970 timestamps and negative long domains stay exact.
  *
  * Guards:
  *   - joins already bucketed (any equi key named `__…`, including this
  *     rule's own output — also the fixed-point loop guard) are skipped;
  *   - streaming joins are skipped (state-store keying and watermark
  *     eviction are tied to the author's equi keys);
  *   - `spark.graft.bandJoinRewrite.enabled=false` disables the rule.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.bandJoinRewrite.enabled"
  val BucketName = "__graft_band_bucket"

  /** (earlier, later) attribute pair of a lower-bound conjunct. */
  private object Lower {
    def unapply(e: Expression): Option[(Attribute, Attribute)] = e match {
      case GreaterThan(a: Attribute, b: Attribute)        => Some((b, a))
      case GreaterThanOrEqual(a: Attribute, b: Attribute) => Some((b, a))
      case LessThan(a: Attribute, b: Attribute)           => Some((a, b))
      case LessThanOrEqual(a: Attribute, b: Attribute)    => Some((a, b))
      case _ => None
    }
  }

  /** `e + δ` with δ a positive literal in the attribute's comparison
    * units (micros for timestamps, raw for longs). */
  private object AddDelta {
    def unapply(ex: Expression): Option[(Attribute, Long)] = ex match {
      case Add(a: Attribute, DeltaLit(d), _) => Some((a, d))
      case Add(DeltaLit(d), a: Attribute, _) => Some((a, d))
      case TimestampAddInterval(a: Attribute, DeltaLit(d), _) => Some((a, d))
      case _ => None
    }
  }

  /** Positive constant band width, as comparison-unit micros/longs. */
  private object DeltaLit {
    def unapply(ex: Expression): Option[Long] = ex match {
      case Literal(v: Long, LongType) if v > 0 => Some(v)
      case Literal(v: Int, IntegerType) if v > 0 => Some(v.toLong)
      case Literal(v: Long, _: DayTimeIntervalType) if v > 0 => Some(v)
      case Literal(iv: CalendarInterval, CalendarIntervalType)
          if iv.months == 0 && iv.days == 0 && iv.microseconds > 0 =>
        Some(iv.microseconds)
      case _ => None
    }
  }

  /** (earlier, later, δ) of an upper-bound conjunct. */
  private object Upper {
    def unapply(ex: Expression): Option[(Attribute, Attribute, Long)] =
      ex match {
        case LessThan(l: Attribute, AddDelta(e, d))           => Some((e, l, d))
        case LessThanOrEqual(l: Attribute, AddDelta(e, d))    => Some((e, l, d))
        case GreaterThan(AddDelta(e, d), l: Attribute)        => Some((e, l, d))
        case GreaterThanOrEqual(AddDelta(e, d), l: Attribute) => Some((e, l, d))
        case LessThan(Subtract(l: Attribute, e: Attribute, _), DeltaLit(d)) =>
          Some((e, l, d))
        case LessThanOrEqual(Subtract(l: Attribute, e: Attribute, _), DeltaLit(d)) =>
          Some((e, l, d))
        case GreaterThan(DeltaLit(d), Subtract(l: Attribute, e: Attribute, _)) =>
          Some((e, l, d))
        case GreaterThanOrEqual(DeltaLit(d), Subtract(l: Attribute, e: Attribute, _)) =>
          Some((e, l, d))
        case _ => None
      }
  }

  private def bandType(dt: DataType): Boolean = dt match {
    case TimestampType | LongType | IntegerType => true
    case _ => false
  }

  private def micros(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixMicros(e)
    case IntegerType   => Cast(e, LongType)
    case _             => e
  }

  private def alreadyBucketed(cond: Expression): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a: Attribute, _) if a.name.startsWith("__") => true
      case EqualTo(_, a: Attribute) if a.name.startsWith("__") => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if !left.isStreaming && !right.isStreaming &&
            !alreadyBucketed(cond) =>
        findBand(left, right, cond).map(rewrite(j, _)).getOrElse(j)
    }
  }

  /** earlier attr, later attr, δ — with the two attrs on opposite
    * sides of the join and both bounds present on the SAME pair. */
  private case class Band(earlier: Attribute, later: Attribute, delta: Long)

  private def findBand(left: LogicalPlan, right: LogicalPlan,
                       cond: Expression): Option[Band] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val lowers = conjuncts.collect { case Lower(e, l) => (e.exprId, l.exprId) }
    val uppers = conjuncts.collect { case Upper(e, l, d) => Band(e, l, d) }
    uppers.find { b =>
      bandType(b.earlier.dataType) &&
        b.earlier.dataType == b.later.dataType &&
        lowers.contains((b.earlier.exprId, b.later.exprId)) &&
        ((left.outputSet.contains(b.earlier) && right.outputSet.contains(b.later)) ||
          (right.outputSet.contains(b.earlier) && left.outputSet.contains(b.later)))
    }
  }

  private def rewrite(j: Join, band: Band): LogicalPlan = {
    val Join(left, right, _, Some(cond), hint) = j
    val earlierOnLeft = left.outputSet.contains(band.earlier)
    val earlyChild = if (earlierOnLeft) left else right
    val lateChild  = if (earlierOnLeft) right else left

    val bEarly = IntegralDivide(micros(band.earlier), Literal(band.delta))
    val bLate  = IntegralDivide(micros(band.later), Literal(band.delta))

    // earlier side probes its own bucket and the next one
    val bucketAttr = AttributeReference(
      BucketName, LongType, nullable = bEarly.nullable)()
    val newEarly = Generate(
      Explode(CreateArray(Seq(bEarly, Add(bEarly, Literal(1L))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bucketAttr), child = earlyChild)

    val lateAlias = Alias(bLate, BucketName)()
    val newLate = Project(lateChild.output :+ lateAlias, lateChild)

    val newCond = And(cond, EqualTo(bucketAttr, lateAlias.toAttribute))
    val newJoin =
      if (earlierOnLeft) Join(newEarly, newLate, Inner, Some(newCond), hint)
      else Join(newLate, newEarly, Inner, Some(newCond), hint)
    Project(j.output, newJoin)
  }
}
