package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite Hamming-distance similarity joins into the
  * pigeonhole-banded equi-join — the transformation
  * [[graft.operators.Dedup.simhashPairsBanded]] applies by hand,
  * surfaced to every plain-SQL query through
  * `SparkSessionExtensions.injectOptimizerRule` (registered by
  * [[graft.functions.GraftExtensions]], next to [[BandJoinRewrite]]).
  *
  * Pattern: an inner join whose condition contains
  * `bit_count(s1 ^ s2) <= k` (or `<`, or the reversed `>=`/`>`
  * spellings) for long/int attributes s1, s2 on OPPOSITE sides and a
  * small non-negative literal k. Without the rewrite that join has no
  * equi keys at all — Catalyst plans a cartesian nested loop, n²
  * signature comparisons AND (on a cluster) a full broadcast or
  * replicated shuffle of one side.
  *
  * Pigeonhole: split the 64 signature bits into k+1 disjoint bands;
  * two signatures within Hamming distance k MUST agree on at least one
  * band (k flipped bits cannot touch all k+1 bands). The rewrite
  * explodes each side to its k+1 `(band, band-key)` rows and joins on
  * band + key equality, keeping every original conjunct as residual —
  * the join becomes a hash join whose candidate volume tracks true
  * collisions, not n².
  *
  * Exactly-once semantics without a distinct: a pair agreeing in
  * SEVERAL bands would surface once per band, and a blanket
  * deduplication would break multiplicity for inputs with duplicate
  * rows. Instead the residual keeps only the FIRST matching band:
  * for every band j < k+1 the condition `band <= j OR band_j(s1) !=
  * band_j(s2)` is added (both signatures are in scope in the join
  * condition, so earlier bands' keys are recomputable there). Each
  * qualifying (row, row) pair then survives on exactly one band row —
  * output multiset identical to the quadratic join's
  * (HammingJoinRewriteSpec asserts equality both on results and on a
  * duplicate-row input).
  *
  * Guards:
  *   - k ≤ 8 (band fan-out is k+1 rows per side; past that the
  *     amplification outgrows the n² it saves at realistic n, and such
  *     thresholds are not near-dup semantics anyway);
  *   - joins already carrying this rule's band attribute are skipped
  *     (fixed-point guard);
  *   - streaming joins are skipped;
  *   - `spark.graft.hammingJoinRewrite.enabled=false` disables it.
  */
object HammingJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.hammingJoinRewrite.enabled"
  val BandName = "__graft_ham_band"
  val KeyName = "__graft_ham_key"
  val MaxDist = 8

  /** `bit_count(a ^ b) <= k` in any spelling → (a, b, k). */
  private object HammingBound {
    private object CountXor {
      def unapply(e: Expression): Option[(Attribute, Attribute)] = e match {
        case BitwiseCount(BitwiseXor(a: Attribute, b: Attribute)) =>
          Some((a, b))
        case _ => None
      }
    }
    private object KLit {
      def unapply(e: Expression): Option[Long] = e match {
        case Literal(v: Int, IntegerType) => Some(v.toLong)
        case Literal(v: Long, LongType)   => Some(v)
        case Cast(KLit(v), _, _, _)       => Some(v)
        case _ => None
      }
    }
    def unapply(e: Expression): Option[(Attribute, Attribute, Long)] =
      e match {
        case LessThanOrEqual(CountXor(a, b), KLit(k)) => Some((a, b, k))
        case LessThan(CountXor(a, b), KLit(k))        => Some((a, b, k - 1))
        case GreaterThanOrEqual(KLit(k), CountXor(a, b)) => Some((a, b, k))
        case GreaterThan(KLit(k), CountXor(a, b))     => Some((a, b, k - 1))
        case _ => None
      }
  }

  private def sigType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType => true
    case _ => false
  }

  private def alreadyBanded(cond: Expression): Boolean =
    cond.exists {
      case a: Attribute => a.name == BandName
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").toBoolean) return plan
    plan.transformUp {
      // Cross included: `crossJoin(...).where(hamming)` folds the
      // predicate into a Cross-type join with a condition — same
      // semantics as Inner, and exactly the spelling that most needs
      // the rewrite (it would otherwise PLAN as a cartesian)
      case j @ Join(left, right, Inner | Cross, Some(cond), _)
          if !left.isStreaming && !right.isStreaming &&
            !alreadyBanded(cond) =>
        findHamming(left, right, cond).map(rewrite(j, _)).getOrElse(j)
    }
  }

  private case class Ham(sLeft: Attribute, sRight: Attribute, k: Int)

  private def findHamming(left: LogicalPlan, right: LogicalPlan,
                          cond: Expression): Option[Ham] =
    splitConjunctivePredicates(cond).collectFirst {
      case HammingBound(a, b, k)
          if k >= 0 && k <= MaxDist &&
            sigType(a.dataType) && a.dataType == b.dataType &&
            ((left.outputSet.contains(a) && right.outputSet.contains(b)) ||
              (right.outputSet.contains(a) && left.outputSet.contains(b))) =>
        if (left.outputSet.contains(a)) Ham(a, b, k.toInt)
        else Ham(b, a, k.toInt)
    }

  /** Band j of a signature: bits [j·w, j·w + width_j) as a long key.
    * Bands tile all 64 bits (the last band absorbs the remainder), so
    * the pigeonhole argument covers any signature width. The shift is
    * arithmetic but the mask kills the sign-fill bits. */
  private def bandKey(sig: Expression, j: Int, bands: Int): Expression = {
    val w = 64 / bands
    val width = if (j == bands - 1) 64 - j * w else w
    val shifted = ShiftRight(Cast(sig, LongType), Literal(j * w))
    if (width >= 64) Cast(sig, LongType)
    else BitwiseAnd(shifted, Literal((1L << width) - 1L))
  }

  private def rewrite(j: Join, ham: Ham): LogicalPlan = {
    val Join(left, right, _, Some(cond), hint) = j
    val bands = ham.k + 1

    def banded(child: LogicalPlan, sig: Attribute)
        : (LogicalPlan, Attribute, Attribute) = {
      val rows = (0 until bands).flatMap { b =>
        Seq(Literal(b), bandKey(sig, b, bands))
      }
      val bAttr = AttributeReference(BandName, IntegerType,
        nullable = false)()
      val kAttr = AttributeReference(KeyName, LongType,
        nullable = sig.nullable)()
      val gen = Generate(
        Inline(CreateArray((0 until bands).map(b => CreateStruct(Seq(
          Literal(b), bandKey(sig, b, bands)))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bAttr, kAttr), child = child)
      (gen, bAttr, kAttr)
    }

    val (newLeft, bL, kL) = banded(left, ham.sLeft)
    val (newRight, bR, kR) = banded(right, ham.sRight)

    // first-matching-band residual: drop a band row when any EARLIER
    // band already matched (keys recomputed from the signatures)
    val firstMatch = (0 until bands - 1).map { jj =>
      Or(LessThanOrEqual(bL, Literal(jj)),
        Not(EqualTo(bandKey(ham.sLeft, jj, bands),
          bandKey(ham.sRight, jj, bands))))
    }
    val newCond = (Seq(cond, EqualTo(bL, bR), EqualTo(kL, kR)) ++ firstMatch)
      .reduce(And)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
  }
}
