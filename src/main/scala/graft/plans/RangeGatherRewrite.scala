package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a bounded-range gather join into an exploded
  * equi-join (SURVEY.md §4.3's candidate rule, now implemented).
  *
  * A patch-gather join
  * {{{ samples JOIN peaks ON s.idx >= p.peak - A AND s.idx < p.peak + B }}}
  * has no equi-key, so Spark executes it as a BroadcastNestedLoopJoin:
  * O(|samples| × |peaks|) predicate evaluations — the asymptotic cliff at
  * scale. But when A and B are literals, the range enumerates exactly
  * A+B integer offsets, so the join is equivalent to
  * {{{
  * samples JOIN (peaks LATERAL VIEW explode(sequence(-A, B-1)) off)
  *         ON s.idx = p.peak + off
  * }}}
  * — a hash equi-join (broadcast or shuffled, Spark's choice): one scan
  * of samples, one probe per row, at the price of fanning the peak side
  * out ×(A+B). For any |samples| > A+B this wins; the rewrite is gated on
  * A+B <= [[RangeGatherRewrite.MaxWidth]].
  *
  * Fires only on Inner joins whose condition is EXACTLY the two range
  * conjuncts (plus any residual conjuncts that stay as post-join
  * filters), on LongType keys, with one side of each bound referencing
  * only one join child. Enabled via [[graft.GraftExtensions]] or
  * `spark.experimental.extraOptimizations`.
  */
object RangeGatherRewrite extends Rule[LogicalPlan] {

  /** Max enumerated offsets (fan-out of the exploded side). */
  val MaxWidth = 4096L

  private case class Bound(sample: Expression, peak: Expression, k: Long)

  /** `e` as `sample >= peak + k` (inclusive lower bound), if it is one. */
  private def asLower(e: Expression): Option[Bound] = e match {
    case GreaterThanOrEqual(s, r) => offsetOf(r).map { case (p, k) => Bound(s, p, k) }
    case GreaterThan(s, r) => offsetOf(r).map { case (p, k) => Bound(s, p, k + 1) }
    case LessThanOrEqual(r, s) => offsetOf(r).map { case (p, k) => Bound(s, p, k) }
    case LessThan(r, s) => offsetOf(r).map { case (p, k) => Bound(s, p, k + 1) }
    case _ => None
  }

  /** `e` as `sample <= peak + k` (inclusive upper bound), if it is one. */
  private def asUpper(e: Expression): Option[Bound] = e match {
    case LessThanOrEqual(s, r) => offsetOf(r).map { case (p, k) => Bound(s, p, k) }
    case LessThan(s, r) => offsetOf(r).map { case (p, k) => Bound(s, p, k - 1) }
    case GreaterThanOrEqual(r, s) => offsetOf(r).map { case (p, k) => Bound(s, p, k) }
    case GreaterThan(r, s) => offsetOf(r).map { case (p, k) => Bound(s, p, k - 1) }
    case _ => None
  }

  /** `peak ± literal` decomposed to (peak, signed offset). Integral
    * literal types only (Catalyst inserts casts for mixed widths, so by
    * the time the optimizer sees the join both sides share a type).
    * Any other expression is the ZERO-offset form `(e, 0)` — without this
    * fallback the common one-sided gather `s >= p && s < p + B` (lower
    * bound with no Add) never decomposes and silently stays a
    * BroadcastNestedLoopJoin. A spurious decomposition is harmless: the
    * caller still requires a matching lower/upper pair on semantically
    * equal (sample, peak) with bounded positive width before rewriting. */
  private def offsetOf(e: Expression): Option[(Expression, Long)] = e match {
    case Add(p, IntegralLiteral(k), _) => Some((p, k))
    case Add(IntegralLiteral(k), p, _) => Some((p, k))
    case Subtract(p, IntegralLiteral(k), _) => Some((p, -k))
    case _ => Some((e, 0L))
  }

  private object IntegralLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(k: Long, LongType) => Some(k)
      case Literal(k: Int, IntegerType) => Some(k.toLong)
      case Literal(k: Short, ShortType) => Some(k.toLong)
      case _ => None
    }
  }

  private def integralType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) && e.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      val lowers = conjuncts.flatMap(c => asLower(c).map(c -> _))
      val uppers = conjuncts.flatMap(c => asUpper(c).map(c -> _))
      val rewrite = (for {
        (lc, lo) <- lowers
        (uc, up) <- uppers
        if lc != uc
        if lo.sample.semanticEquals(up.sample) && lo.peak.semanticEquals(up.peak)
        if integralType(lo.sample.dataType) && lo.sample.dataType == lo.peak.dataType
        width = up.k - lo.k + 1
        if width > 0 && width <= MaxWidth
        // sample on one child, peak wholly on the other
        (sampleSide, peakSide) <- (
          if (refsOnly(lo.sample, left) && refsOnly(lo.peak, right)) Some((left, right))
          else if (refsOnly(lo.sample, right) && refsOnly(lo.peak, left)) Some((right, left))
          else None
        )
        // no existing equi-conjunct between the sides (those plans already
        // hash-join; don't inflate them)
        if !conjuncts.exists {
          case EqualTo(a, b) =>
            (refsOnly(a, left) && refsOnly(b, right)) || (refsOnly(a, right) && refsOnly(b, left))
          case _ => false
        }
      } yield (lc, uc, lo, up, width, sampleSide, peakSide)).headOption

      rewrite match {
        case Some((lc, uc, lo, up, width, _, peakSide)) =>
          val off = AttributeReference("__graft_gather_offset", lo.sample.dataType, nullable = false)()
          // Sequence is TimeZoneAwareExpression: without an explicit zone
          // it is unresolved and plan validation rejects the rewrite.
          // Bounds are emitted in the KEY's integral type so the
          // generated equi-key needs no cast.
          val keyType = lo.sample.dataType
          def litOf(v: Long): Literal = keyType match {
            case IntegerType => Literal(v.toInt)
            case ShortType => Literal(v.toShort)
            case _ => Literal(v)
          }
          val seq = new Sequence(litOf(lo.k), litOf(up.k), Some(litOf(1L)))
            .withTimeZone(conf.sessionLocalTimeZone)
          val gen = Generate(
            Explode(seq),
            unrequiredChildIndex = Nil,
            outer = false,
            qualifier = None,
            generatorOutput = Seq(off),
            child = peakSide
          )
          val newLeft = if (peakSide eq left) gen else left
          val newRight = if (peakSide eq right) gen else right
          val equi = EqualTo(lo.sample, Add(lo.peak, off))
          val residual = conjuncts.filterNot(c => (c eq lc) || (c eq uc))
          val newCond = (equi +: residual).reduce[Expression](And(_, _))
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
