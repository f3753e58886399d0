package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Catalyst optimizer rule: rewrite a keyless INTERVAL join — the
  * `a BETWEEN b + lo AND b + hi` shape with no equi keys — into the
  * bucketed equi-join [[graft.ops.Events.rangeJoin]] builds by hand,
  * so users writing the naive join (in SQL or the DataFrame API) still
  * get the scale plan. Without this rule Spark plans a
  * BroadcastNestedLoopJoin (or a cartesian product): every row pair
  * compared, the canonical local-mode-passes / cluster-falls-over trap.
  *
  * Rewrite: with w = max(hi − lo, 1), `a ∈ [b+lo, b+hi]` ⇔
  * `b ∈ [a−hi, a−lo]`, whose bucket span is exactly ⌈w/w⌉+1 ≤ 2 — so
  * the `a` side explodes to AT MOST TWO bucket rows, the `b` side maps
  * to its single bucket, and the join becomes an equi-join on the
  * bucket with the ORIGINAL predicate kept as a residual filter
  * (bucketing is a pure candidate bound; correctness never depends on
  * it). Output attributes are preserved exactly (a final Project drops
  * the bucket columns), so the rewrite is transparent to everything
  * above it.
  *
  * Scope (deliberately tight): INNER joins whose condition contains a
  * `>=`/`<=` conjunct pair bounding one side's expression by the
  * other side's expression ± literal offsets, and NO equi conjunct
  * between the sides (if one exists, Spark already hash-joins on it).
  * Both bound expressions must share a FIXED-WIDTH ordered domain
  * (r14, the r13 verdict #6 — production interval joins are
  * overwhelmingly temporal and written with BETWEEN, which the parser
  * desugars to exactly this conjunct pair):
  *   - IntegerType / LongType — the event-time-as-epoch shape;
  *     offsets from int/long `Add`/`Subtract` literals;
  *   - TimestampType / TimestampNTZType — offsets from
  *     `TimestampAddInterval` literals that are exact durations
  *     (DayTimeIntervalType micros, or CalendarIntervalType with zero
  *     months AND days — month/day components go through LOCAL
  *     calendar arithmetic, variable-width under DST, so they are
  *     deliberately out of scope); bucketing maps through
  *     `unix_micros` (NTZ first reinterpreted as a UTC instant, which
  *     is gap-free and order-preserving for every session zone);
  *   - DateType — offsets from `DateAdd`/`DateSub` int literals;
  *     bucketing maps through `unix_date`.
  * Floor division replicates Events.rangeJoin's negative-safe
  * integral formula. Extra conjuncts are fine — they ride in the
  * residual filter. Bucketing is only ever a CANDIDATE bound: the
  * original predicate is re-applied as a residual filter, so the
  * domain mapping needs monotonicity + offset-unit consistency, never
  * injectivity.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** (pointExpr, boundExpr, offset): conjunct ≡ point ⋛ bound + offset,
    * offset in the domain's unit (ints, micros, or days — see
    * [[domainOf]]; the pair match requires both sides' domains equal,
    * which pins the units consistent). */
  private def normalize(x: Expression, y: Expression): Option[(Expression, Expression, Long)] = {
    def longOf(l: Literal): Option[Long] = l.dataType match {
      case LongType    => Some(l.value.asInstanceOf[Long])
      case IntegerType => Some(l.value.asInstanceOf[Int].toLong)
      case _           => None
    }
    // exact-duration intervals only: micros. Calendar months/days add
    // via LOCAL calendar arithmetic (variable physical width across
    // DST), so any non-zero month/day component disqualifies.
    def microsOf(l: Literal): Option[Long] = l.dataType match {
      case _: DayTimeIntervalType =>
        Option(l.value).map(_.asInstanceOf[Long])
      case CalendarIntervalType =>
        Option(l.value).map(_.asInstanceOf[CalendarInterval]).flatMap { ci =>
          if (ci.months == 0 && ci.days == 0) Some(ci.microseconds) else None
        }
      case _ => None
    }
    def intOf(l: Literal): Option[Long] = l.dataType match {
      case IntegerType => Option(l.value).map(_.asInstanceOf[Int].toLong)
      case _           => None
    }
    y match {
      case Add(e, l: Literal, _)      => longOf(l).map(v => (x, e, v))
      case Add(l: Literal, e, _)      => longOf(l).map(v => (x, e, v))
      case Subtract(e, l: Literal, _) => longOf(l).map(v => (x, e, -v))
      // ts ± interval: the optimizer folds subtraction into a negated
      // interval literal before this rule runs, so Add alone suffices
      case TimestampAddInterval(e, l: Literal, _) =>
        microsOf(l).map(v => (x, e, v))
      case DateAdd(e, l: Literal) => intOf(l).map(v => (x, e, v))
      case DateSub(e, l: Literal) => intOf(l).map(v => (x, e, -v))
      case e                      => Some((x, e, 0L))
    }
  }

  /** Fixed-width ordered domains the bucket math is defined over; the
    * Int return is only an equality token (same domain ⇔ same unit). */
  private def domainOf(e: Expression): Option[Int] = e.dataType match {
    case LongType | IntegerType              => Some(0)
    case TimestampType | TimestampNTZType    => Some(1)
    case DateType                            => Some(2)
    case _                                   => None
  }

  /** Monotone map into Long in the domain's offset unit. NTZ is
    * reinterpreted as a UTC instant first — zone-FREE, so gap-free and
    * order-preserving regardless of the session zone (a session-zone
    * cast would be neither across a DST spring-forward). */
  private def toLong(e: Expression): Expression = e.dataType match {
    case TimestampType    => UnixMicros(e)
    case TimestampNTZType =>
      UnixMicros(Cast(e, TimestampType, Some("UTC")))
    case DateType         => Cast(UnixDate(e), LongType)
    case _                => Cast(e, LongType)
  }

  private def sideOf(e: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) if j.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      // EqualNullSafe counts too (r13 review): Spark hash-joins on a
      // <=> key just as well, and rewriting past it would demote the
      // real key to a residual filter — a strictly worse plan
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
            yield sa != sb).getOrElse(false)
        case EqualNullSafe(a, b) =>
          (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
            yield sa != sb).getOrElse(false)
        case _ => false
      }
      if (hasEqui) j
      else {
        // candidate lower bounds: point >= bound + lo
        val lowers = conjuncts.flatMap {
          case GreaterThanOrEqual(x, y) => normalize(x, y)
          case LessThanOrEqual(x, y)    => normalize(y, x)
          case _                        => None
        }
        // candidate upper bounds: point <= bound + hi
        val uppers = conjuncts.flatMap {
          case LessThanOrEqual(x, y)    => normalize(x, y)
          case GreaterThanOrEqual(x, y) => normalize(y, x)
          case _                        => None
        }
        val pair = (for {
          (pa, ba, lo) <- lowers
          (pb, bb, hi) <- uppers
          if pa.semanticEquals(pb) && ba.semanticEquals(bb) && hi >= lo
          dp <- domainOf(pa)
          db <- domainOf(ba)
          if dp == db // same domain ⇒ offsets share the unit
          sp <- sideOf(pa, left, right)
          sb <- sideOf(ba, left, right)
          if sp != sb
        } yield (pa, ba, lo, hi, sp)).headOption
        pair match {
          case None => j
          case Some((point, bound, lo, hi, pointOnLeft)) =>
            val w = math.max(hi - lo, 1L)
            def floorDiv(e: Expression): Expression = {
              val x = Cast(e, LongType)
              CaseWhen(Seq((GreaterThanOrEqual(x, Literal(0L)),
                IntegralDivide(x, Literal(w)))),
                UnaryMinus(IntegralDivide(
                  Add(UnaryMinus(x), Literal(w - 1)), Literal(w))))
            }
            // b ∈ [point − hi, point − lo] → explode the point side over
            // that (≤ 2-element) bucket range
            val b0 = floorDiv(Subtract(toLong(point), Literal(hi)))
            val b1 = floorDiv(Subtract(toLong(point), Literal(lo)))
            val bucketAttr =
              AttributeReference("__graft_bucket", LongType, nullable = false)()
            val (pointPlan, boundPlan) =
              if (pointOnLeft) (left, right) else (right, left)
            val exploded = Generate(
              Explode(new Sequence(b0, b1)
                .withTimeZone(conf.sessionLocalTimeZone)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bucketAttr), child = pointPlan)
            val rBucket = Alias(floorDiv(toLong(bound)), "__graft_rbucket")()
            val projected = Project(boundPlan.output :+ rBucket, boundPlan)
            val bucketJoin = Join(exploded, projected, Inner,
              Some(EqualTo(bucketAttr, rBucket.toAttribute)), JoinHint.NONE)
            Project(j.output, Filter(cond, bucketJoin))
        }
      }
  }
}
