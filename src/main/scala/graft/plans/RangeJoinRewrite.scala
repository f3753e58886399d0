package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

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
  * `>=`/`<=` conjunct pair bounding one side's integral expression by
  * the other side's expression ± literals, and NO equi conjunct
  * between the sides (if one exists, Spark already hash-joins on it).
  * Both bound expressions must be IntegerType/LongType — the
  * event-time-as-epoch shape; floor division replicates
  * Events.rangeJoin's negative-safe integral formula. Extra conjuncts
  * are fine — they ride in the residual filter.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** (pointExpr, boundExpr, offset): conjunct ≡ point ⋛ bound + offset. */
  private def normalize(x: Expression, y: Expression): Option[(Expression, Expression, Long)] = {
    def longOf(l: Literal): Option[Long] = l.dataType match {
      case LongType    => Some(l.value.asInstanceOf[Long])
      case IntegerType => Some(l.value.asInstanceOf[Int].toLong)
      case _           => None
    }
    y match {
      case Add(e, l: Literal, _)      => longOf(l).map(v => (x, e, v))
      case Add(l: Literal, e, _)      => longOf(l).map(v => (x, e, v))
      case Subtract(e, l: Literal, _) => longOf(l).map(v => (x, e, -v))
      case e                          => Some((x, e, 0L))
    }
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _                      => false
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
          if integral(pa) && integral(ba)
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
            val b0 = floorDiv(Subtract(Cast(point, LongType), Literal(hi)))
            val b1 = floorDiv(Subtract(Cast(point, LongType), Literal(lo)))
            val bucketAttr =
              AttributeReference("__graft_bucket", LongType, nullable = false)()
            val (pointPlan, boundPlan) =
              if (pointOnLeft) (left, right) else (right, left)
            val exploded = Generate(
              Explode(new Sequence(b0, b1)
                .withTimeZone(conf.sessionLocalTimeZone)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bucketAttr), child = pointPlan)
            val rBucket = Alias(floorDiv(bound), "__graft_rbucket")()
            val projected = Project(boundPlan.output :+ rBucket, boundPlan)
            val bucketJoin = Join(exploded, projected, Inner,
              Some(EqualTo(bucketAttr, rBucket.toAttribute)), JoinHint.NONE)
            Project(j.output, Filter(cond, bucketJoin))
        }
      }
  }
}
