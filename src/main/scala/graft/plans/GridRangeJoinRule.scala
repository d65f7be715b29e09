package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: turn a naive euclidean radius join
  *
  *   a JOIN b ON (ax-bx)*(ax-bx) + (ay-by)*(ay-by) <= r2    [no equi keys]
  *
  * — which Spark can only plan as a broadcast-nested-loop / cartesian
  * (O(n*m) at scale) — into the grid-cell equi-join of
  * [[graft.operators.RangeJoin]]: explode the left side to its 3x3
  * neighbor cells of size r = sqrt(r2), equi-join on (cx, cy), keep the
  * exact predicate as a residual filter. Results are identical (the grid
  * only prunes candidates; the original predicate still decides), the
  * join becomes hash-partitionable, and AQE handles residual cell skew.
  *
  * This is the reference's wellbeing radius join
  * (int_emergency_works_postcodes_by_authority.sql:33-38) made automatic:
  * users write the naive predicate, the engine makes it scale.
  * Inject with spark.sql.extensions=graft.plans.GraftExtensions.
  */
object GridRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** (x-y)*(x-y) with both factors semantically equal. */
  private def matchSq(e: Expression): Option[(Expression, Expression)] = e match {
    case Multiply(s1 @ Subtract(a1, b1, _), s2 @ Subtract(a2, b2, _), _)
        if s1.semanticEquals(s2) => Some((a1, b1))
    case _ => None
  }

  private case class DistPred(ax: Expression, bx: Expression,
                              ay: Expression, by: Expression, r2: Double)

  private def matchDist(cond: Expression): Option[DistPred] = cond match {
    case LessThanOrEqual(Add(sq1, sq2, _), Literal(r2: Double, DoubleType)) =>
      for ((ax, bx) <- matchSq(sq1); (ay, by) <- matchSq(sq2))
        yield DistPred(ax, bx, ay, by, r2)
    case GreaterThanOrEqual(Literal(r2: Double, DoubleType), Add(sq1, sq2, _)) =>
      for ((ax, bx) <- matchSq(sq1); (ay, by) <- matchSq(sq2))
        yield DistPred(ax, bx, ay, by, r2)
    case _ => None
  }

  private def refsIn(e: Expression, p: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(p.outputSet)

  /** Orient the distance predicate so (x1, y1) sits in `left`. */
  private def orient(d: DistPred, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    if (refsIn(d.ax, left) && refsIn(d.ay, left) &&
        refsIn(d.bx, right) && refsIn(d.by, right))
      Some((d.ax, d.ay, d.bx, d.by))
    else if (refsIn(d.bx, left) && refsIn(d.by, left) &&
             refsIn(d.ax, right) && refsIn(d.ay, right))
      Some((d.bx, d.by, d.ax, d.ay))
    else None
  }

  private def hasEquiKeys(conjuncts: Seq[Expression],
                          left: LogicalPlan, right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) =>
        (refsIn(l, left) && refsIn(r, right)) || (refsIn(l, right) && refsIn(r, left))
      case EqualNullSafe(l, r) => // <=> also plans as a hash join
        (refsIn(l, left) && refsIn(r, right)) || (refsIn(l, right) && refsIn(r, left))
      case _ => false
    }

  private def cellOf(x: Expression, r: Double): Expression =
    Floor(Divide(Cast(x, DoubleType), Literal(r)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hit = conjuncts.iterator
        .flatMap(c => matchDist(c).flatMap(d =>
          orient(d, left, right).map(o => (o, d.r2))))
        .find { case (_, r2) => r2 > 0 }
      hit match {
        case Some(((lx, ly, rx, ry), r2)) if !hasEquiKeys(conjuncts, left, right) =>
          // nextUp: sqrt can round DOWN, and a pair at exactly the radius
          // whose axis delta exceeds the rounded cell size by an ulp would
          // land 2 cells apart and be pruned before the residual predicate
          // (which keeps it) ever ran — the one float edge between this
          // plan and the naive one
          val r = Math.nextUp(math.sqrt(r2))
          val dx = AttributeReference("__dx", LongType, nullable = false)()
          val dy = AttributeReference("__dy", LongType, nullable = false)()
          val deltas = CreateArray(Seq(Literal(-1L), Literal(0L), Literal(1L)))
          val genX = Generate(Explode(deltas), Nil, outer = false, None, Seq(dx), left)
          val genXY = Generate(Explode(deltas), Nil, outer = false, None, Seq(dy), genX)
          val cxL = Alias(Add(cellOf(lx, r), dx), "__cxl")()
          val cyL = Alias(Add(cellOf(ly, r), dy), "__cyl")()
          val leftCells = Project(left.output ++ Seq(cxL, cyL), genXY)
          val cxR = Alias(cellOf(rx, r), "__cxr")()
          val cyR = Alias(cellOf(ry, r), "__cyr")()
          val rightCells = Project(right.output ++ Seq(cxR, cyR), right)
          val newCond = And(
            And(EqualTo(cxL.toAttribute, cxR.toAttribute),
              EqualTo(cyL.toAttribute, cyR.toAttribute)),
            cond)
          Project(j.output,
            Join(leftCells, rightCells, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
