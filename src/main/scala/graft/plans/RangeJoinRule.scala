package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst optimizer rule: rewrites a non-equi INNER join whose
  * condition contains a range containment `lo <= x AND x <= hi`
  * (point `x` from one side, interval `[lo, hi]` from the other, no
  * equi-join predicate linking the sides) into the bucketed equi-join
  * shape of [[graft.operators.RangeJoin.pointInInterval]] — floor(x/w)
  * on the point side, an exploded floor(lo/w)..floor(hi/w) bucket
  * sequence on the interval side (inverted intervals filtered first,
  * same descending-`sequence` reason), an equi-join on the bucket, and
  * the ORIGINAL condition re-applied as a filter above it. Output
  * attributes are preserved exactly, so the rewrite is transparent to
  * everything downstream.
  *
  * Why a Rule and not just the library function: SQL and DataFrame
  * code that never heard of graft still writes `JOIN ... ON lo <= x
  * AND x <= hi`, which Spark plans as a broadcast nested loop — or,
  * with two big sides, a cartesian product. With this rule injected
  * (via [[graft.functions.GraftExtensions]] or
  * `spark.experimental.extraOptimizations`) and the bucket width set,
  * the same query plans as a shuffled equi-join. This is stage (c) of
  * the custom-operator preference order: compose if you can (the
  * library function), inject a Rule when the USER'S plan shape needs
  * fixing.
  *
  * Opt-in by session conf `spark.graft.rangeJoin.width` (the bucket
  * width, > 0; pick it near the typical interval length). Unset = the
  * rule is a no-op, so injecting it globally is safe. The rewritten
  * join carries an equality predicate, so the rule can never match its
  * own output (no fixed-point loops).
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.width"

  private def width: Option[Double] =
    Option(SQLConf.get.getConfString(WidthConf, null)).map(_.toDouble)

  /** Normalize a comparison conjunct to (smaller, larger) under <=.
    * Strict inequalities are NOT folded in: `lo < x` admits fewer rows
    * than the bucket overlap implies, but re-applying the original
    * condition would keep output correct — only the bucket bound must
    * be conservative, and floor() buckets are closed-interval safe for
    * strict predicates too, so both forms are accepted.
    */
  private def asLeq(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case LessThan(a, b) => Some((a, b))
    case GreaterThan(a, b) => Some((b, a))
    case _ => None
  }

  private def fromOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic

  /** floor(cast(e as double) / w) as long */
  private def bucketOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) =>
      require(w > 0, s"$WidthConf must be > 0, got $w")
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint) =>
          val conjuncts = splitConjunctivePredicates(cond)
          // an existing cross-side equality already gives Spark an
          // equi-join to hash on — leave those plans alone
          val hasEqui = conjuncts.exists {
            case EqualTo(a, b) =>
              (fromOnly(a, left) && fromOnly(b, right)) ||
                (fromOnly(a, right) && fromOnly(b, left))
            case _ => false
          }
          // find (lo <= x, x <= hi) with x one side's expression and
          // lo/hi both the other side's
          val pair = if (hasEqui) None else {
            val leqs = conjuncts.flatMap(asLeq)
            leqs.iterator.flatMap { case (lo, x1) =>
              leqs.iterator.collect {
                case (x2, hi) if x1.semanticEquals(x2) &&
                    ((fromOnly(x1, left) && fromOnly(lo, right) && fromOnly(hi, right)) ||
                     (fromOnly(x1, right) && fromOnly(lo, left) && fromOnly(hi, left))) =>
                  (x1, lo, hi)
              }
            }.nextOption()
          }
          pair match {
            case None => j
            case Some((x, lo, hi)) =>
              val (pointSide, intervalSide) =
                if (fromOnly(x, left)) (left, right) else (right, left)
              val pBucket = Alias(bucketOf(x, w), "__graft_bucket_p")()
              val pProj = Project(pointSide.output :+ pBucket, pointSide)
              val iBucketAttr =
                AttributeReference("__graft_bucket_i", LongType, nullable = true)()
              // Sequence is TimeZoneAwareExpression: it only resolves
              // with a timezone bound, even for integral sequences
              val tz = Some(SQLConf.get.sessionLocalTimeZone)
              val gen = Generate(
                Explode(Sequence(bucketOf(lo, w), bucketOf(hi, w), None, tz)),
                unrequiredChildIndex = Nil,
                outer = false,
                qualifier = None,
                generatorOutput = Seq(iBucketAttr),
                child = Filter(LessThanOrEqual(lo, hi), intervalSide))
              val bucketJoin = Join(pProj, gen, Inner,
                Some(EqualTo(pBucket.toAttribute, iBucketAttr)), hint)
              Project(j.output, Filter(cond, bucketJoin))
          }
      }
  }
}
