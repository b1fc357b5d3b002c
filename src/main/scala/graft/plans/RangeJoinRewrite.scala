package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule that turns a bounded-range join into a bucketized
  * equi-join — the optimizer-level twin of
  * [[graft.operators.Relational.intervalJoin]]'s hand-written plan.
  *
  * Matches an INNER join whose condition contains
  * {{{r >= l - C  AND  r < l      (or r <= l)}}}
  * for long-typed columns `l` (probe side) and `r` (build side) and a
  * positive literal window `C`, plus any number of ordinary equi-conjuncts.
  * Without the rewrite Spark plans this as a BroadcastNestedLoopJoin (no
  * equi key) or as a per-key cartesian inside a sort-merge join (with one) —
  * both quadratic in the matching key group. The rewrite:
  *
  *  - replicates each probe row into the (at most two) width-C buckets its
  *    window can overlap: `explode(array(l div C, l div C - 1))`
  *  - assigns each build row its single bucket `r div C`
  *  - joins on (original equi keys ++ bucket) — a plain hash-joinable key —
  *    keeping the exact range predicate as the join's residual condition
  *  - projects the original output columns back (bucket columns are
  *    internal)
  *
  * Candidates per probe are then bounded by bucket occupancy — linear in
  * data size for any window that is small relative to the key's time span —
  * instead of the size of the whole key group. Bucket ids use integral
  * division, so bucketing is exact at any epoch magnitude.
  *
  * Activate per session: install the rule (via
  * {{{spark.experimental.extraOptimizations ++= Seq(RangeJoinRewrite)}}}
  * or the [[GraftExtensions]] hook) AND set
  * `spark.graft.rangeJoinRewrite.enabled=true`. The conf gate makes the
  * rewrite opt-in: sessions that adopt `spark.sql.extensions=
  * graft.plans.GraftExtensions` for the SQL functions alone never get
  * their join plans rewritten (the rewrite doubles probe-side rows via
  * explode, which can regress a query whose original plan — e.g. a small
  * broadcast build side — was already fine). The rule is conservative:
  * anything but the exact shape above is left untouched, and it never
  * fires twice (the rewritten join carries the internal bucket-column
  * name as a marker).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Session conf gating the rewrite; the rule is a no-op unless "true". */
  val EnabledFlag = "spark.graft.rangeJoinRewrite.enabled"

  private val BucketCol = "__graft_range_bkt"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledFlag, "false").toBoolean) plan
    else plan transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.output.exists(_.name.startsWith(BucketCol)) =>
        rewrite(j, left, right, cond, hint).getOrElse(j)
    }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def sideOf(e: Expression): Option[Boolean] = // Some(true)=left, Some(false)=right
      if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None

    // r >= l - C  (either spelling side). Returns (l, r, C).
    def lowerBound(e: Expression): Option[(Attribute, Attribute, Long)] = e match {
      case GreaterThanOrEqual(r: Attribute, Subtract(l: Attribute, Literal(c: Long, LongType), _))
          if sideOf(r) == Some(false) && sideOf(l) == Some(true) && c > 0 =>
        Some((l, r, c))
      case LessThanOrEqual(Subtract(l: Attribute, Literal(c: Long, LongType), _), r: Attribute)
          if sideOf(r) == Some(false) && sideOf(l) == Some(true) && c > 0 =>
        Some((l, r, c))
      case _ => None
    }
    // r < l  or  r <= l for the SAME pair.
    def upperBound(e: Expression, l: Attribute, r: Attribute): Boolean = e match {
      case LessThan(rr: Attribute, ll: Attribute) =>
        rr.semanticEquals(r) && ll.semanticEquals(l)
      case LessThanOrEqual(rr: Attribute, ll: Attribute) =>
        rr.semanticEquals(r) && ll.semanticEquals(l)
      case GreaterThan(ll: Attribute, rr: Attribute) =>
        rr.semanticEquals(r) && ll.semanticEquals(l)
      case GreaterThanOrEqual(ll: Attribute, rr: Attribute) =>
        rr.semanticEquals(r) && ll.semanticEquals(l)
      case _ => false
    }

    val found = conjuncts.flatMap(lowerBound).headOption
    found.flatMap { case (l, r, c) =>
      if (l.dataType != LongType || r.dataType != LongType) None
      else if (!conjuncts.exists(upperBound(_, l, r))) None
      else {
        val width = Literal(c, LongType)
        val lBkt = IntegralDivide(l, width)
        // Probe side: explode into the two buckets the window can overlap.
        val bktAttr = AttributeReference(BucketCol, LongType, nullable = true)()
        val gen = Explode(CreateArray(Seq(lBkt, Subtract(lBkt, Literal(1L, LongType)))))
        val newLeft = Generate(gen, unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(bktAttr), child = left)
        // Build side: one bucket per row.
        val rAlias = Alias(IntegralDivide(r, width), BucketCol + "_r")()
        val newRight = Project(right.output :+ rAlias, right)
        val newCond = And(cond, EqualTo(bktAttr, rAlias.toAttribute))
        val rewritten = Join(newLeft, newRight, Inner, Some(newCond), hint)
        // Bucket columns are internal: restore the original output.
        Some(Project(j.output, rewritten))
      }
    }
  }
}
