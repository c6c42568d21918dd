package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression,
  GreaterThanOrEqual, Literal, Multiply, PredicateHelper, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.JaccardSorted

/** Optimizer rule: any `jaccard_sorted(a, b) >= τ` predicate implies the
  * PPJoin length bound — |a∩b| ≤ min(|a|,|b|) and |a∩b| ≥ τ·|a∪b| ≥
  * τ·max(|a|,|b|), so τ·|b| ≤ |a| and τ·|a| ≤ |b|. The rule prepends
  * those two O(1) size comparisons to the conjunction, so the linear
  * sorted-merge Jaccard short-circuits on length-incompatible pairs —
  * on a candidate-verification join at 100 TB most non-duplicate pairs
  * fail the length test without touching either array.
  *
  * Semantics-preserving (the added conjuncts are implied by the
  * original), and idempotent: already-present conjuncts are not
  * re-added, so the optimizer's fixpoint loop terminates. */
object InferJaccardLengthFilter extends Rule[LogicalPlan] with PredicateHelper {

  private def d(e: Expression): Expression = Cast(Size(e, legacySizeOfNull = false), DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extras = conjuncts.flatMap {
        case GreaterThanOrEqual(JaccardSorted(a, b), t @ Literal(_, DoubleType)) =>
          Seq(GreaterThanOrEqual(d(a), Multiply(t, d(b))),
              GreaterThanOrEqual(d(b), Multiply(t, d(a))))
        case _ => Nil
      }.filterNot(e => conjuncts.exists(_.semanticEquals(e)))
      if (extras.isEmpty) f
      else f.copy(condition = (extras ++ conjuncts).reduce(And))
  }
}
