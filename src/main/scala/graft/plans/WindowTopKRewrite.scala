package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the ubiquitous window-top-k idiom
  *
  *   Project(p, Filter(rn <= k, Window(row_number() over (partition by K
  *     order by O) as rn, child)))
  *
  * into `TopKPerKeyPlan(child, K, O, k)` whenever the rank column itself
  * is not referenced above the filter. The window form sorts every
  * partition and materializes the window buffer; the rewritten plan
  * keeps one bounded heap per key after the same exchange — identical
  * row set (ties are nondeterministic in BOTH forms exactly when the
  * ordering is not total).
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) && k == 1 => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Project(projList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
            partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          limitOf(cond, alias.toAttribute).isDefined &&
          limitOf(cond, alias.toAttribute).get > 0 &&
          projList.forall(_.references.subsetOf(child.outputSet + alias.toAttribute)) =>
      // Spark's own InferWindowGroupLimit may already have inserted a
      // (sort-based) WindowGroupLimit below the window — our two-phase
      // heap operator replaces it entirely
      val base = child match {
        case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
        case other => other
      }
      // a projection that keeps the rank column (tf-idf's `rank`,
      // decile labels, …) gets it from the operator itself — the final
      // heap drains each key in rank order, so emitting the 1-based
      // position IS row_number(), with no window to compute it
      val rank = if (projList.exists(_.references.contains(alias.toAttribute)))
        Some(alias.toAttribute) else None
      Project(projList,
        TopKPerKeyPlan(base, partitionSpec,
          orderSpec.map(_.asInstanceOf[SortOrder]),
          limitOf(cond, alias.toAttribute).get, rank))
  }
}
