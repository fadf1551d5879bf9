package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: `size(array_intersect(a, b))` →
  * `intersect_card(a, b)` and `size(array_union(a, b))` →
  * `union_card(a, b)` when both sides are null-free `array<bigint>` —
  * the counting never materializes the set-operation result array.
  * Installed session-wide via GraftExtensions, or per-session through
  * `spark.experimental.extraOptimizations` (GraftFunctions.register).
  */
object RewriteSetCardinality extends Rule[LogicalPlan] {

  private def isLongArray(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.dataType match {
      case ArrayType(LongType, false) => true
      case _                          => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(a, b), _) if isLongArray(a) && isLongArray(b) =>
      IntersectCard(a, b)
    case Size(ArrayUnion(a, b), _) if isLongArray(a) && isLongArray(b) =>
      UnionCard(a, b)
  }
}
