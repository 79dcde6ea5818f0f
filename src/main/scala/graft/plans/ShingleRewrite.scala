package graft.plans

import graft.functions.WordShingles3
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (SURVEY §4.3's optional custom Catalyst piece): rewrite
  * the declarative higher-order 3-token shingle spelling
  *
  *   transform(sequence(0, size(t) - 3), i ->
  *     concat(t[i], ' ', t[i + 1], ' ', t[i + 2]))
  *
  * into the codegen'd [[WordShingles3]] expression (~8× on the text
  * bench). Users keep writing the portable HOF form; the engine swaps the
  * implementation. Non-matching trees are untouched — the rule is a safe
  * no-op outside the exact pattern (the equivalence contract is pinned by
  * VecDotSpec's shingles test plus RuleSpec).
  *
  * Injected by [[graft.functions.GraftExtensions]] via
  * injectOptimizerRule.
  */
object ShingleRewrite extends Rule[LogicalPlan] {

  private def isLit(e: Expression, v: Int): Boolean = e match {
    case Literal(x: Int, _) => x == v
    case Literal(x: Long, _) => x == v
    case _ => false
  }

  private def isSpace(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, _) => s.toString == " "
    case _ => false
  }

  /** tokens[i + off] with off ∈ {0,1,2}; returns the array expression. */
  private def itemAt(e: Expression, lv: NamedExpression, off: Int): Option[Expression] =
    e match {
      case GetArrayItem(arr, idx, _) =>
        idx match {
          case a: NamedExpression if off == 0 && a.exprId == lv.exprId => Some(arr)
          case Add(a: NamedExpression, o, _) if a.exprId == lv.exprId && isLit(o, off) => Some(arr)
          case Add(o, a: NamedExpression, _) if a.exprId == lv.exprId && isLit(o, off) => Some(arr)
          case _ => None
        }
      case ElementAt(arr, idx, _, _) => // 1-based spelling: element_at(t, i + off + 1)
        idx match {
          case Add(a: NamedExpression, o, _) if a.exprId == lv.exprId && isLit(o, off + 1) => Some(arr)
          case Add(o, a: NamedExpression, _) if a.exprId == lv.exprId && isLit(o, off + 1) => Some(arr)
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case t @ ArrayTransform(
          Sequence(start, Subtract(Size(seqArr, _), three, _), _, _),
          LambdaFunction(
            Concat(Seq(e0, s1, e1, s2, e2)),
            Seq(lv: NamedExpression), _))
          if isLit(start, 0) && isLit(three, 3) &&
            isSpace(s1) && isSpace(s2) =>
        (itemAt(e0, lv, 0), itemAt(e1, lv, 1), itemAt(e2, lv, 2)) match {
          case (Some(a0), Some(a1), Some(a2))
              if a0.semanticEquals(seqArr) && a1.semanticEquals(seqArr) &&
                a2.semanticEquals(seqArr) =>
            WordShingles3(seqArr)
          case _ => t
        }
    }
}
