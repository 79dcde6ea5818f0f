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
/** Optimizer rule: rewrite the portable Rabin–Karp rolling-hash spelling
  *
  *   aggregate(transform(sequence(1, length(s)), i ->
  *     cast(ascii(substring(s, i, 1)) as bigint)),
  *     0L, (a, c) -> (a * 31 + c) % 1000000007)
  *
  * into the codegen'd [[graft.functions.RabinKarpHash]] — per-character
  * interpreted closure calls become one generated loop. Bit-exact:
  * both sides fold codePointAt over the string's code points (see the
  * expression's Scaladoc for the equivalence argument, including the
  * empty-string sequence(1,0) quirk). Registered both via
  * [[graft.functions.GraftExtensions]] and post-hoc on
  * `spark.experimental.extraOptimizations` (VecExprs.register); in both
  * positions the rule runs after constant folding, so the int literals
  * 31 / 1000000007 have already collapsed to their long forms. The
  * equivalence is pinned by RuleSpec; PlanSpec pins that
  * doc_rolling_hash actually plans to it.
  */
object RollingHashRewrite extends Rule[LogicalPlan] {

  private def isLongLit(e: Expression, v: Long): Boolean = e match {
    case Literal(x: Int, _) => x.toLong == v
    case Literal(x: Long, _) => x == v
    case Cast(inner, _, _, _) => isLongLit(inner, v)
    case _ => false
  }

  private def isVar(e: Expression, v: NamedExpression): Boolean = e match {
    case n: NamedExpression => n.exprId == v.exprId
    case Cast(inner, _, _, _) => isVar(inner, v)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ArrayTransform(
            Sequence(seqStart, Length(strA), _, _),
            LambdaFunction(mapBody, Seq(iv: NamedExpression), _)),
          zero,
          LambdaFunction(mergeBody,
            Seq(av: NamedExpression, cv: NamedExpression), _),
          LambdaFunction(finBody, Seq(fv: NamedExpression), _))
          if isLongLit(seqStart, 1L) && isLongLit(zero, 0L) &&
            isVar(finBody, fv) => {
        // map: cast(ascii(substring(s, i, 1)) as bigint)
        val mapOk = mapBody match {
          case Cast(Ascii(Substring(strB, ivRef, one)), dt, _, _) =>
            dt == org.apache.spark.sql.types.LongType &&
              isVar(ivRef, iv) && isLongLit(one, 1L) &&
              strB.semanticEquals(strA)
          case _ => false
        }
        // merge: (a * 31 + c) % 1000000007
        val mergeOk = mergeBody match {
          case Remainder(Add(Multiply(a, m, _), c, _), mod, _) =>
            isVar(a, av) && isLongLit(m, 31L) && isVar(c, cv) &&
              isLongLit(mod, 1000000007L)
          case _ => false
        }
        if (mapOk && mergeOk) graft.functions.RabinKarpHash(strA) else agg
      }
    }
}

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
