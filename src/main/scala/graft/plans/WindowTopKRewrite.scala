package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Rewrite the PORTABLE top-k-per-group idiom —
  *
  *   df.withColumn("rank", row_number().over(partitionBy(g).orderBy(o)))
  *     .filter($"rank" <= k)
  *     .drop("rank")
  *
  * — into the [[TopKPerGroup]] operator, automatically. Users (and SQL
  * text) keep writing the standard window spelling; the optimizer
  * swaps in the bounded-heap physical plan, which never materializes
  * or sorts whole partitions (WindowExec sorts every partition fully;
  * even Spark's own InferWindowGroupLimit still feeds a sort — the heap
  * operator replaces the sort entirely and ships at most groups·k rows
  * through the exchange).
  *
  * The rewrite fires ONLY when all of:
  *  - the Window computes exactly one expression: a ROW_NUMBER over a
  *    non-empty PARTITION BY and ORDER BY (rank/dense_rank admit >k
  *    ties — different semantics — and extra window exprs would lose
  *    columns). A GLOBAL row_number (no partition) is excluded: its
  *    top-k is TakeOrderedAndProject's job, and the heap exec's
  *    clustered distribution has no key to cluster on (empty
  *    clustering is rejected at execution — surfaced by text_bm25
  *    under count(), where column pruning drops the rank column and
  *    the pattern suddenly matches);
  *  - the filter is `rn <= k` / `rn < k+1` / `rn = 1` on that alias,
  *    with a literal int k in (0, 10000] (the heap is groups·k rows of
  *    executor memory — a giant literal k belongs on the sort path);
  *  - the Project above DROPS the rank column (TopKPerGroup emits
  *    child columns only; a consumer of the rank number needs the real
  *    window).
  *
  * Same tie caveat as the window idiom itself: under a non-total order,
  * WHICH of the tied rows survive is plan-dependent in both spellings.
  *
  * Mirrors [[ShingleRewrite]]'s two injection paths: session-build via
  * GraftExtensions, post-hoc via VecExprs.register.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private val MaxK = 10000

  private def limitOf(cond: Expression, rank: ExprId): Option[Int] = {
    def isRank(e: Expression) = e match {
      case a: Attribute => a.exprId == rank
      case _ => false
    }
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(a, l) if isRank(a) => lit(l)
      case LessThan(a, l) if isRank(a)        => lit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a) if isRank(a) => lit(l)
      case GreaterThan(l, a) if isRank(a)     => lit(l).map(_ - 1)
      case EqualTo(a, l) if isRank(a)         => lit(l).filter(_ == 1)
      case EqualTo(l, a) if isRank(a)         => lit(l).filter(_ == 1)
      case _ => None
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList, Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(part, order, _)), _)), _, _, wchild, _)))
        if part.nonEmpty && order.nonEmpty &&
          limitOf(cond, al.exprId).exists(k => k > 0 && k <= MaxK) &&
          projectList.forall(!_.exists {
            case a: Attribute => a.exprId == al.exprId
            case _ => false
          }) =>
      val k = limitOf(cond, al.exprId).get
      // Spark's InferWindowGroupLimit may already have slipped its
      // pre-filter under the Window; the heap subsumes it
      val child = wchild match {
        case WindowGroupLimit(_, _, _, _, gchild) => gchild
        case c => c
      }
      Project(projectList, TopKPerGroup(part, order, k, child))
  }
}
