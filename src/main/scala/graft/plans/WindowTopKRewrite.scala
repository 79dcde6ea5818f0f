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
object WindowTopKRewrite extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  private val MaxK = 10000

  /** Split a possibly-conjunctive filter into (the rank bound k, the
    * residual conjuncts that don't touch the rank). A downstream
    * predicate pushed into the same Filter (the optimizer merges
    * `cosine >= t` with `rank <= k` into one And — the sf10
    * semantic-dedup edge build hit exactly this) must not defeat the
    * heap: the k governs the heap, the residual re-applies above it. */
  private def limitAndResidual(cond: Expression, rank: ExprId)
      : Option[(Int, Seq[Expression])] = {
    val conjs = splitConjunctivePredicates(cond)
    val (rankCs, rest) = conjs.partition(_.exists {
      case a: Attribute => a.exprId == rank
      case _ => false
    })
    if (rankCs.size != 1) return None
    limitOf(rankCs.head, rank).map(k => (k, rest))
  }

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

  def apply(plan: LogicalPlan): LogicalPlan = {
    // Pass 1 — rank DROPPED above the filter: replace the Window
    // entirely with the heap operator.
    val replaced = plan.transformUp {
      case Project(projectList, Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, order, _)), _)), _, _, wchild, _)))
          if part.nonEmpty && order.nonEmpty &&
            limitAndResidual(cond, al.exprId)
              .exists { case (k, rest) => k > 0 && k <= MaxK &&
                rest.forall(_.deterministic) } &&
            projectList.forall(!_.exists {
              case a: Attribute => a.exprId == al.exprId
              case _ => false
            }) =>
        val (k, residual) = limitAndResidual(cond, al.exprId).get
        // Spark's InferWindowGroupLimit may already have slipped its
        // pre-filter under the Window; the heap subsumes it — and a
        // heap this rule planted on an earlier fixed-point iteration
        // (the rank-kept pass below) is reused, never doubled
        val child = stripLimit(wchild) match {
          case t @ TopKPerGroup(p2, o2, k2, _)
              if p2 == part && o2 == order && k2 == k => t
          case c => TopKPerGroup(part, order, k, c)
        }
        // residual conjuncts (non-rank predicates the optimizer merged
        // into the same Filter) re-apply over the heap survivors —
        // conjunction order commutes
        val filtered: LogicalPlan =
          if (residual.isEmpty) child
          else Filter(residual.reduce(And), child)
        Project(projectList, filtered)
    }
    // Pass 2 — the consumer KEEPS the rank column (ann_knn_join emits
    // it): TopKPerGroup can't replace the Window outright (it emits
    // child columns only), but it can FEED it — heap-limit the
    // window's input to ≤ groups·k rows, so the WindowExec's sort is
    // over survivors, not the full input (the measured sf10 gap:
    // 22.6 s heaped vs 212.8 s sorting 179M candidate rows). The same
    // rows survive: the heap keeps exactly the rank ≤ k set under the
    // same order (ties carry the idiom's documented caveat in both
    // spellings), and the Final heap's ClusteredDistribution(part)
    // matches the Window's requirement, so no extra exchange appears.
    // Runs as a second pass so the full-replacement case above wins
    // whenever it applies (transformUp would otherwise fire this on
    // the inner Filter before the outer Project is seen).
    replaced.transformUp {
      case Filter(cond,
          w @ Window(Seq(al @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, order, _)), _)), _, _, wchild, _))
          if part.nonEmpty && order.nonEmpty &&
            limitAndResidual(cond, al.exprId)
              .exists { case (k, _) => k > 0 && k <= MaxK } &&
            !stripLimit(wchild).isInstanceOf[TopKPerGroup] =>
        val (k, _) = limitAndResidual(cond, al.exprId).get
        // the FULL filter (rank bound + any merged residual) stays in
        // place; only the window's input is heap-limited
        Filter(cond,
          w.withNewChildren(Seq(TopKPerGroup(part, order, k, stripLimit(wchild)))))
    }
  }

  private def stripLimit(p: LogicalPlan): LogicalPlan = p match {
    case WindowGroupLimit(_, _, _, _, gchild) => gchild
    case c => c
  }
}
