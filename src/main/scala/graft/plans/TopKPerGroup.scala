package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom Catalyst piece (SURVEY §4.3 option (c)): top-k
  * rows per group as a first-class physical operator.
  *
  * Why a custom SparkPlan instead of the window idiom
  * (`row_number().over(partitionBy(g).orderBy(o)) <= k`): WindowExec
  * must SORT every partition on (group, order) — O(n log n) with full
  * materialization per partition — then compute ranks for every row and
  * throw most of them away. This operator keeps one bounded heap of k
  * rows per group — O(n log k), memory O(groups·k) — and never sorts
  * the input. Same answer, strictly less work; the win grows with
  * n/k, which at 100 TB is the whole game (k=3 of millions of rows per
  * group).
  *
  * Plan contract: the strategy emits a PARTIAL/FINAL pair (the hash-
  * aggregate split): the partial heaps per input partition with no
  * distribution requirement, so the exchange ships at most groups·k
  * rows per partition instead of the table; the final requires
  * `ClusteredDistribution(group)` and re-heaps the survivors. Rows are
  * copied only when they enter a heap (at most groups·k live copies),
  * and each group's survivors emit in sort order for deterministic
  * downstream consumption.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy: logical [[TopKPerGroup]] → partial + final
  * [[TopKPerGroupExec]] pair, the same split hash aggregates use. The
  * PARTIAL exec runs before the exchange with no distribution
  * requirement — each input partition forwards at most groups·k rows —
  * so the shuffle moves candidate survivors, not the table; the FINAL
  * exec demands the group clustering and re-heaps the survivors.
  * (Top-k of a union of per-partition top-ks is the global top-k:
  * any row outside a partition's local top-k is beaten by k rows that
  * did ship.) Injected either at session build (GraftExtensions
  * injectPlannerStrategy) or post-hoc via
  * `spark.experimental.extraStrategies` (graft.ops.TopK does this). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k,
        TopKPerGroupExec(g, o, k, planLater(child), partial = true),
        partial = false) :: Nil
    case _ => Nil
  }
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val groupExprsB = groupExprs
    val orderB = order
    val kB = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val groupProj = UnsafeProjection.create(groupExprsB, childOutput)
      // row comparator for the requested sort order (codegen'd, falls
      // back to interpreted) — "smaller" = earlier in the top-k order
      val ord = new LazilyGeneratedOrdering(orderB, childOutput)
      // heap keeps the CURRENT top-k with the worst survivor on top, so
      // admission is a single peek
      val worstOnTop = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kB + 1, worstOnTop)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kB) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        val arr = new Array[InternalRow](h.size)
        var i = 0
        while (!h.isEmpty) { arr(i) = h.poll(); i += 1 }
        // heap drains worst-first; reverse to emit each group in order
        arr.reverseIterator
      }
    }, preservesPartitioning = true)
  }
}
