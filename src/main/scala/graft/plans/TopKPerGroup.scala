package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, LazilyGeneratedOrdering}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}

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

/** Per-partition bounded-heap state shared by the interpreted
  * (`doExecute`) and whole-stage-codegen (`doProduce`/`doConsume`)
  * paths. Public and Java-friendly because generated code references
  * it by class name and calls `insert`/`drain` directly. Memory is
  * O(groups·k) live row copies regardless of input size.
  */
final class TopKHeapBuffer(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    inputSchema: Seq[Attribute],
    k: Int) {
  private val groupProj = UnsafeProjection.create(groupExprs, inputSchema)
  // row comparator for the requested sort order (codegen'd, falls
  // back to interpreted) — "smaller" = earlier in the top-k order
  private val ord = new LazilyGeneratedOrdering(order, inputSchema)
  // heap keeps the CURRENT top-k with the worst survivor on top, so
  // admission is a single peek
  private val worstOnTop = new java.util.Comparator[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
  }
  private val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()

  def insert(row: InternalRow): Unit = {
    val key = groupProj(row)
    var heap = heaps.get(key)
    if (heap == null) {
      heap = new java.util.PriorityQueue[InternalRow](k + 1, worstOnTop)
      heaps.put(key.copy(), heap)
    }
    if (heap.size < k) heap.add(row.copy())
    else if (ord.compare(row, heap.peek()) < 0) {
      heap.poll(); heap.add(row.copy())
    }
  }

  /** Survivors, each group emitted in sort order (heap drains
    * worst-first; reversed per group for deterministic consumption). */
  def drain(): java.util.Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    heaps.values().iterator().asScala.flatMap { h =>
      val arr = new Array[InternalRow](h.size)
      var i = 0
      while (!h.isEmpty) { arr(i) = h.poll(); i += 1 }
      arr.reverseIterator
    }.asJava
  }
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode with BlockingOperatorWithCodegen {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  /** Called from generated code (via the plan reference object), once
    * per partition — projections/orderings are created executor-side. */
  def createBuffer(): TopKHeapBuffer =
    new TopKHeapBuffer(groupExprs, order, child.output, k)

  protected override def doExecute(): RDD[InternalRow] = {
    val thisPlan = this
    child.execute().mapPartitions({ it =>
      val buf = thisPlan.createBuffer()
      while (it.hasNext) buf.insert(it.next())
      import scala.jdk.CollectionConverters._
      buf.drain().asScala
    }, preservesPartitioning = true)
  }

  // ---- whole-stage codegen (the SortExec blocking-operator shape):
  // doConsume feeds every child row into the heap buffer; doProduce
  // drives the child's produce loop once, then streams the drained
  // survivors to the parent. This keeps the operator INSIDE the
  // WholeStageCodegen span instead of breaking it at both edges.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  // we consume whole rows, not individual columns — don't force the
  // child to materialize column variables for us
  override def usedInputs: AttributeSet = AttributeSet(Seq.empty)

  private var bufferVariable: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val needToHeap =
      ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "needToHeap", v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("plan", this)
    bufferVariable = ctx.addMutableState(classOf[TopKHeapBuffer].getName, "topkBuffer",
      v => s"$v = $thisPlan.createBuffer();", forceInline = true)
    val drainedIter = ctx.addMutableState("java.util.Iterator<InternalRow>", "topkDrained",
      forceInline = true)
    val addToBuffer = ctx.freshName("addToTopKBuffer")
    val addToBufferFunc = ctx.addNewFunction(addToBuffer,
      s"""
         |private void $addToBuffer() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val outputRow = ctx.freshName("topkOutputRow")
    s"""
       |if ($needToHeap) {
       |  $addToBufferFunc();
       |  $drainedIter = $bufferVariable.drain();
       |  $needToHeap = false;
       |}
       |while ($limitNotReachedCond $drainedIter.hasNext()) {
       |  UnsafeRow $outputRow = (UnsafeRow) $drainedIter.next();
       |  ${consume(ctx, null, outputRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin.trim
  }

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    s"""
       |${row.code}
       |$bufferVariable.insert((UnsafeRow) ${row.value});
     """.stripMargin
}
