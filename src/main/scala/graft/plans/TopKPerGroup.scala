package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, LazilyGeneratedOrdering}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator custom Catalyst piece (SURVEY §4.3 option (c)): top-k
  * rows per group as a first-class physical operator.
  *
  * Why a custom SparkPlan instead of the window idiom
  * (`row_number().over(partitionBy(g).orderBy(o)) <= k`): WindowExec
  * must SORT every partition on (group, order) — O(n log n) with full
  * materialization per partition — then compute ranks for every row and
  * throw most of them away. This operator keeps one bounded heap of k
  * rows per group — O(n log k) — and never sorts the input. Same
  * answer, strictly less work; the win grows with n/k, which at 100 TB
  * is the whole game (k=3 of millions of rows per group).
  *
  * MEMORY CONTRACT (hardened after the sf30/40 GB-heap suite run OOM'd
  * inside the unbounded heap map — group cardinality ~ row count makes
  * O(groups·k) state O(input)): the per-partition group map is CAPPED
  * at `graft.topk.maxGroupsPerPartition` (default 2^20). On overflow
  *  - the PARTIAL exec PASSES the row THROUGH unchanged: a partial
  *    top-k is a filter guaranteed to retain each group's top-k, so
  *    forwarding a superset is always correct — the final re-selects
  *    (the same stance as Spark's skip-partial-aggregation path);
  *  - the FINAL exec falls back to GRACE-HASH REGROUPING: overflow rows
  *    (whose groups are disjoint from the in-map groups by construction
  *    — once full, no new group enters the map) spill to 16 temp files
  *    partitioned by a level-salted group hash, and each file is
  *    processed recursively with a fresh capped buffer after the map
  *    drains. Memory is O(cap·k) rows regardless of group cardinality;
  *    disk is one round-trip for the overflow remainder only.
  * Both overflow paths surface in the operator's SQL metrics
  * (passThroughRows / spilledRows) so a plan audit sees them.
  *
  * Plan contract: the strategy emits a PARTIAL/FINAL pair (the hash-
  * aggregate split): the partial heaps per input partition with no
  * distribution requirement, so the exchange ships at most groups·k
  * rows per partition (plus the documented overflow pass-through);
  * the final requires `ClusteredDistribution(group)` and re-heaps the
  * survivors. Rows are copied only when they enter a heap, and each
  * group's survivors emit in sort order for deterministic downstream
  * consumption.
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
  * [[TopKPerGroupExec]] pair, the same split hash aggregates use.
  * (Top-k of a union of per-partition top-ks is the global top-k:
  * any row outside a partition's local top-k is beaten by k rows that
  * did ship.) Injected either at session build (GraftExtensions
  * injectPlannerStrategy) or post-hoc via
  * `spark.experimental.extraStrategies` (graft.ops.TopK does this). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      // resolved HERE (planning time, driver) and carried as a plan
      // parameter: a constructor-evaluated val would re-read the conf
      // on every AQE copy(), long after the caller's conf scope closed
      val cap = math.max(1, org.apache.spark.sql.internal.SQLConf.get
        .getConfString("graft.topk.maxGroupsPerPartition", (1 << 20).toString)
        .toInt)
      TopKPerGroupExec(g, o, k,
        TopKPerGroupExec(g, o, k, planLater(child), partial = true, cap),
        partial = false, cap) :: Nil
    case _ => Nil
  }
}

/** Per-partition bounded-heap state shared by the interpreted
  * (`doExecute`) and whole-stage-codegen (`doProduce`/`doConsume`)
  * paths. Public and Java-friendly because generated code references
  * it by class name and calls `insert`/`drain` directly.
  *
  * `insert` returns true when the row was absorbed; false means the
  * group map is full, this is a PARTIAL buffer, and the caller must
  * emit the row downstream unchanged. A FINAL buffer never refuses a
  * row — past the cap it spills to the grace-hash files (see the
  * operator scaladoc) and recurses over them at drain time.
  */
final class TopKHeapBuffer(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    inputSchema: Seq[Attribute],
    k: Int,
    maxGroups: Int,
    passThroughOnOverflow: Boolean,
    passThroughMetric: SQLMetric,
    spillMetric: SQLMetric,
    level: Int = 0) {
  require(level <= 8, // 16^8 distinct groups per partition — unreachable
    s"grace-hash recursion exceeded depth 8 (groups per partition > 16^8?)")
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

  private val FanOut = 16
  private var spillFiles: Array[java.io.File] = _
  private var spillOuts: Array[java.io.DataOutputStream] = _
  private lazy val toUnsafe = UnsafeProjection.create(inputSchema, inputSchema)
  private val writeBuffer = new Array[Byte](4096)

  def insert(row: InternalRow): Boolean = {
    val key = groupProj(row)
    var heap = heaps.get(key)
    if (heap == null) {
      if (heaps.size >= maxGroups) {
        if (passThroughOnOverflow) { passThroughMetric.add(1); return false }
        spill(key, row); return true
      }
      heap = new java.util.PriorityQueue[InternalRow](k + 1, worstOnTop)
      heaps.put(key.copy(), heap)
    }
    if (heap.size < k) heap.add(row.copy())
    else if (ord.compare(row, heap.peek()) < 0) {
      heap.poll(); heap.add(row.copy())
    }
    true
  }

  /** Level-salted group-hash fan-out: rows in one spill file share
    * `hash % 16` at THIS level, so the next level must re-mix or every
    * row would land in one child file again. */
  private def part(key: UnsafeRow): Int = {
    val h = scala.util.hashing.byteswap32(
      key.hashCode ^ (0x9e3779b9 * (level + 1)))
    (h & Int.MaxValue) % FanOut
  }

  private def spill(key: UnsafeRow, row: InternalRow): Unit = {
    if (spillOuts == null) {
      // allocate under Spark's managed local dirs (ADVICE r11: tmpdir +
      // deleteOnExit lands on the wrong volume on real clusters and
      // leaks on kill -9); the task-completion listener covers the
      // task-failure path, where drain() never runs
      spillFiles = Array.tabulate(FanOut) { i =>
        org.apache.spark.sql.graftshim.GraftSqlShim
          .managedSpillFile(s"graft-topk-l$level-$i-")
      }
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          spillFiles.foreach(f => if (f.exists()) { f.delete(); () })
        })
      spillOuts = spillFiles.map(f => new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 16)))
    }
    val u = row match {
      case ur: UnsafeRow => ur
      case other => toUnsafe(other)
    }
    val out = spillOuts(part(key))
    out.writeInt(u.getSizeInBytes)
    u.writeToStream(out, writeBuffer)
    spillMetric.add(1)
  }

  /** Survivors: in-map groups first (each group in sort order — the
    * heap drains worst-first, reversed per group), then each grace-hash
    * spill file regrouped through a fresh capped buffer. The map is
    * cleared before the first file is read, so live state never exceeds
    * two caps. */
  def drain(): java.util.Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    if (spillOuts != null) spillOuts.foreach(_.close())
    val mem: Iterator[InternalRow] =
      heaps.values().iterator().asScala.flatMap { h =>
        val arr = new Array[InternalRow](h.size)
        var i = 0
        while (!h.isEmpty) { arr(i) = h.poll(); i += 1 }
        arr.reverseIterator
      }
    val all = if (spillFiles == null) mem else mem ++ {
      heaps.clear()
      // zero-length fan-out files have nothing to regroup — delete them
      // NOW (ADVICE r11: they used to linger until JVM exit)
      spillFiles.iterator.filter { f =>
        if (f.length() > 0) true else { f.delete(); false }
      }.flatMap { f =>
        val sub = new TopKHeapBuffer(groupExprs, order, inputSchema, k,
          maxGroups, passThroughOnOverflow = false,
          passThroughMetric, spillMetric, level + 1)
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(new java.io.FileInputStream(f), 1 << 16))
        val nFields = inputSchema.length
        try {
          var done = false
          while (!done) {
            val sz = try in.readInt() catch { case _: java.io.EOFException => done = true; -1 }
            if (!done) {
              val bytes = new Array[Byte](sz)
              in.readFully(bytes)
              val r = new UnsafeRow(nFields)
              r.pointTo(bytes, sz)
              sub.insert(r)
            }
          }
        } finally { in.close(); f.delete(); () }
        sub.drain().asScala
      }
    }
    all.asJava
  }
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false,
    maxGroups: Int = 1 << 20) extends UnaryExecNode with BlockingOperatorWithCodegen {

  // The FINAL is genuinely blocking (no row leaves before the input is
  // exhausted), so its child loop can drop shouldStop() checks — the
  // BlockingOperatorWithCodegen contract, kept as the mixin (its drain
  // loop may then call limitNotReachedCond without tripping Spark's
  // leaf-or-blocking assertion). The PARTIAL is NOT truly blocking:
  // overflow pass-through rows are consumed mid-production, and without
  // stop checks in the child loop every forwarded row piles up in the
  // WholeStageCodegen BufferedRowIterator's currentRows until the
  // partition ends — O(overflow) memory, the exact regression the map
  // cap exists to prevent (ADVICE r11). Re-overriding needStopCheck =
  // partial keeps the child loop re-entrant there: the produce loop's
  // iterator state lives in mutable fields, so processNext() resumes
  // where it returned, exactly like any streaming operator; the
  // parent's limit checks are inherited back for the same reason.
  override def needStopCheck: Boolean = partial
  override def limitNotReachedChecks: Seq[String] =
    if (partial) parent.limitNotReachedChecks else Nil

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "passThroughRows" -> SQLMetrics.createMetric(sparkContext,
      "rows forwarded unselected (partial group map full)"),
    "spilledRows" -> SQLMetrics.createMetric(sparkContext,
      "rows spilled for grace-hash regrouping (final group map full)"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  /** Called from generated code (via the plan reference object), once
    * per partition. The metrics are passed IN, resolved driver-side
    * before task serialization: a deserialized task-side plan copy that
    * touched `this.metrics` would lazily mint FRESH unregistered
    * accumulators and the driver's would stay at zero (measured — the
    * overflow counters read 0 while the overflow demonstrably ran). */
  def createBuffer(passM: SQLMetric, spillM: SQLMetric): TopKHeapBuffer =
    new TopKHeapBuffer(groupExprs, order, child.output, k, maxGroups,
      passThroughOnOverflow = partial, passM, spillM)

  protected override def doExecute(): RDD[InternalRow] = {
    val thisPlan = this
    val passM = longMetric("passThroughRows")
    val spillM = longMetric("spilledRows")
    child.execute().mapPartitions({ it =>
      val buf = thisPlan.createBuffer(passM, spillM)
      import scala.jdk.CollectionConverters._
      // overflow pass-through rows stream out ahead of the drain (the
      // final re-selects); `++`'s right side is by-name, so the drain
      // only materializes after the input is exhausted
      it.filter(r => !buf.insert(r)) ++ buf.drain().asScala
    }, preservesPartitioning = true)
  }

  // ---- whole-stage codegen (the SortExec blocking-operator shape):
  // doConsume feeds every child row into the heap buffer — emitting it
  // straight to the parent instead when the partial map refuses it
  // (the ExpandExec multiple-consume-sites pattern) — and doProduce
  // drives the child's produce loop once, then streams the drained
  // survivors. This keeps the operator INSIDE the WholeStageCodegen
  // span instead of breaking it at both edges.

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
    // resolve the metric accumulators on the DRIVER (codegen time) and
    // ship them as references — see createBuffer
    val passRef = ctx.addReferenceObj("passMetric", metrics("passThroughRows"),
      classOf[SQLMetric].getName)
    val spillRef = ctx.addReferenceObj("spillMetric", metrics("spilledRows"),
      classOf[SQLMetric].getName)
    bufferVariable = ctx.addMutableState(classOf[TopKHeapBuffer].getName, "topkBuffer",
      v => s"$v = $thisPlan.createBuffer($passRef, $spillRef);", forceInline = true)
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
    // Partial only: the child loop carries shouldStop() checks (see
    // needStopCheck), and its `return` exits addToBufferFunc — NOT
    // processNext — so "input exhausted" and "yielded with buffered
    // pass-through rows" both land here. shouldStop() disambiguates:
    // buffered rows ⇒ return now (needToHeap stays true; the next
    // processNext re-enters the child loop from its persisted iterator
    // state); clean fall-through ⇒ the input is done, drain. The final
    // never passes through and never buffers mid-consume, so its guard
    // is vacuous.
    s"""
       |if ($needToHeap) {
       |  $addToBufferFunc();
       |  if (shouldStop()) return;
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

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    // copy ONCE into a local before handing the row term to the parent:
    // consume() splices the term into every column access, so passing
    // the .copy() expression re-allocated a fresh row per field read
    // (ADVICE r11). The copy itself stays mandatory — the buffered
    // currentRows path retains the row past the child's buffer reuse.
    val passRow = ctx.freshName("topkPassRow")
    s"""
       |${row.code}
       |if (!$bufferVariable.insert((UnsafeRow) ${row.value})) {
       |  UnsafeRow $passRow = ((UnsafeRow) ${row.value}).copy();
       |  ${consume(ctx, null, passRow)}
       |}
     """.stripMargin
  }
}
