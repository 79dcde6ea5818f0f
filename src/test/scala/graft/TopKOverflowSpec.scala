package graft

import graft.ops.TopK
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The bounded-memory contract of the custom top-k operator, added after
  * the sf30 suite in a 40 GB heap OOM'd inside the then-unbounded heap
  * map (group cardinality ~ row count makes O(groups·k) state O(input)):
  *
  *  - group maps are capped at graft.topk.maxGroupsPerPartition;
  *  - the PARTIAL exec forwards overflow rows unchanged (the final
  *    re-selects — answers must be bit-identical to the uncapped run);
  *  - the FINAL exec grace-hash-spills overflow rows and regroups each
  *    spill file recursively — again answer-invariant;
  *  - both paths are visible in the operator's SQL metrics.
  *
  * The fixture has ~50× more groups than the test cap, so BOTH overflow
  * paths run (metrics-asserted, never vacuous), and with cap=1 the
  * grace-hash recursion descends at least one level (16 files at
  * cap 1 over 3000 groups → child buffers overflow again).
  *
  * Metric-reading discipline learned here the hard way: every Dataset
  * action calls executedPlan.resetMetrics(), and a re-collect SKIPS the
  * map stages (shuffle outputs are reused), so metrics of pre-shuffle
  * operators read ZERO after any second action on the same frame. Each
  * case therefore collects exactly once per plan, inside the conf scope,
  * and reads metrics with no further action in between.
  */
class TopKOverflowSpec extends SparkSpec {

  // 3000 groups × 3 rows, interleaved so no partition sees a group run
  private def wide = spark.range(9000)
    .select((col("id") % 3000).as("grp"), col("id"),
      (col("id") % 7).cast("double").as("score"))

  /** Plan AND run exactly once under the cap (the strategy resolves the
    * conf at planning time); returns the rows and the executed frame. */
  private def topk(cap: Int): (Seq[Seq[Any]], org.apache.spark.sql.DataFrame) = {
    spark.conf.set("graft.topk.maxGroupsPerPartition", cap.toString)
    // AQE wraps finished stages in leaf QueryStageExec nodes, which
    // plan.collect does not descend into — keep the plan flat so the
    // metric assertions can find both execs
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = TopK.perGroup(wide.toDF(), Seq("grp"),
        Seq(col("score").desc, col("id").asc), 2).orderBy("grp", "id")
      (df.collect().map(_.toSeq).toSeq, df)
    } finally {
      spark.conf.unset("graft.topk.maxGroupsPerPartition")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  private def metric(df: org.apache.spark.sql.DataFrame,
      node: String, name: String): Long = {
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    executed.collect {
      case e: graft.plans.TopKPerGroupExec if e.nodeName == node =>
        e.metrics(name).value
    }.sum
  }

  test("capped run is bit-identical to the uncapped run") {
    val (uncapped, _) = topk(1 << 20)
    val (got, capped) = topk(64)
    assert(got == uncapped)
    assert(got.size == 6000) // top-2 of every group survived both paths
    // neither overflow path was idle: the partial forwarded rows past
    // its 64-group map, the final grace-hash-spilled its own overflow
    assert(metric(capped, "TopKPerGroupPartial", "passThroughRows") > 0)
    assert(metric(capped, "TopKPerGroupFinal", "spilledRows") > 0)
  }

  test("grace-hash recursion (cap 1) still selects exactly top-k") {
    assert(topk(1)._1 == topk(1 << 20)._1)
  }

  test("partial's generated child loop keeps stop checks (bounded pass-through)") {
    // ADVICE r11: with BlockingOperatorWithCodegen semantics on the
    // PARTIAL, the child produce loop dropped shouldStop() — every
    // overflow pass-through row buffered in currentRows for the whole
    // partition (O(overflow) memory in the default codegen path). The
    // fix re-enables needStopCheck for the partial, so its span carries
    // a stop check in the child loop IN ADDITION to the drain loop's
    // (pre-fix the span had exactly one), and materializes the
    // pass-through copy into a single local (`topkPassRow`) instead of
    // re-evaluating .copy() per parent field access.
    spark.conf.set("graft.topk.maxGroupsPerPartition", "64")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = TopK.perGroup(wide.toDF(), Seq("grp"),
        Seq(col("score").desc, col("id").asc), 2)
      val gen = org.apache.spark.sql.execution.debug
        .codegenString(df.queryExecution.executedPlan)
      val partialSpan = gen.split("== Subtree").find(_.contains("topkPassRow"))
      assert(partialSpan.isDefined,
        "no codegen span contains the partial pass-through local")
      assert("shouldStop\\(\\)".r.findAllIn(partialSpan.get).size >= 2,
        "partial span must stop-check both the child loop and the drain loop")
    } finally {
      spark.conf.unset("graft.topk.maxGroupsPerPartition")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("window idiom equivalence under overflow") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val windowed = wide.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn").orderBy("grp", "id")
      .collect().map(_.toSeq).toSeq
    assert(topk(32)._1 == windowed)
  }
}
