package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[graft.plans.WindowTopKRewrite]] — the portable row_number idiom
  * must plan to the bounded-heap operator exactly when the rank column
  * is dropped, and the rewrite must not change any row. */
class WindowTopKRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def base = {
    graft.functions.VecExprs.register(spark) // post-hoc rule + strategy
    spark.range(0, 1000).select(
      (col("id") % 7).as("g"),
      (col("id") * 131 % 997).as("v"),
      col("id").as("tie"))
  }

  private val w = Window.partitionBy("g").orderBy(col("v").desc, col("tie"))

  test("drop-rank idiom rewrites to TopKPerGroup and keeps the same rows") {
    val idiom = base.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3).drop("rank")
    val plan = idiom.queryExecution.optimizedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Window"), plan)
    // same rows as the un-rewritten spelling (computed via the real
    // window by keeping the rank column, which blocks the rewrite)
    val expected = base.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("g", "v", "tie").as[(Long, Long, Long)].collect().sorted.toSeq
    val got = idiom.as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got.size == 21)
  }

  test("keeping the rank column keeps the Window but heap-limits its input") {
    // the consumer needs the rank number, so the Window survives — but
    // it now sorts ≤ groups·k heap survivors instead of the full input
    // (the sf10 ann_knn_join measurement: 213 s sorting 179M candidate
    // rows vs 16 s heaped). Rows AND ranks must match the plain window.
    val kept = base.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
    val plan = kept.queryExecution.optimizedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(plan.contains("Window") || plan.contains("window"), plan)
    val got = kept.select("g", "v", "tie", "rank")
      .as[(Long, Long, Long, Int)].collect().sorted.toSeq
    // independent expectation: per-group top-3 computed driver-side
    val expected = base.as[(Long, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
          .map { case ((g, v, t), i) => (g, v, t, i + 1) }
      }.sorted
    assert(got == expected)
  }

  test("a residual predicate merged into the rank filter still heaps") {
    // the optimizer collapses a downstream filter into the rank filter
    // (Filter(v > t && rank <= 3)) — the sf10 semantic-dedup edge build
    // paid a full 179M-row window sort because the old pattern only
    // matched a BARE rank comparison; the residual must re-apply above
    // the heap, same rows out
    val merged = base.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3).drop("rank")
      .filter(col("v") > 2)
    val plan = merged.queryExecution.optimizedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    val expected = base.as[(Long, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(3).filter(_._2 > 2)
      }.sorted
    assert(merged.as[(Long, Long, Long)].collect().sorted.toSeq == expected)
    // the rank-KEPT spelling with a merged residual heaps under the
    // window too
    val kept = base.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3 && col("v") > 2)
    val keptPlan = kept.queryExecution.optimizedPlan.toString
    assert(keptPlan.contains("TopKPerGroup"), keptPlan)
    assert(kept.drop("rank").as[(Long, Long, Long)].collect().sorted.toSeq
      == expected)
  }

  test("global (no-partition) row_number does not rewrite, and count() executes") {
    // a global window has no clustering key for the heap exec; and under
    // count(), column pruning drops the rank column from the Project, so
    // without the part.nonEmpty guard the pattern would suddenly match
    // (the text_bm25 bench regression)
    val wg = Window.orderBy(col("v").desc, col("tie"))
    val idiom = base.withColumn("rank", row_number().over(wg))
      .filter(col("rank") <= 5).drop("rank")
    assert(!idiom.queryExecution.optimizedPlan.toString.contains("TopKPerGroup"))
    assert(idiom.count() == 5L)
    // the kept-rank spelling (what text_bm25 actually writes) must also
    // survive count()'s pruning
    val kept = base.withColumn("rank", row_number().over(wg))
      .filter(col("rank") <= 5)
    assert(kept.count() == 5L)
  }

  test("rank/dense_rank do not rewrite (ties admit more than k rows)") {
    val r = base.withColumn("rank", rank().over(w))
      .filter(col("rank") <= 3).drop("rank")
    val plan = r.queryExecution.optimizedPlan.toString
    assert(!plan.contains("TopKPerGroup"), plan)
  }

  test("rn = 1 (keep-first dedup idiom) rewrites with k = 1") {
    val first = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val plan = first.queryExecution.optimizedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(first.count() == 7)
  }
}
