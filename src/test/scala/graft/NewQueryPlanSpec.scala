package graft

/** Plan shapes for the round-5 additions: the SCD2 build and the CDC
  * apply must each be ONE shuffle on the key (every window/sort shares
  * the (user_id → ts, event_id) ordering); the timeline and array
  * battery are plain two-phase hash aggregates with no window at all.
  * Pins the no-self-join / no-extra-exchange claims in the Scaladoc. */
class NewQueryPlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    // AQE's toString prints Final AND Initial sections — keep the final
    // one only, or every operator is double-counted
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  // key-hash exchanges only: the single rangepartitioning exchange is
  // the presentation orderBy, allowed by contract
  private def hashExchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).size

  test("events_scd2_state: one hash exchange, windows share one sort") {
    assume(new java.io.File(sf).isDirectory)
    val p = executedPlan("events_scd2_state")
    assert(hashExchanges(p) == 1, p.take(1200))
  }

  test("events_cdc_apply: one hash exchange for both window passes") {
    assume(new java.io.File(sf).isDirectory)
    val p = executedPlan("events_cdc_apply")
    assert(hashExchanges(p) == 1, p.take(1200))
  }

  test("events_user_timeline: hash aggregate, no window operator") {
    assume(new java.io.File(sf).isDirectory)
    val p = executedPlan("events_user_timeline")
    assert(!p.contains("Window"), p.take(1200))
    assert(p.contains("ObjectHashAggregate") || p.contains("HashAggregate"))
  }

  test("fn_array_battery: hash aggregate, no window operator") {
    assume(new java.io.File(sf).isDirectory)
    val p = executedPlan("fn_array_battery")
    assert(!p.contains("Window"), p.take(1200))
    assert(p.contains("ObjectHashAggregate") || p.contains("HashAggregate"))
  }

  test("scan_dpp_join: dynamic pruning subquery lands in the fact scan") {
    assume(new java.io.File(sf).isDirectory)
    val p = executedPlan("scan_dpp_join")
    assert(p.contains("dynamicpruning"),
      s"no dynamicpruning filter in the fact scan: ${p.take(1500)}")
  }

  test("events_attribution_last: bucketed equi-join, no BNLJ/cartesian") {
    assume(new java.io.File(sf).isDirectory)
    val p = executedPlan("events_attribution_last")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("text_bm25: global ranking bounded by TakeOrderedAndProject, not a corpus window") {
    assume(new java.io.File(sf).isDirectory)
    val p = executedPlan("text_bm25")
    // the heap-bounded top-k runs UNDER the k-row rank window: the sort
    // the window sees is over limit(k) output, never the scored corpus
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("mv_rewrite_joined: summary-side join broadcasts the dim, no shuffle join") {
    val p = executedPlan("mv_rewrite_joined")
    // the routed star: |days|×|types| summary rows join the 5-row dim —
    // Catalyst must pick a broadcast join (either side qualifies; a
    // sort-merge join here would mean the swap produced a shuffle)
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    // the scan is the summary mirror, not the raw firehose
    assert(p.contains("events_daily_"), p.take(1500))
    assert(!p.contains("events.parquet"), p.take(1500))
  }
}
