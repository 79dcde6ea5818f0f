package graft

/** Shuffle BUDGETS for headline queries — the regression net for the
  * scale discipline the Scaladocs claim. Each entry pins the number of
  * hash-partitioning exchanges in the final (AQE) plan: a future edit
  * that sneaks an extra shuffle into a hot query fails HERE with the
  * query named, instead of surfacing as a quiet bench regression three
  * rounds later. Range exchanges (presentation orderBy) are excluded by
  * contract, same as NewQueryPlanSpec.
  *
  * Budgets are exact counts, not ≤-bounds: a DROP in shuffles is also
  * worth noticing (it usually means a join degenerated to broadcast or
  * a rewrite fired where it didn't before) — update the number with the
  * reason in the commit, either way.
  */
class PlanBudgetSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def hashExchanges(q: String): Int = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    "Exchange hashpartitioning".r.findAllIn(fin).size
  }

  private val budgets: Seq[(String, Int)] = Seq(
    // one two-phase hash aggregate each
    "q1_lineitem_agg" -> 1,
    "events_tumbling_hourly" -> 1,
    "events_ts_quarantine" -> 1,
    // MV routing: aggregate over the |days|×|types| summary, not events
    "mv_rewrite_daily" -> 1,
    // per-user window + per-type aggregate
    "events_late_watermark" -> 2,
    // WindowTopKRewrite fires: one clustering exchange for the heap
    "dedup_lineitem" -> 1,
    // bucketed mirrors co-locate the fact⋈fact join: zero hash shuffles
    "join_bucketed_colocated" -> 0
  )

  budgets.foreach { case (q, budget) =>
    test(s"$q stays at $budget hash exchange(s)") {
      assume(new java.io.File(sf).isDirectory)
      val got = hashExchanges(q)
      assert(got == budget,
        s"$q: $got hash exchanges, budget $budget — a shuffle appeared or " +
          "disappeared; re-derive the plan story before updating the budget")
    }
  }
}
