package graft

/** Physical-plan shape assertions — the 100 TB contract, checked on the
  * sf0.001 tables. Correctness says the operators compute the right
  * answer; these tests pin HOW: filters reach the parquet scan, bounded
  * dims broadcast, global top-k avoids a total sort, and nothing falls
  * into a cartesian/BNLJ product except the deliberate broadcast probes.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed to the lineitem scan, schema pruned") {
    val p = plan("q1_lineitem_agg")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), p)
    // projection pruning: untouched wide columns never leave the scan
    assert(!p.contains("l_comment"), p)
  }

  test("q5: bounded dims (nation, region) join via broadcast hash join") {
    val p = plan("q5_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan("topk_global_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("topk_per_group_custom plans the custom bounded-heap exec") {
    val p = plan("topk_per_group_custom")
    assert(p.contains("TopKPerGroup"), p)
  }

  test("topk custom exec participates in whole-stage codegen (no span break)") {
    // '*(n) TopKPerGroup…' = inside a WholeStageCodegen span; a bare
    // node name means the operator fell back to the interpreted path
    // and broke the fused span at both edges. AQE only collapses
    // codegen stages at execution, so materialize before reading the
    // final plan.
    val df = SparkEntry.queries("topk_per_group_custom")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) TopKPerGroupPartial""".r.findFirstIn(p).isDefined, p)
    assert("""\*\(\d+\) TopKPerGroupFinal""".r.findFirstIn(p).isDefined, p)
  }

  test("bucketed co-located join: the only exchange is the final sort") {
    // force the planner off broadcast so the join must rely on the
    // bucket layout (a broadcast would hide exactly the shuffle this
    // test is about)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("join_bucketed_colocated")
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges == 1, s"expected only the ORDER BY exchange:\n$p")
      assert(p.contains("SortMergeJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("partitioned mirror scan prunes language partitions at planning time") {
    val p = plan("scan_partition_pruned")
    // the lang predicate must land in PartitionFilters (directory-level
    // pruning), not as a data filter evaluated per row
    val pf = "PartitionFilters: \\[[^\\]]*lang".r
    assert(pf.findFirstIn(p).isDefined, p)
  }

  test("z-order box query prunes grid-cell partitions at planning time") {
    val p = plan("scan_zorder_cells")
    // the covering-cell IN list must land in PartitionFilters
    // (directory pruning); the box residual stays a pushed data filter
    val pf = "PartitionFilters: \\[[^\\]]*zcell".r
    assert(pf.findFirstIn(p).isDefined, p)
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("o_custkey"), p)
  }

  test("bucketized range join stays an equi-join — no cartesian/BNLJ") {
    val p = plan("join_range_events")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("near-dup candidate joins are equi-joins — no cartesian/BNLJ") {
    for (q <- Seq("dedup_near_jaccard", "dedup_near_minhash", "dedup_near_simhash")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q:\n$p")
    }
  }

  test("brute-force ANN broadcasts the probe side (deliberate BNLJ), never cartesian") {
    val p = plan("ann_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("emb_neardup_pairs: block-partitioned pair join is an equi-join — no cartesian/BNLJ") {
    val p = plan("emb_neardup_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("text_tfidf builds lazily — zero table rows read at plan construction") {
    // Round-1 bug: a driver-side documents.count() at build time — a full
    // table scan before the query even ran. Parquet schema-inference /
    // file-listing jobs are fine (metadata, scales with file count); what
    // must not happen is a build-time job reading table ROWS. Job-group
    // tagging is thread-local, so concurrent suites can't pollute this.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
    val sc = spark.sparkContext
    val group = "graft-lazy-tfidf"
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val rows = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (Option(e.properties).exists(_.getProperty("spark.jobGroup.id") == group))
          stages.add(e.stageInfo.stageId)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (stages.contains(e.stageId) && e.taskMetrics != null)
          rows.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup(group, "lazy build check", interruptOnCancel = false)
      try SparkEntry.queries("text_tfidf")(spark, sf).queryExecution.executedPlan
      finally sc.clearJobGroup()
      // marker job in its OWN group (so its 1 range-record isn't counted):
      // it starts only after any build-time job has finished
      val marker = "graft-lazy-marker"
      sc.setJobGroup(marker, "flush", interruptOnCancel = false)
      try spark.range(1).count()
      finally sc.clearJobGroup()
      // listener bus is async but ordered: once the marker job is visible,
      // every earlier build-time task-end has been delivered
      val deadline = System.currentTimeMillis() + 10000
      var ids = Array.empty[Int]
      while (ids.isEmpty && System.currentTimeMillis() < deadline) {
        ids = sc.statusTracker.getJobIdsForGroup(marker)
        if (ids.isEmpty) Thread.sleep(50)
      }
      assert(ids.nonEmpty, "marker job never surfaced in the status tracker")
      Thread.sleep(200) // marker's own task-end events
      assert(rows.get() == 0,
        s"plan construction read ${rows.get()} table rows — build must be lazy")
    } finally sc.removeSparkListener(listener)
  }

  test("dedup_incremental: delta join dynamically prunes index partitions") {
    // the whole point of the persisted (band, pfx)-partitioned signature
    // index: an ingest tick's delta⋈corpus join must touch only the
    // partitions whose buckets the delta hits, not scan the index
    val p = plan("dedup_incremental")
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"index scan shows no dynamic partition pruning:\n$p")
    assert(p.contains("PartitionFilters"), p)
  }

  test("ann_ivf_bucketed: probe join dynamically prunes cell partitions") {
    // the IVF-layout serving contract: the scan of the cell-partitioned
    // corpus mirror must carry a dynamic pruning subquery from the
    // broadcast probe side — query IO scales with cells probed, not
    // corpus size
    val p = plan("ann_ivf_bucketed")
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"cell-partitioned scan shows no dynamic partition pruning:\n$p")
    assert(p.contains("PartitionFilters"), p)
  }

  test("doc_rolling_hash plans the codegen'd rabin_karp, not the HOF fold") {
    val p = plan("doc_rolling_hash")
    assert(p.contains("rabin_karp"), p)
    assert(!p.contains("aggregate("), p)
  }

  test("similarity queries run the codegen'd vec_dot, not the HOF fold") {
    val p = plan("emb_neardup_pairs")
    assert(p.contains("vec_dot"), p)
    assert(!p.contains("zip_with"), p)
  }

  test("scan_orc_mirror: status filter pushed to the ORC scan, schema pruned") {
    val p = plan("scan_orc_mirror")
    assert(p.toLowerCase.contains("orc"), p)
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("o_orderstatus"), p)
    // untouched columns never leave the scan regardless of format
    assert(!p.contains("o_custkey"), p)
  }

  test("graph_triangles: oriented-edge closure joins are equi-joins — no cartesian/BNLJ") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("graph_pagerank scale path: over the gate, no forced broadcast of the |V| state") {
    // the broadcast of the rank/degree state is SIZE-GATED
    // (graft.linkrank.broadcastMaxNodes): force the gate to 0 — the
    // web-graph regime where a forced broadcast of a data-sized state
    // frame would OOM — and the per-round join must plan shuffle/SMJ
    // against the bucketed edge mirror, with no BroadcastExchange
    // anywhere (autoBroadcastJoinThreshold off isolates the gate from
    // the planner's own small-table choice). Results must match the
    // broadcast path bit-for-bit.
    spark.conf.set("graft.linkrank.broadcastMaxNodes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("graph_pagerank")(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange"),
        s"gated-off state still plans a broadcast:\n$p")
      assert(p.contains("SortMergeJoin"), p)
      val shuffled = df.collect().toSeq
      spark.conf.set("graft.linkrank.broadcastMaxNodes", "5000000")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      val broadcasted = SparkEntry.queries("graph_pagerank")(spark, sf).collect().toSeq
      assert(shuffled == broadcasted,
        "shuffle-path and broadcast-path ranks diverge")
    } finally {
      spark.conf.set("graft.linkrank.broadcastMaxNodes", "5000000")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("graph_pagerank: per-round state join reads the bucketed edge mirror co-located") {
    // the |E|-row side must come from the bucketed catalog mirror (one
    // bucketing shuffle paid at build, none per query): the scan
    // reports its bucket selection, and with broadcast off the only
    // exchanges are on the |V|-row state side, never under a scan of
    // the edge table
    spark.conf.set("graft.linkrank.broadcastMaxNodes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SparkEntry.queries("graph_pagerank")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount"),
        s"edge side is not a bucketed scan:\n$p")
    } finally {
      spark.conf.set("graft.linkrank.broadcastMaxNodes", "5000000")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("graph_hits scale path: over the gate, state broadcasts only 1-row totals") {
    // same gate as pagerank, but HITS legitimately broadcasts its L1
    // totals — 1-row frames — per half-step. With the gate forced to 0
    // and the planner's own broadcast choice off, every remaining
    // BroadcastExchange must be one of those single-`tot`-column
    // frames; the |V|-row state itself must join as shuffle/SMJ against
    // the bucketed edge scan. Both paths must agree bit-for-bit.
    spark.conf.set("graft.linkrank.broadcastMaxNodes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("graph_hits")(spark, sf)
      val exec = df.queryExecution.executedPlan
      val bcasts = exec.collectWithSubqueries {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          b.child.output.map(_.name)
      }
      assert(bcasts.forall(_ == Seq("tot")),
        s"non-total frame broadcast under gate 0: $bcasts\n$exec")
      assert(exec.toString.contains("SortMergeJoin"), exec.toString)
      assert(exec.toString.contains("SelectedBucketsCount"),
        s"edge side is not a bucketed scan:\n$exec")
      val shuffled = df.collect().toSeq
      spark.conf.set("graft.linkrank.broadcastMaxNodes", "5000000")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      val broadcasted = SparkEntry.queries("graph_hits")(spark, sf).collect().toSeq
      assert(shuffled == broadcasted,
        "shuffle-path and broadcast-path authorities diverge")
    } finally {
      spark.conf.set("graft.linkrank.broadcastMaxNodes", "5000000")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("prefix-sum queries never plan the single-partition global window") {
    // curate_sample_weighted / curate_shuffle_epoch spell
    // `SUM/ROW_NUMBER OVER (ORDER BY ...)` in their ORACLES; the Spark
    // plans must carry NO WindowExec at all — the two-pass offset
    // scheme (PrefixSums/DenseIds) replaces it, and a window sneaking
    // back in would funnel the corpus through one task
    for (q <- Seq("curate_sample_weighted", "curate_shuffle_epoch")) {
      val exec = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
      val windows = exec.collectWithSubqueries {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty, s"$q plans a window:\n$exec")
    }
  }

  test("text_containment candidate generation is bucketed — no cartesian/BNLJ") {
    val p = plan("text_containment")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ann_pq_topk: ADC search is equi-joins over broadcast tables — no cartesian") {
    val p = plan("ann_pq_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ETL pipeline clean path shuffles only for the final sort") {
    val p = plan("pipeline_clean")
    val exchanges = "Exchange".r.findAllIn(p).length
    // one rangepartitioning exchange for the deterministic ORDER BY;
    // transform/validate themselves are pure map-side projections
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$p")
  }
}
