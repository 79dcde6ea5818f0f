package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step under near-dup
  * deduplication (pairs → components → one survivor per component).
  *
  * Two-level design (the shape production CC systems use):
  *
  *  1. '''Partition-local contraction''': a `mapPartitions` union–find
  *     collapses every chain whose edges happen to be co-located,
  *     emitting a (node → local root) star mapping. Memory is O(nodes
  *     per partition) — bounded by partition sizing, not graph size.
  *     Near-dup graphs are chain-heavy; this removes most of the
  *     diameter before any iteration (at toy scale, all of it).
  *  2. '''Global min-label propagation''' with pointer doubling
  *     (label ← label(label)) resolves the cross-partition structure in
  *     O(log contracted-diameter) rounds. Each round is one union +
  *     hash-aggregate + a pointer jump; convergence is witnessed by the
  *     exact-decimal Σlabel (labels only decrease, so the sum is
  *     strictly decreasing until fixpoint — a one-row aggregate, no
  *     changed-row count).
  *
  * Every round localCheckpoints: persist would keep nesting the logical
  * plan (~3× per round — the analyzer, not the data, blows up; see
  * NOTES.md). The loop's shuffle width is pinned to the edge volume and
  * restored afterwards — iteration state is tiny relative to the corpus
  * that produced the pairs.
  */
object Graph {

  /** Eager localCheckpoint with its carried statistics capped —
    * checkpointing preserves the child plan's computed sizeInBytes, and
    * an iterative self-join SQUARES it per round into a BigInt whose
    * mere multiplication stalls the driver (the sf10 semantic-dedup
    * lesson: 11+ minutes inside BigInteger.multiply during AQE stats
    * visits). Every in-loop checkpoint in this file must go through
    * here. */
  private def ckpt(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftshim.GraftSqlShim.capCheckpointStats(
      df.sparkSession, df.localCheckpoint(true))

  /** Shuffle width for the iteration loops: ~250k edges per partition,
    * floored at the lesser of 8 and the cluster's parallelism — the old
    * `edges/1e6` put a 1.2M-edge graph on ONE partition and serialized
    * every round onto a single core (measured: most of the sf10
    * semantic-dedup wall time), while tiny graphs keep tiny widths so
    * per-task overhead doesn't dominate gate-scale runs. */
  private def loopWidth(
      spark: org.apache.spark.sql.SparkSession, edges: Long): String =
    math.max(
      math.min(8, spark.sparkContext.defaultParallelism).toLong,
      edges / 250000L).toString

  /** Partition-local union–find with path compression + union-by-min:
    * contracts every co-located chain to its partition-local min root.
    * Pure per-partition imperative logic — the one place mapPartitions
    * is the right tool. */
  private def localContract(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val ks = parent.keys.toArray
        ks.iterator.map(k => (k, find(k)))
      }
      .toDF("id", "label")
  }

  /** Components of a DELTA-SIZED edge set: when the edges fit the
    * driver gate they are collected once (`limit(max+1)` — one job, no
    * separate count over a possibly-expensive edge plan) and labeled by
    * a single union-find pass whose unions always hang the larger root
    * under the smaller, so the final root IS the component minimum —
    * byte-identical contract to [[altStarComponents]] (min-id labels;
    * self-loop-only vertices self-label; absent vertices absent). An
    * incremental tick's contracted graph is O(delta) edges by
    * construction, and paying O(log²n) distributed star rounds of fixed
    * scheduler wall for a few thousand edges is exactly the overhead
    * this gate removes; past the gate it falls through to the
    * distributed alternating-star. The same size-gated-state stance as
    * LinkRank's broadcast gate: driver state is bounded by the
    * THRESHOLD, never by the data. */
  def componentsSizeGated(pairs: DataFrame,
      driverMaxEdges: Int = 2000000): DataFrame = {
    val Seq(ca, cb) = pairs.columns.toSeq.take(2)
    val spark = pairs.sparkSession
    val raw = pairs.select(col(ca).cast("long").as("a"),
      col(cb).cast("long").as("b"))
    val rows = raw.limit(driverMaxEdges + 1).collect()
    if (rows.length > driverMaxEdges) altStarComponents(pairs)
    else {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      rows.foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val out = parent.keys.toArray.sorted
        .map(k => org.apache.spark.sql.Row(k, find(k)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.toSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("label",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
  }

  /** Two-level decomposition shared by both distributed loops: the
    * partition-local union–find contracts every co-located chain, and
    * because every edge lives wholly inside one partition, two local
    * trees can only belong to the same component through a SHARED NODE
    * (one that appears in several partitions with differing local
    * roots). The quotient graph the distributed loop must still solve
    * is therefore exactly the BRIDGE set {(min-root, root)} of the
    * multi-rooted nodes — typically orders of magnitude smaller than
    * |E| (at sf0.1 the near-dup graph's 462 edges contract to zero
    * bridges; the loop runs on nothing). Returns
    * (mapping: id → mroot + all local roots, ckpt'd; bridges: quotient
    * edge list, NOT ckpt'd).
    * Label composition: component-min m* is its own local root in every
    * partition that sees it (it is the min of any set containing it),
    * so m* is a quotient vertex and the loop's min-label over the
    * quotient IS the component min; nodes whose root class never
    * bridges keep mroot, which in that case is the component min. */
  private def contractToBridges(edges: DataFrame): (DataFrame, DataFrame) = {
    val mapping = ckpt(localContract(edges)
      .groupBy(col("id"))
      .agg(min(col("label")).as("mroot"),
        collect_set(col("label")).as("roots")))
    val bridges = mapping
      .select(col("mroot"), explode(col("roots")).as("r"))
      .filter(col("r") =!= col("mroot"))
      .select(col("r").as("doc_a"), col("mroot").as("doc_b"))
    (mapping, bridges)
  }

  /** (node → component label) composed from the contraction mapping and
    * the distributed loop's labels over the quotient graph. */
  private def composeLabels(mapping: DataFrame, quotientLabels: DataFrame): DataFrame =
    mapping.select(col("id"), col("mroot"))
      .join(quotientLabels.select(col("id").as("qid"), col("label").as("qlabel")),
        col("mroot") === col("qid"), "left")
      .select(col("id"), coalesce(col("qlabel"), col("mroot")).as("label"))

  /** @param pairs undirected edges as two long columns (any names);
    *              vertices not present in any pair are absent from the
    *              output (they are their own singleton component).
    * @return (id, label) — label = min vertex id of the component.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val Seq(ca, cb) = pairs.columns.toSeq.take(2)
    val fwd = pairs.select(col(ca).as("doc_a"), col(cb).as("doc_b"))
    val spark = fwd.sparkSession
    // Level 1: contract in-partition structure; the min-label loop then
    // propagates over the BRIDGE quotient only (guide §2.3 — the loop
    // shuffles the quotient, never the full edge set; before this the
    // loop joined |E| rows per round to fix what is by construction
    // only the cross-partition residue). The union–find is
    // direction-agnostic, so the edge list is consumed ONCE, one-way —
    // the old symmetric 2|E| checkpoint is gone with the |E|-row loop.
    val (mapping, bridgesFwd) = contractToBridges(fwd)
    val bridges = ckpt(bridgesFwd.unionByName(
      bridgesFwd.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))))
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    val loopParts = loopWidth(spark, bridges.count())
    spark.conf.set("spark.sql.shuffle.partitions", loopParts)
    try {
      var labels = ckpt(bridges.select(col("doc_a").as("id")).distinct()
        .select(col("id"), col("id").as("label")))
      val edges = bridges
      // Convergence witness: labels only ever DECREASE (every update is a
      // least(...) over candidates that include the current label), so the
      // exact-decimal Σlabel is strictly decreasing until fixpoint and a
      // one-row aggregate replaces the old changed-row count. DECIMAL(38,0)
      // because at real scale Σ of 64-bit ids overflows a long.
      var prevSum: Option[java.math.BigDecimal] = None
      var converged = false
      var rounds = 0
      while (!converged && rounds < 40) {
        // one round = min over {self, neighbor labels, label-of-label}
        // assembled as a UNION into a single hash aggregate (no left
        // joins — the self candidate guarantees every id survives), then
        // a SECOND pointer jump before the checkpoint: distance-to-root
        // quarters per round instead of halving, for one extra small
        // join, which halves the number of scheduled rounds.
        val nbrCand = edges.join(labels, edges("doc_b") === labels("id"))
          .select(edges("doc_a").as("cid"), col("label"))
        val ptrCand = labels.as("l")
          .join(labels.as("p"), col("l.label") === col("p.id"))
          .select(col("l.id").as("cid"), col("p.label").as("label"))
        val selfCand = labels.select(col("id").as("cid"), col("label"))
        val step1 = selfCand.unionByName(nbrCand).unionByName(ptrCand)
          .groupBy(col("cid")).agg(min(col("label")).as("label"))
          .select(col("cid").as("id"), col("label"))
        val step2 = ckpt(step1.as("a")
          .join(step1.select(col("id").as("jid"), col("label").as("jlabel")).as("b"),
            col("a.label") === col("b.jid"), "left")
          .select(col("a.id").as("id"),
            least(col("a.label"), coalesce(col("b.jlabel"), col("a.label"))).as("label")))
        val s = step2
          .agg(sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
          .head.getDecimal(0)
        // An empty graph sums to SQL NULL — converged by definition (there is
        // nothing left to relabel), and comparing through it would NPE.
        converged = (s == null) || prevSum.exists(p => p != null && p.compareTo(s) == 0)
        prevSum = Some(s)
        labels = step2
        rounds += 1
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          System.err.println(s"[cc] round=$rounds sum=$s")
      }
      // Min-label propagation is Θ(log diameter) only after the local
      // contraction has eaten the chains; on a high-diameter graph whose
      // chains CROSS partitions it degrades toward Θ(diameter) and can
      // exhaust the cap — in which case the labels are NOT components
      // and returning them would be silently wrong (the sf10 semantic
      // k-NN graph did exactly this: 40 rounds, Σlabel still falling).
      // Fail loudly and point at the diameter-independent algorithm.
      require(converged,
        "connectedComponents did not converge within its round cap — " +
          "the graph's cross-partition diameter defeats min-label " +
          "propagation; use altStarComponents (O(log² n) rounds " +
          "independent of diameter) for this graph shape")
      composeLabels(mapping, labels)
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)
  }

  /** Connected components by the ALTERNATING algorithm — Large-Star /
    * Small-Star (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14). Same output contract as [[connectedComponents]]
    * (label = component-min vertex id), different convergence economics:
    * the round count is O(log² n) INDEPENDENT of component diameter,
    * where min-label propagation pays Θ(log diameter) only after the
    * partition-local contraction has eaten the chains. On a 100 TB
    * near-dup graph the clusters are shallow and both are fine; on
    * pathological chain-shaped graphs (linked time series, road-network
    * extracts) the alternating algorithm is the one that terminates in
    * bounded rounds — that is why it ships as a second mode rather than
    * a replacement.
    *
    * Each operation is expressed as a per-key MIN aggregate + join, never
    * a collected neighbor list (a hot vertex's adjacency stays
    * distributed; the groupBy carries one row per edge, map-side
    * combined):
    *  - large-star: for every u, link each LARGER neighbor v > u to
    *    m = min(Γ(u) ∪ u);
    *  - small-star: orient edges large→small; link each smaller
    *    neighbor and u itself to m = min(N(u) ∪ u).
    * Both preserve connectivity and only ever re-point vertices at
    * smaller ids; the fixpoint is a forest of min-rooted stars. The
    * fixpoint test is exact (count equality + one-sided except — equal
    * cardinality ⊇ check), not a checksum heuristic.
    */
  def altStarComponents(pairs: DataFrame): DataFrame = {
    val Seq(ca, cb) = pairs.columns.toSeq.take(2)
    val spark = pairs.sparkSession
    // Level 1 (same two-level shape as connectedComponents): contract
    // co-located structure per partition; the alternating rounds then
    // run on the BRIDGE quotient only. The O(log² n) round bound holds
    // a fortiori (the quotient is a minor of the input graph), and the
    // label contract is unchanged (see contractToBridges on why the
    // component min survives contraction). The edge list is consumed
    // once by the contraction pass — no |E|-row checkpoint.
    val (mapping, bridgesFwd) = contractToBridges(
      pairs.select(col(ca).cast("long").as("doc_a"),
        col(cb).cast("long").as("doc_b")))
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      def largeStar(e: DataFrame): DataFrame = {
        val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
        val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mb"))
          .select(col("a"), least(col("mb"), col("a")).as("m"))
        sym.join(mins, "a").filter(col("b") > col("a"))
          .select(col("b").as("a"), col("m").as("b"))
          .filter(col("a") =!= col("b")).distinct()
      }
      def smallStar(e: DataFrame): DataFrame = {
        val dir = e.select(greatest(col("a"), col("b")).as("a"),
            least(col("a"), col("b")).as("b"))
          .filter(col("a") =!= col("b"))
        val mins = dir.groupBy(col("a")).agg(min(col("b")).as("m"))
        dir.join(mins, "a").select(col("b").as("v"), col("m"))
          .unionByName(mins.select(col("a").as("v"), col("m")))
          .filter(col("v") =!= col("m"))
          .select(col("v").as("a"), col("m").as("b")).distinct()
      }
      var edges = ckpt(bridgesFwd
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
        .filter(col("a") =!= col("b")).distinct())
      // the count is tracked across rounds instead of re-counted: the
      // previous round's cardinality can't change under a checkpoint,
      // so re-running edges.count() every round was one pure-overhead job
      // per round (measured ~0.1 s/round of dedup_clusters_star's sf0.1
      // wall; the fixpoint test itself stays EXACT — count equality +
      // one-sided except, short-circuited so except only runs on
      // count-stable rounds)
      var edgeCnt = edges.count()
      spark.conf.set("spark.sql.shuffle.partitions", loopWidth(spark, edgeCnt))
      var converged = edgeCnt == 0
      var rounds = 0
      // O(log² n) bound ⇒ 64 rounds covers any graph that fits in a
      // long-keyed edge list; the cap exists only to bound a bug, so
      // exceeding it must FAIL, not silently label an unconverged edge
      // set (the labeling step below assumes a min-rooted star forest —
      // on a non-fixpoint it would emit wrong components with no error).
      val maxRounds = 64
      while (!converged && rounds < maxRounds) {
        val next = ckpt(smallStar(largeStar(edges)))
        val nextCnt = next.count()
        converged = nextCnt == edgeCnt && next.except(edges).isEmpty
        edges = next
        edgeCnt = nextCnt
        rounds += 1
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          System.err.println(s"[altstar] round=$rounds edges=$edgeCnt")
      }
      require(converged,
        s"altStarComponents did not reach its star-forest fixpoint in " +
          s"$maxRounds alternating rounds — refusing to label an " +
          s"unconverged edge set (labels would be silently wrong)")
      // Star state over the quotient: (child, root) with root = class
      // min; roots carry no outgoing edge, so they self-label. Composed
      // through the contraction mapping, a local root whose class never
      // bridged falls through the left join to itself — same singleton
      // semantics as before (vertices that only ever appeared in
      // self-loop pairs are in the mapping and self-label).
      val lbl = edges.select(col("a").as("id"), col("b").as("label"))
        .unionByName(edges.select(col("b").as("id"), col("b").as("label")))
        .groupBy(col("id")).agg(min(col("label")).as("label"))
      composeLabels(mapping, lbl)
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedParts)
  }
}
