package graft.queries

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link analysis (PageRank) over the customer↔supplier shipment graph —
  * the source-authority signal large-scale curation pipelines use to
  * weight crawl sources (rank flows to suppliers many well-connected
  * customers buy from, exactly how domain authority flows to documents).
  *
  * Deterministic by the suite's rules so a DuckDB oracle can replay the
  * power iteration CTE-by-CTE (same discipline as the k-means trainer in
  * [[Similarity]]):
  *  - undirected edge set (each distinct customer—supplier shipment pair
  *    contributes both directions), so every node has degree >= 1 and no
  *    dangling-mass redistribution is needed;
  *  - FIXED 3 iterations, damping 0.85, uniform 1/N init;
  *  - per-edge contributions rank/deg are doubles, but each is
  *    floor-quantized to 1e-15 units (pure IEEE multiply + floor —
  *    identical both engines, unlike a double→decimal cast) and summed
  *    as int64 ⇒ the per-node fold is EXACT and partition-order
  *    independent; one double division + damping per round, same
  *    operation order both engines.
  *
  * Scale shape: ranks are |V| rows, edges |E| rows. The edge list lives
  * as a bucketed+sorted catalog mirror keyed on `src`
  * ([[graft.ops.Bucketing]]), so each round's equi-join (ranks ⋈ edges
  * on src) never re-shuffles the |E|-row side — only the |V|-row state
  * moves per round. Whether the state side broadcasts is SIZE-GATED at
  * plan construction (`graft.linkrank.broadcastMaxNodes`, default 5e6):
  * under the gate a broadcast skips even the state shuffle; over it (a
  * web-scale graph whose |V|-row state would OOM a forced broadcast)
  * the join plans as a co-located SMJ against the bucketed edge scan.
  * PlanSpec pins the over-gate path: no BroadcastExchange of the state.
  * Contributions partial-aggregate map-side either way, so only
  * |V|-sized per-node sums cross the wire per round. No driver actions
  * inside the loop; 3 rounds of plan nesting stay well under the
  * analyzer budget that forces `localCheckpoint` in the unbounded-round
  * CC loop ([[graft.ops.Graph]]).
  */
object LinkRank {

  private val Iters = 3
  private val Damping = 0.85
  private val Unit = 1e15

  /** Nodes are LONG-encoded — customers at 2·custkey, suppliers at
    * 2·suppkey+1. Integer keys keep every shuffle (degree, per-round
    * contribution agg) on 8-byte codegen'd hashes; the human-readable
    * label is reconstructed only for the final top-20 projection.
    *
    * Graph CONSTRUCTION (the orders⋈lineitem join + distinct — the
    * expensive part) is a write-once, fingerprint-memoized BUCKETED
    * catalog mirror of the directed edge list (both directions),
    * bucketed+sorted on `src`: at 100 TB the edge list is built at
    * ingest/compaction time and every analytics run starts from the
    * co-located materialized graph, not the raw fact tables — the
    * per-round join then shuffles only the |V|-row state. The tag
    * carries BOTH sources' fingerprints, so regenerating either table
    * rebuilds. */
  private def edgesTable(spark: SparkSession, dir: String): String = {
    val fpO = graft.ops.IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val fpL = graft.ops.IncrementalDedup.sourceFingerprint(spark, s"$dir/lineitem.parquet")
    // edge volume tracks the lineitem join — size buckets from it
    val n = graft.ops.Bucketing.bucketCountFor(spark, s"$dir/lineitem.parquet")
    val t = s"linkrank_edges_b${n}_${dir}_${fpO}_$fpL".replaceAll("[^A-Za-z0-9_]", "_")
    graft.ops.Bucketing.ensureTable(spark, t, "src", n) {
      val pairs = T.orders(spark, dir)
        .join(T.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
        .select(
          (col("o_custkey") * 2).as("c_node"),
          (col("l_suppkey") * 2 + 1).as("s_node"))
        .distinct()
      pairs.select(col("c_node").as("src"), col("s_node").as("dst"))
        .union(pairs.select(col("s_node").as("src"), col("c_node").as("dst")))
    }
  }

  private def edges(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    spark.table(edgesTable(spark, dir))
  }

  /** Degree SIDECAR next to the edge mirror: (node, deg) materialized
    * once per edge-mirror build (the name inherits the mirror's source
    * fingerprints, so a regenerated graph rebuilds both). Two costs it
    * removes from every pagerank run: the per-session |E|-row degree
    * aggregation, and the eager `deg.count()` job that fed the
    * broadcast gate and the 1/|V| constants — |V| now comes off the
    * sidecar's parquet FOOTERS, a driver-side metadata read of a
    * handful of files, no Spark job at all. At 100 TB the same move
    * holds: degree is a vertex property maintained at graph-ingest
    * time, and |V| is a catalog statistic, not a nightly count query. */
  private def degSidecar(spark: SparkSession, dir: String): (DataFrame, Long) = {
    val et = edgesTable(spark, dir)
    val path = s"${sys.props("java.io.tmpdir")}/graft-buckets/${et}_deg"
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = success.getFileSystem(conf)
    if (!fs.exists(success)) {
      spark.table(et).groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    // |V| from footer row counts: metadata-only, driver-side
    val nV = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(st.getPath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        } finally r.close()
      }.sum
    (graft.T.readCached(spark, path), nV)
  }

  /** One damped power-iteration round over the bucketed edge mirror —
    * the shared step of the fixed-count gate query and the
    * convergence-mode scale path. The iteration state carries (node,
    * deg, rank) — |V| rows — so the per-round contribution is rank/deg
    * computed INSIDE the state and the |E|-row edge list is read as-is
    * from the mirror: deg is a |V|-sized property, keep it on the
    * |V|-sized side. The broadcast gate: a forced hint on a web-scale
    * |V|-row state is a driver OOM, so over the gate the state joins as
    * a plain shuffle/SMJ against the co-located bucketed edge scan. */
  private def prStep(e: DataFrame, deg: DataFrame, nV: Long,
      gate: DataFrame => DataFrame)(ranks: DataFrame): DataFrame = {
    val contrib = e
      .join(gate(ranks), col("src") === col("node"))
      .select(col("dst"),
        floor(col("rank") / col("deg") * lit(Unit)).cast("long").as("units"))
      .groupBy(col("dst")).agg(sum(col("units")).as("u"))
    contrib
      .join(gate(deg), col("dst") === col("node"))
      .select(col("node"), col("deg"),
        // driver-side 0.15/nV, NOT lit(1-Damping)/nn: 1.0-0.85 in IEEE
        // is 0.15000000000000002, while Scala's 0.15 literal and the
        // oracle's CAST(0.15 AS DOUBLE) are both the nearest double to
        // 0.15 — and the / nV divide is the same IEEE op both sides
        (lit(0.15 / nV) +
          lit(Damping) * (col("u").cast("double") / lit(Unit))).as("rank"))
  }

  /** `rounds` fixed power rounds from the uniform start. deg and |V|
    * come off the persisted sidecar: no per-session degree aggregation,
    * no eager count job. */
  private[graft] def powerState(spark: SparkSession, dir: String,
      rounds: Int): DataFrame = {
    val e = edges(spark, dir)
    val (deg, nV) = degSidecar(spark, dir)
    val gateMax = spark.conf.get("graft.linkrank.broadcastMaxNodes", "5000000").toLong
    val gate: DataFrame => DataFrame =
      if (nV <= gateMax) df => df.hint("broadcast") else df => df
    var ranks = deg.select(col("node"), col("deg"), lit(1.0 / nV).as("rank"))
    for (round <- 1 to rounds) {
      ranks = prStep(e, deg, nV, gate)(ranks)
      // Over the gate (the web-graph regime), materialize the |V|-row
      // state BETWEEN rounds. Lazily chaining all rounds into one DAG
      // lets the scheduler run stages from different rounds
      // concurrently, and at sf100 (56 GB heap, 32-way tasks) the
      // overlapping SMJ sorts + hash aggregates exhausted the unified
      // pool mid-suite (UNABLE_TO_ACQUIRE_MEMORY, VERDICT r12 #4).
      // Per-round materialization serializes the rounds — peak demand
      // is ONE round's joins, invariant in the round count — and
      // truncates the lineage the same way the convergence loop already
      // does. The LAST round stays lazy: its input is already
      // materialized (same memory bound) and the caller's plan keeps the
      // round-step joins inspectable (PlanSpec pins SMJ + bucketed edge
      // scan on it). The int64-unit contribution sum is
      // order-independent, so the cut changes no value (PlanSpec pins
      // gate-0 ≡ broadcast bit-for-bit). Under the gate the state is
      // broadcast-sized; the one-job lazy plan is cheaper and the
      // oracle-gated path stays untouched.
      if (nV > gateMax && round < rounds) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Convergence mode — the production stopping rule the fixed-count
    * gate deliberately avoids (a data-dependent round count cannot be
    * CTE-replayed by the oracle): iterate until the L1 rank movement
    * `Σ|units_t − units_{t−1}|` (int64 1e-15 units — exact, order-
    * independent) drops to `l1Units`, or `maxRounds`. Costs one extra
    * |V|-sized join + 1-row aggregate per round; state is
    * localCheckpointed so the plan never grows with the round count.
    * Returns (final state, rounds run). GraphSpec pins bit-equality
    * with [[powerState]] at the returned round count — the stopping
    * rule changes WHEN you stop, never what a round computes. */
  def pagerankConverged(spark: SparkSession, dir: String,
      l1Units: Long = 1000000000L, maxRounds: Int = 50): (DataFrame, Int) = {
    val e = edges(spark, dir)
    val (deg, nV) = degSidecar(spark, dir)
    val gateMax = spark.conf.get("graft.linkrank.broadcastMaxNodes", "5000000").toLong
    val gate: DataFrame => DataFrame =
      if (nV <= gateMax) df => df.hint("broadcast") else df => df
    var ranks = deg.select(col("node"), col("deg"), lit(1.0 / nV).as("rank"))
      .localCheckpoint()
    var round = 0
    while (round < maxRounds) {
      val next = prStep(e, deg, nV, gate)(ranks).localCheckpoint()
      round += 1
      val moved = next.select(col("node"),
          floor(col("rank") * lit(Unit)).cast("long").as("nu"))
        .join(ranks.select(col("node"),
          floor(col("rank") * lit(Unit)).cast("long").as("ou")), "node")
        .agg(sum(abs(col("nu") - col("ou")))).first().getLong(0)
      ranks = next
      if (moved <= l1Units) return (ranks, round)
    }
    (ranks, round)
  }

  private def pagerank(spark: SparkSession, dir: String): DataFrame =
    powerState(spark, dir, Iters)
      .filter(col("node") % 2 === 1)
      .select(concat(lit("s"), expr("node div 2")).as("node"),
        col("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(20)

  /** The power iteration unrolled to CTEs, one block per round —
    * mirrors the Spark loop step for step. */
  private def pagerankSql: String = {
    val sb = new StringBuilder
    sb.append(
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT c_node AS src, s_node AS dst FROM pairs
        |      UNION ALL SELECT s_node, c_node FROM pairs),
        |deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
        |nn AS (SELECT COUNT(*) AS n FROM deg),
        |r0 AS (SELECT node, deg, CAST(1.0 AS DOUBLE) / n AS rank FROM deg, nn)""".stripMargin)
    for (t <- 1 to Iters) {
      val prev = s"r${t - 1}"
      sb.append(s"""
        |, c$t AS (
        |  SELECT dst, SUM(CAST(floor(rank / deg * 1e15) AS BIGINT)) AS u
        |  FROM $prev JOIN e ON node = src GROUP BY dst),
        |r$t AS (
        |  SELECT node, deg.deg AS deg,
        |    CAST(0.15 AS DOUBLE) / n + CAST(0.85 AS DOUBLE) * (CAST(u AS DOUBLE) / 1e15) AS rank
        |  FROM c$t JOIN deg ON dst = node, nn)""".stripMargin)
    }
    sb.append(s"""
      |SELECT 's' || CAST(node // 2 AS BIGINT) AS node, rank FROM r$Iters
      |WHERE node % 2 = 1
      |ORDER BY rank DESC, node
      |LIMIT 20""".stripMargin)
    sb.toString
  }

  // -------------------------------------------------------------------
  // graph_triangles — triangle counting over the supplier co-shipment
  // graph (suppliers appearing on the same high-quantity order are
  // linked). The per-node triangle count is the clustering-coefficient
  // numerator — the link-analysis primitive next to PageRank for
  // weighting crawl sources by how tightly knit their neighborhood is.
  //
  // Shape at scale: edges are ORIENTED low-degree → high-degree with id
  // tie-break — the Chiba–Nishizeki/Schank ordering — so every triangle
  // {a,b,c} (a<b<c in the (deg,id) total order) is enumerated exactly
  // once as the wedge (a,b)+(b,c) closed by the single lookup (a,c):
  // two equi-joins on the oriented edge list, never an all-pairs
  // expansion. Degree-orientation is what survives power-law graphs —
  // under id-order a hot node's wedge fan-out is unbounded (every
  // lower-id neighbor pairs with every higher-id one), while
  // degree-order bounds per-node out-degree by O(sqrt(|E|))/arboricity.
  // GraphSpec's ScalaCheck property pins count-equivalence of the two
  // orientations on generated power-law graphs. Edge generation is
  // bucket-collect (suppliers per order, sorted, ordered pairs
  // exploded), not an |order|-keyed self-join that would evaluate the
  // scan subplan twice (NOTES.md).
  private def triangles(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val hi = T.lineitem(spark, dir)
      .filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_suppkey"))
    val und = hi.groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_suppkey"))).as("ss"))
      .select(explode(expr(
        "flatten(transform(ss, (x, i) -> " +
          "transform(slice(ss, i + 2, size(ss)), y -> struct(x AS s1, y AS s2))))"))
        .as("p"))
      .select(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .distinct()
    val fp = graft.ops.IncrementalDedup.sourceFingerprint(
      spark, s"$dir/lineitem.parquet")
    trianglesOf(orientByDegree(und), spillKey = s"lineitem_$fp", reuse = true)
      .orderBy(col("triangles").desc, col("suppkey"))
      .limit(10)
  }

  /** Re-orient an undirected edge set (given id-oriented, s1 < s2) into
    * the degree total order: low-(degree, id) endpoint first. The
    * degree join is |E| ⋈ |V| twice — at scale the |V|-row degree side
    * is exactly the frame the planner may broadcast on its own size
    * estimate; no forced hint. */
  private[graft] def orientByDegree(und: DataFrame): DataFrame = {
    val d = und.select(col("s1").as("node"))
      .union(und.select(col("s2").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val d1 = d.select(col("node").as("n1"), col("deg").as("deg1"))
    val d2 = d.select(col("node").as("n2"), col("deg").as("deg2"))
    val firstIsLower = col("deg1") < col("deg2") ||
      (col("deg1") === col("deg2") && col("s1") < col("s2"))
    und.join(d1, col("s1") === col("n1"))
      .join(d2, col("s2") === col("n2"))
      .select(
        when(firstIsLower, col("s1")).otherwise(col("s2")).as("s1"),
        when(firstIsLower, col("s2")).otherwise(col("s1")).as("s2"))
  }

  /** Wedge-closure triangle count over an edge list oriented by any
    * strict total order: ab ⋈ bc on the middle node, closed by the
    * single ac lookup — per-node triangle counts via the 3-way node
    * explode. Orientation-agnostic (any total order enumerates each
    * triangle exactly once), which is what GraphSpec's equivalence
    * property exercises. */
  private[graft] def trianglesOf(oriented: DataFrame,
      spillKey: String = "adhoc", reuse: Boolean = false): DataFrame = {
    // Spill the oriented edge list to a temp parquet and read it back for
    // the three self-join arms — the same disk-backed reuse persist()
    // bought, but with nothing left in the block manager afterwards (the
    // old persist() had no unpersist and leaked cached blocks across a
    // 173-query session; GraphSpec now pins getPersistentRDDs empty).
    // The spill dir is KEYED, not UUID-fresh (ADVICE r6): deleteOnExit
    // only fires at JVM shutdown, so per-call UUID dirs accumulated
    // unbounded tmpdir usage across a long session's repeated sweeps.
    // One dir per key, overwritten in place, bounds the footprint; the
    // caller must consume the result before reusing a key. With
    // reuse=true and a content-stable key (the gate query passes the
    // source fingerprint) the spill is also memoized like every other
    // mirror, so sweep N+1 skips the write entirely.
    val spark = oriented.sparkSession
    val path = new org.apache.hadoop.fs.Path(
      s"${sys.props("java.io.tmpdir")}/graft-spill/tri_$spillKey")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    if (!(reuse && fs.exists(done)))
      oriented.write.mode("overwrite").parquet(path.toString)
    fs.deleteOnExit(path)
    val e = graft.T.readCached(spark, path.toString)
    val ab = e.select(col("s1").as("a"), col("s2").as("b"))
    val bc = e.select(col("s1").as("bb"), col("s2").as("c"))
    val ac = e.select(col("s1").as("aa"), col("s2").as("cc"))
    val tri = ab.join(bc, col("b") === col("bb"))
      .join(ac, col("aa") === col("a") && col("cc") === col("c"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("suppkey"))
      .groupBy(col("suppkey"))
      .agg(count(lit(1)).as("triangles"))
  }

  private val trianglesSql =
    """WITH hi AS (
      |  SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 45),
      |und AS (
      |  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
      |  FROM hi a JOIN hi b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
      |deg AS (
      |  SELECT node, COUNT(*) AS deg FROM (
      |    SELECT s1 AS node FROM und UNION ALL SELECT s2 AS node FROM und)
      |  GROUP BY node),
      |e AS (
      |  SELECT
      |    CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.s1 < u.s2)
      |         THEN u.s1 ELSE u.s2 END AS s1,
      |    CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u.s1 < u.s2)
      |         THEN u.s2 ELSE u.s1 END AS s2
      |  FROM und u
      |  JOIN deg d1 ON u.s1 = d1.node
      |  JOIN deg d2 ON u.s2 = d2.node),
      |tri AS (
      |  SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      |  FROM e e1
      |  JOIN e e2 ON e1.s2 = e2.s1
      |  JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2)
      |SELECT suppkey, CAST(COUNT(*) AS BIGINT) AS triangles
      |FROM (SELECT unnest([a, b, c]) AS suppkey FROM tri)
      |GROUP BY suppkey
      |ORDER BY triangles DESC, suppkey
      |LIMIT 10""".stripMargin

  // -------------------------------------------------------------------
  // graph_hits — HITS hubs & authorities (Kleinberg 1999) on the
  // BIPARTITE customer→supplier graph: authority flows to suppliers
  // that well-connected customers buy from, hub weight to customers
  // that buy from authoritative suppliers — the two-sided source-
  // quality signal where PageRank's single rank conflates the roles.
  // Directed edges are the even-src half of the same bucketed edge
  // mirror PageRank serves from (customers sit at 2k, so src%2=0 IS
  // the customer→supplier direction — no rebuild).
  //
  // Determinism: FIXED 2 rounds; each half-step sums int64-quantized
  // contributions (floor(score·1e12) — exact, order-independent) and
  // L1-normalizes with one int/int→double division, same IEEE ops both
  // engines. With the state always normalized to ~1e12 total units, a
  // per-node sum is bounded by maxdeg·1e12 — int64-safe to maxdeg
  // ~9e6 (document-graph territory; a hotter node needs a bigger
  // quantum, not a different algorithm). Scale shape as PageRank: the
  // |V|-row state joins the mirror's bucketed |E| side under the same
  // size-gated broadcast (`graft.linkrank.broadcastMaxNodes`); the L1
  // totals are 1-row broadcasts, never a driver collect.
  private val HitsIters = 2

  /** One HITS round: authority half-step then hub half-step, both
    * int64-quantized and L1-normalized by a 1-row broadcast. Shared by
    * the fixed-count gate query and [[hitsConverged]]. */
  private def hitsStep(e: DataFrame, gate: DataFrame => DataFrame)(
      h: DataFrame): (DataFrame, DataFrame) = {
    val araw = e.join(gate(h), col("src") === col("node"))
      .select(col("dst"),
        floor(col("h") * lit(1e12)).cast("long").as("units"))
      .groupBy(col("dst")).agg(sum(col("units")).as("araw"))
    val atot = araw.agg(sum(col("araw")).as("tot"))
    val a = araw.crossJoin(broadcast(atot))
      .select(col("dst").as("node"),
        (col("araw").cast("double") / col("tot").cast("double")).as("a"))
    val hraw = e.join(gate(a), col("dst") === col("node"))
      .select(col("src"),
        floor(col("a") * lit(1e12)).cast("long").as("units"))
      .groupBy(col("src")).agg(sum(col("units")).as("hraw"))
    val htot = hraw.agg(sum(col("hraw")).as("tot"))
    val h2 = hraw.crossJoin(broadcast(htot))
      .select(col("src").as("node"),
        (col("hraw").cast("double") / col("tot").cast("double")).as("h"))
    (a, h2)
  }

  /** `rounds` fixed HITS rounds; returns the authority state. */
  private[graft] def hitsState(spark: SparkSession, dir: String,
      rounds: Int): DataFrame = {
    val e = edges(spark, dir).filter(col("src") % 2 === 0)
    // hub seed off the |V|-sized degree SIDECAR (a node appears there
    // iff it has an out-edge, so filtering even src is exactly the
    // distinct src of the even-src half) — not a distinct shuffle over
    // the |E| mirror; the count job is |V|-sized too. The sidecar is a
    // tiny on-disk parquet, so reading it twice (count + seed) is
    // cheaper than a persist() we'd have to remember to release.
    val hubs0 = degSidecar(spark, dir)._1
      .filter(col("node") % 2 === 0).select(col("node"))
    val nC = hubs0.count()
    val gateMax =
      spark.conf.get("graft.linkrank.broadcastMaxNodes", "5000000").toLong
    val gate: DataFrame => DataFrame =
      if (nC <= gateMax) df => df.hint("broadcast") else df => df
    var h = hubs0.select(col("node"), lit(1.0 / nC).as("h"))
    var a: DataFrame = null
    for (round <- 1 to rounds) {
      val (a2, h2) = hitsStep(e, gate)(h)
      a = a2; h = h2
      // Materialize the |V|-row hub state BETWEEN rounds (not the last —
      // its output feeds nothing): each half-step's L1 normalization
      // (crossJoin over broadcast(tot)) references its own input twice,
      // so a lazily chained round-N plan nests round N−1 four times —
      // 2 rounds executed 11.3 s of task time for 1.5 s of wall at
      // sf0.1 (AQE's stage reuse recovers shuffle stages but not the
      // broadcast subtrees). One checkpoint per round bounds the
      // re-execution at one round's tree — same cut powerState makes
      // over the gate, and hitsConverged makes every round; arithmetic
      // unchanged (int64-quantized sums, same IEEE division).
      if (round < rounds) h = h.localCheckpoint(true)
    }
    a
  }

  /** Convergence mode, same contract as [[pagerankConverged]]: iterate
    * until the int64 L1 HUB movement (the slower-settling side of the
    * alternation) drops to `l1Units` of the 1e12-unit mass, or
    * `maxRounds`. GraphSpec pins bit-equality of the authority state
    * with [[hitsState]] at the returned round count. */
  def hitsConverged(spark: SparkSession, dir: String,
      l1Units: Long = 10000000000L, maxRounds: Int = 50): (DataFrame, Int) = {
    val e = edges(spark, dir).filter(col("src") % 2 === 0)
    val hubs0 = degSidecar(spark, dir)._1
      .filter(col("node") % 2 === 0).select(col("node"))
    val nC = hubs0.count()
    val gateMax =
      spark.conf.get("graft.linkrank.broadcastMaxNodes", "5000000").toLong
    val gate: DataFrame => DataFrame =
      if (nC <= gateMax) df => df.hint("broadcast") else df => df
    var h = hubs0.select(col("node"), lit(1.0 / nC).as("h")).localCheckpoint()
    var a: DataFrame = null
    var round = 0
    while (round < maxRounds) {
      val (a2, h2raw) = hitsStep(e, gate)(h)
      val h2 = h2raw.localCheckpoint()
      a = a2
      round += 1
      val moved = h2.select(col("node"),
          floor(col("h") * lit(1e12)).cast("long").as("nu"))
        .join(h.select(col("node"),
          floor(col("h") * lit(1e12)).cast("long").as("ou")), "node")
        .agg(sum(abs(col("nu") - col("ou")))).first().getLong(0)
      h = h2
      if (moved <= l1Units) return (a, round)
    }
    (a, round)
  }

  private def hits(spark: SparkSession, dir: String): DataFrame =
    hitsState(spark, dir, HitsIters)
      .select(concat(lit("s"), expr("node div 2")).as("node"),
        col("a").as("authority"))
      .orderBy(col("authority").desc, col("node"))
      .limit(20)

  /** The two HITS rounds unrolled to CTEs, one a/h half-step pair per
    * round — mirrors the Spark loop step for step. */
  private def hitsSql: String = {
    val sb = new StringBuilder
    sb.append(
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT c_node AS src, s_node AS dst FROM pairs),
        |nc AS (SELECT COUNT(DISTINCT src) AS n FROM e),
        |h0 AS (SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) / n AS h FROM e, nc)""".stripMargin)
    for (t <- 1 to HitsIters) {
      val prev = s"h${t - 1}"
      sb.append(s"""
        |, a${t}_raw AS (
        |  SELECT dst, SUM(CAST(floor(h * 1e12) AS BIGINT)) AS araw
        |  FROM $prev JOIN e ON node = src GROUP BY dst),
        |a$t AS (
        |  SELECT dst AS node, CAST(araw AS DOUBLE) / CAST(tot AS DOUBLE) AS a
        |  FROM a${t}_raw, (SELECT SUM(araw) AS tot FROM a${t}_raw) s),
        |h${t}_raw AS (
        |  SELECT src, SUM(CAST(floor(a * 1e12) AS BIGINT)) AS hraw
        |  FROM a$t JOIN e ON node = dst GROUP BY src),
        |h$t AS (
        |  SELECT src AS node, CAST(hraw AS DOUBLE) / CAST(tot AS DOUBLE) AS h
        |  FROM h${t}_raw, (SELECT SUM(hraw) AS tot FROM h${t}_raw) s)""".stripMargin)
    }
    sb.append(s"""
      |SELECT 's' || CAST(node // 2 AS BIGINT) AS node, a AS authority
      |FROM a$HitsIters
      |ORDER BY authority DESC, node
      |LIMIT 20""".stripMargin)
    sb.toString
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("graph_pagerank", pagerank, Some(pagerankSql)),
    QueryDef("graph_triangles", triangles, Some(trianglesSql)),
    QueryDef("graph_hits", hits, Some(hitsSql))
  )
}
