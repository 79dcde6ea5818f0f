package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** ONE ingest micro-batch through EVERY incremental maintainer, under
  * ONE manifest commit (VERDICT r11 #4) — the production shape the
  * separate gates rehearse piecewise:
  *
  *   append → streaming near-dup dedup → incremental ER → incremental
  *   semantic dedup → IVF delta segment → stats sidecars → summary
  *   refresh — crash-consistent TOGETHER.
  *
  * Composition (delta = documents ≡ 0 mod 20, vectors ≡ 3 mod 10 — the
  * same split conventions the individual gates verify):
  *  1. '''dedup''': the delta batch through [[DedupStream.acceptBatch]]
  *     against the bootstrapped corpus — first-writer-wins, survivors
  *     land as `docs/batch-1` + `sigs/batch-1`.
  *  2. '''er''': the SURVIVORS (not the raw delta — dedup feeds
  *     resolution, the sequential production dependency) probe the
  *     corpus signature segments for candidates; erVerify's rule, base
  *     endpoints CONTRACT to their bootstrap entity rep, size-gated
  *     components over the delta-sized graph, stable-id survivorship —
  *     changed master rows land in `tick1/er_changed`.
  *  3. '''semantic''': the embedding delta through the frozen-quantizer
  *     tick (dedupSemanticIncremental — O(delta·√N) candidates).
  *  4. '''ivf''': accepted delta vectors join their frozen-cell
  *     assignment from the cell-partitioned delta segment — the index
  *     rows a query-serving mirror would load.
  *  5. '''stats''': tick-grain sidecar metrics over the accepted corpus
  *     (rows, lang NDV, n_chars min/max) — the same numbers the
  *     NdvStats/HistStats per-file machinery maintains at file grain.
  *  6. '''summary''': per-lang doc counts over the accepted corpus —
  *     the MV the navigator would serve.
  *
  * ATOMICITY: stages write to DETERMINISTIC paths with overwrite
  * semantics (idempotent redo), and nothing is visible until the LAST
  * action — a single conditional-put of `heads/v1` through
  * [[graft.ops.Manifest.publishIfAbsent]]'s arbiter (link(2)-exclusive
  * on file:, retry-ambiguity-hardened conditional PUT elsewhere).
  * A crash ANYWHERE before the CAS leaves the committed state at v0;
  * the rerun redoes the stages over unchanged inputs (the accepted
  * corpus below the tick) and re-attempts the same head — convergence
  * is byte-stable because every stage is a deterministic function of
  * committed state. A crash AFTER the CAS makes the rerun a no-op.
  * IngestTickSpec kills the tick between every pair of stages and pins
  * convergence against a never-killed run.
  */
object IngestTick {

  val Stages: Seq[String] =
    Seq("dedup", "er", "semantic", "ivf", "stats", "summary")

  /** Injected stage-boundary death for the crash-consistency spec —
    * thrown AFTER the named stage's artifact is durably written and
    * BEFORE the next stage (so the rerun must tolerate every prefix of
    * on-disk stage artifacts). */
  final class InjectedDeath(val stage: String)
    extends RuntimeException(s"injected death after stage $stage")

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def headPath(root: String, v: Int) = s"$root/heads/v$v"

  def headExists(spark: SparkSession, root: String, v: Int): Boolean =
    fs(spark, root).exists(new Path(headPath(root, v)))

  /** The one commit point: write the head JSON to a tmp path, then a
    * single conditional-put onto `heads/v<v>`. Loser (head already
    * present) is a benign no-op — the tick is idempotent. */
  private def casHead(spark: SparkSession, root: String, v: Int,
      body: String): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(s"$root/heads/.tmp-v$v-${java.util.UUID.randomUUID()}")
    f.mkdirs(new Path(s"$root/heads"))
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val won = graft.ops.Manifest.publishIfAbsent(
      spark.sparkContext.hadoopConfiguration, tmp, new Path(headPath(root, v)))
    if (!won && f.exists(tmp)) { f.delete(tmp, false); () }
  }

  private def baseDocs(spark: SparkSession, dir: String): DataFrame =
    graft.T.documents(spark, dir)
      .filter(col("doc_id") % 20 =!= 0).select(col("doc_id"), col("text"))

  private def deltaDocs(spark: SparkSession, dir: String): DataFrame =
    graft.T.documents(spark, dir)
      .filter(col("doc_id") % 20 === 0).select(col("doc_id"), col("text"))

  /** Bootstrap = "tick 0": corpus batch accepted (self-dedup), base ER
    * resolution persisted, committed as head v0. Idempotent. */
  def ensureBootstrap(spark: SparkSession, dir: String, root: String): Unit = {
    graft.Ctx.prep(spark)
    if (headExists(spark, root, 0)) return
    graft.ops.BuildLedger.timed("ingesttick/bootstrap") {
      val n0 = DedupStream.acceptBatch(spark, root, baseDocs(spark, dir), 0L)
      // base ER resolution over the ACCEPTED corpus: banded candidates
      // off the batch-0 signature segment, the shared erVerify rule,
      // components, rep = min member (singletons rep to themselves)
      val sigs0 = spark.read.parquet(s"$root/sigs/batch-0")
      val edges = graft.queries.TextOps.erVerify(spark, dir,
        graft.queries.TextOps.bandCandidatesAuto(sigs0))
      val labels = graft.ops.Graph.componentsSizeGated(edges)
      spark.read.parquet(s"$root/docs/batch-0").select(col("doc_id"))
        .join(labels, col("doc_id") === col("id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("rep"))
        .write.mode("overwrite").parquet(s"$root/er/base")
      casHead(spark, root, 0, s"""{"tick":0,"accepted_base":$n0}""")
    }
  }

  /** The tick. `dieAfter` injects a crash after the named stage's
    * artifact write (spec use). Returns true when this call committed
    * the head (false = it was already committed — idempotent replay). */
  def runTick(spark: SparkSession, dir: String, root: String,
      dieAfter: Option[String] = None): Boolean = {
    graft.Ctx.prep(spark)
    ensureBootstrap(spark, dir, root)
    if (headExists(spark, root, 1)) return false
    val t = s"$root/tick1"
    def die(stage: String): Unit =
      if (dieAfter.contains(stage)) throw new InjectedDeath(stage)

    // 1 ── dedup: delta batch vs the accepted corpus (replay-idempotent
    // batch-dir overwrite is DedupStream's own contract)
    val nDelta = DedupStream.acceptBatch(spark, root, deltaDocs(spark, dir), 1L)
    die("dedup")

    // 2 ── er: survivors probe the corpus signature segment
    val bucket = concat_ws("#", col("band"), col("sig"))
    val sigs0 = spark.read.parquet(s"$root/sigs/batch-0")
    val sigs1 = spark.read.parquet(s"$root/sigs/batch-1")
    val cand = graft.ops.IncrementalDedup.newCandidates(
      sigs0.select(col("doc_id"), bucket.as("bucket")),
      sigs1.select(col("doc_id"), bucket.as("bucket")))
    val edges = graft.queries.TextOps.erVerify(spark, dir, cand)
    val base = spark.read.parquet(s"$root/er/base")
    val contracted = edges
      .join(base.select(col("doc_id").as("doc_a"), col("rep").as("rep_a")),
        Seq("doc_a"), "left")
      .join(base.select(col("doc_id").as("doc_b"), col("rep").as("rep_b")),
        Seq("doc_b"), "left")
      .select(
        when(col("doc_a") % 20 === 0, col("doc_a")).otherwise(col("rep_a")).as("na"),
        when(col("doc_b") % 20 === 0, col("doc_b")).otherwise(col("rep_b")).as("nb"))
      .filter(col("na") =!= col("nb"))
    val labels = graft.ops.Graph.componentsSizeGated(contracted)
    val ents = labels.groupBy(col("label")).agg(
      coalesce(min(when(col("id") % 20 =!= 0, col("id"))), min(col("id")))
        .as("entity_id"))
    val compNodes = labels.join(broadcast(ents), "label")
    val deltaMembers = compNodes.filter(col("id") % 20 === 0)
      .select(col("entity_id"), col("id").as("doc_id"))
    val corpusMembers = compNodes.filter(col("id") % 20 =!= 0)
      .select(col("entity_id"), col("id").as("rep"))
      .join(base, "rep")
      .select(col("entity_id"), col("doc_id"))
    val acc1Ids = spark.read.parquet(s"$root/docs/batch-1").select(col("doc_id"))
    val singles = acc1Ids
      .join(compNodes.filter(col("id") % 20 === 0)
        .select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("entity_id"), col("doc_id"))
    val memb = deltaMembers.unionByName(corpusMembers).unionByName(singles)
    val m = memb.join(graft.T.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars")), "doc_id")
    val langMode = m.groupBy(col("entity_id"), col("lang"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("entity_id"))
      .agg(min_by(col("lang"),
        struct((-col("cnt")).as("nc"), col("lang"))).as("golden_lang"))
    m.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        max_by(col("doc_id"),
          struct(col("n_chars"), (-col("doc_id")).as("nd"))).as("golden_doc"),
        max(col("n_chars")).as("golden_len"))
      .join(langMode, "entity_id")
      .write.mode("overwrite").parquet(s"$t/er_changed")
    die("er")

    // 3 ── semantic: the frozen-quantizer embedding tick
    graft.queries.Similarity.dedupSemanticIncremental(spark, dir)
      .write.mode("overwrite").parquet(s"$t/sem_assign")
    die("semantic")

    // 4 ── ivf: accepted delta vectors with their frozen-cell assignment
    val (_, deltaSeg) = graft.queries.Similarity.semIncSegments(spark, dir)
    spark.read.parquet(deltaSeg).select(col("vec_id"), col("cell"))
      .join(spark.read.parquet(s"$t/sem_assign")
        .filter(col("accepted") === 1).select(col("vec_id")), "vec_id")
      .write.mode("overwrite").parquet(s"$t/ivf_indexed")
    die("ivf")

    // 5 ── stats: tick-grain sidecar numbers over the accepted corpus
    val accDocs = spark.read
      .parquet(s"$root/docs/batch-0", s"$root/docs/batch-1")
      .select(col("doc_id"))
      .join(graft.T.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars")), "doc_id")
    accDocs.agg(
        count(lit(1)).as("docs_rows"),
        countDistinct(col("lang")).as("lang_ndv"),
        min(col("n_chars")).cast("long").as("chars_min"),
        max(col("n_chars")).cast("long").as("chars_max"))
      .write.mode("overwrite").parquet(s"$t/stats")
    die("stats")

    // 6 ── summary: the per-lang MV refresh
    accDocs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$t/summary")
    die("summary")

    // ── THE commit: everything above becomes visible atomically
    casHead(spark, root, 1,
      s"""{"tick":1,"accepted_delta":$nDelta,"artifacts":["docs/batch-1","sigs/batch-1","tick1/er_changed","tick1/sem_assign","tick1/ivf_indexed","tick1/stats","tick1/summary"]}""")
    true
  }

  private val metricSchema = StructType(Seq(
    StructField("stage", StringType, nullable = false),
    StructField("metric", StringType, nullable = false),
    StructField("value", LongType, nullable = false)))

  /** Gate output: (stage, metric, value) rows read back from the
    * COMMITTED artifacts — the oracle replays the whole tick in SQL and
    * must land on the same numbers. */
  def metrics(spark: SparkSession, dir: String, root: String): DataFrame = {
    require(headExists(spark, root, 1), s"tick not committed at $root")
    val acc0 = spark.read.parquet(s"$root/docs/batch-0").count()
    val acc1 = spark.read.parquet(s"$root/docs/batch-1").count()
    val d1 = deltaDocs(spark, dir).count()
    val er = spark.read.parquet(s"$root/tick1/er_changed")
      .select(col("entity_id")).collect().map(_.getLong(0))
    val sem = spark.read.parquet(s"$root/tick1/sem_assign")
    val semDelta = sem.count()
    val semAcc = sem.filter(col("accepted") === 1).count()
    val ivf = spark.read.parquet(s"$root/tick1/ivf_indexed").count()
    val st = spark.read.parquet(s"$root/tick1/stats").collect()(0)
    val summ = spark.read.parquet(s"$root/tick1/summary")
    val summRows = summ.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    val summLangs = summ.count()
    val summMax = summ.agg(max(col("n_docs"))).collect()(0).getLong(0)
    val rows = Seq(
      ("01_dedup", "accepted_base", acc0),
      ("01_dedup", "accepted_delta", acc1),
      ("01_dedup", "dropped_delta", d1 - acc1),
      ("02_er", "entities_touched", er.length.toLong),
      ("02_er", "entities_minted", er.count(_ % 20 == 0).toLong),
      ("02_er", "entities_extended", er.count(_ % 20 != 0).toLong),
      ("03_semantic", "delta_vecs", semDelta),
      ("03_semantic", "accepted_vecs", semAcc),
      ("03_semantic", "dup_vecs", semDelta - semAcc),
      ("04_ivf", "indexed_delta_vecs", ivf),
      ("05_stats", "chars_max", st.getLong(st.fieldIndex("chars_max"))),
      ("05_stats", "chars_min", st.getLong(st.fieldIndex("chars_min"))),
      ("05_stats", "docs_rows", st.getLong(st.fieldIndex("docs_rows"))),
      ("05_stats", "lang_ndv", st.getLong(st.fieldIndex("lang_ndv"))),
      ("06_summary", "lang_rows_max", summMax),
      ("06_summary", "langs", summLangs),
      ("06_summary", "rows_total", summRows))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 1),
      metricSchema)
      .orderBy(col("stage"), col("metric"))
  }
}
