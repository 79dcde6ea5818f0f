package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING near-duplicate deduplication at ingest — the shape a
  * training-data pipeline actually deploys: documents arrive
  * continuously, each micro-batch is deduplicated against everything
  * already ACCEPTED (first-writer-wins) plus itself, and only the
  * survivors land in the corpus. Nothing ever re-reads the corpus text
  * wholesale:
  *
  *  - '''Candidates''' come from the persisted MinHash band-signature
  *    index (the same 4-band md5-min signatures every batch dedup query
  *    uses): the batch's signatures probe the accepted set's signature
  *    segments — O(batch) work, corpus-independent.
  *  - '''Verify''' is exact shingle-set Jaccard ≥ 0.8, computed only
  *    inside candidate pairs; the corpus side's shingle sets are
  *    recomputed from the stored text of just the candidate partners
  *    (delta-sized join against the corpus, never a scan).
  *  - '''Within-batch''' duplicates resolve by connected components
  *    over the verified batch edges ([[graft.ops.Graph
  *    .componentsSizeGated]] — a batch graph is delta-sized by
  *    construction), keeping the minimum doc id per component.
  *
  * Semantics (deterministic, pinned by DedupStreamSpec): a batch doc
  * with a verified near-dup already in the corpus is dropped (the
  * earlier writer won); remaining batch docs dedup among themselves
  * (min id survives its component). This is the streaming counterpart
  * of `dedup_incremental`'s batch tick — FIRST-writer-wins rather than
  * global-min-wins, which is the only causally available rule online.
  *
  * Storage layout (replay-idempotent, at-least-once → effectively-once):
  * each batch OVERWRITES its own `docs/batch-<id>` and
  * `sigs/batch-<id>` directories, so a replayed batch converges to the
  * same survivor set (its inputs — the accepted set = all LOWER batch
  * dirs — are unchanged on replay; its own half-written output is
  * ignored by the `< id` filter and then overwritten). Signature
  * segments accumulate per batch and are the streaming DELTA tier of
  * the index architecture: the batch path's partitioned
  * ([[graft.ops.IncrementalDedup]]) index is the compacted steady
  * state; a compaction job folds segments into it off the hot path. */
object DedupStream {

  /** Shingle projection of a (doc_id, text) frame: 3-word shingles,
    * distinct per doc — identical to the batch path's. Docs under 3
    * tokens carry an empty set (they can never near-dup). */
  private def shingled(df: DataFrame): DataFrame = {
    graft.functions.VecExprs.register(df.sparkSession)
    df.withColumn("tokens", split(col("text"), " "))
      .withColumn("shingle_set",
        when(size(col("tokens")) >= 3,
          array_distinct(expr("word_shingles3(tokens)")))
          .otherwise(array().cast("array<string>")))
      .drop("tokens")
  }

  private def sigsOf(docs: DataFrame): DataFrame =
    graft.queries.TextOps.bandSigs(
      shingled(docs).filter(size(col("shingle_set")) > 0)
        .select(col("doc_id"), col("shingle_set")))

  private def listBatchDirs(spark: SparkSession, root: String,
      below: Long): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter { d =>
        val n = d.getName
        n.startsWith("batch-") &&
          scala.util.Try(n.stripPrefix("batch-").toLong).toOption
            .exists(_ < below)
      }
      .map(_.toString)
  }

  /** One micro-batch's dedup-and-accept — exposed for the spec; the
    * stream calls it per trigger. Returns the survivor count. */
  private[graft] def acceptBatch(spark: SparkSession, tablePath: String,
      batch: DataFrame, id: Long, jaccard: Double = 0.8): Long = {
    import graft.ops.IncrementalDedup
    val docs = batch.select(col("doc_id").cast("long").as("doc_id"),
      col("text")).localCheckpoint(true)
    val bs = sigsOf(docs).localCheckpoint(true)
    val corpusSigs = corpusSigsBelow(spark, tablePath, id)
    // delta-vs-corpus + within-delta candidate pairs off signatures only
    val cand = IncrementalDedup.newCandidates(
      corpusSigs.select(col("doc_id"),
        concat_ws("#", col("band"), col("sig")).as("bucket")),
      bs.select(col("doc_id"),
        concat_ws("#", col("band"), col("sig")).as("bucket")))
      .localCheckpoint(true)
    // shingle sets for verify: batch side in hand; corpus side
    // recomputed from the stored text of candidate PARTNERS only
    val batchIds = docs.select(col("doc_id"))
    val corpusPartnerIds = cand
      .select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id")))
      .join(batchIds, Seq("doc_id"), "left_anti").distinct()
    val docDirs = listBatchDirs(spark, s"$tablePath/docs", id)
    val textsAll = docs.select(col("doc_id"), col("text"))
      .unionByName(
        if (docDirs.isEmpty) docs.limit(0).select(col("doc_id"), col("text"))
        else spark.read.parquet(docDirs: _*)
          .join(corpusPartnerIds, "doc_id")
          .select(col("doc_id"), col("text")))
    val sets = shingled(textsAll)
      .select(col("doc_id"), col("shingle_set"))
    // Three-phase verify, every phase an EXACT-SAFE prune (no false
    // negatives, so the output edge set is bit-identical to the
    // one-phase string-set join it replaces):
    //
    //  1. slim bounds over xxhash64-sorted encodings — ships only
    //     (size, theorem-prefix) per side (the r12 verify design rule;
    //     bounds derived for t = 0.8, so other thresholds skip this
    //     phase rather than risking a wrong prune);
    //  2. hashed full-array verify — ships the int64 encodings (~8 B
    //     per shingle vs ~40 B strings). For docs with injective
    //     encodings, |h(A)∩h(B)| ≥ |A∩B| and the hashed union is ≤ the
    //     string union, so jac_hash ≥ jac_string for EVERY threshold:
    //     jac_hash < t is a certain reject, jac_hash ≥ t survives to
    //     phase 3 (cross-doc collisions can only inflate jac_hash —
    //     a survivor, never a lost pair);
    //  3. exact string-set verify over the phase-2 SURVIVORS only,
    //     with shingle sets recomputed for just the survivor-pair docs.
    //
    // Phase 3 is the only exchange that moves whole string sets, and it
    // is now OUTPUT-sized — before r14 it joined the full batch's sets
    // (~3.4 KB/doc), which at a 4.75M-doc batch-0 bootstrap (the
    // pipeline_ingest_tick base, sf100) spilled 20.5 GB and died ENOSPC.
    //
    // A WITHIN-doc collision (two distinct shingles of one doc sharing
    // a 64-bit hash) deflates array_intersect's overlap count and could
    // — at exactly-threshold geometry — falsely prune (ADVICE r12), so
    // any doc whose hashed encoding lost an element to a within-doc
    // collision (size(ids) < set size after dedup) bypasses phases 1–2
    // entirely: its pairs go straight to the exact string-set verify.
    // That keeps the pipeline STRICTLY exact, not exact-up-to-2^-64.
    // materialized once (eager checkpoint): enc0 feeds the collision
    // probe, the slim bounds, and both sides of the hashed verify — at
    // 8 B/shingle it is the cheapest representation to hold, and the
    // alternative re-runs the shingle+hash pipeline four times
    val enc0 = sets.select(col("doc_id"),
      array_sort(expr("transform(shingle_set, s -> xxhash64(s))")).as("ids"))
      .localCheckpoint(true)
    val collided = enc0
      .filter(size(col("ids")) =!= size(array_distinct(col("ids"))))
      .select(col("doc_id")).localCheckpoint(true)
    val candColl = cand
      .join(collided.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
      .unionByName(cand.join(
        collided.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
        .select(cand.columns.map(col).toSeq: _*))
      .distinct()
    val candClean = cand
      .join(collided.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_anti")
      .join(collided.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_anti")
    val surv1 =
      if (jaccard == 0.8) graft.queries.TextOps.jaccardSlimSurvivors(enc0, candClean)
      else candClean.select(col("doc_a"), col("doc_b"))
    val ea = enc0.select(col("doc_id").as("doc_a"), col("ids").as("ia"))
    val eb = enc0.select(col("doc_id").as("doc_b"), col("ids").as("ib"))
    val surv2 = surv1
      .join(ea.hint("shuffle_hash"), "doc_a")
      .join(eb.hint("shuffle_hash"), "doc_b")
      .withColumn("hin", size(array_intersect(col("ia"), col("ib"))))
      .filter(col("hin") > 0)
      .filter(col("hin").cast("double") /
        (size(col("ia")) + size(col("ib")) - col("hin")) >= jaccard)
      .select(col("doc_a"), col("doc_b"))
    val candFinal = surv2
      .unionByName(candColl.select(col("doc_a"), col("doc_b")))
      .localCheckpoint(true)
    val finalIds = candFinal.select(col("doc_a").as("doc_id"))
      .unionByName(candFinal.select(col("doc_b").as("doc_id")))
      .distinct()
    val setsF = shingled(textsAll.join(finalIds, "doc_id"))
      .select(col("doc_id"), col("shingle_set"))
    val sa = setsF.select(col("doc_id").as("doc_a"), col("shingle_set").as("xa"))
    val sb = setsF.select(col("doc_id").as("doc_b"), col("shingle_set").as("xb"))
    val verified = candFinal.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("inter", size(array_intersect(col("xa"), col("xb"))))
      .filter(col("inter") > 0)
      .withColumn("jac", col("inter").cast("double") /
        (size(col("xa")) + size(col("xb")) - col("inter")))
      .filter(col("jac") >= jaccard)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val corpusIdSet = corpusPartnerIds
    // rule 1: a verified edge to the corpus drops the batch doc
    val dupOfCorpus = verified.join(
        corpusIdSet.select(col("doc_id").as("doc_a")), Seq("doc_a"))
      .select(col("doc_b").as("doc_id"))
      .unionByName(verified.join(
          corpusIdSet.select(col("doc_id").as("doc_b")), Seq("doc_b"))
        .select(col("doc_a").as("doc_id")))
      .distinct()
    // rule 2: among the rest, min id survives its within-batch component
    val stillIn = batchIds.join(dupOfCorpus, Seq("doc_id"), "left_anti")
    val innerEdges = verified
      .join(stillIn.select(col("doc_id").as("doc_a")), Seq("doc_a"))
      .join(stillIn.select(col("doc_id").as("doc_b")), Seq("doc_b"))
    val labels = graft.ops.Graph.componentsSizeGated(innerEdges)
    val losers = labels.filter(col("id") =!= col("label"))
      .select(col("id").as("doc_id"))
    val survivors = docs.join(stillIn, "doc_id")
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"))
    survivors.write.mode("overwrite")
      .parquet(s"$tablePath/docs/batch-$id")
    sigsOf(survivors).write.mode("overwrite")
      .parquet(s"$tablePath/sigs/batch-$id")
    spark.read.parquet(s"$tablePath/docs/batch-$id").count()
  }

  /** Start the streaming dedup-ingest of `source` (doc_id, text rows)
    * into `tablePath`. The accepted corpus is `tablePath/docs/batch-*`. */
  def start(source: DataFrame, tablePath: String,
      checkpoint: String, jaccard: Double = 0.8): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        acceptBatch(batch.sparkSession, tablePath, batch, id, jaccard)
        ()
      }
      .outputMode("append")
      .start()

  /** Newest `_SUCCESS`-complete compacted index strictly below `below`,
    * as (version, dir). */
  private def bestIndex(spark: SparkSession, tablePath: String,
      below: Long): Option[(Long, String)] = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    fs.listStatus(p).toSeq.map(_.getPath)
      .flatMap { d =>
        val n = d.getName
        if (!n.startsWith("index-v")) None
        else scala.util.Try(n.stripPrefix("index-v").toLong).toOption
          .filter(v => v < below &&
            fs.exists(new Path(d, "_SUCCESS")))
          .map(v => v -> d.toString)
      }
      .sortBy(_._1).lastOption
  }

  /** The signature corpus a batch `below` dedups against: the newest
    * complete compacted index under it plus every segment the index
    * does not cover. */
  private def corpusSigsBelow(spark: SparkSession, tablePath: String,
      below: Long): DataFrame = {
    val idx = bestIndex(spark, tablePath, below)
    val floor = idx.map(_._1).getOrElse(-1L)
    val segs = listBatchDirs(spark, s"$tablePath/sigs", below)
      .filter(d => new Path(d).getName.stripPrefix("batch-").toLong > floor)
    val segDf =
      if (segs.isEmpty) None
      else Some(spark.read.parquet(segs: _*)
        .select(col("doc_id"), col("band"), col("sig")))
    val idxDf = idx.map { case (_, d) =>
      spark.read.parquet(d)
        .select(col("doc_id"), col("band").cast("int").as("band"),
          col("sig").cast("string").as("sig"))
    }
    (segDf, idxDf) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        spark.range(0).select(col("id").as("doc_id"),
          lit(0).as("band"), lit("").as("sig")).limit(0)
    }
  }

  /** Fold the signature segments with batch id ≤ `through` (plus any
    * older compacted index) into ONE partitioned index —
    * [[graft.ops.IncrementalDedup.writeIndex]]'s (band, pfx) layout,
    * the same compacted steady state the batch tick probes — and drop
    * the covered segments. Run OFF the hot path, and only for batch
    * ids the stream's checkpoint has committed: an at-least-once
    * restart replays the latest batch, whose corpus must still resolve
    * below it, so `through` must stay under any replayable id.
    *
    * Crash discipline, no renames: the new `index-v<through>` commits
    * by `_SUCCESS` BEFORE any covered segment or older index is
    * deleted; readers prefer the newest complete index and ignore the
    * segments it covers, so a death on either side of the commit point
    * leaves a readable, convergent state (worst case: redundant rows —
    * harmless, candidates are DISTINCT pairs). Idempotent. */
  def compactSegments(spark: SparkSession, tablePath: String,
      through: Long): Option[String] = {
    val covered = listBatchDirs(spark, s"$tablePath/sigs", through + 1)
    val prior = bestIndex(spark, tablePath, through + 1)
    if (covered.isEmpty && prior.isEmpty) return None
    if (prior.exists(_._1 == through) && covered.isEmpty) return Some(prior.get._2)
    val sigs = corpusSigsBelow(spark, tablePath, through + 1)
    val idxDir = s"$tablePath/index-v$through"
    graft.ops.IncrementalDedup.writeIndex(sigs, idxDir)
    // the new index is complete — the covered tiers are now redundant
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    covered.foreach(d => fs.delete(new Path(d), true))
    prior.filter(_._1 != through)
      .foreach { case (_, d) => fs.delete(new Path(d), true) }
    Some(idxDir)
  }

  /** Read back the accepted corpus. */
  def accepted(spark: SparkSession, tablePath: String): DataFrame = {
    val dirs = listBatchDirs(spark, s"$tablePath/docs", Long.MaxValue)
    if (dirs.isEmpty)
      spark.range(0).select(col("id").as("doc_id"),
        lit("").as("text")).limit(0)
    else spark.read.parquet(dirs: _*)
  }
}
