package graft.streaming

import graft.ops.{CopyOnWrite, Manifest}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DecimalType

/** Streaming upsert into a partitioned parquet lake table — the
  * continuous-ingest half of the copy-on-write story: every micro-batch
  * MERGEs into the table by key ([[CopyOnWrite.merge]]), rewriting only
  * the partitions that batch touches, then COMMITS a [[Manifest]]
  * version — so the streaming sink composes with the whole snapshot
  * layer for free: time travel to any micro-batch boundary, file-level
  * pruning over the current version, and retention via
  * [[Manifest.vacuum]].
  *
  * Per batch: merge in ARCHIVE mode (replaced partition dirs rename
  * under `_archive/batch-<id>` — data files stay immutable), remap the
  * archived files' addresses in earlier manifests
  * ([[Manifest.remapPrefix]] — O(metadata) pointer fixup, no data
  * moves), then commit the live file set as the next version through
  * the CAS protocol ([[Manifest.commitWithRetry]] — a single-writer
  * stream commits first try; the retry path exists so an out-of-band
  * writer, e.g. a compactor, can share the chain).
  *
  * Delivery: the file/checkpoint source replays a failed batch
  * (at-least-once), and merge-by-key is idempotent for identical delta
  * rows — a replayed batch re-replaces the same keys with the same
  * values — so the DATA converges to effectively-once, the same
  * argument as the JDBC upsert sink ([[CsvPipelineStream]]). A replayed
  * batch does append an extra (identical-content) manifest version:
  * versions are checkpoints of state, so a duplicate snapshot is
  * harmless and vacuum retires it.
  *
  * 100 TB shape: per trigger the work is proportional to the TOUCHED
  * partitions, not the table (the merge's anti-join reads only those
  * directories), plus one footer pass for the manifest stats; the
  * manifest chain gives readers the isolation CopyOnWrite alone lacks —
  * a reader pinned to version v never observes a mid-swap state.
  */
object LakeStream {

  /** Start a streaming merge of `source` (a streaming DataFrame whose
    * rows carry `partCol` and `keyCol`) into the table at `tablePath`,
    * committing one manifest version per micro-batch. `keyCol` doubles
    * as the manifest's stats key (int64 → real min/max spans; any other
    * type degrades to the conservative full-range span). */
  def start(source: DataFrame, tablePath: String, partCol: String,
      keyCol: String, checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeAndCommit(batch.sparkSession, tablePath, partCol, keyCol, batch, id)
        ()
      }
      .outputMode("update")
      .start()

  /** One micro-batch's merge + manifest commit (the body [[start]] runs
    * per trigger), returning the touched partitions with their archive
    * destinations — [[startWithSummary]] needs those to compute the
    * batch's retractions. */
  private def mergeAndCommit(s: SparkSession, tablePath: String,
      partCol: String, keyCol: String, batch: DataFrame,
      id: Long): Seq[CopyOnWrite.MergedPartition] = {
    val archive = s"$tablePath/_archive/batch-$id"
    val merged = CopyOnWrite.mergeDetailed(s, tablePath, partCol, keyCol,
      batch, archiveTo = Some(archive))
    val fs = new Path(tablePath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    merged.foreach { m =>
      m.archivedTo.foreach { to =>
        val from = fs.makeQualified(
          new Path(tablePath, s"$partCol=${m.value}"))
        Manifest.remapPrefix(s, tablePath, s"$from/", s"$to/")
      }
    }
    Manifest.commitWithRetry(s, tablePath) { (_, _) =>
      Manifest.collectStats(s, Manifest.dataFiles(s, tablePath), keyCol)
    }
    merged
  }

  /** Streaming WRITE-AUDIT-PUBLISH: stage each micro-batch as
    * append-only files under `$tablePath/staged/batch-<id>` and
    * CAS-advance the named BRANCH ([[Manifest.tryAdvanceRef]]) to a
    * snapshot including them — the serving branch (`main`) never moves
    * while the stream runs. Audit queries read the staging branch
    * ([[Manifest.readRef]]); when they pass, publishing is ONE pointer
    * move ([[Manifest.fastForward]]) that shares the audited snapshot
    * file by name — atomic, all-or-nothing, and the audit saw exactly
    * the bytes being published.
    *
    * Replay safety: a replayed batch rewrites the SAME `batch-<id>`
    * directory (overwrite mode) and the advance drops any entries under
    * that directory before re-appending — so at-least-once delivery
    * converges to exactly the staged file set, with no double-append.
    *
    * 100 TB shape: per trigger the work is one delta-sized parquet
    * write + one footer pass over the delta + one ~60-byte ref file;
    * nothing scales with table size, and the isolation means a bad
    * crawl never reaches the serving branch — the curation-pipeline
    * deployment story for continuous ingest. */
  def startStagedAppend(source: DataFrame, tablePath: String,
      keyCol: String, checkpoint: String,
      branch: String = "staging"): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val dir = s"$tablePath/staged/batch-$id"
        batch.write.mode("overwrite").parquet(dir)
        val fs = new Path(dir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val prefix = fs.makeQualified(new Path(dir)).toString
        val added = Manifest.collectStats(s,
          Manifest.dataFiles(s, dir), keyCol)
        Manifest.advanceRefWithRetry(s, tablePath, branch) { cur =>
          cur.filterNot(e =>
            fs.makeQualified(new Path(e.path)).toString.startsWith(prefix)) ++
            added
        }
        ()
      }
      .outputMode("append")
      .start()

  // ---------------------------------------------------------------------
  // Streaming maintenance of the routed day/hour summaries (VERDICT r6
  // #4): the merge law mv_incremental_refresh proves in batch, wired to
  // the per-micro-batch commit point — so the aggregate navigator
  // ([[graft.plans.SummaryRewrite]]) serves dashboards off a summary
  // that is never more than one trigger behind the table.
  // ---------------------------------------------------------------------

  private val D18 = DecimalType(18, 2)
  private val D28 = DecimalType(18 + 10, 2) // sum-of-partials widening, pinned

  /** The summary shape [[graft.queries.MatView.ensureSummary]] writes and
    * SummaryRewrite routes onto: one row per (grain bucket, event_type)
    * with count / exact-decimal sum / min / max partials — plus, when the
    * table carries a `user_id` column, a mergeable HLL partial of the
    * bucket's distinct users (the batch summaries' `uhll` twin, so a
    * streamed table answers mv_distinct-style questions too). */
  private def partials(df: DataFrame, grain: String): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n"),
      sum(col("value").cast(D18)).cast(D28).as("sum_value_dec"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value")) ++
      (if (df.columns.contains("user_id"))
        Seq(hll_sketch_agg(col("user_id")).as("uhll")) else Nil)
    df.groupBy(date_trunc(grain, col("ts")).as(grain), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Re-aggregate a union of summary partials through the merge law:
    * counts add, DECIMAL sums add exactly, min/max fold, HLL partials
    * union (`hll_union_agg` — sketch union is the distinct-count merge
    * law; retractions never reach it because upsert-affected buckets go
    * through the scoped rebuild, same as min/max). The widened sum casts
    * back to the stored type so every version has one schema. */
  private def foldSummaries(parts: DataFrame, grain: String): DataFrame = {
    val aggs = Seq(sum(col("n")).as("n"),
      sum(col("sum_value_dec")).cast(D28).as("sum_value_dec"),
      min(col("min_value")).as("min_value"),
      max(col("max_value")).as("max_value")) ++
      (if (parts.columns.contains("uhll"))
        Seq(hll_union_agg(col("uhll")).as("uhll")) else Nil)
    parts.groupBy(col(grain), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incrementally refresh the `_summary/<grain>/v<batchId>` rollups of
    * an events-shaped lake table (`ts`, `event_type`, `value` columns)
    * after batch `batchId` merged, and return grain → the refreshed
    * summary's path.
    *
    * Maintenance law, per grain:
    *  - **append-only batch** (no replaced rows): new version =
    *    merge-law fold of (previous version ∪ batch partials) — O(batch
    *    ∪ summary), never the table;
    *  - **upsert batch** (`replaced` carries the pre-merge rows whose
    *    keys the batch rewrote): buckets the replacements touch are
    *    recomputed from the post-merge table scoped to those buckets —
    *    counts and sums COULD be maintained by signed retractions, but
    *    min/max are not invertible (removing the row that held the max
    *    forces a re-look), so the affected buckets take the scoped
    *    rebuild and every other bucket stays on the merge law. The
    *    bucket set is batch-bounded, so the rebuild reads a ts-pruned
    *    sliver of the table, not the firehose;
    *  - **bootstrap** (no previous version): full build from the
    *    post-merge table — the one-time cost the static
    *    [[graft.queries.MatView.ensureSummary]] pays too.
    *
    * Replay safety (at-least-once delivery): versions are keyed by
    * batch id — a completed `v<batchId>` (its `_SUCCESS` marker exists)
    * makes the refresh a no-op, and an incomplete one is rebuilt from
    * the last complete predecessor, so a crash anywhere between the
    * data commit and the summary write converges on replay. The whole
    * computation runs under [[graft.plans.SummaryRewrite.withBypass]]:
    * the scoped rebuild's own aggregate matches the routing grammar,
    * and routing it onto the version being superseded would feed the
    * refresh from stale partials.
    *
    * Retention keeps the previous version (the replay fallback) and
    * deletes older ones eagerly — no deleteOnExit accumulation. */
  private[graft] def refreshSummaries(spark: SparkSession, tablePath: String,
      newRows: DataFrame, replaced: Option[DataFrame], batchId: Long,
      grains: Seq[String] = Seq("day", "hour")): Map[String, String] = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def complete(p: Path): Boolean = fs.exists(new Path(p, "_SUCCESS"))
    grains.map { grain =>
      val gDir = new Path(s"$tablePath/_summary/$grain")
      val vDir = new Path(gDir, s"v$batchId")
      if (!complete(vDir)) graft.plans.SummaryRewrite.withBypass {
        val prevVersions: Seq[Long] =
          if (!fs.exists(gDir)) Seq.empty
          else fs.listStatus(gDir).toSeq.map(_.getPath.getName)
            .filter(_.startsWith("v"))
            .flatMap(n => scala.util.Try(n.drop(1).toLong).toOption)
            .filter(v => v < batchId && complete(new Path(gDir, s"v$v")))
            .sorted
        val prev = prevVersions.lastOption
          .map(v => spark.read.parquet(new Path(gDir, s"v$v").toString))
        val table = CopyOnWrite.read(spark, tablePath)
        val newParts = partials(newRows, grain)
        val out = prev match {
          case None => partials(table, grain)
          case Some(p) =>
            // affected buckets: where the batch REPLACED rows. Driver
            // state is O(batch-span buckets) — the same bounded shape as
            // CoW's touched-partition list.
            val bRows = replaced.map(_.select(
                date_trunc(grain, col("ts")).as("b")).distinct().collect())
              .getOrElse(Array.empty)
            val hasNullB = bRows.exists(_.isNullAt(0))
            val bVals = bRows.filterNot(_.isNullAt(0)).map(_.getTimestamp(0))
            if (bRows.isEmpty) foldSummaries(p.unionByName(newParts), grain)
            else {
              def inB(c: Column): Column = {
                val nonNull =
                  if (bVals.isEmpty) lit(false)
                  else coalesce(c.isin(bVals.toSeq: _*), lit(false))
                if (hasNullB) nonNull || c.isNull else nonNull
              }
              // redundant PUSHABLE conjunct: isin-over-trunc never reaches
              // the parquet scan, but a bare-ts window does — row groups
              // outside [min bucket, max bucket + grain) skip on stats, so
              // the scoped rebuild reads a batch-bounded sliver at scale
              val grainMs = if (grain == "day") 86400000L else 3600000L
              val tsWindow: Column =
                if (bVals.isEmpty) col("ts").isNull
                else {
                  val lo = bVals.minBy(_.getTime)
                  val hi = new java.sql.Timestamp(
                    bVals.maxBy(_.getTime).getTime + grainMs)
                  val range = col("ts") >= lit(lo) && col("ts") < lit(hi)
                  if (hasNullB) range || col("ts").isNull else range
                }
              val scoped = partials(
                table.filter(tsWindow && inB(date_trunc(grain, col("ts")))),
                grain)
              foldSummaries(
                p.filter(!inB(col(grain)))
                  .unionByName(newParts.filter(!inB(col(grain)))), grain)
                .unionByName(scoped)
            }
        }
        out.repartition(1).write.mode("overwrite").parquet(vDir.toString)
        prevVersions.dropRight(1) // keep the replay fallback, drop the rest
          .foreach(v => fs.delete(new Path(gDir, s"v$v"), true))
      }
      afterGrainRefresh(grain, batchId)
      grain -> fs.makeQualified(vDir).toString
    }.toMap
  }

  /** [[start]] plus summary maintenance: each micro-batch merges into
    * the table, commits its manifest version, refreshes the day/hour
    * summaries under the SAME batch id (summary `v<N>` ≡ manifest
    * version `N` — a reader can pin a consistent (data, summary) pair
    * at any trigger boundary), and re-registers the navigator routes so
    * raw-spelling dashboard aggregates over the table keep reading the
    * fresh rollup instead of the firehose. */
  /** Test hooks into the TORN WINDOW of the two-commit shape: fired
    * after the batch's manifest CAS lands (before any summary write),
    * and after each grain's summary version lands (before the next
    * grain's). A spec that throws from one simulates a process death
    * inside the window; the restart contract below must heal it. */
  private[graft] var afterManifestCommit: Long => Unit = _ => ()
  private[graft] var afterGrainRefresh: (String, Long) => Unit = (_, _) => ()

  def startWithSummary(source: DataFrame, tablePath: String, partCol: String,
      keyCol: String, checkpoint: String,
      grains: Seq[String] = Seq("day", "hour")): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        mergeAndCommit(s, tablePath, partCol, keyCol, batch, id)
        afterManifestCommit(id)
        // ORDERING INVARIANT (crash recovery): the data commit precedes
        // the summary refresh, and BOTH are idempotent-keyed by batch id
        // — the merge archives under `_archive/batch-<id>` and the
        // summary completes `v<id>` exactly once (`complete` check in
        // refreshSummaries). A death between the two replays the batch:
        // the merge re-applies (same keys, same rows — convergent) and
        // the refresh then runs against the already-merged table. That
        // replay's OWN archivedTo only holds the partitions the RE-merge
        // rewrote — the batch's rows themselves, not the pre-batch rows
        // the first attempt retracted — so `replaced` must be derived
        // from the WHOLE per-batch archive root (every attempt's dirs,
        // unique-suffixed by the CoW swap): otherwise a bucket the first
        // attempt emptied (an upsert that moved a row across hours)
        // escapes the scoped rebuild and lingers stale in the summary.
        val fs = new Path(tablePath)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val archRoot = new Path(s"$tablePath/_archive/batch-$id")
        val archDirs: Seq[String] =
          if (!fs.exists(archRoot)) Seq.empty
          else fs.listStatus(archRoot).toSeq.filter(_.isDirectory)
            .map(_.getPath.toString)
        // pre-merge rows the batch rewrote: the archived partitions'
        // content, restricted to the batch's keys. Empty archive set ⇒
        // pure appends ⇒ the merge-law path.
        val replaced =
          if (archDirs.isEmpty) None
          else Some(s.read.parquet(archDirs: _*)
            .join(broadcast(batch.select(col(keyCol)).distinct()),
              Seq(keyCol), "left_semi"))
        val paths = refreshSummaries(s, tablePath, batch, replaced, id, grains)
        graft.functions.VecExprs.register(s) // the routing RULE, if absent
        paths.foreach { case (grain, p) =>
          graft.plans.SummaryRewrite.register(tablePath, grain, p)
        }
        ()
      }
      .outputMode("update")
      .start()
}
