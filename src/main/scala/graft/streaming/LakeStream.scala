package graft.streaming

import graft.ops.{CopyOnWrite, Manifest}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

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
        val s = batch.sparkSession
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
        ()
      }
      .outputMode("update")
      .start()

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
}
