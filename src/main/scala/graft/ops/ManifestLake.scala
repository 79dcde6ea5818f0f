package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** A table whose membership is defined ONLY by the manifest-list chain
  * ([[Manifest.commitDelta]]) — the Iceberg architecture, where
  * [[graft.streaming.LakeStream]] is the Hive-shaped one:
  *
  *  - Data files are IMMUTABLE and never move. A merge writes the
  *    replacement content of the touched partitions to a fresh
  *    `data/<tag>/` directory and commits (added, removed) against the
  *    list head — the removed files stay on disk untouched, so every
  *    historical version keeps reading verbatim with no
  *    [[Manifest.remapPrefix]] pointer surgery (the fixup LakeStream
  *    needs because its CoW renames directories aside).
  *  - Commit metadata cost is O(delta): one new manifest for the added
  *    files, rewrites only of manifests naming a removed file, every
  *    other manifest shared by name (ManifestListSpec economics).
  *  - Readers resolve a version's file set from the list and read those
  *    paths directly; partition dirs are an internal layout detail, not
  *    the table definition. A reader pinned to version v is isolated
  *    from every concurrent writer by construction.
  *  - Retention ([[vacuum]]) deletes data files no RETAINED list
  *    references, then the dropped lists and their orphaned manifests.
  *
  * Layout: rows are written under `data/<tag>/graft_p=<v>/` — partitioned
  * directories for single-valued removal granularity, but with the
  * user's partition column RETAINED AS A DATA COLUMN (the `graft_p` shadow
  * carries the directory), so version reads need no basePath gymnastics
  * across per-commit roots. `partCol` must be string-typed and
  * path-safe, the same contract [[CopyOnWrite.merge]] documents.
  *
  * Concurrency: a lost CAS re-runs the WHOLE merge against the new
  * head (not a metadata-only rebase of stale file sets) — so two
  * writers hitting the SAME partition serialize correctly: the loser
  * re-reads the winner's files as its base and re-folds survivors,
  * instead of resurrecting rows the winner already replaced.
  * ManifestLakeSpec races two same-partition writers and pins both
  * updates durable with no duplicated keys.
  *
  * At-least-once replay (the streaming sink): output dirs are unique
  * per (tag, head version) — `data/<tag>-v<n>/`. A crash between write
  * and commit replays onto the SAME head and overwrites the same
  * never-committed dir; a full duplicate delivery lands on the new
  * head, re-reads the first commit's files as the touched partition
  * (survivors re-fold through the key anti-join — merge-by-key is
  * idempotent) and commits an identical-content snapshot, which vacuum
  * retires. Either way the table converges instead of double-counting
  * or dropping survivor rows.
  */
object ManifestLake {

  /** Merge `delta` (replace-by-key within touched partitions, insert
    * otherwise) into the manifest-list table at `tablePath`, writing
    * new files under `data/<tag>/` and committing O(delta) metadata.
    * Returns the committed list version. */
  def mergeCommit(spark: SparkSession, tablePath: String, partCol: String,
      keyCol: String, delta: DataFrame, tag: String,
      maxAttempts: Int = 10): Int = {
    val touched: Seq[String] = delta.select(col(partCol)).distinct()
      .collect().map { r =>
        val v = r.get(0)
        require(v != null, s"null $partCol in delta — unsupported")
        require(v.isInstanceOf[String],
          s"$partCol must be string-typed for path round-tripping")
        v.asInstanceOf[String]
      }.toSeq.sorted
    def inTouched(p: String): Boolean =
      touched.exists(v => p.contains(s"/graft_p=$v/"))

    // the WHOLE merge re-runs on a lost CAS — the (added, removed) sets
    // are derived from the head's files, so a same-partition racer's
    // commit must be re-read, not overwritten with stale survivors
    // (commitDeltaGroupedAt pins the attempt to the head we merged
    // against; its internal rebase would silently resurrect replaced
    // rows here)
    var attempt = 0
    while (attempt < maxAttempts) {
      val head = Manifest.currentListVersion(spark, tablePath)
      // unique per (tag, head): a same-head replay overwrites its own
      // never-committed dir; a post-commit replay or CAS retry gets a
      // fresh dir and never reads files it is about to overwrite
      val outDir = s"$tablePath/data/$tag-v${head + 1}"
      val entries =
        if (head >= 0) Manifest.readAll(spark, tablePath, head) else Seq.empty
      val removed = entries.map(_.path).filter(inTouched).toSet
      val oldTouched = removed.toSeq.sorted
      val survivors =
        if (oldTouched.isEmpty) None
        else Some(spark.read.parquet(oldTouched: _*)
          .join(delta.select(col(keyCol)), Seq(keyCol), "left_anti"))
      val newData = survivors.fold(delta)(s =>
        s.unionByName(delta, allowMissingColumns = true))
      newData.withColumn("graft_p", col(partCol))
        .write.partitionBy("graft_p").mode("overwrite").parquet(outDir)
      val added = Manifest.collectStats(
        spark, Manifest.dataFiles(spark, outDir), keyCol)
      // one manifest per touched partition (Iceberg's partition-aligned
      // manifests): a later single-partition commit rewrites one
      // manifest and shares every other partition's by name
      val groups = added.groupBy(e =>
        touched.find(v => e.path.contains(s"/graft_p=$v/")))
        .toSeq.sortBy(_._1).map(_._2)
      Manifest.commitDeltaGroupedAt(spark, tablePath, head, groups,
        removed) match {
        case Right(v) => return v
        case Left(_)  => attempt += 1
      }
    }
    throw new java.io.IOException(
      s"merge of '$tag' lost $maxAttempts consecutive races at $tablePath")
  }

  /** The table as of list `version` (default: current head). An empty
    * chain or an empty version reads as an empty frame only if a schema
    * source exists — callers read versions they know committed. */
  def read(spark: SparkSession, tablePath: String, version: Int = -1): DataFrame = {
    val v = if (version >= 0) version
      else Manifest.currentListVersion(spark, tablePath)
    require(v >= 0, s"no committed list versions at $tablePath")
    spark.read.parquet(Manifest.readAll(spark, tablePath, v).map(_.path): _*)
  }

  /** Drop every list version not in `retain`: delete data files only
    * the dropped versions reference, then the dropped list files and
    * any manifests no retained list names. Returns deleted paths. */
  def vacuum(spark: SparkSession, tablePath: String,
      retain: Seq[Int]): Seq[String] = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = Manifest.listVersions(spark, tablePath)
    val dropped = all.diff(retain)
    val keepRefs = retain.flatMap(v => Manifest.readList(spark, tablePath, v))
    val keepManifests = keepRefs.map(_.name).toSet
    val keepFiles = keepRefs
      .flatMap(r => Manifest.readManifestFile(spark, tablePath, r.name))
      .map(_.path).toSet
    val doomedFiles = dropped
      .flatMap(v => Manifest.readAll(spark, tablePath, v)).map(_.path)
      .distinct.filterNot(keepFiles.contains)
    val doomedManifests = dropped
      .flatMap(v => Manifest.readList(spark, tablePath, v)).map(_.name)
      .distinct.filterNot(keepManifests.contains)
    doomedFiles.foreach(p => fs.delete(new Path(p), false))
    doomedManifests.foreach(n =>
      fs.delete(new Path(tablePath, s"_manifest/$n"), false))
    val doomedLists = dropped.map { v =>
      val p = new Path(tablePath, s"_manifest/v$v.list.json")
      fs.delete(p, false)
      p.toString
    }
    doomedFiles ++
      doomedManifests.map(n => s"$tablePath/_manifest/$n") ++ doomedLists
  }

  /** Streaming ingest: one [[mergeCommit]] per micro-batch, tagged by
    * batch id (replays converge — see the object doc). */
  def start(source: DataFrame, tablePath: String, partCol: String,
      keyCol: String, checkpoint: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeCommit(batch.sparkSession, tablePath, partCol, keyCol,
          batch, s"batch-$id")
        ()
      }
      .outputMode("update")
      .start()
}
