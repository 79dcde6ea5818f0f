package graft.ops

import org.apache.spark.sql.SparkSession

/** Bucketed-mirror management: write a table once, bucketed + sorted on
  * its join key, so every later join or aggregation on that key runs
  * WITHOUT a shuffle exchange (BucketingSpec pins the plan property;
  * `join_bucketed_colocated` gates the result through the oracle).
  *
  * This is the storage-layout half of the co-located join story at
  * 100 TB: the one-time bucketing shuffle is paid at ingest/compaction,
  * and every downstream fact⋈fact join on the bucket key — the
  * per-query cost that dominates a star-schema workload — reads
  * co-located buckets instead of re-shuffling the fact tables each run.
  *
  * Mirrors are memoized like the LSH signature index
  * ([[IncrementalDedup.ensureIndex]]): the table name embeds a
  * [[IncrementalDedup.sourceFingerprint]] of the source parquet, so
  * regenerated inputs land at a fresh name and rebuild instead of
  * serving stale rows. Bucket METADATA lives in the session catalog
  * (Spark's bucketing is catalog-carried, not file-carried), so a new
  * session re-registers by rewriting — the within-session steady state
  * (every bench tick, every Verify rerun) is a catalog hit.
  */
object Bucketing {

  /** Floor bucket count (test SF); the real count is SIZED from the
    * data — see [[bucketCountFor]]. Both sides of a co-located join
    * MUST agree on the count, which is why every mirror in a testdata
    * dir anchors on the same dominant fact. */
  val Buckets = 8

  /** One bucket ≈ one writer/reader task's comfortable input. A FIXED
    * count is the scale bug the sf30/40 GB-heap suite measured: 8
    * buckets over a 4.6 GB fact put ~22M rows in each writer task and
    * the untracked parquet-writer buffers + sort state OOM'd the heap
    * (at 100 TB a fixed count is off by 1000×). */
  val TargetBucketBytes: Long = 256L << 20

  /** Deterministic size-derived bucket count for an anchor parquet:
    * ceil(bytes / target) rounded up to a power of two (re-derivable at
    * catalog re-register time from the same immutable source), floored
    * at [[Buckets]], capped at 4096. A missing anchor (generic dirs)
    * falls back to the floor. */
  def bucketCountFor(spark: SparkSession, anchorPath: String): Int = {
    val p = new org.apache.hadoop.fs.Path(anchorPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    val raw = math.max(1L, (bytes + TargetBucketBytes - 1) / TargetBucketBytes)
    var c = Buckets
    while (c < raw && c < 4096) c <<= 1
    c
  }

  private def mirrorName(base: String, dir: String, n: Int,
      spark: SparkSession): String =
    s"${base}_bkt${n}_${dir}_${IncrementalDedup.sourceFingerprint(spark, s"$dir/$base.parquet")}"
      .replaceAll("[^A-Za-z0-9_]", "_")

  /** Ensure a bucketed+sorted mirror of `$dir/$base.parquet` keyed on
    * `key` exists in the session catalog; returns its table name. The
    * bucket count anchors on the dir's LINEITEM (the dominant fact), so
    * every mirror of the dir joins co-located with every other. The
    * count rides in the table/dir name: a layout built under one sizing
    * is never re-registered under another. */
  def ensure(spark: SparkSession, dir: String, base: String, key: String): String = {
    val n = bucketCountFor(spark, s"$dir/lineitem.parquet")
    ensureTable(spark, mirrorName(base, dir, n, spark), key, n)(
      graft.T(spark, dir, base))
  }

  /** Ensure an arbitrary frame exists as a bucketed+sorted EXTERNAL
    * catalog table named `t` (the name must already carry the source
    * fingerprint). Three steady states:
    *  - catalog hit: nothing to do (same session, every bench tick);
    *  - FILES exist but the catalog entry doesn't (a NEW session over a
    *    surviving tmpdir): re-REGISTER the existing bucketed files with
    *    a `CREATE TABLE … CLUSTERED BY … LOCATION` DDL — metadata-only,
    *    no rewrite. Spark's bucket ids ride in the file names, so a
    *    re-registered table bucket-joins exactly like the original
    *    (BucketingSpec pins no-rewrite + still shuffle-free);
    *  - nothing exists: build once. `repartition(Buckets, key)` before
    *    the write gives one file per bucket, so the sortBy order
    *    survives to the reader and the join needs no re-sort either.
    * This is the ingest-time economics at 100 TB: the bucketing shuffle
    * is paid once when the layout is FIRST materialized; every later
    * session re-attaches to the files. */
  def ensureTable(spark: SparkSession, t: String, key: String,
      buckets: Int = Buckets)(
      build: => org.apache.spark.sql.DataFrame): String = {
    if (!spark.catalog.tableExists(t)) {
      val path = s"${sys.props("java.io.tmpdir")}/graft-buckets/$t"
      val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(success)) {
        val schema = spark.read.parquet(path).schema
        val cols = schema.fields
          .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(
          s"CREATE TABLE `$t` ($cols) USING parquet " +
            s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $buckets BUCKETS " +
            s"LOCATION '$path'")
      } else {
        Scratch.guardBuild(spark, t) // refuse, don't die ENOSPC mid-write (r12)
        BuildLedger.timed(s"bucketed/$t") {
          build
            .repartition(buckets, org.apache.spark.sql.functions.col(key))
            .write.mode("overwrite")
            .bucketBy(buckets, key).sortBy(key)
            .option("path", path)
            .saveAsTable(t)
        }
      }
    }
    t
  }
}
