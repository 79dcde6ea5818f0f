package graft.ops

import org.apache.spark.sql.SparkSession

/** Hive-style partitioned-directory mirrors: write a table once,
  * partitioned by a low-cardinality column, so every later query that
  * filters on that column prunes whole directories at PLANNING time —
  * zero bytes read for excluded partitions (`PartitionFilters:` in the
  * scan node, pinned by PlanSpec; `scan_partition_pruned` gates the
  * result through the oracle).
  *
  * This is the directory-layout half of the scan story at 100 TB
  * (the bucket layout in [[Bucketing]] is the join half): a corpus
  * partitioned by language/source/date turns the dominant selective
  * scans ("English only", "last 7 days") into |match|-proportional
  * reads instead of corpus-sized ones. Partition columns must be
  * low-cardinality — one directory per value; a high-cardinality key
  * here is the small-files anti-pattern (that key belongs in
  * [[Bucketing]]'s fixed-width buckets instead).
  *
  * Mirrors are path-memoized like the LSH signature index: the
  * directory name embeds a [[IncrementalDedup.sourceFingerprint]] of
  * the source parquet, and a `_SUCCESS`-marked mirror is reused as-is
  * (regenerated inputs land at a fresh path and rebuild).
  */
object PartitionedLayout {

  /** Ensure a mirror of `$dir/$base.parquet` partitioned by `key`
    * exists on disk; returns its path. */
  def ensure(spark: SparkSession, dir: String, base: String, key: String): String =
    ensureDerived(spark, s"$dir/$base.parquet", s"${base}_part_${key}_$dir", key)(
      graft.T(spark, dir, base))

  /** Generalization of [[ensure]] for DERIVED layouts: persist the frame
    * produced by `build` partitioned by `key`, memoized on the SOURCE
    * parquet's fingerprint — valid whenever `build` is a deterministic
    * function of that source (e.g. an IVF cell assignment whose trained
    * centroids derive from the same table). `build` is by-name: a mirror
    * hit never constructs the frame at all. */
  def ensureDerived(spark: SparkSession, srcPath: String, tag: String, key: String)(
      build: => org.apache.spark.sql.DataFrame): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, srcPath)
    val dirTag = s"${tag}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-partitioned/$dirTag"
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      Scratch.guardBuild(spark, dirTag) // refuse, don't die ENOSPC mid-write
      BuildLedger.timed(s"partitioned/$tag") {
        build.write.mode("overwrite").partitionBy(key).parquet(path)
      }
    }
    path
  }
}
