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

  /** 8 buckets at test SF; at cluster scale this is sized so one bucket
    * ≈ one task's comfortable input (e.g. 2000 buckets for a 1 TB fact
    * at 512 MB target), and both sides of a co-located join MUST agree
    * on the count. */
  val Buckets = 8

  private def mirrorName(base: String, dir: String, spark: SparkSession): String =
    s"${base}_bkt_${dir}_${IncrementalDedup.sourceFingerprint(spark, s"$dir/$base.parquet")}"
      .replaceAll("[^A-Za-z0-9_]", "_")

  /** Ensure a bucketed+sorted mirror of `$dir/$base.parquet` keyed on
    * `key` exists in the session catalog; returns its table name. */
  def ensure(spark: SparkSession, dir: String, base: String, key: String): String =
    ensureTable(spark, mirrorName(base, dir, spark), key)(
      graft.T(spark, dir, base))

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
  def ensureTable(spark: SparkSession, t: String, key: String)(
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
            s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $Buckets BUCKETS " +
            s"LOCATION '$path'")
      } else {
        build
          .repartition(Buckets, org.apache.spark.sql.functions.col(key))
          .write.mode("overwrite")
          .bucketBy(Buckets, key).sortBy(key)
          .option("path", path)
          .saveAsTable(t)
      }
    }
    t
  }
}
