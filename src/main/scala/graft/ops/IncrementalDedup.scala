package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup candidate generation (SCALE.md "where the next
  * 10× goes" #3): once a corpus's LSH signatures are persisted as an
  * index partitioned by bucket, NEW data never re-joins the corpus with
  * itself. A delta of D docs against a corpus of N costs
  *
  *   delta⋈index bucket join (|D|·bucketFanout lookups)
  *   + delta self-join (|D|² worst case, tiny)
  *
  * instead of the (N+D)² full recompute — the difference between an
  * hourly ingest tick and a weekly cluster-wide job at 100 TB.
  *
  * Signature-agnostic: works over any (doc_id, bucket…) frame — MinHash
  * band hashes, SimHash bands, blocking keys — because bucket-collision
  * candidacy is the common LSH contract. The bucket may span several
  * columns (the `on` overloads), which is what lets the PERSISTED index
  * put low-cardinality bucket components (band, signature prefix) into
  * the parquet partition layout: a delta join then touches only the
  * partitions whose buckets the delta actually hits (dynamic partition
  * pruning — asserted in PlanSpec), so an ingest tick reads |delta|-
  * proportional bytes of index, not the whole corpus.
  *
  * Completeness is exact by construction (a qualifying pair within the
  * union shares a bucket; both its docs are in corpus — already known —
  * or at least one is in the delta — produced here); the equivalence
  * against a full recompute is pinned by IncrementalDedupSpec and,
  * end-to-end through storage, by the `dedup_incremental` oracle query.
  */
object IncrementalDedup {

  /** All bucket-collision pairs within one signature frame —
    * the "full recompute" baseline. Columns: (doc_id, bucket). */
  def candidates(sigs: DataFrame): DataFrame =
    candidatesOn(sigs, Seq("bucket"))

  /** As [[candidates]], with the bucket spread over `on` columns. */
  def candidatesOn(sigs: DataFrame, on: Seq[String]): DataFrame =
    sigs.as("x").join(sigs.as("y"), on)
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

  /** Candidate pairs a delta ADDS to an indexed corpus: delta-vs-corpus
    * bucket collisions plus within-delta collisions. Union with the
    * corpus's own (already-known) pairs to equal `candidates(corpus ∪
    * delta)`. Requires corpus and delta doc_id sets to be disjoint —
    * re-ingested ids belong in the corpus index, not the delta. */
  def newCandidates(corpusSigs: DataFrame, deltaSigs: DataFrame): DataFrame =
    newCandidatesOn(corpusSigs, deltaSigs, Seq("bucket"))

  /** As [[newCandidates]], with the bucket spread over `on` columns.
    * Pass the PERSISTED index read ([[readIndex]]) as `corpusSigs` and
    * include the partition columns in `on` — the delta side then drives
    * dynamic partition pruning on the index scan. */
  def newCandidatesOn(corpusSigs: DataFrame, deltaSigs: DataFrame,
      on: Seq[String]): DataFrame = {
    val cross = deltaSigs.as("d").join(corpusSigs.as("c"), on)
      .select(
        least(col("d.doc_id"), col("c.doc_id")).as("doc_a"),
        greatest(col("d.doc_id"), col("c.doc_id")).as("doc_b"))
    val within = deltaSigs.as("x").join(deltaSigs.as("y"), on)
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    cross.unionByName(within).distinct()
  }

  /** Persist a (doc_id, band, sig) signature frame as the corpus index,
    * parquet-partitioned by (band, pfx = first sig hex char): 4×16
    * directories whose names ARE the coarse bucket, so a delta bucket
    * join prunes at the filesystem level before any row is read. The
    * full `sig` stays a data column — partitioning by the complete
    * signature would create a directory per distinct bucket (unbounded
    * small files); a fixed 64-way layout keeps files large and lets the
    * fine-grained sig equality run as an ordinary codegen'd join. */
  def writeIndex(sigs: DataFrame, path: String): Unit =
    withPfx(sigs)
      .write.mode("overwrite").partitionBy("band", "pfx").parquet(path)

  /** Build the index only if it isn't already on disk (checked via the
    * committer's `_SUCCESS` marker, so a half-written index rebuilds).
    * This is the operator's steady state: the corpus index is written
    * once per compaction and then only READ by every ingest tick — the
    * whole point of the incremental path is that ticks don't pay the
    * corpus-sized write. Call [[writeIndex]] directly to force a
    * rebuild (e.g. after corpus compaction). */
  def ensureIndex(sigs: => DataFrame, spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) writeIndex(sigs, path)
  }

  /** Partition-column types are INFERRED from directory names on read —
    * a small index whose pfx values happen to be all digits would come
    * back int, not string, and silently miss the delta join. Pin both. */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("band", col("band").cast("int"))
      .withColumn("pfx", col("pfx").cast("string"))

  /** The index's bucket columns, coarse→fine: partition dirs then sig. */
  val indexBucket: Seq[String] = Seq("band", "pfx", "sig")

  /** Derive the partition-prefix column a delta side must carry to join
    * an index on [[indexBucket]]. */
  def withPfx(sigs: DataFrame): DataFrame =
    sigs.withColumn("pfx", substring(col("sig"), 1, 1))

  /** Deterministic per-corpus index location (idempotent rebuild).
    * Include [[sourceFingerprint]] of the corpus input in `tag`: a
    * `_SUCCESS`-marked index is otherwise trusted forever, so if the
    * data under the same path were regenerated, ensureIndex would serve
    * stale candidates — fingerprinted tags make regenerated inputs land
    * at a fresh path and rebuild instead. */
  def indexPath(tag: String): String = {
    val safe = tag.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${sys.props("java.io.tmpdir")}/graft-index/$safe"
  }

  /** Cheap driver-side fingerprint of an index's SOURCE data — file
    * count, max mtime, total byte length under `path` (one FS listing,
    * no data read). Changes whenever the input is regenerated; embed it
    * in the [[indexPath]] tag so index validity is keyed to input
    * identity, not just input location. */
  def sourceFingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.getFileStatus(p) match {
      case st if st.isDirectory => fs.listStatus(p).filter(_.isFile)
      case st => Array(st)
    }
    val maxM = if (files.isEmpty) 0L else files.map(_.getModificationTime).max
    s"${files.length}-$maxM-${files.map(_.getLen).sum}"
  }
}
