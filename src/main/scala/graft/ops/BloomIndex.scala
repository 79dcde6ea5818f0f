package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.util.sketch.BloomFilter

/** Per-FILE bloom-filter index for point lookups — the file-skipping
  * grain min/max spans cannot provide. [[Manifest.collectStats]] prunes
  * range queries because a sorted/clustered layout gives files narrow
  * [min, max] key spans; but a point lookup on a key column the layout
  * does NOT sort by (a uuid-ish id, a foreign key) sees every file span
  * the whole domain and prunes nothing. The bloom index answers exactly
  * that case: one membership sketch per data file (built distributed —
  * group by `_metadata.file_path` over the [[graft.functions.BloomAgg]]
  * aggregate, one pass, map-side combined), stored as a tiny parquet
  * sidecar; a lookup consults the sidecar driver-side (O(#files), the
  * same metadata economics as the manifests) and schedules scans ONLY
  * for files whose filter admits the key.
  *
  * Guarantees: blooms have no false negatives, so pruning never loses a
  * row — a false positive only costs one wasted file scan (rate set by
  * `fpp`). The filter bytes are deterministic (bit-OR of per-key
  * patterns, order- and partitioning-independent), so index builds are
  * reproducible. This is Parquet's row-group bloom / Iceberg's puffin
  * blob, done at the file grain where the driver can use it before
  * touching any footer.
  */
object BloomIndex {

  /** Build the index over `dataPath`'s files for `keyCol` — integral,
    * string, or binary keys; each enters the filter by its native type
    * (a long cast here would NULL out uuid-ish string ids and blind the
    * index). Writes (file_path, bloom) rows to `indexPath`.
    * `expectedPerFile` sizes each filter (overshooting costs bits,
    * undershooting costs fpp). One distributed pass over the data. */
  def build(spark: SparkSession, dataPath: String, keyCol: String,
      indexPath: String, expectedPerFile: Long = 1L << 16,
      fpp: Double = 0.01): Unit = {
    graft.functions.VecExprs.register(spark)
    spark.read.parquet(dataPath)
      .select(col(keyCol).as("k"),
        col("_metadata.file_path").as("file_path"))
      .groupBy(col("file_path"))
      .agg(expr(s"bloom_agg(k, ${expectedPerFile}L, $fpp)").as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(indexPath)
  }

  /** The index as driver-side (file, filter) pairs — O(#files). */
  def load(spark: SparkSession, indexPath: String): Seq[(String, BloomFilter)] =
    spark.read.parquet(indexPath).collect().toSeq.map { r =>
      r.getAs[String]("file_path") ->
        BloomFilter.readFrom(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
    }

  /** Files that might contain ANY of `keys` — the scan set for a
    * multi-key point lookup. No false negatives: every file holding one
    * of the keys is returned. NOTE the result can legitimately be EMPTY
    * (every probed key absent, no false positive fired) — callers must
    * short-circuit to an empty result instead of handing zero paths to
    * `spark.read.parquet`, which throws. */
  def candidateFiles(index: Seq[(String, BloomFilter)],
      keys: Seq[Long]): Seq[String] =
    index.collect {
      case (f, bf) if keys.exists(bf.mightContainLong) => f
    }

  /** String-key variant (indexes built over a string/binary column —
    * the uuid-ish-id case). `mightContainString` probes the UTF-8 bytes,
    * matching what [[graft.functions.BloomAgg]] put in. */
  def candidateFilesStr(index: Seq[(String, BloomFilter)],
      keys: Seq[String]): Seq[String] =
    index.collect {
      case (f, bf) if keys.exists(bf.mightContainString) => f
    }
}
