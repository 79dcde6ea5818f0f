package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the table-maintenance half of the layout
  * story ([[Bucketing]] and [[PartitionedLayout]] are the write-time
  * half). Streaming ingest, per-trigger micro-batches, and
  * high-parallelism writers all decay a table into thousands of
  * KB-sized files; at 100 TB the resulting per-file open/footer cost
  * dominates scan time and the NameNode/object-store listing becomes
  * the bottleneck. Compaction bin-packs a directory's data files back
  * to a target size in one distributed pass.
  *
  * Contract:
  *  - sizing is computed from the actual file listing (ceil of
  *    bytes/target), never guessed from row counts;
  *  - the rewrite goes to a sibling temp dir first and is swapped in
  *    with two renames — readers never observe a half-rewritten
  *    dataset, and a crash mid-compaction leaves either the old or the
  *    new complete layout, not a mix;
  *  - content is preserved as a MULTISET (round-robin repartition
  *    reassigns rows to output files; row order inside a parquet
  *    dataset is not part of its contract).
  *
  * At cluster scale this runs per partition directory (compact the
  * partitions a write touched, not the table) and under a table lock or
  * snapshot protocol; the single-directory primitive here is that inner
  * step. CompactionSpec pins file-count reduction, multiset equality,
  * and crash-safety of the swap ordering.
  */
object Compaction {

  /** Data files of `dir` (excludes _SUCCESS/CRC bookkeeping). */
  private def dataFiles(spark: SparkSession, dir: Path) = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).filter(f =>
      f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
  }

  /** Bin-pack the parquet directory `path` into ceil(bytes/targetBytes)
    * files. Returns (files before, files after). */
  def compact(spark: SparkSession, path: String, targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(spark, p)
    val total = before.map(_.getLen).sum
    val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val tmp = new Path(path + ".compact-tmp")
    val old = new Path(path + ".compact-old")
    spark.read.parquet(path)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: old layout is renamed aside BEFORE the new one moves in, so
    // any failure leaves exactly one complete layout addressable
    fs.delete(old, true)
    if (!fs.rename(p, old)) sys.error(s"compaction swap failed: $p -> $old")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore
      sys.error(s"compaction swap failed: $tmp -> $p")
    }
    fs.delete(old, true)
    (before.length, dataFiles(spark, p).length)
  }
}
