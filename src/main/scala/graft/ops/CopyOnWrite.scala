package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Copy-on-write MERGE (upsert by key) into a Hive-partitioned parquet
  * table — the Delta/Iceberg `MERGE INTO` execution shape, reduced to
  * its storage primitive: only the partitions the delta touches are
  * rewritten; every other partition's files are left byte-identical on
  * disk (LakeCowSpec pins this).
  *
  * Per touched partition: new data = (existing rows anti-joined on the
  * delta's keys) ∪ (delta rows for that partition) — i.e. matched keys
  * are REPLACED, unmatched delta keys are inserts, and a delta
  * partition value absent from the base simply materializes as a new
  * directory. The rewrite goes to a sibling temp dir first and is
  * swapped in with renames ([[Compaction]]'s crash-safety argument:
  * readers observe the old or the new complete partition, never a mix).
  *
  * Scale notes: the loop is over TOUCHED PARTITIONS (driver state =
  * the delta's distinct partition values — catalog-sized, not
  * data-sized); each iteration is one distributed anti-join + write
  * over a single partition's data. The single-job alternative —
  * dynamic partition overwrite of the merged frame — needs a snapshot
  * layer to avoid reading the path being overwritten, which is
  * precisely the metadata layer table formats add on top of this
  * primitive. Deletes (the third MERGE clause) are the same anti-join
  * with no union; omitted here because the engine's reference surface
  * has no delete feed.
  */
object CopyOnWrite {

  /** One touched partition's outcome: its value and, in archive mode,
    * the directory its replaced files actually landed in (unique-
    * suffixed on collision, so callers doing manifest pointer fixup
    * must use THIS path, not the canonical one). */
  final case class MergedPartition(value: String, archivedTo: Option[String])

  /** Upsert `delta` into the partitioned table at `tablePath` by
    * `keyCol`. Returns the partition values rewritten.
    *
    * `archiveTo`: when set, replaced partition directories are RENAMED
    * under this path (keeping their `partCol=value` names) instead of
    * deleted — data files stay immutable, which is what makes a
    * pre-merge [[Manifest]] snapshot readable forever (time travel).
    * The archive is an O(1) metadata rename per touched partition, not
    * a copy; a retention job prunes archives once no live snapshot
    * references them (the GC half a table format's VACUUM does). */
  def merge(spark: SparkSession, tablePath: String, partCol: String,
      keyCol: String, delta: DataFrame,
      archiveTo: Option[String] = None): Seq[String] =
    mergeDetailed(spark, tablePath, partCol, keyCol, delta, archiveTo)
      .map(_.value)

  /** [[merge]], reporting per-partition archive destinations. */
  def mergeDetailed(spark: SparkSession, tablePath: String, partCol: String,
      keyCol: String, delta: DataFrame,
      archiveTo: Option[String] = None): Seq[MergedPartition] = {
    // the partition value round-trips value -> directory name -> filter
    // literal; that round-trip is exact for strings only (dates,
    // decimals, floats all have formatting degrees of freedom), and a
    // null can neither name a directory nor equal itself in the filter
    require(delta.schema(partCol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"CoW merge requires a string-typed partition column, " +
        s"got $partCol: ${delta.schema(partCol).dataType.simpleString}")
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataCols = delta.columns.filter(_ != partCol)
    val touched = delta.select(col(partCol)).distinct()
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"CoW merge delta contains a null $partCol value — null cannot " +
            "name a partition directory")
        r.getString(0)
      }.sorted.toSeq
    touched.map { p =>
      val partDir = new Path(tablePath, s"$partCol=$p")
      val tmpDir = new Path(tablePath, s".merge-tmp-$partCol=$p")
      val deltaP = delta.filter(col(partCol) === p).select(dataCols.map(col): _*)
      val merged =
        if (fs.exists(partDir)) {
          // allowMissingColumns = schema evolution through the merge: a
          // delta column the base lacks null-fills surviving base rows
          // (and vice versa on a narrowing delta). Untouched partitions
          // keep their old file schema — readers reconcile with
          // mergeSchema ([[read]]), exactly Delta/Iceberg's add-column
          // semantics (metadata-only for old files).
          val existing = spark.read.parquet(partDir.toString)
          existing.join(deltaP.select(col(keyCol)), Seq(keyCol), "left_anti")
            .unionByName(deltaP, allowMissingColumns = true)
        } else deltaP
      merged.write.mode("overwrite").parquet(tmpDir.toString)
      // swap: move the old dir aside (archive or drop), promote the tmp
      // dir. A crash between the two renames loses availability of one
      // partition, never serves half-merged data. Hadoop rename signals
      // failure by RETURNING FALSE, not throwing — an unchecked false
      // here would leave the old partition in place and silently drop
      // the merge's data on the follow-up rename, so both renames are
      // checked and a colliding archive destination (the same partition
      // merged twice against one archive root) gets a unique suffix
      // instead of failing the swap.
      def renameOrThrow(src: Path, dst: Path): Unit =
        if (!fs.rename(src, dst)) throw new java.io.IOException(
          s"rename failed: $src -> $dst")
      val archivedTo =
        if (!fs.exists(partDir)) None
        else archiveTo match {
          case Some(arch) =>
            val archRoot = new Path(arch)
            if (!fs.exists(archRoot)) fs.mkdirs(archRoot)
            var dest = new Path(archRoot, s"$partCol=$p")
            var n = 0
            while (fs.exists(dest)) {
              n += 1
              dest = new Path(archRoot, s"$partCol=$p-$n")
            }
            renameOrThrow(partDir, dest)
            Some(fs.makeQualified(dest).toString)
          case None =>
            fs.delete(partDir, true)
            None
        }
      renameOrThrow(tmpDir, partDir)
      MergedPartition(p, archivedTo)
    }
  }

  /** Re-read a merged table, restoring the partition column that the
    * directory layout carries; mergeSchema reconciles partitions whose
    * files predate a schema-evolving merge (their missing columns read
    * as null). */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.option("basePath", tablePath)
      .option("mergeSchema", "true").parquet(tablePath)
}
