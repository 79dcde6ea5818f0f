package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Snapshot manifests — the minimal metadata layer a table format adds
  * over copy-on-write storage: a versioned file list with per-file
  * key statistics, harvested from parquet FOOTERS (metadata-only
  * distributed reads, the [[graft.queries.Lake]] `meta_parquet_stats`
  * shape).
  *
  * Two capabilities fall out:
  *  - FILE-LEVEL PRUNING without directory layouts: a key-range query
  *    keeps only files whose [min,max] intersects the range — the
  *    manifest is the index, O(#files) driver arithmetic, zero data
  *    reads (`lake_manifest_prune` gates it; the residual predicate
  *    keeps answers exact however coarse the file stats).
  *  - VERSIONED READS: each manifest names a complete consistent file
  *    set, so "read as of v" is "read exactly v's files" — provided
  *    data files are immutable, which [[CopyOnWrite.merge]]'s archive
  *    mode guarantees by renaming replaced partition directories aside
  *    instead of deleting them (`lake_time_travel` gates it).
  *
  * At 100 TB the manifest itself becomes a dataset (Iceberg's manifest
  * lists); the JSON-lines file here is the same structure at catalog
  * scale. Listing and stats collection are one pass at write time;
  * every later planning decision is metadata-only.
  */
object Manifest {

  final case class FileEntry(path: String, bytes: Long, rows: Long,
      minKey: Long, maxKey: Long)

  /** Per-file footer stats of an int64 key column — distributed: the
    * driver holds file NAMES, executors open footers (no data pages). */
  def collectStats(spark: SparkSession, files: Seq[String], keyCol: String)
      : Seq[FileEntry] = {
    import spark.implicits._
    if (files.isEmpty) return Seq.empty
    spark.createDataset(files)
      .repartition(math.min(files.size, 32))
      .map { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          val blocks = r.getFooter.getBlocks.asScala
          val chunks = blocks.flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == keyCol)
          val mins = chunks.map(_.getStatistics.genericGetMin
            .asInstanceOf[Number].longValue)
          val maxs = chunks.map(_.getStatistics.genericGetMax
            .asInstanceOf[Number].longValue)
          (f, chunks.map(_.getTotalSize).sum, blocks.map(_.getRowCount).sum,
            mins.min, maxs.max)
        } finally r.close()
      }
      .collect()
      .map { case (p, b, n, lo, hi) => FileEntry(p, b, n, lo, hi) }
      .toSeq.sortBy(_.path)
  }

  /** Files whose [minKey, maxKey] intersects [lo, hi] — the pruning
    * decision, pure driver arithmetic over the manifest. */
  def prune(entries: Seq[FileEntry], lo: Long, hi: Long): Seq[FileEntry] =
    entries.filter(e => e.maxKey >= lo && e.minKey <= hi)

  private def manifestPath(tablePath: String, version: Int) =
    new Path(tablePath, s"_manifest/v$version.json")

  def write(spark: SparkSession, tablePath: String, version: Int,
      entries: Seq[FileEntry]): Unit = {
    val p = manifestPath(tablePath, version)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try entries.foreach { e =>
      out.write((s"""{"path":"${e.path}","bytes":${e.bytes},""" +
        s""""rows":${e.rows},"min_key":${e.minKey},"max_key":${e.maxKey}}""" +
        "\n").getBytes("UTF-8"))
    } finally out.close()
  }

  def read(spark: SparkSession, tablePath: String, version: Int): Seq[FileEntry] = {
    val p = manifestPath(tablePath, version)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // fixed five-field JSON lines written by `write` — parsed by shape,
    // no JSON library dependency
    val Line = ("""\{"path":"(.*)","bytes":(\d+),"rows":(\d+),""" +
      """"min_key":(-?\d+),"max_key":(-?\d+)\}""").r
    text.split('\n').filter(_.nonEmpty).toSeq.map {
      case Line(p0, b, n, lo, hi) =>
        FileEntry(p0, b.toLong, n.toLong, lo.toLong, hi.toLong)
    }
  }

  /** Retention — the VACUUM half of snapshot management: delete every
    * archived data file that NO retained version's manifest references,
    * plus the manifests of dropped versions. Live (non-archive) files
    * are never touched — they belong to the current table; archives
    * exist only to serve historical manifests, so once the last
    * manifest naming them is dropped they are garbage. Returns the
    * deleted paths. Driver state is manifest-sized; deletes are
    * filesystem metadata calls. */
  def vacuum(spark: SparkSession, tablePath: String,
      retainVersions: Seq[Int], allVersions: Seq[Int]): Seq[String] = {
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val referenced: Set[String] = retainVersions
      .flatMap(v => read(spark, tablePath, v)).map(_.path).toSet
    val archRoot = s"$tablePath/_archive"
    val deletable = dataFiles(spark, archRoot)
      .filterNot(referenced.contains)
    deletable.foreach(f => fs.delete(new Path(f), false))
    val droppedManifests = allVersions.diff(retainVersions).map { v =>
      val p = manifestPath(tablePath, v)
      fs.delete(p, false)
      p.toString
    }
    // sweep now-empty archive directories (bottom-up)
    def sweep(p: Path): Unit = if (fs.exists(p)) {
      fs.listStatus(p).filter(_.isDirectory).foreach(s => sweep(s.getPath))
      if (fs.listStatus(p).isEmpty) fs.delete(p, false)
    }
    sweep(new Path(archRoot))
    deletable ++ droppedManifests
  }

  /** All data files under `dir`, recursively, skipping `_`/`.` names;
    * empty for a missing directory (e.g. an archive no merge touched). */
  def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    def walk(p: Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else if (n.endsWith(".parquet")) Seq(st.getPath.toString)
        else Seq.empty
      }
    walk(root).sorted
  }
}
