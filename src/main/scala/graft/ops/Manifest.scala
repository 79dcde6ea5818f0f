package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Snapshot manifests — the minimal metadata layer a table format adds
  * over copy-on-write storage: a versioned file list with per-file
  * key statistics, harvested from parquet FOOTERS (metadata-only
  * distributed reads, the [[graft.queries.Lake]] `meta_parquet_stats`
  * shape).
  *
  * Three capabilities fall out:
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
  *  - OPTIMISTIC CONCURRENT COMMITS: the version chain advances by
  *    compare-and-swap — [[tryCommit]] publishes v(n+1) only if vn is
  *    still current, using an atomic no-overwrite rename of the
  *    manifest file as the arbiter (the Delta-on-HDFS protocol: the
  *    filesystem's create-exclusive rename decides races, not a lock
  *    service). A loser re-reads the new current version, rebases its
  *    file-set delta, and retries ([[commitWithRetry]]). ManifestSpec
  *    drives two interleaved writers and pins both rows durable on a
  *    linearizable chain.
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
    * driver holds file NAMES, executors open footers (no data pages).
    * Files with no key-column chunk, null/empty statistics, or a
    * non-numeric key type (all reachable through schema-evolving
    * merges) get the CONSERVATIVE [Long.MinValue, Long.MaxValue]
    * span — they intersect every range, so pruning never drops a file
    * it cannot prove safe to drop. Executors read through the
    * session's Hadoop configuration (broadcast once), not a bare
    * default one that would lose FS-specific settings. */
  def collectStats(spark: SparkSession, files: Seq[String], keyCol: String)
      : Seq[FileEntry] = {
    import spark.implicits._
    if (files.isEmpty) return Seq.empty
    val confB = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files)
      .repartition(math.min(files.size, 32))
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(f), confB.value.value)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          val blocks = r.getFooter.getBlocks.asScala
          val chunks = blocks.flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == keyCol)
          val spans = chunks.flatMap { c =>
            scala.util.Try {
              val st = c.getStatistics
              if (st != null && st.hasNonNullValue)
                Some((st.genericGetMin.asInstanceOf[Number].longValue,
                  st.genericGetMax.asInstanceOf[Number].longValue))
              else None
            }.toOption.flatten
          }
          val (lo, hi) =
            if (spans.isEmpty) (Long.MinValue, Long.MaxValue)
            else (spans.map(_._1).min, spans.map(_._2).max)
          (f, chunks.map(_.getTotalSize).sum, blocks.map(_.getRowCount).sum,
            lo, hi)
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

  // -------------------------------------------------------------------
  // Multi-key stats — the manifest grain of the Z-ORDER story. A
  // Morton-clustered file carries a TIGHT [min,max] span on EVERY
  // interleaved dimension (a linear sort serves only its leading key:
  // every file's span on a secondary column is the full domain, and
  // secondary-dimension pruning keeps everything). Harvesting one span
  // per key column lets a 2-D box query drop whole FILES driver-side —
  // the grain between the zcell directory pruning and the in-file
  // row-group skipping that `scan_zorder_cells`/ZOrderSpec already
  // prove. Same one footer pass; the span list just grows by one
  // (lo, hi) per dimension.

  /** Per-file spans of several int64 key columns; missing/null column
    * chunks degrade to the conservative full span per dimension. */
  final case class FileEntryN(path: String, bytes: Long, rows: Long,
      spans: Seq[(Long, Long)])

  def collectStatsN(spark: SparkSession, files: Seq[String],
      keyCols: Seq[String]): Seq[FileEntryN] = {
    import spark.implicits._
    require(keyCols.nonEmpty, "collectStatsN needs at least one key column")
    if (files.isEmpty) return Seq.empty
    val confB = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val keys = keyCols // avoid closing over `this`
    spark.createDataset(files)
      .repartition(math.min(files.size, 32))
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(f), confB.value.value)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          val blocks = r.getFooter.getBlocks.asScala
          val allChunks = blocks.flatMap(_.getColumns.asScala)
          val spans = keys.map { k =>
            val chunks = allChunks.filter(_.getPath.toDotString == k)
            val good = chunks.flatMap { c =>
              scala.util.Try {
                val st = c.getStatistics
                if (st != null && st.hasNonNullValue)
                  Some((st.genericGetMin.asInstanceOf[Number].longValue,
                    st.genericGetMax.asInstanceOf[Number].longValue))
                else None
              }.toOption.flatten
            }
            if (good.isEmpty) (Long.MinValue, Long.MaxValue)
            else (good.map(_._1).min, good.map(_._2).max)
          }
          (f, allChunks.map(_.getTotalSize).sum,
            blocks.map(_.getRowCount).sum, spans)
        } finally r.close()
      }
      .collect()
      .map { case (p, b, n, s) => FileEntryN(p, b, n, s) }
      .toSeq.sortBy(_.path)
  }

  /** Files whose span intersects the box on EVERY dimension — a file
    * survives only if no dimension disqualifies it. */
  def pruneN(entries: Seq[FileEntryN],
      boxes: Seq[(Long, Long)]): Seq[FileEntryN] =
    entries.filter { e =>
      require(e.spans.size == boxes.size,
        s"entry has ${e.spans.size} spans, box has ${boxes.size} dims")
      e.spans.zip(boxes).forall { case ((mn, mx), (lo, hi)) =>
        mx >= lo && mn <= hi
      }
    }

  private def manifestPathN(tablePath: String, version: Int) =
    new Path(tablePath, s"_manifest/n$version.json")

  def writeN(spark: SparkSession, tablePath: String, version: Int,
      entries: Seq[FileEntryN]): Unit = {
    val body = entries.map { e =>
      val spans = e.spans.map { case (lo, hi) => s"[$lo,$hi]" }
        .mkString("[", ",", "]")
      s"""{"path":"${e.path}","bytes":${e.bytes},""" +
        s""""rows":${e.rows},"spans":$spans}""" + "\n"
    }.mkString.getBytes("UTF-8")
    val p = manifestPathN(tablePath, version)
    writeBytes(p.getFileSystem(spark.sparkContext.hadoopConfiguration), p, body)
  }

  def readN(spark: SparkSession, tablePath: String,
      version: Int): Seq[FileEntryN] = {
    val p = manifestPathN(tablePath, version)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val Line = ("""\{"path":"(.*)","bytes":(\d+),"rows":(\d+),""" +
      """"spans":\[(.*)\]\}""").r
    val Span = """\[(-?\d+),(-?\d+)\]""".r
    text.split('\n').filter(_.nonEmpty).toSeq.map {
      case Line(p0, b, n, ss) =>
        val spans = Span.findAllMatchIn(ss)
          .map(m => (m.group(1).toLong, m.group(2).toLong)).toSeq
        FileEntryN(p0, b.toLong, n.toLong, spans)
    }
  }

  private def manifestPath(tablePath: String, version: Int) =
    new Path(tablePath, s"_manifest/v$version.json")

  private def render(entries: Seq[FileEntry]): Array[Byte] =
    entries.map { e =>
      s"""{"path":"${e.path}","bytes":${e.bytes},""" +
        s""""rows":${e.rows},"min_key":${e.minKey},"max_key":${e.maxKey}}""" + "\n"
    }.mkString.getBytes("UTF-8")

  private def writeBytes(fs: FileSystem, p: Path, bytes: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** The CAS arbiter: atomically publish the fully-written temp file at
    * `tmp` onto `dst` IFF `dst` does not exist yet. Returns true for
    * the winner, false for a loser; the temp file (and any checksum
    * sidecar) is cleaned up either way.
    *
    * Scheme matrix (VERDICT r8 #7) — "atomic no-overwrite publish" is
    * NOT portable, and each storage class needs ITS OWN primitive:
    *
    * | scheme            | primitive                 | why it's atomic |
    * |-------------------|---------------------------|-----------------|
    * | `file`            | `link(2)` via Files.createLink | hardlink creation fails EEXIST in the kernel — one syscall, no probe |
    * | `hdfs`, `viewfs`  | `FileContext.rename(Rename.NONE)` | the NameNode arbitrates exists-check + rename in one namespace op (contractual) |
    * | `graft.manifest.atomicRenameSchemes` (conf, comma-sep) | same `Rename.NONE` path | operator opt-in for HDFS-COMPATIBLE stores whose single-op rename is contractually atomic (abfs/ADLS Gen2, ofs) — ADVICE r9: fail-loud is the right default, but the sound-primitive set is wider than the built-in whitelist |
    * | `graft.manifest.conditionalPutSchemes` (conf, comma-sep) | ONE no-overwrite `create(dst)` carrying the bytes | the store's own compare-and-set: the connector maps exclusive create to S3 `If-None-Match: *` (S3A conditional create), GCS `ifGenerationMatch=0`, Azure `If-None-Match: *`. No rename at all — object stores have none; the temp file is local staging whose bytes are re-uploaded in the one conditional PUT |
    * | anything else     | NOT SUPPORTED — fails loudly | a Hadoop "rename" on an unlisted store is copy+delete behind an exists PROBE — a TOCTOU lost update by construction |
    *
    * Listing a scheme under `conditionalPutSchemes` is an operator
    * ASSERTION that the connector's exclusive create is a true
    * conditional put evaluated at commit time (e.g. S3A with
    * `fs.s3a.create.conditional.enabled`), not a client-side exists
    * probe. MemCasFsSpec races 8 writers through this branch against an
    * in-memory store whose exclusive create is a real compare-and-set
    * and whose rename throws — proving the arbiter never needs rename
    * on this path.
    *
    * Unknown schemes FAIL LOUDLY (UnsupportedOperationException) instead
    * of falling through to rename semantics that silently lose commits:
    * the `file:` implementation of Rename.NONE is exactly such a trap —
    * an `exists()` probe + POSIX `rename(2)` that OVERWRITES, so two
    * racers can both pass the probe and one commit vanishes
    * (ManifestSpec's threaded two-writer test caught it in practice
    * before the link(2) arbiter). An object store wired through the
    * generic branch would re-create that bug at 100 TB, where the
    * commit log IS the table. */
  private[graft] def publishIfAbsent(conf: org.apache.hadoop.conf.Configuration,
      tmp: Path, dst: Path): Boolean = {
    val fs = dst.getFileSystem(conf)
    val scheme = Option(dst.toUri.getScheme).getOrElse(fs.getScheme)
    def confSchemes(key: String): Set[String] =
      conf.get(key, "").split(",").map(_.trim).filter(_.nonEmpty).toSet
    def renameNone(): Boolean =
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
        fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.NONE)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException => false
        // some FileContext impls surface the exists-conflict as a
        // generic IOException; the destination existing is the proof
        case _: java.io.IOException if fs.exists(dst) => false
      }
    // ONE exclusive create carrying the full payload — the branch for
    // stores whose no-overwrite create is a conditional put. Bytes are
    // buffered first (manifests are KBs of metadata): the conditional
    // PUT either lands whole or not at all.
    def conditionalPut(): Boolean = {
      def readAll(p: Path): Array[Byte] = {
        val in = fs.open(p)
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          bos.toByteArray
        } finally in.close()
      }
      val bytes = readAll(tmp)
      // RETRY AMBIGUITY: a conditional PUT can land and still surface as
      // a failure to the client (response lost; the SDK's retry then
      // sees 412 because the FIRST attempt created the object). A naive
      // "caught → lost" here makes the writer rebase on a head that IS
      // its own commit and re-apply the delta — a duplicate. So every
      // failure where the destination exists reconciles by reading the
      // head back: byte-identical means the store holds exactly the
      // state this writer intended to publish — claim the win (if a
      // racer wrote those same bytes, the intended states coincide and
      // neither re-applying is correct); different bytes is a real loss.
      def reconcile(): Boolean =
        try java.util.Arrays.equals(readAll(dst), bytes)
        catch { case _: java.io.IOException => false }
      try {
        val out = fs.create(dst, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException => reconcile()
        // connectors that evaluate the precondition at close() may
        // surface the conflict as a plain IOException — the destination
        // existing distinguishes a conflict/ambiguity from a hard fault
        case _: java.io.IOException if fs.exists(dst) => reconcile()
      }
    }
    val won = scheme match {
      case "file" =>
        val tmpNio = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri)
        val dstNio = java.nio.file.Paths.get(fs.makeQualified(dst).toUri)
        try { java.nio.file.Files.createLink(dstNio, tmpNio); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      case "hdfs" | "viewfs" => renameNone()
      case other if confSchemes("graft.manifest.atomicRenameSchemes")
          .contains(other) => renameNone()
      case other if confSchemes("graft.manifest.conditionalPutSchemes")
          .contains(other) => conditionalPut()
      case other =>
        if (fs.exists(tmp)) fs.delete(tmp, false)
        throw new UnsupportedOperationException(
          s"graft.Manifest: no atomic no-overwrite publish primitive is " +
            s"wired for scheme '$other' — refusing to fall through to " +
            "rename semantics that can silently lose a commit. Either " +
            "wire the store's conditional put (S3 If-None-Match: *, GCS " +
            "ifGenerationMatch=0, Azure If-None-Match: *) and list the " +
            "scheme under graft.manifest.conditionalPutSchemes, or — for " +
            "an HDFS-compatible store whose single-op rename is " +
            "contractually atomic — list it under " +
            "graft.manifest.atomicRenameSchemes.")
    }
    if (fs.exists(tmp)) fs.delete(tmp, false)
    won
  }

  def write(spark: SparkSession, tablePath: String, version: Int,
      entries: Seq[FileEntry]): Unit = {
    val p = manifestPath(tablePath, version)
    writeBytes(p.getFileSystem(spark.sparkContext.hadoopConfiguration), p,
      render(entries))
  }

  def read(spark: SparkSession, tablePath: String, version: Int): Seq[FileEntry] = {
    val p = manifestPath(tablePath, version)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parseEntries(text)
  }

  // fixed five-field JSON lines written by `render` — parsed by shape,
  // no JSON library dependency
  private def parseEntries(text: String): Seq[FileEntry] = {
    val Line = ("""\{"path":"(.*)","bytes":(\d+),"rows":(\d+),""" +
      """"min_key":(-?\d+),"max_key":(-?\d+)\}""").r
    text.split('\n').filter(_.nonEmpty).toSeq.map {
      case Line(p0, b, n, lo, hi) =>
        FileEntry(p0, b.toLong, n.toLong, lo.toLong, hi.toLong)
    }
  }

  /** The committed version chain, ascending; empty for a table with no
    * manifests yet. One directory listing — metadata-only. */
  def versions(spark: SparkSession, tablePath: String): Seq[Int] = {
    val mdir = new Path(tablePath, "_manifest")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mdir)) return Seq.empty
    val V = """v(\d+)\.json""".r
    fs.listStatus(mdir).toSeq.map(_.getPath.getName)
      .collect { case V(n) => n.toInt }.sorted
  }

  /** Current version, or -1 when the chain is empty (so `expected = -1`
    * commits v0). */
  def currentVersion(spark: SparkSession, tablePath: String): Int =
    versions(spark, tablePath).lastOption.getOrElse(-1)

  /** Optimistic CAS publish of `entries` as version `expected + 1`:
    * succeeds only if `expected` is still the head of the chain at
    * publish time. The arbiter is an atomic NO-OVERWRITE rename of the
    * fully-written temp manifest onto the versioned name (see
    * [[publishIfAbsent]] — hardlink-create on local FS, where Hadoop's
    * Rename.NONE is a non-atomic probe; FileContext rename on HDFS), so
    * two racing writers can never both own a version and readers never
    * see a partially-written manifest. Returns Right(newVersion) for the
    * winner, Left(actualCurrentVersion) for a loser (who should rebase
    * on the new head and retry). */
  def tryCommit(spark: SparkSession, tablePath: String, expected: Int,
      entries: Seq[FileEntry]): Either[Int, Int] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val next = expected + 1
    val dst = manifestPath(tablePath, next)
    val fs = dst.getFileSystem(conf)
    // fast-path stale check (cheap listing); the publish below is the
    // authoritative arbiter either way
    val cur = currentVersion(spark, tablePath)
    if (cur != expected) return Left(cur)
    val tmp = new Path(tablePath,
      s"_manifest/.tmp-${java.util.UUID.randomUUID()}-v$next.json")
    writeBytes(fs, tmp, render(entries))
    if (publishIfAbsent(conf, tmp, dst)) Right(next)
    else Left(currentVersion(spark, tablePath))
  }

  /** CAS retry loop: read the current head, let `recompute` rebuild the
    * entry list against that base (current version, its entries — empty
    * at -1), and try to commit; on a lost race, rebase on the new head
    * and retry. Returns the committed version. */
  def commitWithRetry(spark: SparkSession, tablePath: String,
      maxAttempts: Int = 10)(
      recompute: (Int, Seq[FileEntry]) => Seq[FileEntry]): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = currentVersion(spark, tablePath)
      val baseEntries =
        if (base >= 0) read(spark, tablePath, base) else Seq.empty
      tryCommit(spark, tablePath, base, recompute(base, baseEntries)) match {
        case Right(v) => return v
        case Left(_)  => attempt += 1
      }
    }
    throw new java.io.IOException(
      s"manifest commit lost $maxAttempts consecutive races at $tablePath")
  }

  // -------------------------------------------------------------------
  // Two-level manifests (manifest lists) — the Iceberg snapshot layout.
  //
  // The single-level chain above rewrites the FULL file list on every
  // commit: O(#files) metadata per commit, which at 100 TB (millions of
  // data files) makes commit cost grow with TABLE size rather than
  // DELTA size. One more level of indirection fixes the economics:
  // data files are named by IMMUTABLE manifest files (`m-<uuid>.json`,
  // same JSON-lines entry format), and a version is a manifest LIST
  // (`v<N>.list.json`) naming the manifest files it comprises, each
  // with aggregated span/count stats. A commit then
  //   - appends by writing ONE new manifest for the added files plus a
  //     new list that shares every existing manifest BY NAME — O(delta)
  //     bytes written and ZERO existing manifests opened
  //     (ManifestListSpec pins both);
  //   - removes by rewriting ONLY the manifests that actually name a
  //     removed file (located by reading manifest entries — manifest-
  //     scale metadata, never data); untouched manifests are shared.
  // Reads prune at BOTH levels: list-level span stats drop whole
  // manifests before any manifest file is opened, then per-file stats
  // prune within the survivors ([[pruneTwoLevel]]). The commit arbiter
  // is the same atomic no-overwrite rename as the single-level chain,
  // applied to the list file — both chains are independent, so a table
  // can carry either (or both, during a migration).
  //
  // Losers of a CAS race may leave orphaned `m-*.json` files behind;
  // they are unreferenced metadata (never data), swept by the same
  // retention pass that drops expired list versions.

  /** One manifest file as named by a list: aggregate stats let the
    * planner drop the whole manifest without opening it. */
  final case class ManifestRef(name: String, files: Long, bytes: Long,
      rows: Long, minKey: Long, maxKey: Long)

  private def refOf(name: String, entries: Seq[FileEntry]): ManifestRef =
    ManifestRef(name, entries.size, entries.map(_.bytes).sum,
      entries.map(_.rows).sum, entries.map(_.minKey).min,
      entries.map(_.maxKey).max)

  /** Write `entries` as a fresh immutable manifest file. */
  def writeManifestFile(spark: SparkSession, tablePath: String,
      entries: Seq[FileEntry]): ManifestRef = {
    require(entries.nonEmpty, "empty manifest files are never written")
    val name = s"m-${java.util.UUID.randomUUID()}.json"
    val p = new Path(tablePath, s"_manifest/$name")
    writeBytes(p.getFileSystem(spark.sparkContext.hadoopConfiguration), p,
      render(entries))
    refOf(name, entries)
  }

  def readManifestFile(spark: SparkSession, tablePath: String,
      name: String): Seq[FileEntry] = {
    val p = new Path(tablePath, s"_manifest/$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parseEntries(text)
  }

  private def listPath(tablePath: String, version: Int) =
    new Path(tablePath, s"_manifest/v$version.list.json")

  private def renderList(refs: Seq[ManifestRef]): Array[Byte] =
    refs.map { r =>
      s"""{"manifest":"${r.name}","files":${r.files},"bytes":${r.bytes},""" +
        s""""rows":${r.rows},"min_key":${r.minKey},"max_key":${r.maxKey}}""" +
        "\n"
    }.mkString.getBytes("UTF-8")

  def readList(spark: SparkSession, tablePath: String,
      version: Int): Seq[ManifestRef] = {
    val p = listPath(tablePath, version)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val Line = ("""\{"manifest":"(.*)","files":(\d+),"bytes":(\d+),""" +
      """"rows":(\d+),"min_key":(-?\d+),"max_key":(-?\d+)\}""").r
    text.split('\n').filter(_.nonEmpty).toSeq.map {
      case Line(n, f, b, r, lo, hi) =>
        ManifestRef(n, f.toLong, b.toLong, r.toLong, lo.toLong, hi.toLong)
    }
  }

  /** The committed manifest-list chain, ascending. */
  def listVersions(spark: SparkSession, tablePath: String): Seq[Int] = {
    val mdir = new Path(tablePath, "_manifest")
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mdir)) return Seq.empty
    val V = """v(\d+)\.list\.json""".r
    fs.listStatus(mdir).toSeq.map(_.getPath.getName)
      .collect { case V(n) => n.toInt }.sorted
  }

  def currentListVersion(spark: SparkSession, tablePath: String): Int =
    listVersions(spark, tablePath).lastOption.getOrElse(-1)

  /** CAS publish of `refs` as list version `expected + 1` — same
    * no-overwrite-rename arbiter as [[tryCommit]]. */
  def tryCommitList(spark: SparkSession, tablePath: String, expected: Int,
      refs: Seq[ManifestRef]): Either[Int, Int] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val next = expected + 1
    val dst = listPath(tablePath, next)
    val fs = dst.getFileSystem(conf)
    val cur = currentListVersion(spark, tablePath)
    if (cur != expected) return Left(cur)
    val tmp = new Path(tablePath,
      s"_manifest/.tmp-${java.util.UUID.randomUUID()}-v$next.list.json")
    writeBytes(fs, tmp, renderList(refs))
    if (publishIfAbsent(conf, tmp, dst)) Right(next)
    else Left(currentListVersion(spark, tablePath))
  }

  /** One delta commit against the list chain: `added` files enter as
    * one fresh manifest; manifests naming a `removed` path are
    * rewritten without it (dropped entirely if emptied); every other
    * manifest is shared by name, unread and unwritten. Race losers
    * rebase on the new head and retry — the rebase is recomputed from
    * the head's refs, so concurrent disjoint deltas all land. Returns
    * the committed list version. */
  def commitDelta(spark: SparkSession, tablePath: String,
      added: Seq[FileEntry], removed: Set[String] = Set.empty,
      maxAttempts: Int = 10): Int =
    commitDeltaGrouped(spark, tablePath,
      if (added.isEmpty) Seq.empty else Seq(added), removed, maxAttempts)

  /** [[commitDelta]] with the added files pre-clustered into one
    * manifest per group — Iceberg's partition-aligned manifests: when
    * groups track partitions, a later commit touching one partition
    * rewrites ONE manifest and shares the rest by name, instead of
    * rewriting a mixed manifest that happens to name a removed file. */
  def commitDeltaGrouped(spark: SparkSession, tablePath: String,
      addedGroups: Seq[Seq[FileEntry]], removed: Set[String] = Set.empty,
      maxAttempts: Int = 10): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = currentListVersion(spark, tablePath)
      commitDeltaGroupedAt(spark, tablePath, base, addedGroups, removed) match {
        case Right(v) => return v
        case Left(_)  => attempt += 1
      }
    }
    throw new java.io.IOException(
      s"manifest-list commit lost $maxAttempts consecutive races at $tablePath")
  }

  /** One CAS attempt of a grouped delta against an EXPLICIT base — for
    * callers whose (added, removed) sets are themselves derived from
    * that base (e.g. a merge that read the base's files): on a lost
    * race such a caller must RECOMPUTE its delta against the new head,
    * not blindly re-apply the stale one — re-applying would resurrect
    * rows a racing commit already replaced ([[ManifestLake]]'s
    * same-partition writer race). Pure appends have no such derivation
    * and may retry via [[commitDeltaGrouped]]. */
  def commitDeltaGroupedAt(spark: SparkSession, tablePath: String,
      base: Int, addedGroups: Seq[Seq[FileEntry]],
      removed: Set[String]): Either[Int, Int] = {
    require(addedGroups.forall(_.nonEmpty), "empty added group")
    val baseRefs =
      if (base >= 0) readList(spark, tablePath, base) else Seq.empty
    val carried =
      if (removed.isEmpty) baseRefs // pure append: nothing is opened
      else baseRefs.flatMap { ref =>
        val entries = readManifestFile(spark, tablePath, ref.name)
        if (!entries.exists(e => removed.contains(e.path))) Some(ref)
        else {
          val kept = entries.filterNot(e => removed.contains(e.path))
          if (kept.isEmpty) None
          else Some(writeManifestFile(spark, tablePath, kept))
        }
      }
    val refs = carried ++
      addedGroups.map(g => writeManifestFile(spark, tablePath, g))
    tryCommitList(spark, tablePath, base, refs)
  }

  /** All file entries of a list version — reads every named manifest. */
  def readAll(spark: SparkSession, tablePath: String,
      version: Int): Seq[FileEntry] =
    readList(spark, tablePath, version)
      .flatMap(r => readManifestFile(spark, tablePath, r.name))

  /** Two-level key-range pruning: list-level spans drop whole manifests
    * unopened, then per-file stats prune within the survivors. Returns
    * the kept entries and the names of the manifests actually read. */
  def pruneTwoLevel(spark: SparkSession, tablePath: String, version: Int,
      lo: Long, hi: Long): (Seq[FileEntry], Seq[String]) = {
    val hit = readList(spark, tablePath, version)
      .filter(r => r.maxKey >= lo && r.minKey <= hi)
    val kept = hit.flatMap(r =>
      prune(readManifestFile(spark, tablePath, r.name), lo, hi))
    (kept, hit.map(_.name))
  }

  /** Pointer fixup after a directory rename: every manifest entry whose
    * path starts with `fromPrefix` is rewritten to `toPrefix` + rest.
    * This is what keeps HISTORICAL manifests readable when
    * [[CopyOnWrite.merge]]'s archive mode renames a replaced partition
    * directory aside — the files are untouched, only their address
    * changed, so the fixup is O(manifest) driver string work and no
    * data moves. (Iceberg avoids the need by never moving data files;
    * with directory-granularity CoW the remap is the equivalent
    * metadata operation.) */
  def remapPrefix(spark: SparkSession, tablePath: String,
      fromPrefix: String, toPrefix: String): Unit =
    versions(spark, tablePath).foreach { v =>
      val es = read(spark, tablePath, v)
      if (es.exists(_.path.startsWith(fromPrefix)))
        write(spark, tablePath, v, es.map { e =>
          if (e.path.startsWith(fromPrefix))
            e.copy(path = toPrefix + e.path.stripPrefix(fromPrefix))
          else e
        })
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

  // -------------------------------------------------------------------
  // Named refs — branches and tags over the snapshot pool (the Iceberg
  // refs / Nessie model). A SNAPSHOT is one immutable `m-<uuid>.json`
  // manifest file naming a complete consistent file set; a REF is a
  // named pointer at a snapshot. Branches advance, tags are pinned.
  //
  // The mutable-pointer problem is solved without ever overwriting a
  // file: ref state lives at `_manifest/refs/<name>/<seq>.ref` and
  // "advance" means CAS-publishing seq+1 through the same atomic
  // no-overwrite rename that arbitrates the version chain — the head is
  // max(seq), every historical head stays readable, and two racing
  // advances of one branch can never both win a seq. Fast-forward
  // publishes share the snapshot FILE by name (zero data or metadata
  // copied), which makes the write-audit-publish pattern free: stage a
  // new crawl's files on a branch, run the audit queries against the
  // branch read, then fast-forward `main` — an atomic, all-or-nothing
  // publish, with the audit never having touched the serving branch.
  //
  // At 100 TB nothing here scales with data: a commit writes one
  // manifest (delta-sized under the two-level layout) and one ~60-byte
  // ref file; reads resolve name → seq → snapshot in two metadata ops.

  /** Head of a ref: (seq, snapshot manifest name, kind). None for an
    * unknown ref. */
  def refHead(spark: SparkSession, tablePath: String,
      name: String): Option[(Int, String, String)] = {
    val dir = new Path(tablePath, s"_manifest/refs/$name")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return None
    val S = """(\d+)\.ref""".r
    val seqs = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case S(n) => n.toInt }
    if (seqs.isEmpty) return None
    val seq = seqs.max
    val in = fs.open(new Path(dir, s"$seq.ref"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val R = """\{"kind":"(\w+)","snapshot":"([^"]+)"\}""".r
    text.trim match {
      case R(kind, snap) => Some((seq, snap, kind))
      case _ => None
    }
  }

  /** The file set a ref currently names. */
  def readRef(spark: SparkSession, tablePath: String,
      name: String): Seq[FileEntry] = {
    val (_, snap, _) = refHead(spark, tablePath, name).getOrElse(
      throw new java.io.IOException(s"unknown ref '$name' at $tablePath"))
    readManifestFile(spark, tablePath, snap)
  }

  /** Ref names become path components under `_manifest/refs/` — reject
    * separators and dot-traversal so a name can never address outside
    * the refs directory (and stays regex-parseable in the ref file). */
  private def requireRefName(name: String): Unit =
    require(name.matches("[A-Za-z0-9][A-Za-z0-9._-]*") && !name.contains(".."),
      s"invalid ref name '$name': use [A-Za-z0-9._-], no leading dot")

  private def writeRefFile(spark: SparkSession, tablePath: String,
      name: String, seq: Int, kind: String, snapshot: String): Boolean = {
    requireRefName(name)
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(tablePath, s"_manifest/refs/$name/$seq.ref")
    val fs = dst.getFileSystem(conf)
    fs.mkdirs(dst.getParent)
    val tmp = new Path(dst.getParent,
      s".tmp-${java.util.UUID.randomUUID()}.ref")
    writeBytes(fs, tmp,
      s"""{"kind":"$kind","snapshot":"$snapshot"}""".getBytes("UTF-8"))
    publishIfAbsent(conf, tmp, dst)
  }

  /** Create a branch at an explicit file set (writes a fresh snapshot).
    * Fails if the ref already exists. */
  def createBranch(spark: SparkSession, tablePath: String, name: String,
      entries: Seq[FileEntry]): String = {
    require(refHead(spark, tablePath, name).isEmpty,
      s"ref '$name' already exists")
    val ref = writeManifestFile(spark, tablePath, entries)
    if (!writeRefFile(spark, tablePath, name, 0, "branch", ref.name))
      throw new java.io.IOException(s"lost race creating branch '$name'")
    ref.name
  }

  /** Create a branch sharing another ref's current snapshot BY NAME —
    * no manifest rewritten, no data touched. */
  def branchFrom(spark: SparkSession, tablePath: String, name: String,
      from: String): String = {
    require(refHead(spark, tablePath, name).isEmpty,
      s"ref '$name' already exists")
    val (_, snap, _) = refHead(spark, tablePath, from).getOrElse(
      throw new java.io.IOException(s"unknown ref '$from'"))
    if (!writeRefFile(spark, tablePath, name, 0, "branch", snap))
      throw new java.io.IOException(s"lost race creating branch '$name'")
    snap
  }

  /** Pin a tag at another ref's current snapshot. Tags never advance:
    * [[tryAdvanceRef]] refuses them. */
  def tagFrom(spark: SparkSession, tablePath: String, name: String,
      from: String): String = {
    require(refHead(spark, tablePath, name).isEmpty,
      s"ref '$name' already exists")
    val (_, snap, _) = refHead(spark, tablePath, from).getOrElse(
      throw new java.io.IOException(s"unknown ref '$from'"))
    if (!writeRefFile(spark, tablePath, name, 0, "tag", snap))
      throw new java.io.IOException(s"lost race creating tag '$name'")
    snap
  }

  /** CAS-advance a branch to a NEW snapshot holding `entries`: succeeds
    * only if `expectedSeq` is still the head. Right(newSeq) wins,
    * Left(actualSeq) lost — rebase and retry. */
  def tryAdvanceRef(spark: SparkSession, tablePath: String, name: String,
      expectedSeq: Int, entries: Seq[FileEntry]): Either[Int, Int] = {
    val (seq, _, kind) = refHead(spark, tablePath, name).getOrElse(
      throw new java.io.IOException(s"unknown ref '$name'"))
    require(kind == "branch", s"ref '$name' is a $kind — tags never advance")
    if (seq != expectedSeq) return Left(seq)
    val ref = writeManifestFile(spark, tablePath, entries)
    if (writeRefFile(spark, tablePath, name, expectedSeq + 1, "branch", ref.name))
      Right(expectedSeq + 1)
    else Left(refHead(spark, tablePath, name).map(_._1).getOrElse(seq))
  }

  /** Retry loop over [[tryAdvanceRef]]: `recompute` rebuilds the entry
    * list against the head it lost to. */
  def advanceRefWithRetry(spark: SparkSession, tablePath: String,
      name: String, maxAttempts: Int = 10)(
      recompute: Seq[FileEntry] => Seq[FileEntry]): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val (seq, _, _) = refHead(spark, tablePath, name).getOrElse(
        throw new java.io.IOException(s"unknown ref '$name'"))
      tryAdvanceRef(spark, tablePath, name, seq,
        recompute(readRef(spark, tablePath, name))) match {
        case Right(s) => return s
        case Left(_)  => attempt += 1
      }
    }
    throw new java.io.IOException(
      s"ref '$name' advance lost $maxAttempts consecutive races")
  }

  private def parseRefFile(fs: FileSystem, p: Path): Option[(String, String)] = {
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val R = """\{"kind":"(\w+)","snapshot":"([^"]+)"\}""".r
    text.trim match {
      case R(kind, snap) => Some((kind, snap))
      case _ => None
    }
  }

  /** Delete a ref (branch or tag) — the pointer only; snapshots and
    * data wait for [[vacuumRefs]]. */
  def dropRef(spark: SparkSession, tablePath: String, name: String): Unit = {
    requireRefName(name)
    val dir = new Path(tablePath, s"_manifest/refs/$name")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
  }

  /** Garbage collection for the refs layer — what [[vacuum]] is to the
    * version chain. Three passes, all metadata-sized:
    *  1. trim each ref's seq history to its newest `keepSeqs` files
    *     (historical heads are replayable state, not data — dropping
    *     one never orphans a future read that a retained ref serves);
    *  2. delete `m-*.json` snapshot files that no retained ref seq AND
    *     no manifest-list version names — the orphans dropped branches
    *     and lost CAS races leave behind;
    *  3. delete data files under the caller's `dataRoots` (e.g. the
    *     streaming WAP's `staged/` area) that nothing retained
    *     references: not a ref snapshot, not a list version, not a
    *     single-chain version. Roots OUTSIDE `dataRoots` are never
    *     touched — shared base data stays however the refs churn.
    * Returns everything deleted. Concurrency: a writer mid-CAS holds
    * its snapshot name in a seq file only after the rename lands, so
    * passes 2/3 could race a commit. `minAgeMs` is the expire-snapshots
    * defense: snapshots and staged files younger than the grace window
    * are never GC'd, so set it above the max plausible commit latency
    * when writers may be live (0 = trust single-ownership, the spec
    * default). */
  def vacuumRefs(spark: SparkSession, tablePath: String,
      dataRoots: Seq[String], keepSeqs: Int = 1,
      minAgeMs: Long = 0L): Seq[String] = {
    require(keepSeqs >= 1, "keepSeqs must retain at least the head")
    require(minAgeMs >= 0L, "minAgeMs must be non-negative")
    val graceCutoff = System.currentTimeMillis() - minAgeMs
    val conf = spark.sparkContext.hadoopConfiguration
    val refsDir = new Path(tablePath, "_manifest/refs")
    val mdir = new Path(tablePath, "_manifest")
    val fs = mdir.getFileSystem(conf)
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    val S = """(\d+)\.ref""".r

    // pass 1: trim seq history; collect retained refs' snapshot names
    val refSnaps = scala.collection.mutable.Set[String]()
    if (fs.exists(refsDir)) fs.listStatus(refsDir).foreach { rd =>
      if (rd.isDirectory) {
        val seqs = fs.listStatus(rd.getPath).toSeq
          .flatMap(st => st.getPath.getName match {
            case S(n) => Some(n.toInt -> st.getPath)
            case _ => None
          }).sortBy(-_._1)
        seqs.drop(keepSeqs).foreach { case (_, p) =>
          fs.delete(p, false); deleted += p.toString
        }
        seqs.take(keepSeqs).foreach { case (_, p) =>
          parseRefFile(fs, p).foreach { case (_, snap) => refSnaps += snap }
        }
      }
    }

    // retained list-chain + version-chain references
    val listVs = listVersions(spark, tablePath)
    val listRefs = listVs.flatMap(v => readList(spark, tablePath, v))
    val listSnaps = listRefs.map(_.name).toSet
    val chainEntries = versions(spark, tablePath)
      .flatMap(v => read(spark, tablePath, v))

    // pass 2: orphan snapshot manifests. The grace window is the
    // expire-snapshots defense against live writers: a committer
    // between writeManifestFile and its ref CAS holds a snapshot no
    // ref names yet — skipping manifests younger than minAgeMs (set it
    // above the max plausible commit latency) makes that window safe
    // instead of a documented race.
    if (fs.exists(mdir)) fs.listStatus(mdir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("m-") && n.endsWith(".json") &&
          !refSnaps.contains(n) && !listSnaps.contains(n) &&
          st.getModificationTime <= graceCutoff) {
        fs.delete(st.getPath, false); deleted += st.getPath.toString
      }
    }

    // pass 3: unreferenced data files under the managed roots
    val referenced: Set[String] =
      (refSnaps.toSeq.flatMap(readManifestFile(spark, tablePath, _)) ++
        listRefs.flatMap(r => readManifestFile(spark, tablePath, r.name)) ++
        chainEntries).map(e => entryKeyOf(fs, e.path)).toSet
    dataRoots.foreach { root =>
      dataFiles(spark, root)
        .filterNot(f => referenced.contains(entryKeyOf(fs, f)))
        .foreach { f =>
          val p = new Path(f)
          // same grace as pass 2: a mid-commit writer's staged files
          // are unreferenced only until its CAS lands
          if (fs.getFileStatus(p).getModificationTime <= graceCutoff) {
            fs.delete(p, false); deleted += f
          }
        }
    }
    deleted.toSeq
  }

  /** Scheme-insensitive comparison key (manifests may hold qualified
    * or bare paths depending on the writer). */
  private def entryKeyOf(fs: FileSystem, p: String): String =
    fs.makeQualified(new Path(p)).toUri.getPath

  /** Fast-forward publish: point `name` at `from`'s current snapshot,
    * SHARING the snapshot file — the write-audit-publish commit. CAS on
    * the target's head; no manifest rewritten. */
  def fastForward(spark: SparkSession, tablePath: String, name: String,
      from: String): Either[Int, Int] = {
    val (seq, _, kind) = refHead(spark, tablePath, name).getOrElse(
      throw new java.io.IOException(s"unknown ref '$name'"))
    require(kind == "branch", s"ref '$name' is a $kind — tags never advance")
    val (_, snap, _) = refHead(spark, tablePath, from).getOrElse(
      throw new java.io.IOException(s"unknown ref '$from'"))
    if (writeRefFile(spark, tablePath, name, seq + 1, "branch", snap))
      Right(seq + 1)
    else Left(refHead(spark, tablePath, name).map(_._1).getOrElse(seq))
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
