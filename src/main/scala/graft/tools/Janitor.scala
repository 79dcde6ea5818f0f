package graft.tools

/** Dead-fingerprint artifact GC — the disk-budget half of the sf100
  * sweep plan (VERDICT r12 "what's missing" #1).
  *
  * Every memoized artifact this engine writes (bucketed mirrors, LSH
  * signature indexes, IVF centroid sidecars, partitioned layouts, lake
  * snapshots) embeds a [[graft.ops.IncrementalDedup.sourceFingerprint]]
  * of its source table — `{fileCount}-{maxMtimeMs}-{totalBytes}` — in
  * its directory/table name, so a regenerated input lands at a fresh
  * path and rebuilds. The flip side: artifacts keyed to fingerprints
  * that no longer match ANY current source are unreachable forever (the
  * `ensure*` lookups can never produce their tag again), yet they sit
  * on the scratch volume. Round 12's sf100 completion leg died on
  * exactly this: tens of GB of artifacts keyed to deleted sf1–sf30
  * datasets left ~300 MB free and every query re-skipped.
  *
  * The janitor makes the reclaim a computed, safe operation instead of
  * a manual `rm`: it fingerprints every table under the KEEP source
  * dirs, scans the `graft-*` artifact roots under java.io.tmpdir, and
  * deletes only children whose name embeds at least one
  * fingerprint-shaped token of which NONE matches a live fingerprint.
  * A child with no fingerprint token is never touched (unknown ≠ dead),
  * a child touched in the last 15 minutes is never touched (it may be a
  * running bench's mid-build mirror), and the live set is computed the
  * way [[liveFingerprints]] documents — through Hadoop's
  * checksum-hiding view of the source listing, because that is the view
  * the embedded fingerprints were computed from. Do NOT run a
  * standalone sweep while another graft JVM is mid-bench: a mirror it
  * built more than 15 minutes ago but still reads is indistinguishable
  * from settled state (the round-13 incident deleted a live edge mirror
  * under a running suite — see SCALE.md).
  *
  * At 100 TB this is snapshot/index expiration against the live-catalog
  * root set — the same mark-and-sweep contract lakehouse table formats
  * run as `expire_snapshots` / `remove_orphan_files` maintenance.
  */
object Janitor {

  /** Artifact roots the engine writes under java.io.tmpdir. Source-data
    * dirs (graft-sf100 etc.) are NOT artifact roots — they are listed
    * as keep-sources instead and never swept. */
  private val RootPrefix = "graft-"
  private val NonArtifactRoots = Set("graft-sf1", "graft-sf3", "graft-sf10",
    "graft-sf30", "graft-sf100", "graft-sf300", "graft-sf1000")

  /** fingerprint-shaped token: fileCount SEP mtimeMs SEP totalBytes,
    * where SEP is the raw '-' or the name-sanitized '_' and the mtime
    * is an epoch-millis-sized integer (12+ digits keeps short counters
    * from matching). */
  private val FpToken = raw"(\d{1,6})[-_](\d{12,})[-_](\d+)".r

  private def norm(n: String, m: String, b: String) = s"$n:$m:$b"

  /** Live fingerprints of every table directly under each keep dir —
    * same formula as sourceFingerprint (files directly under the path;
    * max mtime ms; total bytes), Spark-free.
    *
    * CRITICAL (learned the hard way, round 13): sourceFingerprint runs
    * through Hadoop's LOCAL filesystem, which is a ChecksumFileSystem —
    * its listStatus HIDES the `.name.crc` checksum siblings Spark's
    * local writes leave next to every part file. A live-set built from
    * a raw java.io listing counts those dotfiles, disagrees with every
    * artifact's embedded fingerprint, and the sweep then reaps LIVE
    * artifacts (this deleted a just-built 6 GB edge mirror mid-bench
    * and failed three graph gates with FILE_NOT_EXIST). Both variants
    * are emitted — hidden-files-excluded (the Hadoop view, the one that
    * matters) and hidden-files-included — and a dir matching EITHER is
    * live, so a future fingerprint-source change fails toward keeping. */
  def liveFingerprints(keepDirs: Seq[String]): Set[String] =
    keepDirs.flatMap { base =>
      val b = new java.io.File(base)
      val tables = if (b.isDirectory) b.listFiles().toSeq else Nil
      tables.flatMap { t =>
        val all =
          if (t.isDirectory) Option(t.listFiles()).getOrElse(Array.empty).filter(_.isFile).toSeq
          else if (t.isFile) Seq(t) else Nil
        Seq(all.filterNot(_.getName.startsWith(".")), all).distinct.flatMap { files =>
          if (files.isEmpty) None
          else Some(norm(files.length.toString,
            files.map(_.lastModified).max.toString,
            files.map(_.length).sum.toString))
        }
      }
    }.toSet

  private def sizeOf(f: java.io.File): Long =
    if (f.isFile) f.length
    else Option(f.listFiles()).getOrElse(Array.empty).map(sizeOf).sum

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }

  /** One sweep. Returns (reclaimedBytes, deletedDirNames). `dryRun`
    * reports without deleting. */
  def sweep(keepDirs: Seq[String], dryRun: Boolean = false,
      tmpDir: String = sys.props("java.io.tmpdir")): (Long, Seq[String]) = {
    val live = liveFingerprints(keepDirs)
    val roots = Option(new java.io.File(tmpDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(RootPrefix) &&
        !NonArtifactRoots.contains(f.getName))
    var reclaimed = 0L
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    // age guard: a dir touched in the last 15 minutes may belong to a
    // RUNNING bench's warm pass (its source could be mid-write, its
    // fingerprint mid-derivation) — never reap it. The janitor's
    // contract is garbage collection of settled state, not eviction.
    val minAgeMs = 15L * 60 * 1000
    val now = System.currentTimeMillis()
    roots.foreach { root =>
      Option(root.listFiles()).getOrElse(Array.empty).foreach { child =>
        val toks = FpToken.findAllMatchIn(child.getName)
          .map(m => norm(m.group(1), m.group(2), m.group(3))).toSeq
        if (toks.nonEmpty && !toks.exists(live.contains) &&
            now - child.lastModified > minAgeMs) {
          reclaimed += sizeOf(child)
          deleted += s"${root.getName}/${child.getName}"
          if (!dryRun) rmTree(child)
        }
      }
    }
    (reclaimed, deleted.toSeq)
  }

  /** Standalone entry: args = keep-source dirs (defaults to the three
    * driver testdata SFs + SPARK_GRAFT_SF_DIR); pass --dry-run first. */
  def main(args: Array[String]): Unit = {
    val dry = args.contains("--dry-run")
    val dirs0 = args.filterNot(_.startsWith("--")).toSeq
    val dirs = if (dirs0.nonEmpty) dirs0 else defaultKeepDirs
    val (bytes, gone) = sweep(dirs, dryRun = dry)
    gone.foreach(d => System.err.println(s"[janitor] ${if (dry) "would delete" else "deleted"} $d"))
    println(s"[janitor] ${if (dry) "reclaimable" else "reclaimed"} ${bytes >> 20} MB " +
      s"in ${gone.size} dead artifact dirs (keep-sources: ${dirs.mkString(",")})")
  }

  def defaultKeepDirs: Seq[String] =
    (Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1") ++
      sys.env.get("SPARK_GRAFT_SF_DIR") ++
      // every generated source dir still on disk stays a GC root: a
      // bench run at one SF must never reap another live SF's artifacts
      Option(new java.io.File(sys.props("java.io.tmpdir")).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.matches("graft-sf[0-9.]+"))
        .map(_.getPath).sorted.toSeq).distinct
}
