package graft

import org.scalatest.funsuite.AnyFunSuite

/** The dead-fingerprint GC (round 12's sf100 completion leg died with
  * ~56 GB of unreachable mirrors on the scratch volume). The sweep's
  * contract: an artifact child whose name embeds fingerprint tokens of
  * which NONE matches a live source fingerprint is deleted; a child
  * with a matching token, or with NO fingerprint-shaped token at all,
  * is never touched; source-data roots are never scanned. */
class JanitorSpec extends AnyFunSuite {

  private def mkTmp(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("janitorspec").toFile
    d.deleteOnExit(); d
  }

  private def write(dir: java.io.File, name: String, bytes: Int): java.io.File = {
    val f = new java.io.File(dir, name)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, Array.fill[Byte](bytes)(7))
    f
  }

  /** the age guard never reaps a freshly-touched dir — test fixtures
    * must look settled */
  private def age(d: java.io.File): java.io.File = {
    d.setLastModified(System.currentTimeMillis() - 24L * 3600 * 1000)
    d
  }

  test("sweep deletes only dead-fingerprint children; no-token and live survive") {
    val tmp = mkTmp()
    // a fake source dir with one table of 2 files
    val src = new java.io.File(tmp, "sfX"); src.mkdirs()
    val tbl = new java.io.File(src, "orders.parquet"); tbl.mkdirs()
    write(tbl, "part-0", 100); write(tbl, "_SUCCESS", 0)
    val files = tbl.listFiles().filter(_.isFile)
    val liveFp = s"${files.length}-${files.map(_.lastModified).max}-${files.map(_.length).sum}"
    // artifact root with three children
    val root = new java.io.File(tmp, "graft-mirrors"); root.mkdirs()
    val liveChild = new java.io.File(root, s"mirror_a_$liveFp"); liveChild.mkdirs()
    write(liveChild, "data", 10); age(liveChild)
    val deadChild = new java.io.File(root, "mirror_b_9-1786853280213-2892271724")
    deadChild.mkdirs(); write(deadChild, "data", 10); age(deadChild)
    val noTokChild = new java.io.File(root, "state_no_fingerprint"); noTokChild.mkdirs()
    write(noTokChild, "data", 10); age(noTokChild)
    // a source-data root must never be scanned even with token-shaped names
    val srcRoot = new java.io.File(tmp, "graft-sf100"); srcRoot.mkdirs()
    val srcChild = new java.io.File(srcRoot, "x_1-178685326000-99"); srcChild.mkdirs()
    write(srcChild, "data", 10); age(srcChild)

    val (reclaimed, gone) = graft.tools.Janitor.sweep(
      Seq(src.getPath), dryRun = false, tmpDir = tmp.getPath)
    assert(gone == Seq("graft-mirrors/mirror_b_9-1786853280213-2892271724"))
    assert(reclaimed == 10L)
    assert(liveChild.exists && noTokChild.exists && srcChild.exists)
    assert(!deadChild.exists)
  }

  test("dry run reports without deleting; underscore-sanitized tokens match") {
    val tmp = mkTmp()
    val src = new java.io.File(tmp, "sfY"); src.mkdirs()
    val tbl = new java.io.File(src, "lineitem.parquet"); tbl.mkdirs()
    write(tbl, "part-0", 55)
    val files = tbl.listFiles().filter(_.isFile)
    val fpU = s"${files.length}_${files.map(_.lastModified).max}_${files.map(_.length).sum}"
    val root = new java.io.File(tmp, "graft-buckets"); root.mkdirs()
    val live = new java.io.File(root, s"lineitem_bkt8_$fpU"); live.mkdirs(); age(live)
    val dead = new java.io.File(root, "lineitem_bkt8_1_1786853280000_1"); dead.mkdirs()
    write(dead, "d", 3); age(dead)
    val (reclaimable, gone) = graft.tools.Janitor.sweep(
      Seq(src.getPath), dryRun = true, tmpDir = tmp.getPath)
    assert(gone.size == 1 && reclaimable == 3L)
    assert(dead.exists && live.exists) // dry run touched nothing
  }

  test("Hadoop-hidden checksum files never poison the live set (round-13 incident)") {
    // Spark's local writes leave .part-xxx.crc siblings that Hadoop's
    // ChecksumFileSystem HIDES from listStatus — so sourceFingerprint
    // (the fp embedded in artifact names) sees only the visible files.
    // The live set must match that view: an artifact keyed to the
    // visible-files fingerprint is LIVE even though a raw listing of
    // the source counts twice as many files.
    val tmp = mkTmp()
    val src = new java.io.File(tmp, "sfZ"); src.mkdirs()
    val tbl = new java.io.File(src, "orders.parquet"); tbl.mkdirs()
    write(tbl, "part-0", 70); write(tbl, "_SUCCESS", 0)
    write(tbl, ".part-0.crc", 12); write(tbl, "._SUCCESS.crc", 8)
    val vis = tbl.listFiles().filter(f => f.isFile && !f.getName.startsWith("."))
    val hadoopFp =
      s"${vis.length}-${vis.map(_.lastModified).max}-${vis.map(_.length).sum}"
    val root = new java.io.File(tmp, "graft-mirrors"); root.mkdirs()
    val liveChild = new java.io.File(root, s"orders_tt_$hadoopFp")
    liveChild.mkdirs(); write(liveChild, "data", 5); age(liveChild)
    val (_, gone) = graft.tools.Janitor.sweep(
      Seq(src.getPath), dryRun = false, tmpDir = tmp.getPath)
    assert(gone.isEmpty && liveChild.exists,
      s"Hadoop-view artifact reaped: $gone")
  }

  test("non-crc dotfiles don't poison the live set (ChecksumFileSystem hides ONLY .name.crc)") {
    // Hadoop's local FS hides only checksum siblings — a .DS_Store-style
    // dotfile IS counted by sourceFingerprint. The live set must carry
    // that exact view too (ADVICE r13: the old dotfiles-excluded/"all"
    // pair matched neither when a non-crc dotfile coexisted with .crc
    // files, and live artifacts were reaped).
    val tmp = mkTmp()
    val src = new java.io.File(tmp, "sfY"); src.mkdirs()
    val tbl = new java.io.File(src, "t.parquet"); tbl.mkdirs()
    write(tbl, "part-0", 70); write(tbl, "_SUCCESS", 0)
    write(tbl, ".part-0.crc", 12) // hidden by ChecksumFileSystem
    write(tbl, ".DS_Store", 33)   // NOT hidden — counted by the fp
    val hadoopView = tbl.listFiles().filter(f =>
      f.isFile && !f.getName.matches("^\\..*\\.crc$"))
    val fp = s"${hadoopView.length}-${hadoopView.map(_.lastModified).max}-" +
      s"${hadoopView.map(_.length).sum}"
    val root = new java.io.File(tmp, "graft-mirrors"); root.mkdirs()
    val liveChild = new java.io.File(root, s"t_mm_$fp")
    liveChild.mkdirs(); write(liveChild, "data", 5); age(liveChild)
    val (_, gone) = graft.tools.Janitor.sweep(
      Seq(src.getPath), dryRun = false, tmpDir = tmp.getPath)
    assert(gone.isEmpty && liveChild.exists,
      s"ChecksumFileSystem-view artifact reaped: $gone")
  }

  test("a live foreign heartbeat degrades the sweep to dry-run; stale ones are GC'd") {
    val tmp = mkTmp()
    val src = new java.io.File(tmp, "sfV"); src.mkdirs()
    val tbl = new java.io.File(src, "t.parquet"); tbl.mkdirs()
    write(tbl, "part-0", 9)
    val root = new java.io.File(tmp, "graft-mirrors"); root.mkdirs()
    val dead = new java.io.File(root, "mirror_9-1786853280213-28922717")
    dead.mkdirs(); write(dead, "data", 10); age(dead)
    // a FRESH heartbeat from a (dead) foreign pid still reads live —
    // freshness alone is enough (conservative against pid reuse races)
    val hb = new java.io.File(tmp, graft.tools.Janitor.HeartbeatDirName)
    hb.mkdirs()
    val foreign = new java.io.File(hb, "999999999.hb")
    write(hb, "999999999.hb", 0)
    foreign.setLastModified(System.currentTimeMillis())
    val (_, wouldGo) = graft.tools.Janitor.sweep(
      Seq(src.getPath), dryRun = false, tmpDir = tmp.getPath)
    assert(wouldGo.nonEmpty && dead.exists,
      "sweep deleted despite a live foreign heartbeat")
    // stale (dead pid AND old beat): GC'd in passing, sweep proceeds
    foreign.setLastModified(System.currentTimeMillis() - 31L * 60 * 1000)
    val (_, gone2) = graft.tools.Janitor.sweep(
      Seq(src.getPath), dryRun = false, tmpDir = tmp.getPath)
    assert(gone2.nonEmpty && !dead.exists && !foreign.exists)
    // our OWN heartbeat never blocks our own sweep
    graft.tools.Janitor.touchHeartbeat(tmp.getPath)
    val dead2 = new java.io.File(root, "mirror_8-1786853280214-28922718")
    dead2.mkdirs(); write(dead2, "data", 10); age(dead2)
    val (_, gone3) = graft.tools.Janitor.sweep(
      Seq(src.getPath), dryRun = false, tmpDir = tmp.getPath)
    assert(gone3.nonEmpty && !dead2.exists)
    graft.tools.Janitor.clearHeartbeat(tmp.getPath)
  }

  test("age guard: a freshly-touched dir is never reaped even with a dead fingerprint") {
    val tmp = mkTmp()
    val src = new java.io.File(tmp, "sfW"); src.mkdirs()
    val tbl = new java.io.File(src, "t.parquet"); tbl.mkdirs()
    write(tbl, "part-0", 9)
    val root = new java.io.File(tmp, "graft-mirrors"); root.mkdirs()
    val fresh = new java.io.File(root, "building_1-1786853280000-1")
    fresh.mkdirs(); write(fresh, "data", 3) // mtime = now: maybe mid-build
    val (_, gone) = graft.tools.Janitor.sweep(
      Seq(src.getPath), dryRun = false, tmpDir = tmp.getPath)
    assert(gone.isEmpty && fresh.exists, s"mid-build dir reaped: $gone")
  }
}
