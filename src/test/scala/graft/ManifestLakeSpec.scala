package graft

import java.nio.file.Files
import graft.ops.{Manifest, ManifestLake}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[ManifestLake]] — the manifest-list-defined table: immutable data
  * files (no renames ever), O(delta) merge commits, version reads,
  * streaming ingest, retention. */
class ManifestLakeSpec extends SparkSpec {

  import spark.implicits._

  case class Rec(k: Long, p: String, v: Double)

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def table(dir: String, version: Int = -1): Seq[(Long, String, Double)] =
    ManifestLake.read(spark, dir, version)
      .select(col("k"), col("p"), col("v")).as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq

  test("merge commits replace by key, keep survivors, and never move old files") {
    val dir = Files.createTempDirectory("graft-mlake").toString
    val v0 = ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0)).toDF("k", "p", "v"),
      "load")
    assert(v0 == 0)
    assert(table(dir) == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0)))
    val v0Files = Manifest.readAll(spark, dir, 0).map(_.path)
    val v0Stamps = v0Files.map(p => fs.getFileStatus(new Path(p))
      .getModificationTime)

    // update k=2, insert k=4 — touches only partition b
    val v1 = ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((2L, "b", 99.0), (4L, "b", 40.0)).toDF("k", "p", "v"), "u1")
    assert(v1 == 1)
    assert(table(dir) == Seq(
      (1L, "a", 10.0), (2L, "b", 99.0), (3L, "b", 30.0), (4L, "b", 40.0)))
    // time travel: v0 reads verbatim — its files were neither moved nor
    // rewritten (same paths, same mtimes)
    assert(table(dir, 0) == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0)))
    v0Files.zip(v0Stamps).foreach { case (p, t) =>
      assert(fs.getFileStatus(new Path(p)).getModificationTime == t, p)
    }
    // O(delta) metadata: partition a's manifest carried into v1 BY NAME
    val names0 = Manifest.readList(spark, dir, 0).map(_.name).toSet
    val names1 = Manifest.readList(spark, dir, 1).map(_.name).toSet
    val aManifests = names0.filter(n =>
      Manifest.readManifestFile(spark, dir, n)
        .forall(_.path.contains("/graft_p=a/")))
    assert(aManifests.nonEmpty)
    assert(aManifests.subsetOf(names1))
    // and v1's data scan never lists partition a's old dirs: the a rows
    // come from the v0 files themselves
    val aPaths = v0Files.filter(_.contains("/graft_p=a/")).toSet
    assert(Manifest.readAll(spark, dir, 1).map(_.path).toSet
      .intersect(aPaths) == aPaths)
  }

  test("duplicate delivery of a batch converges without dropping survivors") {
    val dir = Files.createTempDirectory("graft-mlake-replay").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "b", 1.0), (2L, "b", 2.0)).toDF("k", "p", "v"), "load")
    val delta = Seq((2L, "b", 99.0)).toDF("k", "p", "v")
    ManifestLake.mergeCommit(spark, dir, "p", "k", delta, "u1")
    // the same tag delivered again (post-commit replay)
    ManifestLake.mergeCommit(spark, dir, "p", "k", delta, "u1")
    // survivor k=1 kept through both applications; value converged
    assert(table(dir) == Seq((1L, "b", 1.0), (2L, "b", 99.0)))
  }

  test("streaming ingest commits one version per micro-batch") {
    val dir = Files.createTempDirectory("graft-mlake-stream").toString
    val ckpt = Files.createTempDirectory("graft-mlake-ckpt").toString
    val mem = MemoryStream[Rec](spark)
    val q = ManifestLake.start(mem.toDF(), dir, "p", "k", ckpt)
    try {
      mem.addData(Rec(1L, "a", 10.0), Rec(2L, "b", 20.0))
      q.processAllAvailable()
      mem.addData(Rec(2L, "b", 99.0), Rec(3L, "c", 30.0))
      q.processAllAvailable()
      assert(Manifest.listVersions(spark, dir) == Seq(0, 1))
      assert(table(dir) == Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)))
      assert(table(dir, 0) == Seq((1L, "a", 10.0), (2L, "b", 20.0)))
    } finally q.stop()
  }

  test("same-partition writer race: loser re-merges, no resurrected rows") {
    val dir = Files.createTempDirectory("graft-mlake-race").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "b", 1.0), (2L, "b", 2.0), (3L, "b", 3.0)).toDF("k", "p", "v"),
      "load")
    // two writers update DIFFERENT keys of the SAME partition from the
    // same base: whoever loses the CAS must re-read the winner's files,
    // or the winner's update is silently reverted by stale survivors
    def writer(tag: String, k: Long, v: Double): Thread = new Thread(() => {
      ManifestLake.mergeCommit(spark, dir, "p", "k",
        Seq((k, "b", v)).toDF("k", "p", "v"), tag)
      ()
    })
    val ts = Seq(writer("w1", 1L, 11.0), writer("w2", 2L, 22.0))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(Manifest.currentListVersion(spark, dir) == 2)
    // both updates durable, survivor intact, and — the resurrection
    // check — each key appears exactly once
    assert(table(dir) == Seq((1L, "b", 11.0), (2L, "b", 22.0), (3L, "b", 3.0)))
  }

  test("deleteWhere commits metadata only; reads subtract positions; history intact") {
    val dir = Files.createTempDirectory("graft-mlake-del").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0), (4L, "b", 40.0))
        .toDF("k", "p", "v"), "load")
    val v0Files = Manifest.readAll(spark, dir, 0).map(_.path)
    val v0Stamps = v0Files.map(p =>
      fs.getFileStatus(new Path(p)).getModificationTime)

    val v1 = ManifestLake.deleteWhere(spark, dir, col("k") % 2 === 1, "d1")
    assert(v1 == 1)
    // no data file rewritten or moved — the delete is a sidecar
    v0Files.zip(v0Stamps).foreach { case (p, t) =>
      assert(fs.getFileStatus(new Path(p)).getModificationTime == t, p)
    }
    val (dels1, data1) = Manifest.readAll(spark, dir, 1)
      .partition(_.path.contains("/deletes/"))
    assert(data1.map(_.path).toSet == v0Files.toSet) // files shared by name
    assert(dels1.map(_.rows).sum == 2) // k=1, k=3
    assert(table(dir) == Seq((2L, "b", 20.0), (4L, "b", 40.0)))
    assert(table(dir, 0) == Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0), (4L, "b", 40.0)))

    // second delete harvests from LIVE rows only: k=3 is already gone,
    // so the new vector names exactly one position (k=2), not two
    val v2 = ManifestLake.deleteWhere(spark, dir, col("k") <= 3, "d2")
    assert(v2 == 2)
    val newDels = Manifest.readAll(spark, dir, 2)
      .filter(_.path.contains("/deletes/d2-"))
    assert(newDels.map(_.rows).sum == 1)
    assert(table(dir) == Seq((4L, "b", 40.0)))
    // a no-match predicate leaves the chain untouched
    assert(ManifestLake.deleteWhere(spark, dir, col("k") === 999, "d3") == 2)
    assert(Manifest.currentListVersion(spark, dir) == 2)
  }

  test("merge over a partition with delete vectors does not resurrect rows") {
    val dir = Files.createTempDirectory("graft-mlake-delmerge").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "b", 1.0), (2L, "b", 2.0), (3L, "b", 3.0)).toDF("k", "p", "v"),
      "load")
    ManifestLake.deleteWhere(spark, dir, col("k") === 1, "d1")
    // the merge rewrites partition b: survivors must read THROUGH the
    // vector, or k=1 rides back in via the rewritten files
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((3L, "b", 33.0)).toDF("k", "p", "v"), "u1")
    assert(table(dir) == Seq((2L, "b", 2.0), (3L, "b", 33.0)))
  }

  test("compactDeletes folds vectors into dirty files and shares clean ones") {
    val dir = Files.createTempDirectory("graft-mlake-compact").toString
    // coalesce(1): partition b's two rows share ONE data file, so the
    // delete leaves a survivor in the dirty file and compaction must
    // rewrite it (not merely drop a fully-dead file)
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0)).toDF("k", "p", "v")
        .coalesce(1),
      "load")
    ManifestLake.deleteWhere(spark, dir, col("k") === 3, "d1")
    val cleanBefore = Manifest.readAll(spark, dir, 1)
      .map(_.path).filter(_.contains("/graft_p=a/")).toSet
    assert(cleanBefore.nonEmpty)
    val v2 = ManifestLake.compactDeletes(spark, dir, "p", "k", "rw")
    assert(v2 == 2)
    val after = Manifest.readAll(spark, dir, 2).map(_.path)
    // no vectors remain; partition a's file carried by name, b's replaced
    assert(!after.exists(_.contains("/deletes/")))
    assert(cleanBefore.subsetOf(after.toSet))
    assert(after.exists(_.contains("/data/rw-v2/")))
    assert(table(dir) == Seq((1L, "a", 10.0), (2L, "b", 20.0)))
    // idempotent when nothing is dirty
    assert(ManifestLake.compactDeletes(spark, dir, "p", "k", "rw2") == 2)
  }

  test("deletedRows change feed reads only new vectors and their dirty files") {
    val dir = Files.createTempDirectory("graft-mlake-cdc").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v").coalesce(1),
      "load")
    ManifestLake.deleteWhere(spark, dir, col("k") === 1, "d1")
    val feed = ManifestLake.deletedRows(spark, dir, 0, 1)
    assert(feed.select(col("k"), col("p"), col("v"))
      .as[(Long, String, Double)].collect().toSeq == Seq((1L, "a", 10.0)))
    // the untouched partition's file never enters the scan — the feed's
    // IO is the delta, not the table
    assert(!feed.inputFiles.exists(_.contains("graft_p=b")))
  }

  test("delete vectors apply in partitions whose dir name needs URI encoding") {
    // `_metadata.file_path` is an RFC-encoded URI (space → %20) while
    // manifest entries carry the raw component — a space-valued
    // partition catches any single-decoder classification regression
    // (the dirty file would silently scan clean, resurrecting rows)
    val dir = Files.createTempDirectory("graft-mlake-enc").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "not specified", 1.0), (2L, "not specified", 2.0))
        .toDF("k", "p", "v").coalesce(1), "load")
    ManifestLake.deleteWhere(spark, dir, col("k") === 1, "d1")
    assert(table(dir) == Seq((2L, "not specified", 2.0)))
    ManifestLake.compactDeletes(spark, dir, "p", "k", "rw")
    assert(table(dir) == Seq((2L, "not specified", 2.0)))
  }

  test("readWhere prunes by manifest key spans and still applies vectors") {
    val dir = Files.createTempDirectory("graft-mlake-prune").toString
    // two partitions → disjoint key ranges in separate files
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0), (2L, "a", 20.0)).toDF("k", "p", "v").coalesce(1),
      "load-a")
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((100L, "b", 1.0), (200L, "b", 2.0)).toDF("k", "p", "v").coalesce(1),
      "load-b")
    ManifestLake.deleteWhere(spark, dir, col("k") === 2, "d1")
    val pruned = ManifestLake.readWhere(spark, dir, 0L, 50L)
    assert(pruned.select(col("k"), col("p"), col("v"))
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1) ==
      Seq((1L, "a", 10.0)))
    // partition b's file is span-pruned out of the scan entirely
    assert(!pruned.inputFiles.exists(_.contains("graft_p=b")))
  }

  test("partition evolution: later commits may partition by a different column") {
    // the partition directory is an internal layout detail (the user
    // column rides as data), so changing partCol between commits needs
    // no rewrite and no reader-side reconstruction — Iceberg's
    // partition-evolution property falls out of the design
    val dir = Files.createTempDirectory("graft-mlake-evolve").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", "r1", 10.0), (2L, "b", "r1", 20.0))
        .toDF("k", "p", "region", "v"), "load")
    // same schema, new partitioning column for the new commit
    ManifestLake.mergeCommit(spark, dir, "region", "k",
      Seq((3L, "c", "r2", 30.0)).toDF("k", "p", "region", "v"), "evolved")
    assert(ManifestLake.read(spark, dir)
      .select(col("k"), col("p"), col("region"), col("v"))
      .as[(Long, String, String, Double)]
      .collect().sortBy(_._1).toSeq ==
      Seq((1L, "a", "r1", 10.0), (2L, "b", "r1", 20.0),
        (3L, "c", "r2", 30.0)))
  }

  test("vacuum deletes only files exclusive to dropped versions") {
    val dir = Files.createTempDirectory("graft-mlake-vacuum").toString
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v"), "load")
    ManifestLake.mergeCommit(spark, dir, "p", "k",
      Seq((2L, "b", 99.0)).toDF("k", "p", "v"), "u1")
    val v0Only = Manifest.readAll(spark, dir, 0).map(_.path)
      .filter(_.contains("/graft_p=b/"))
    assert(v0Only.nonEmpty)
    val deleted = ManifestLake.vacuum(spark, dir, retain = Seq(1))
    // b's superseded file went; a's shared file stayed; v1 still reads
    v0Only.foreach(p => assert(deleted.contains(p), p))
    assert(Manifest.listVersions(spark, dir) == Seq(1))
    assert(table(dir) == Seq((1L, "a", 10.0), (2L, "b", 99.0)))
  }
}
