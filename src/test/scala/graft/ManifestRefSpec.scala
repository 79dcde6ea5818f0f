package graft

import java.nio.file.Files
import graft.ops.Manifest
import org.apache.spark.sql.functions._

/** [[Manifest]] named refs — branches, tags, CAS advance, and the
  * write-audit-publish fast-forward. */
class ManifestRefSpec extends SparkSpec {

  private def freshTable(n: Long): (String, Seq[Manifest.FileEntry]) = {
    val dir = Files.createTempDirectory("graft-refs-spec").toString
    spark.range(0, n).select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(s"$dir/data")
    val entries = Manifest.collectStats(spark,
      Manifest.dataFiles(spark, s"$dir/data"), "k")
    (dir, entries)
  }

  private def writeDelta(dir: String, lo: Long, hi: Long): Seq[Manifest.FileEntry] = {
    spark.range(lo, hi).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("append").parquet(s"$dir/delta")
    Manifest.collectStats(spark,
      Manifest.dataFiles(spark, s"$dir/delta"), "k")
  }

  test("branch isolation: commits to dev never move main; reads resolve per-ref") {
    val (dir, base) = freshTable(400)
    Manifest.createBranch(spark, dir, "main", base)
    val mainSnap = Manifest.refHead(spark, dir, "main").get._2

    // dev shares main's snapshot file by name — no new manifest written
    val devSnap = Manifest.branchFrom(spark, dir, "dev", from = "main")
    assert(devSnap == mainSnap)

    // commit a delta to dev only
    val delta = writeDelta(dir, 400, 500)
    val seq = Manifest.advanceRefWithRetry(spark, dir, "dev")(cur => cur ++ delta)
    assert(seq == 1)

    val mainRows = spark.read
      .parquet(Manifest.readRef(spark, dir, "main").map(_.path): _*).count()
    val devRows = spark.read
      .parquet(Manifest.readRef(spark, dir, "dev").map(_.path): _*).count()
    assert(mainRows == 400L, s"main moved: $mainRows")
    assert(devRows == 500L, s"dev missing delta: $devRows")
    // main's head is still seq 0 on the original snapshot
    assert(Manifest.refHead(spark, dir, "main").get == ((0, mainSnap, "branch")))
  }

  test("tags pin a snapshot and refuse to advance") {
    val (dir, base) = freshTable(100)
    Manifest.createBranch(spark, dir, "main", base)
    val pinned = Manifest.tagFrom(spark, dir, "release-1", from = "main")

    // main advances past the tag
    val delta = writeDelta(dir, 100, 150)
    Manifest.advanceRefWithRetry(spark, dir, "main")(cur => cur ++ delta)

    assert(Manifest.refHead(spark, dir, "release-1").get._2 == pinned)
    assert(spark.read.parquet(
      Manifest.readRef(spark, dir, "release-1").map(_.path): _*).count() == 100L)
    intercept[IllegalArgumentException] {
      Manifest.tryAdvanceRef(spark, dir, "release-1", 0, base)
    }
  }

  test("racing advances on one branch serialize: one winner per seq, loser rebases") {
    val (dir, base) = freshTable(200)
    Manifest.createBranch(spark, dir, "main", base)
    val d1 = writeDelta(dir, 200, 250)
    val d2 = {
      spark.range(250, 300).select(col("id").as("k"), (col("id") * 2).as("v"))
        .coalesce(1).write.mode("append").parquet(s"$dir/delta2")
      Manifest.collectStats(spark, Manifest.dataFiles(spark, s"$dir/delta2"), "k")
    }
    // both writers read head seq 0, then race the CAS
    val r1 = Manifest.tryAdvanceRef(spark, dir, "main", 0, base ++ d1)
    val r2 = Manifest.tryAdvanceRef(spark, dir, "main", 0, base ++ d2)
    assert(r1.isRight && r2.isLeft, s"$r1 / $r2")
    // loser rebases on the new head and lands both deltas
    val seq = Manifest.advanceRefWithRetry(spark, dir, "main")(cur => cur ++ d2)
    assert(seq == 2)
    assert(spark.read.parquet(
      Manifest.readRef(spark, dir, "main").map(_.path): _*).count() == 300L)
  }

  test("vacuumRefs deletes only what no retained ref, list, or chain references") {
    val (dir, base) = freshTable(200)
    Manifest.createBranch(spark, dir, "main", base)

    // an abandoned experiment: extra files staged under the managed
    // root, referenced only by the tmp branch
    spark.range(200, 260).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("append").parquet(s"$dir/staged/x")
    val staged = Manifest.collectStats(spark,
      Manifest.dataFiles(spark, s"$dir/staged/x"), "k")
    Manifest.createBranch(spark, dir, "tmp", base ++ staged)

    // while tmp lives, its files and snapshot are retained
    assert(Manifest.vacuumRefs(spark, dir, Seq(s"$dir/staged")).isEmpty)
    assert(Manifest.dataFiles(spark, s"$dir/staged/x").nonEmpty)

    // dropping the branch orphans them: GC removes the staged files and
    // tmp's snapshot manifest, and main still reads in full
    Manifest.dropRef(spark, dir, "tmp")
    val deleted = Manifest.vacuumRefs(spark, dir, Seq(s"$dir/staged"))
    assert(deleted.exists(_.contains("/staged/")), deleted)
    assert(deleted.exists(_.contains("m-")), deleted)
    assert(Manifest.dataFiles(spark, s"$dir/staged").isEmpty)
    assert(spark.read.parquet(
      Manifest.readRef(spark, dir, "main").map(_.path): _*).count() == 200L)

    // seq-history trim: advance main twice, keepSeqs=1 drops seqs 0..1
    // and their snapshots but never the head's
    val d = writeDelta(dir, 300, 320)
    Manifest.advanceRefWithRetry(spark, dir, "main")(cur => cur ++ d)
    Manifest.advanceRefWithRetry(spark, dir, "main")(cur => cur)
    val trimmed = Manifest.vacuumRefs(spark, dir, Seq(s"$dir/staged"))
    assert(trimmed.count(_.endsWith(".ref")) == 2, trimmed)
    assert(spark.read.parquet(
      Manifest.readRef(spark, dir, "main").map(_.path): _*).count() == 220L)
  }

  test("vacuumRefs grace window: young orphans survive, old ones collect") {
    val (dir, base) = freshTable(40)
    Manifest.createBranch(spark, dir, "main", base)
    // orphan a snapshot + staged files (the mid-commit writer shape:
    // manifest and data written, ref CAS not yet landed)
    spark.range(40, 60).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("append").parquet(s"$dir/staged/y")
    val staged = Manifest.collectStats(spark,
      Manifest.dataFiles(spark, s"$dir/staged/y"), "k")
    Manifest.createBranch(spark, dir, "tmp", base ++ staged)
    Manifest.dropRef(spark, dir, "tmp")

    // a one-hour grace window spares everything just written...
    assert(Manifest.vacuumRefs(spark, dir, Seq(s"$dir/staged"),
      minAgeMs = 3600L * 1000).isEmpty)
    assert(Manifest.dataFiles(spark, s"$dir/staged/y").nonEmpty)

    // ...and the default window collects the same orphans
    val deleted = Manifest.vacuumRefs(spark, dir, Seq(s"$dir/staged"))
    assert(deleted.exists(_.contains("/staged/")), deleted)
    assert(deleted.exists(_.contains("m-")), deleted)
    assert(spark.read.parquet(
      Manifest.readRef(spark, dir, "main").map(_.path): _*).count() == 40L)
  }

  test("write-audit-publish: stage on a branch, audit, fast-forward main atomically") {
    val (dir, base) = freshTable(300)
    Manifest.createBranch(spark, dir, "main", base)
    Manifest.branchFrom(spark, dir, "staging", from = "main")

    // stage a delta that includes some out-of-contract rows
    spark.range(300, 340)
      .select(col("id").as("k"), when(col("id") < 330, col("id") * 2).as("v"))
      .coalesce(1).write.mode("append").parquet(s"$dir/delta")
    val delta = Manifest.collectStats(spark,
      Manifest.dataFiles(spark, s"$dir/delta"), "k")
    Manifest.advanceRefWithRetry(spark, dir, "staging")(cur => cur ++ delta)

    // audit runs against the STAGING read; main is untouched throughout
    val staged = spark.read.parquet(
      Manifest.readRef(spark, dir, "staging").map(_.path): _*)
    val nulls = staged.filter(col("v").isNull).count()
    assert(nulls == 10L)
    assert(spark.read.parquet(
      Manifest.readRef(spark, dir, "main").map(_.path): _*).count() == 300L)

    // audit passes (suppose the null contract allows them) → publish is
    // one CAS pointer move sharing the audited snapshot file by name
    val before = Manifest.refHead(spark, dir, "staging").get._2
    assert(Manifest.fastForward(spark, dir, "main", from = "staging").isRight)
    val head = Manifest.refHead(spark, dir, "main").get
    assert(head._1 == 1 && head._2 == before)
    assert(spark.read.parquet(
      Manifest.readRef(spark, dir, "main").map(_.path): _*).count() == 340L)
  }
}
