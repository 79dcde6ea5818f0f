package graft

import java.nio.file.Files
import graft.ops.Manifest
import org.apache.spark.sql.functions._

/** [[Manifest]] — footer-stat harvesting, JSON round-trip, and the
  * file-pruning decision actually dropping files. */
class ManifestSpec extends SparkSpec {

  test("stats round-trip and key-range pruning keeps only intersecting files") {
    val dir = Files.createTempDirectory("graft-manifest-spec").toString
    spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartitionByRange(5, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    val files = Manifest.dataFiles(spark, dir)
    assert(files.size == 5)
    val entries = Manifest.collectStats(spark, files, "k")
    assert(entries.size == 5)
    assert(entries.map(_.rows).sum == 1000L)
    assert(entries.map(_.minKey).min == 0L)
    assert(entries.map(_.maxKey).max == 999L)
    // disjoint ranges: every file's span is a fraction of the domain
    entries.foreach(e => assert(e.maxKey - e.minKey < 1000, e))
    Manifest.write(spark, dir, 0, entries)
    assert(Manifest.read(spark, dir, 0) == entries)
    // a narrow range hits a strict subset of files, and the kept files
    // still contain every matching row
    val kept = Manifest.prune(entries, 100, 120)
    assert(kept.nonEmpty && kept.size < entries.size, kept)
    val n = spark.read.parquet(kept.map(_.path): _*)
      .filter(col("k").between(100, 120)).count()
    assert(n == 21)
    // an out-of-domain range prunes everything
    assert(Manifest.prune(entries, 5000, 6000).isEmpty)
  }

  test("2-D spans: Morton layout prunes on both dims; linear layout cannot prune the secondary") {
    import graft.ops.ZOrder
    val base = spark.range(0, 4096).select(
      (col("id") % 64).as("x"),
      (col("id") / 64).cast("long").as("y"),
      col("id").as("v"))

    def layout(dir: String, sortCols: Seq[org.apache.spark.sql.Column]) = {
      base.repartitionByRange(8, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .write.mode("overwrite").option("maxRecordsPerFile", 256)
        .parquet(dir)
      Manifest.collectStatsN(spark, Manifest.dataFiles(spark, dir),
        Seq("x", "y"))
    }
    val zDir = Files.createTempDirectory("graft-z2-morton").toString
    val linDir = Files.createTempDirectory("graft-z2-linear").toString
    val zEntries = layout(zDir,
      Seq(ZOrder.morton(col("x"), col("y"))))
    val linEntries = layout(linDir, Seq(col("x")))
    assert(zEntries.size >= 8 && linEntries.size >= 8)

    // JSON round-trip
    Manifest.writeN(spark, zDir, 0, zEntries)
    assert(Manifest.readN(spark, zDir, 0) == zEntries)

    // a box tight in BOTH dims: the Morton layout drops most files; the
    // linear layout prunes on x but a Y-ONLY box keeps every file (each
    // x-sorted file spans the whole y domain)
    val box = Seq((8L, 23L), (8L, 23L))
    val zKept = Manifest.pruneN(zEntries, box)
    assert(zKept.size < zEntries.size / 2, s"${zKept.size}/${zEntries.size}")
    val yOnly = Seq((Long.MinValue, Long.MaxValue), (8L, 23L))
    assert(Manifest.pruneN(linEntries, yOnly).size == linEntries.size)
    assert(Manifest.pruneN(zEntries, yOnly).size < zEntries.size)

    // pruned read + residual ≡ full filter
    val got = spark.read.parquet(zKept.map(_.path): _*)
      .filter(col("x").between(8, 23) && col("y").between(8, 23))
      .agg(count(lit(1)), sum(col("v"))).head()
    val want = base
      .filter(col("x").between(8, 23) && col("y").between(8, 23))
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(got == want)
  }

  test("vacuum deletes archives only when the last referencing manifest is dropped") {
    import graft.ops.CopyOnWrite
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-vacuum-spec").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0)).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val archive = s"$dir/_archive/v0"
    val touched = CopyOnWrite.merge(spark, dir, "p", "k",
      Seq((2L, "b", 99.0)).toDF("k", "p", "v"), archiveTo = Some(archive))
    assert(touched == Seq("b"))
    val live = Manifest.dataFiles(spark, dir)
    val v0 = Manifest.dataFiles(spark, archive) ++
      live.filterNot(_.contains("/p=b/"))
    Manifest.write(spark, dir, 0, Manifest.collectStats(spark, v0, "k"))
    Manifest.write(spark, dir, 1, Manifest.collectStats(spark, live, "k"))
    // retaining both versions: nothing is deletable
    assert(Manifest.vacuum(spark, dir, Seq(0, 1), Seq(0, 1)).isEmpty)
    assert(Manifest.dataFiles(spark, archive).nonEmpty)
    // dropping v0 releases its archived files and its manifest
    val deleted = Manifest.vacuum(spark, dir, Seq(1), Seq(0, 1))
    assert(deleted.exists(_.contains("_archive")), deleted)
    assert(Manifest.dataFiles(spark, s"$dir/_archive").isEmpty)
    // v1 still reads fully
    val cur = spark.read.parquet(Manifest.read(spark, dir, 1).map(_.path): _*)
      .select("k", "v").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(cur == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("optimistic CAS commit: interleaved writers both land on a linearizable chain") {
    val dir = Files.createTempDirectory("graft-cas-spec").toString
    spark.range(0, 100).select(col("id").as("k"))
      .coalesce(2).write.mode("overwrite").parquet(dir)
    val base = Manifest.collectStats(spark, Manifest.dataFiles(spark, dir), "k")
    // empty chain: current is -1, first commit lands v0
    assert(Manifest.currentVersion(spark, dir) == -1)
    assert(Manifest.tryCommit(spark, dir, -1, base) == Right(0))
    // two writers each read the head (v0), prepare disjoint file adds
    val head = Manifest.currentVersion(spark, dir)
    val addA = Manifest.FileEntry("mem://writer-a.parquet", 1, 5, 0, 4)
    val addB = Manifest.FileEntry("mem://writer-b.parquet", 1, 7, 5, 11)
    // writer A publishes first and wins v1
    assert(Manifest.tryCommit(spark, dir, head, base :+ addA) == Right(1))
    // writer B's CAS on the stale base LOSES and reports the new head
    assert(Manifest.tryCommit(spark, dir, head, base :+ addB) == Left(1))
    // B rebases on v1 (re-reads, re-applies its delta) and wins v2
    val v1 = Manifest.read(spark, dir, 1)
    assert(Manifest.tryCommit(spark, dir, 1, v1 :+ addB) == Right(2))
    // both writers' rows are durable; the chain is v0 < v1 < v2 with
    // each version a superset of its parent (no lost update anywhere)
    val byV = (0 to 2).map(v => Manifest.read(spark, dir, v).map(_.path).toSet)
    assert(Manifest.versions(spark, dir) == Seq(0, 1, 2))
    assert(byV(1) == byV(0) + addA.path)
    assert(byV(2) == byV(1) + addB.path)
  }

  test("commitWithRetry: concurrent writers serialize, no update lost") {
    // This test CAUGHT a real lost update in round 7: the arbiter was
    // FileContext.rename(Rename.NONE), which on local FS is an exists()
    // probe + POSIX rename(2) — overwriting, not atomic. Two racers both
    // passed the probe, both renamed onto v1, one manifest vanished.
    // The arbiter is now hardlink-create (link(2) fails atomically with
    // EEXIST); eight writers here keep the race window hot.
    val dir = Files.createTempDirectory("graft-cas-retry-spec").toString
    spark.range(0, 10).select(col("id").as("k"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val base = Manifest.collectStats(spark, Manifest.dataFiles(spark, dir), "k")
    assert(Manifest.tryCommit(spark, dir, -1, base) == Right(0))
    // each thread appends ITS file to whatever base it lands on —
    // the rebase closure is the writer's merge logic
    val nWriters = 8
    val gate = new java.util.concurrent.CountDownLatch(1)
    def writer(tag: String): Thread = new Thread(() => {
      gate.await()
      Manifest.commitWithRetry(spark, dir, maxAttempts = 100) { (_, cur) =>
        cur :+ Manifest.FileEntry(s"mem://$tag.parquet", 1, 1, 0, 0)
      }
      ()
    })
    val ts = (1 to nWriters).map(i => writer(s"t$i"))
    ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
    val head = Manifest.currentVersion(spark, dir)
    assert(head == nWriters, s"expected $nWriters commits past v0, got head v$head")
    val finalSet = Manifest.read(spark, dir, head).map(_.path).toSet
    (1 to nWriters).foreach { i =>
      assert(finalSet.contains(s"mem://t$i.parquet"), finalSet)
    }
    assert(finalSet.size == base.size + nWriters)
    // linearizable chain: every version is its parent plus exactly one
    // writer's file — a lost update would show as a version whose
    // parent-set it does not extend
    val byV = (0 to head).map(v => Manifest.read(spark, dir, v).map(_.path).toSet)
    (1 to head).foreach { v =>
      assert(byV(v).size == byV(v - 1).size + 1, s"v$v not parent+1")
      assert(byV(v - 1).subsetOf(byV(v)), s"v$v dropped entries from v${v - 1}")
    }
  }

  test("CAS soak: 25 rounds of a 4-writer duel never lose a commit") {
    // The arbiter is pure driver-side FS work (no Spark jobs), so this
    // soak is cheap — and a regression back to probe-then-rename fails
    // it with high probability in a single run, not once a week.
    (1 to 25).foreach { round =>
      val dir = Files.createTempDirectory(s"graft-cas-soak-$round").toString
      assert(Manifest.tryCommit(spark, dir, -1, Seq.empty) == Right(0))
      val gate = new java.util.concurrent.CountDownLatch(1)
      val ts = (1 to 4).map { i =>
        new Thread(() => {
          gate.await()
          Manifest.commitWithRetry(spark, dir, maxAttempts = 100) { (_, cur) =>
            cur :+ Manifest.FileEntry(s"mem://r$round-t$i.parquet", 1, 1, 0, 0)
          }
          ()
        })
      }
      ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
      val head = Manifest.currentVersion(spark, dir)
      assert(head == 4, s"round $round: expected head v4, got v$head")
      assert(Manifest.read(spark, dir, head).map(_.path).toSet ==
        (1 to 4).map(i => s"mem://r$round-t$i.parquet").toSet,
        s"round $round lost a writer's entry")
    }
  }

  test("manifest-backed snapshot diff opens only delta-touched files") {
    import graft.ops.CopyOnWrite
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mdiff-spec").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0)).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val archive = s"$dir/_archive/v0"
    CopyOnWrite.merge(spark, dir, "p", "k",
      Seq((2L, "b", 99.0), (4L, "b", 40.0)).toDF("k", "p", "v"),
      archiveTo = Some(archive))
    val live = Manifest.dataFiles(spark, dir)
    val v0 = Manifest.dataFiles(spark, archive) ++
      live.filterNot(_.contains("/p=b/"))
    Manifest.write(spark, dir, 0, Manifest.collectStats(spark, v0, "k"))
    Manifest.write(spark, dir, 1, Manifest.collectStats(spark, live, "k"))
    val diff = graft.queries.Lake.diffFromManifests(spark, dir, 0, 1, "k", "v")
    // the p=a partition is named by BOTH manifests: its files must
    // never enter the scan — the unchanged row it contributes comes
    // from the manifests' row counts, not a read
    // normalize URI spellings (file:/ vs file:///) so the disjointness
    // check cannot pass vacuously on mismatched schemes
    def norm(s: String): String = s.replaceFirst("^file:/+", "/")
    val untouched = live.filter(_.contains("/p=a/")).map(norm).toSet
    assert(untouched.nonEmpty)
    val opened = diff.inputFiles.map(norm).toSet
    assert(opened.nonEmpty)
    assert(opened.forall(_.startsWith("/")), opened)
    assert(opened.intersect(untouched).isEmpty,
      s"diff opened untouched files: ${opened.intersect(untouched)}")
    // and the classification is still complete and correct
    val rows = diff.as[(String, Long)].collect().toMap
    assert(rows == Map("insert" -> 1L, "update" -> 1L, "unchanged" -> 2L))
  }

  test("unknown storage scheme refuses the CAS publish loudly (scheme matrix)") {
    // an object store routed through the generic rename branch would
    // re-create the probe-then-rename lost-update this suite caught on
    // file: — the arbiter must REFUSE schemes it has no atomic
    // primitive for, and still clean up its temp file
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("fs.mockfs.impl", classOf[MockSchemeFs].getName)
    conf.set("fs.mockfs.impl.disable.cache", "true")
    val dir = Files.createTempDirectory("graft-scheme").toString
    val tmp = new org.apache.hadoop.fs.Path(s"mockfs://host$dir/v1.tmp")
    val dst = new org.apache.hadoop.fs.Path(s"mockfs://host$dir/v1.json")
    val fs = tmp.getFileSystem(conf)
    val out = fs.create(tmp, true)
    out.write("x".getBytes("UTF-8")); out.close()
    val ex = intercept[UnsupportedOperationException] {
      Manifest.publishIfAbsent(conf, tmp, dst)
    }
    assert(ex.getMessage.contains("mockfs"), ex.getMessage)
    assert(ex.getMessage.contains("If-None-Match"), ex.getMessage)
    assert(!fs.exists(tmp), "loser temp file must be cleaned up")
    assert(!fs.exists(dst), "nothing may be published")
  }
}

/** A local filesystem masquerading under an unknown scheme — how the
  * scheme gate is tested without a real object store. */
class MockSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs://host/")
}
