package graft

import java.nio.file.Files
import graft.ops.Manifest
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Two-level manifest lists ([[Manifest.commitDelta]]) — the O(delta)
  * commit economics: append commits write one manifest and read none;
  * removals rewrite only touched manifests; reads prune at the list
  * level before any manifest file is opened. The "never opened" pins
  * work by renaming the files that must not be read out of the way —
  * if the code path touches them, it throws. */
class ManifestListSpec extends SparkSpec {

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def entriesFor(dir: String): Seq[Manifest.FileEntry] =
    Manifest.collectStats(spark, Manifest.dataFiles(spark, dir), "k")

  private def writeRange(dir: String, lo: Long, hi: Long, parts: Int): Unit =
    spark.range(lo, hi).select(col("id").as("k"))
      .repartitionByRange(parts, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)

  private def manifestFiles(table: String): Set[String] =
    fs.listStatus(new Path(table, "_manifest")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("m-")).toSet

  test("append commit writes one new manifest and never opens existing ones") {
    val table = Files.createTempDirectory("graft-mlist-append").toString
    writeRange(s"$table/batch0", 0, 100, 2)
    assert(Manifest.commitDelta(spark, table,
      entriesFor(s"$table/batch0")) == 0)
    val m0 = manifestFiles(table)
    assert(m0.size == 1)
    // hide v0's manifest: a pure append must not open it
    val hidden = m0.map { n =>
      val p = new Path(table, s"_manifest/$n")
      val aside = new Path(table, s"_manifest/.aside-$n")
      assert(fs.rename(p, aside)); (aside, p)
    }
    writeRange(s"$table/batch1", 100, 200, 3)
    assert(Manifest.commitDelta(spark, table,
      entriesFor(s"$table/batch1")) == 1)
    hidden.foreach { case (aside, p) => assert(fs.rename(aside, p)) }
    // the new list shares v0's manifest BY NAME and adds exactly one
    val refs = Manifest.readList(spark, table, 1)
    assert(refs.map(_.name).toSet.intersect(m0) == m0)
    assert(manifestFiles(table).size == 2)
    val all = Manifest.readAll(spark, table, 1)
    assert(all.map(_.rows).sum == 200L)
    assert(spark.read.parquet(all.map(_.path): _*).count() == 200L)
  }

  test("removal rewrites only the manifests naming a removed file") {
    val table = Files.createTempDirectory("graft-mlist-remove").toString
    writeRange(s"$table/a", 0, 100, 2)
    writeRange(s"$table/b", 100, 200, 2)
    Manifest.commitDelta(spark, table, entriesFor(s"$table/a"))
    Manifest.commitDelta(spark, table, entriesFor(s"$table/b"))
    val v1 = Manifest.readList(spark, table, 1)
    assert(v1.size == 2)
    val mA = Manifest.readList(spark, table, 0).head.name
    val victim = Manifest.readManifestFile(spark, table,
      v1.map(_.name).filterNot(_ == mA).head).head.path
    assert(Manifest.commitDelta(spark, table, Seq.empty,
      removed = Set(victim)) == 2)
    val v2 = Manifest.readList(spark, table, 2)
    // a's manifest survives by name; b's was rewritten under a new name
    assert(v2.map(_.name).contains(mA))
    assert(v2.size == 2)
    val all = Manifest.readAll(spark, table, 2)
    assert(!all.map(_.path).contains(victim))
    assert(all.map(_.rows).sum ==
      200L - Manifest.readAll(spark, table, 1)
        .find(_.path == victim).get.rows)
    // v1 still reads in full — manifests are immutable, history intact
    assert(Manifest.readAll(spark, table, 1).map(_.rows).sum == 200L)
  }

  test("removing a manifest's last file drops it from the list entirely") {
    val table = Files.createTempDirectory("graft-mlist-empty").toString
    writeRange(s"$table/a", 0, 50, 1)
    writeRange(s"$table/b", 50, 100, 1)
    Manifest.commitDelta(spark, table, entriesFor(s"$table/a"))
    Manifest.commitDelta(spark, table, entriesFor(s"$table/b"))
    val bPaths = entriesFor(s"$table/b").map(_.path).toSet
    assert(Manifest.commitDelta(spark, table, Seq.empty,
      removed = bPaths) == 2)
    val v2 = Manifest.readList(spark, table, 2)
    assert(v2.size == 1)
    assert(Manifest.readAll(spark, table, 2).map(_.rows).sum == 50L)
  }

  test("two-level pruning drops whole manifests before opening them") {
    val table = Files.createTempDirectory("graft-mlist-prune").toString
    writeRange(s"$table/lo", 0, 100, 2)
    writeRange(s"$table/hi", 1000, 1100, 2)
    Manifest.commitDelta(spark, table, entriesFor(s"$table/lo"))
    Manifest.commitDelta(spark, table, entriesFor(s"$table/hi"))
    val refs = Manifest.readList(spark, table, 1)
    val loManifest = refs.filter(_.minKey < 500).map(_.name)
    assert(loManifest.size == 1)
    // hide the lo manifest: a probe entirely inside hi must not open it
    val p = new Path(table, s"_manifest/${loManifest.head}")
    val aside = new Path(table, s"_manifest/.aside")
    assert(fs.rename(p, aside))
    val (kept, opened) = Manifest.pruneTwoLevel(spark, table, 1, 1040, 1060)
    assert(fs.rename(aside, p))
    assert(opened == refs.filterNot(_.minKey < 500).map(_.name))
    assert(kept.nonEmpty)
    assert(kept.forall(e => e.maxKey >= 1040 && e.minKey <= 1060))
    // the kept files still contain every matching row
    assert(spark.read.parquet(kept.map(_.path): _*)
      .filter(col("k").between(1040, 1060)).count() == 21L)
    // and two-level agrees with flat pruning over the full entry set
    val flat = Manifest.prune(Manifest.readAll(spark, table, 1), 1040, 1060)
    assert(kept.toSet == flat.toSet)
  }

  test("concurrent delta commits both land; loser shares winner's manifest") {
    val table = Files.createTempDirectory("graft-mlist-race").toString
    writeRange(s"$table/w1", 0, 10, 1)
    writeRange(s"$table/w2", 10, 20, 1)
    val Seq(e1, e2) = Seq(s"$table/w1", s"$table/w2").map(entriesFor)
    def writer(es: Seq[Manifest.FileEntry]): Thread =
      new Thread(() => { Manifest.commitDelta(spark, table, es); () })
    val ts = Seq(writer(e1), writer(e2))
    ts.foreach(_.start()); ts.foreach(_.join())
    val head = Manifest.currentListVersion(spark, table)
    assert(head == 1, s"expected v0+v1, got head v$head")
    val paths = Manifest.readAll(spark, table, head).map(_.path).toSet
    assert(paths == (e1 ++ e2).map(_.path).toSet)
    // v1's list carries v0's manifest by name — the rebase shared it
    val v0Names = Manifest.readList(spark, table, 0).map(_.name).toSet
    assert(v0Names.subsetOf(Manifest.readList(spark, table, 1)
      .map(_.name).toSet))
  }
}
