package graft

import java.nio.file.Files
import graft.ops.{Manifest, ManifestLake}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** [[ManifestLake.compactClustered]] — OPTIMIZE + sort order (the
  * Delta `OPTIMIZE ZORDER BY` analogue). The gate
  * (`lake_compact_cluster`) proves the rewrite is semantics-preserving
  * against the DuckDB oracle; this spec pins the physical claims the
  * oracle cannot see: per-file key spans become pairwise DISJOINT so
  * manifest pruning keeps a strict subset of files (pre-clustering the
  * modulo-chunked ingest makes every file span the full key range and
  * pruning keeps everything), the rewrite is idempotent from metadata
  * alone, already-clustered partitions are skipped, delete-vector-
  * addressed files are left alone, and time travel to a pre-clustering
  * version still reads the original files verbatim. */
class CompactClusterSpec extends SparkSpec {

  import spark.implicits._

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def table(dir: String, version: Int = -1): Seq[(Long, String, Double)] =
    ManifestLake.read(spark, dir, version)
      .select(col("k"), col("p"), col("v")).as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq

  private def dataEntries(dir: String, v: Int): Seq[Manifest.FileEntry] =
    Manifest.readAll(spark, dir, v).filterNot(_.path.contains("/deletes/"))

  private def partOf(p: String): String =
    p.replaceAll(".*/graft_p=([^/]*)/.*", "$1")

  private def disjoint(fs: Seq[Manifest.FileEntry]): Boolean = {
    val s = fs.sortBy(e => (e.minKey, e.maxKey))
    s.zip(s.drop(1)).forall { case (a, b) => a.maxKey < b.minKey }
  }

  /** 4 modulo-interleaved appends × 2 partitions — every one of the 8
    * files spans (nearly) the FULL key range 0..399: the worst case
    * for span pruning, and exactly what chunked ingest produces. */
  private def moduloLoad(dir: String): Seq[(Long, String, Double)] = {
    val rows = for (k <- 0L until 400L)
      yield (k, if (k % 2 == 0) "a" else "b", k * 1.5)
    (0 until 4).foreach { c =>
      ManifestLake.appendCommit(spark, dir, "p", "k",
        rows.filter(r => (r._1 % 8) / 2 == c).toDF("k", "p", "v")
          .repartition(1),
        s"chunk-$c")
    }
    rows.sortBy(_._1)
  }

  /** Byte target that asks for ~4 output files per partition. */
  private def quarterTarget(dir: String, v: Int): Long = {
    val perPart = dataEntries(dir, v).groupBy(e => partOf(e.path))
      .map(_._2.map(_.bytes).sum)
    math.max(1L, perPart.max / 4)
  }

  test("clustering makes spans disjoint and pruning selective; rows and history survive") {
    val dir = Files.createTempDirectory("graft-clu").toString
    val rows = moduloLoad(dir)
    val before = dataEntries(dir, 3)
    assert(before.size == 8)
    // worst case pinned: every file intersects the probe range
    assert(Manifest.prune(before, 100L, 199L).size == 8)
    val stamps = before.map(e =>
      e.path -> fs.getFileStatus(new Path(e.path)).getModificationTime).toMap
    val v = ManifestLake.compactClustered(spark, dir, "k",
      quarterTarget(dir, 3), "cluster")
    assert(v == 4)
    val after = dataEntries(dir, v)
    // multiple range-files per partition, spans pairwise disjoint
    val byPart = after.groupBy(e => partOf(e.path))
    assert(byPart.keySet == Set("a", "b"))
    byPart.foreach { case (pv, fs0) =>
      assert(fs0.size >= 2, s"partition $pv should split into range files")
      assert(disjoint(fs0), s"partition $pv spans overlap: " +
        fs0.map(e => (e.minKey, e.maxKey)).sortBy(_._1).mkString(", "))
    }
    // the layout's payoff: the same probe now keeps a strict subset
    val kept = Manifest.prune(after, 100L, 199L)
    assert(kept.size < after.size,
      s"pruning kept ${kept.size} of ${after.size} files")
    // and the pruned read still answers exactly
    val got = ManifestLake.readWhere(spark, dir, 100L, 199L, v)
      .filter(col("k").between(100, 199))
      .select(col("k"), col("p"), col("v")).as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == rows.filter(r => r._1 >= 100 && r._1 <= 199))
    // rows identical through the rewrite; old version reads originals
    assert(table(dir, v) == rows)
    assert(table(dir, 3) == rows)
    assert(dataEntries(dir, 3).map(_.path).toSet == before.map(_.path).toSet)
    stamps.foreach { case (p, t) =>
      assert(fs.getFileStatus(new Path(p)).getModificationTime == t, p)
    }
  }

  test("idempotent from metadata alone: a clustered table is a no-op head") {
    val dir = Files.createTempDirectory("graft-clu").toString
    moduloLoad(dir)
    val target = quarterTarget(dir, 3)
    val v = ManifestLake.compactClustered(spark, dir, "k", target, "cluster")
    assert(v == 4)
    // disjoint spans are recognized without reading any data file
    val v2 = ManifestLake.compactClustered(spark, dir, "k", target, "again")
    assert(v2 == v, "re-clustering a clustered table must not commit")
    assert(Manifest.currentListVersion(spark, dir) == v)
  }

  test("an oversized fat file is split into range files, then the rule quiesces") {
    val dir = Files.createTempDirectory("graft-clu").toString
    moduloLoad(dir)
    // first pack everything fat (compactSmall with a huge cap): one
    // file per partition, spans trivially disjoint — but each file is
    // the WHOLE range, so a narrow read pays for everything
    val vFat = ManifestLake.compactSmall(spark, dir, "k",
      64L * 1024 * 1024, "fat")
    val fat = dataEntries(dir, vFat)
    assert(fat.size == 2)
    // the oversize rule fires: fat bytes > 2×target ⇒ split by range
    val target = fat.map(_.bytes).max / 4
    val v = ManifestLake.compactClustered(spark, dir, "k", target, "split")
    val after = dataEntries(dir, v)
    after.groupBy(e => partOf(e.path)).foreach { case (pv, fs0) =>
      assert(fs0.size >= 2, s"partition $pv not split")
      assert(disjoint(fs0), s"partition $pv overlaps after split")
    }
    assert(Manifest.prune(after, 100L, 199L).size < after.size)
    // hysteresis: outputs sit under 2×target ⇒ second run is a no-op
    assert(ManifestLake.compactClustered(spark, dir, "k", target,
      "again") == v)
    // rows identical through fat-pack + split
    assert(table(dir, v) == table(dir, 3))
  }

  test("delete-vector-dirty files are excluded from the rewrite") {
    val dir = Files.createTempDirectory("graft-clu").toString
    moduloLoad(dir)
    // vector the rows of chunk-0 / partition a (k % 8 == 0 hits only
    // files under data/chunk-0/graft_p=a)
    val vDel = ManifestLake.deleteWhere(spark, dir,
      col("k") % 8 === 0, "del")
    val dirty = dataEntries(dir, vDel)
      .filter(_.path.contains("/chunk-0/graft_p=a/")).map(_.path).toSet
    assert(dirty.nonEmpty)
    val v = ManifestLake.compactClustered(spark, dir, "k",
      quarterTarget(dir, vDel), "cluster")
    val after = dataEntries(dir, v)
    // the dirty files ride into the new version by name, untouched
    assert(dirty.subsetOf(after.map(_.path).toSet))
    // and the clustered head still subtracts the deleted rows
    val got = table(dir, v)
    assert(got.forall(r => r._1 % 8 != 0))
    assert(got.size == 400 - 50)
  }
}
