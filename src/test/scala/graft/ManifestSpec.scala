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
}
