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
}
