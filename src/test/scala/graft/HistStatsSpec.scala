package graft

import java.nio.file.Files

import graft.ops.{HistStats, Manifest, ManifestLake}
import org.apache.spark.sql.functions._

/** [[graft.ops.HistStats]] — per-file equi-depth sidecars: one profile
  * per data file reused by path across commits (the O(delta) ANALYZE),
  * and the merged piecewise-linear CDF matching the truth exactly at
  * per-file boundaries and end-to-end on a skewed table. */
class HistStatsSpec extends SparkSpec {

  import spark.implicits._

  private val B = 32

  /** 95/5 long tail: 0..949 carry v = id % 100; 950..999 carry a tail
    * value 100000 + 1000·(id − 950). */
  private def load(dir: String, chunks: Int): Unit = {
    val rows = (0L until 1000L).map(i =>
      (i, if (i < 950) i % 100 else 100000L + 1000L * (i - 950)))
    (0 until chunks).foreach { c =>
      ManifestLake.appendCommit(spark, dir, "p", "k",
        rows.filter(_._1 % chunks == c).toDF("k", "v")
          .withColumn("p", lit("x")).repartition(1), s"chunk-$c")
    }
  }

  test("merged CDF interpolates real mass on a long tail") {
    val dir = Files.createTempDirectory("graft-hist").toString
    load(dir, 4)
    val cdf = HistStats.mergedCdf(spark, dir, "v", B)
    def frac(x: Double): Double = {
      val (xs, cum) = cdf
      if (x < xs.head) 0.0
      else if (x >= xs.last) 1.0
      else {
        var k = java.util.Arrays.binarySearch(xs, x)
        if (k < 0) k = -k - 2
        (cum(k) + (x - xs(k)) / (xs(k + 1) - xs(k)) *
          (cum(k + 1) - cum(k))) / cum.last
      }
    }
    // 95% of the mass sits at or below 99; the uniform-span model would
    // call this ~0 (99 of a ~49M-wide span). Within-file resolution is
    // 1/B of a file's mass, so the knee reads as ~94-96%, not exactly 95
    val below100 = frac(99.0)
    assert(below100 > 0.90 && below100 <= 0.97, s"CDF(99) = $below100")
    // tail predicate v >= 100000 keeps ~5%
    val tail = 1.0 - frac(99999.0)
    assert(tail > 0.03 && tail < 0.08, s"tail mass = $tail")
    assert(frac(Double.MaxValue) == 1.0 && frac(-1.0) == 0.0)
  }

  test("O(delta) across commits: prior file profiles ride by path, unchanged") {
    val dir = Files.createTempDirectory("graft-hist").toString
    load(dir, 4)
    val before = HistStats.ensure(spark, dir, "v", B)
      .as[(String, Long, Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val nFiles = Manifest.readAll(spark, dir,
      Manifest.currentListVersion(spark, dir)).size
    assert(before.size == nFiles, "one profile per data file")
    ManifestLake.appendCommit(spark, dir, "p", "k",
      Seq((2000L, 5L), (2001L, 7L)).toDF("k", "v")
        .withColumn("p", lit("x")).repartition(1), "late")
    val after = HistStats.ensure(spark, dir, "v", B)
      .as[(String, Long, Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    before.foreach { case (f, prof) =>
      assert(after.get(f).contains(prof), s"profile for $f changed")
    }
    assert(after.size > before.size, "the new file must be profiled")
  }
}
