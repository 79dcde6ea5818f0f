package graft.tools

import graft.ops.{Manifest, ManifestLake}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for SCALE.md: the read-path cost of small-file
  * accretion and what [[ManifestLake.compactSmall]] buys back. Builds a
  * lake from the events table via N chunked appendCommits (the ingest
  * pattern that CREATES the problem), times the same scan-aggregate at
  * the fragmented head and after compaction, prints file counts and
  * best-of-3 wall times. Not part of the query surface. */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val chunks = if (args.length > 1) args(1).toInt else 24
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Ctx.prep(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-cprobe").toString
    val ev = graft.T.events(spark, dir).filter(col("event_id").isNotNull)
    (0 until chunks).foreach { k =>
      ManifestLake.appendCommit(spark, path, "event_type", "event_id",
        ev.filter(col("event_id") % chunks === k), s"chunk-$k")
    }
    def files(v: Int): Int = Manifest.readAll(spark, path, v).size
    def scan(v: Int): Unit = {
      ManifestLake.read(spark, path, v)
        .groupBy(col("event_type"))
        .agg(count(lit(1)), sum(col("value")), countDistinct(col("user_id")))
        .collect()
      ()
    }
    def bestOf(n: Int)(f: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    val headPre = Manifest.currentListVersion(spark, path)
    scan(headPre) // warm (codegen + FS cache parity with the post run)
    val tPre = bestOf(3)(scan(headPre))
    val t0 = System.nanoTime()
    val vPost = ManifestLake.compactSmall(spark, path, "event_id",
      256L * 1024 * 1024, "opt")
    val tCompact = (System.nanoTime() - t0) / 1e9
    scan(vPost)
    val tPost = bestOf(3)(scan(vPost))
    println(f"COMPACT dir=$dir chunks=$chunks files=${files(headPre)}->" +
      f"${files(vPost)} scanPre=$tPre%.3fs scanPost=$tPost%.3fs " +
      f"compact=$tCompact%.3fs")
    spark.stop()
  }
}
