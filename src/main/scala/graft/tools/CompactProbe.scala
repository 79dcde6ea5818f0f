package graft.tools

import graft.ops.{Manifest, ManifestLake}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for SCALE.md: what the two compaction jobs buy
  * back on the read path. Builds a lake from the events table via N
  * chunked appendCommits (the ingest pattern that CREATES the
  * problem), then measures:
  *   1. full-scan aggregate at the fragmented head vs after
  *      [[ManifestLake.compactSmall]] (the small-file tax);
  *   2. a narrow key-range read ([[ManifestLake.readWhere]]) at the
  *      fragmented head vs after [[ManifestLake.compactClustered]]
  *      (the span-pruning payoff), with files-kept counts from
  *      [[Manifest.prune]] so the pruning is visible in metadata,
  *      not just wall time.
  * Best-of-3 wall times, warm-first. Not part of the query surface.
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val chunks = if (args.length > 1) args(1).toInt else 24
    val clusterTarget =
      if (args.length > 2) args(2).toLong else 16L * 1024 * 1024
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Ctx.prep(spark)
    val path = java.nio.file.Files.createTempDirectory("graft-cprobe").toString
    val ev = graft.T.events(spark, dir).filter(col("event_id").isNotNull)
    val (idLo, idHi) = {
      val r = ev.agg(min(col("event_id")), max(col("event_id"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    (0 until chunks).foreach { k =>
      ManifestLake.appendCommit(spark, path, "event_type", "event_id",
        ev.filter(col("event_id") % chunks === k), s"chunk-$k")
    }
    def entries(v: Int): Seq[Manifest.FileEntry] =
      Manifest.readAll(spark, path, v).filterNot(_.path.contains("/deletes/"))
    def scan(v: Int): Unit = {
      ManifestLake.read(spark, path, v)
        .groupBy(col("event_type"))
        .agg(count(lit(1)), sum(col("value")), countDistinct(col("user_id")))
        .collect()
      ()
    }
    // a ~1% id slice — the dashboard/point-lookup shape readWhere serves
    val lo = idLo + (idHi - idLo) / 2
    val hi = lo + math.max(1L, (idHi - idLo) / 100)
    def rangeScan(v: Int): Unit = {
      ManifestLake.readWhere(spark, path, lo, hi, v)
        .filter(col("event_id").between(lo, hi))
        .groupBy(col("event_type"))
        .agg(count(lit(1)), sum(col("value")))
        .collect()
      ()
    }
    def bestOf(n: Int)(f: => Unit): Double =
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    val headPre = Manifest.currentListVersion(spark, path)
    scan(headPre); rangeScan(headPre) // warm codegen + FS cache parity
    val tPre = bestOf(3)(scan(headPre))
    val tRangePre = bestOf(3)(rangeScan(headPre))
    val keptPre = Manifest.prune(entries(headPre), lo, hi).size
    val t0 = System.nanoTime()
    val vSmall = ManifestLake.compactSmall(spark, path, "event_id",
      256L * 1024 * 1024, "opt")
    val tCompact = (System.nanoTime() - t0) / 1e9
    scan(vSmall)
    val tPost = bestOf(3)(scan(vSmall))
    val t1 = System.nanoTime()
    val vClu = ManifestLake.compactClustered(spark, path, "event_id",
      clusterTarget, "cluster")
    val tCluster = (System.nanoTime() - t1) / 1e9
    rangeScan(vClu)
    val tRangePost = bestOf(3)(rangeScan(vClu))
    val keptPost = Manifest.prune(entries(vClu), lo, hi).size
    println(f"COMPACT dir=$dir chunks=$chunks " +
      f"files=${entries(headPre).size}->${entries(vSmall).size}->" +
      f"${entries(vClu).size} " +
      f"scanPre=$tPre%.3fs scanPost=$tPost%.3fs " +
      f"rangePre=$tRangePre%.3fs rangePost=$tRangePost%.3fs " +
      f"keptPre=$keptPre keptPost=$keptPost " +
      f"compact=$tCompact%.3fs cluster=$tCluster%.3fs")
    spark.stop()
  }
}
