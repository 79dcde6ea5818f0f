package graft

import java.nio.file.Files
import graft.ops.{Manifest, ManifestLake, NdvStats}
import org.apache.spark.sql.functions._

/** [[NdvStats]] — per-file KMV sketches in a manifest sidecar. The
  * gate (`lake_ndv_manifest`) proves the merged estimate against the
  * DuckDB oracle; this spec pins the lifecycle the oracle can't see:
  * one sketch per data file, prior sketches reused by path across
  * commits (the O(delta) ANALYZE), the sidecar merge bit-equal to a
  * direct whole-table sketch (KMV mergeability), and the estimate
  * invariant under compaction (same value set, different files). */
class NdvStatsSpec extends SparkSpec {

  import spark.implicits._

  private val K = 16

  private def load(dir: String, chunks: Int): Unit = {
    val rows = for (i <- 0L until 240L)
      yield (i, if (i % 2 == 0) "a" else "b", (i % 37).toString)
    (0 until chunks).foreach { c =>
      ManifestLake.appendCommit(spark, dir, "p", "k",
        rows.filter(_._1 % chunks == c).toDF("k", "p", "u").repartition(1),
        s"chunk-$c")
    }
  }

  private def directSketch(dir: String): Seq[String] = {
    graft.functions.VecExprs.register(spark)
    ManifestLake.read(spark, dir)
      .agg(expr(s"kmv_bottomk(md5(cast(u AS string)), $K)").as("ks"))
      .collect()(0).getSeq[String](0)
  }

  test("one sketch per file; sidecar merge bit-equal to the direct sketch") {
    val dir = Files.createTempDirectory("graft-ndv").toString
    load(dir, 4)
    val side = NdvStats.ensure(spark, dir, "u", K)
    val nFiles = Manifest.readAll(spark, dir,
      Manifest.currentListVersion(spark, dir)).size
    assert(side.count() == nFiles)
    val merged = NdvStats.mergedSketch(spark, dir, "u", K)
      .collect()(0).getSeq[String](0)
    assert(merged == directSketch(dir), "KMV mergeability violated")
  }

  test("O(delta) across commits: prior file sketches ride by path, unchanged") {
    val dir = Files.createTempDirectory("graft-ndv").toString
    load(dir, 4)
    val before = NdvStats.ensure(spark, dir, "u", K)
      .as[(String, Seq[String])].collect().toMap
    ManifestLake.appendCommit(spark, dir, "p", "k",
      Seq((1000L, "a", "99"), (1001L, "b", "99"))
        .toDF("k", "p", "u").repartition(1), "late")
    val after = NdvStats.ensure(spark, dir, "u", K)
      .as[(String, Seq[String])].collect().toMap
    // every pre-existing file's sketch is carried verbatim
    before.foreach { case (f, ks) =>
      assert(after.get(f).contains(ks), s"sketch for $f changed")
    }
    assert(after.size == before.size + 2) // the two new partition files
    // and the new value is visible in the merged sketch's domain
    val merged = NdvStats.mergedSketch(spark, dir, "u", K)
      .collect()(0).getSeq[String](0)
    assert(merged == directSketch(dir))
  }

  test("streaming lifecycle: per-batch ANALYZE, clustering mid-stream, stats stay bit-equal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-ndv").toString
    val ckpt = Files.createTempDirectory("graft-ndv-ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    // the maintenance loop a streaming table runs: append the batch,
    // refresh the stats sidecar — ensure() sketches ONLY the new files
    def sink() = in.toDF().toDF("k", "p", "u").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ManifestLake.appendCommit(batch.sparkSession, dir, "p", "k",
          batch, s"batch-$id")
        NdvStats.ensure(batch.sparkSession, dir, "u", K)
        ()
      }
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    val q = sink()
    in.addData((0L, "a", "x0"), (1L, "b", "x1"))
    in.addData((2L, "a", "x2"), (3L, "b", "x0"))
    q.awaitTermination(120000)
    ManifestLake.compactClustered(spark, dir, "k", 64L * 1024 * 1024, "clu")
    val q2 = sink()
    in.addData((4L, "a", "x3"), (5L, "b", "x2"))
    q2.awaitTermination(120000)
    val merged = NdvStats.mergedSketch(spark, dir, "u", K)
      .collect()(0).getSeq[String](0)
    assert(merged == directSketch(dir),
      "streamed + compacted stats diverge from the direct sketch")
  }

  test("estimate invariant under compaction (new files, same value set)") {
    val dir = Files.createTempDirectory("graft-ndv").toString
    load(dir, 4)
    val pre = NdvStats.mergedSketch(spark, dir, "u", K)
      .collect()(0).getSeq[String](0)
    ManifestLake.compactSmall(spark, dir, "k", 64L * 1024 * 1024, "opt")
    val post = NdvStats.mergedSketch(spark, dir, "u", K)
      .collect()(0).getSeq[String](0)
    assert(post == pre, "compaction changed the table-level sketch")
    // compacted files are NEW paths — they were sketched fresh
    val side = NdvStats.ensure(spark, dir, "u", K)
    assert(side.filter(col("file_key").contains("/opt-")).count() == 2)
  }
}
