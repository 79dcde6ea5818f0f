package graft

import java.nio.file.Files
import graft.ops.{Manifest, ManifestLake}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** [[ManifestLake.appendCommit]] + [[ManifestLake.compactSmall]] — the
  * ingest fast path and the maintenance job that repays it. The gate
  * (`lake_compact_small`) proves the rewrite is semantics-preserving
  * against the DuckDB oracle; this spec pins the physical claims the
  * oracle cannot see: O(delta) appends share history by name, bins
  * collapse file counts without crossing partitions or the byte cap,
  * delete-vector-addressed files are left alone, and time travel to a
  * pre-compaction version still reads the original files verbatim. */
class CompactSmallSpec extends SparkSpec {

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

  /** 6 appends × 2 partitions, 2 rows each — 12 small files. */
  private def chunkedLoad(dir: String): Seq[(Long, String, Double)] = {
    val rows = for (i <- 0L until 12L; p = if (i % 2 == 0) "a" else "b")
      yield (i, p, i * 1.5)
    rows.grouped(2).zipWithIndex.foreach { case (chunk, i) =>
      ManifestLake.appendCommit(spark, dir, "p", "k",
        chunk.toDF("k", "p", "v"), s"chunk-$i")
    }
    rows.sortBy(_._1)
  }

  test("appendCommit is O(delta): prior files shared by name, untouched") {
    val dir = Files.createTempDirectory("graft-cmp").toString
    val rows = chunkedLoad(dir)
    assert(Manifest.currentListVersion(spark, dir) == 5)
    assert(table(dir) == rows)
    // every chunk's files survive verbatim: 6 commits x 2 partitions
    val entries = dataEntries(dir, 5)
    assert(entries.size == 12, s"expected 12 small files, got ${entries.size}")
    // v0's manifest rides into v5 BY NAME (never rewritten: appends
    // carry zero removes, so commitDelta shares every prior manifest)
    val names0 = Manifest.readList(spark, dir, 0).map(_.name).toSet
    val names5 = Manifest.readList(spark, dir, 5).map(_.name).toSet
    assert(names0.subsetOf(names5))
  }

  test("compactSmall packs per partition, preserves rows, keeps history") {
    val dir = Files.createTempDirectory("graft-cmp").toString
    val rows = chunkedLoad(dir)
    val before = dataEntries(dir, 5)
    val stamps = before.map(e =>
      e.path -> fs.getFileStatus(new Path(e.path)).getModificationTime).toMap
    val v = ManifestLake.compactSmall(spark, dir, "k",
      64L * 1024 * 1024, "opt")
    assert(v == 6)
    // 12 files -> 1 per partition; bins never cross partition values
    val after = dataEntries(dir, v)
    assert(after.size == 2, s"expected 2 packed files, got ${after.size}")
    assert(after.map(e => partOf(e.path)).sorted == Seq("a", "b"))
    // rows identical through the rewrite
    assert(table(dir, v) == rows)
    // pre-compaction version still reads the ORIGINAL files, untouched
    assert(table(dir, 5) == rows)
    assert(dataEntries(dir, 5).map(_.path).toSet == before.map(_.path).toSet)
    stamps.foreach { case (p, t) =>
      assert(fs.getFileStatus(new Path(p)).getModificationTime == t, p)
    }
    // stats survive: packed entries carry real key spans for pruning
    val spanA = after.find(e => partOf(e.path) == "a").get
    assert(spanA.minKey == 0L && spanA.maxKey == 10L)
    // idempotent: nothing left to pack
    assert(ManifestLake.compactSmall(spark, dir, "k",
      64L * 1024 * 1024, "opt2") == v)
  }

  test("byte cap bounds each bin; sub-cap singletons are not rewritten") {
    val dir = Files.createTempDirectory("graft-cmp").toString
    chunkedLoad(dir)
    val sizes = dataEntries(dir, 5).map(_.bytes)
    // target fits at most two of the (near-uniform) files per bin
    val target = (sizes.max * 2.2).toLong
    val v = ManifestLake.compactSmall(spark, dir, "k", target, "opt")
    val after = dataEntries(dir, v)
    // 6 per partition packed pairwise -> 3 per partition
    assert(after.size == 6, s"expected 6 bins, got ${after.size}")
    assert(after.groupBy(e => partOf(e.path)).values.forall(_.size == 3))
  }

  test("compaction races a live append: CAS serializes, nothing lost") {
    val dir = Files.createTempDirectory("graft-cmp").toString
    val rows = chunkedLoad(dir)
    val extra = Seq((100L, "a", 1.0), (101L, "b", 2.0))
    // the maintenance job and the ingest path CAS against the same
    // head: whoever loses replans/retries; both commits must land and
    // neither may drop the other's files from the final list
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fAppend = Future(ManifestLake.appendCommit(spark, dir, "p", "k",
      extra.toDF("k", "p", "v"), "live-append"))
    val fCompact = Future(ManifestLake.compactSmall(spark, dir, "k",
      64L * 1024 * 1024, "opt"))
    val (vA, vC) = (Await.result(fAppend, 120.seconds),
      Await.result(fCompact, 120.seconds))
    pool.shutdown()
    assert(Set(vA, vC) == Set(6, 7), s"expected versions {6,7}, got {$vA,$vC}")
    assert(table(dir) == (rows ++ extra).sortBy(_._1))
    // the head accounts for every row exactly once
    val head = Manifest.currentListVersion(spark, dir)
    assert(dataEntries(dir, head).map(_.rows).sum == 14)
  }

  test("streaming ingest drains into appendCommit; compaction mid-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-cmp").toString
    val ckpt = Files.createTempDirectory("graft-cmp-ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Double)]
    // the appendCommit fast path as a streaming sink: one O(delta)
    // commit per micro-batch, tagged by batch id — no partition rewrite
    val q = in.toDF().toDF("k", "p", "v").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ManifestLake.appendCommit(batch.sparkSession, dir, "p", "k",
          batch, s"batch-$id")
        ()
      }
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    in.addData((0L, "a", 0.0), (1L, "b", 1.5))
    in.addData((2L, "a", 3.0), (3L, "b", 4.5))
    q.awaitTermination(120000)
    val v = ManifestLake.compactSmall(spark, dir, "k",
      64L * 1024 * 1024, "opt")
    // a later micro-batch appends AFTER compaction — segments coexist
    val q2 = in.toDF().toDF("k", "p", "v").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ManifestLake.appendCommit(batch.sparkSession, dir, "p", "k",
          batch, s"batch-$id")
        ()
      }
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    in.addData((4L, "a", 6.0), (5L, "b", 7.5))
    q2.awaitTermination(120000)
    assert(table(dir) == (0L until 6L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", i * 1.5)))
    assert(Manifest.currentListVersion(spark, dir) > v)
  }

  test("delete-vector-addressed files are excluded; compactions compose") {
    val dir = Files.createTempDirectory("graft-cmp").toString
    val rows = chunkedLoad(dir)
    ManifestLake.deleteWhere(spark, dir, col("k") === 4L, "d1")
    val dirtyHead = Manifest.currentListVersion(spark, dir)
    val dirtyPath = dataEntries(dir, dirtyHead)
      .find(e => e.minKey <= 4L && e.maxKey >= 4L && partOf(e.path) == "a")
      .get.path
    val v = ManifestLake.compactSmall(spark, dir, "k",
      64L * 1024 * 1024, "opt")
    val after = dataEntries(dir, v)
    // the dirty file rides along unpacked; its vector still applies
    assert(after.map(_.path).contains(dirtyPath))
    assert(after.size == 3, s"2 packed + 1 dirty, got ${after.size}")
    val expect = rows.filterNot(_._1 == 4L)
    assert(table(dir, v) == expect)
    // compactDeletes then folds the vector into the (packed) table
    val v2 = ManifestLake.compactDeletes(spark, dir, "p", "k", "fold")
    assert(table(dir, v2) == expect)
    assert(!Manifest.readAll(spark, dir, v2).exists(_.path.contains("/deletes/")))
  }
}
