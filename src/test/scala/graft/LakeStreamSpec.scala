package graft

import java.nio.file.Files
import graft.streaming.LakeStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[LakeStream]] — streaming copy-on-write upsert: batches merge by
  * key, replays converge, untouched partitions stay untouched. */
class LakeStreamSpec extends SparkSpec {

  import spark.implicits._

  case class Rec(k: Long, p: String, v: Double)
  case class KV(k: Long, v: Long)

  test("streaming merges upsert into the partitioned table and converge on replay") {
    val dir = Files.createTempDirectory("graft-lakestream").toString
    val ckpt = Files.createTempDirectory("graft-lakestream-ckpt").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(dir)

    val mem = MemoryStream[Rec](spark)
    val q = LakeStream.start(mem.toDF(), dir, "p", "k", ckpt)
    try {
      // batch 1: update k=2, insert k=3 into a NEW partition
      mem.addData(Rec(2L, "b", 99.0), Rec(3L, "c", 30.0))
      q.processAllAvailable()
      def table(): Seq[(Long, String, Double)] =
        graft.ops.CopyOnWrite.read(spark, dir)
          .select(col("k"), col("p"), col("v")).as[(Long, String, Double)]
          .collect().sortBy(_._1).toSeq
      assert(table() == Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)))
      // batch 2 replays batch 1's rows (at-least-once) plus one new row:
      // the keyed merge absorbs the duplicates
      mem.addData(Rec(2L, "b", 99.0), Rec(3L, "c", 30.0), Rec(4L, "a", 40.0))
      q.processAllAvailable()
      assert(table() == Seq(
        (1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0), (4L, "a", 40.0)))

      // --- the manifest chain: one committed version per micro-batch,
      // each a complete consistent snapshot of its batch boundary
      import graft.ops.Manifest
      assert(Manifest.versions(spark, dir) == Seq(0, 1))
      def snapshot(v: Int): Seq[(Long, Double)] =
        spark.read.parquet(Manifest.read(spark, dir, v).map(_.path): _*)
          .select(col("k"), col("v")).as[(Long, Double)]
          .collect().sortBy(_._1).toSeq
      // v1 = current table state
      assert(snapshot(1) == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))
      // v0 = the state at batch 1's boundary — batch 2 later rewrote
      // partitions a/b/c, but archive mode + manifest pointer remap
      // keep the old snapshot fully readable (streaming time travel)
      assert(snapshot(0) == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
      // a third batch extends the chain
      mem.addData(Rec(5L, "c", 50.0))
      q.processAllAvailable()
      assert(Manifest.versions(spark, dir) == Seq(0, 1, 2))
      assert(snapshot(2) == Seq(
        (1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)))
      assert(snapshot(0) == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
    } finally q.stop()
  }

  test("streaming write-audit-publish: batches stage on a branch, main moves only on publish") {
    import graft.ops.Manifest
    val dir = Files.createTempDirectory("graft-wapstream").toString
    val ckpt = Files.createTempDirectory("graft-wapstream-ckpt").toString
    // base table + refs: main serves, staging takes the stream
    spark.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    Manifest.createBranch(spark, dir, "main", Manifest.collectStats(
      spark, Manifest.dataFiles(spark, s"$dir/data"), "k"))
    Manifest.branchFrom(spark, dir, "staging", from = "main")

    def refCount(name: String): Long = spark.read
      .parquet(Manifest.readRef(spark, dir, name).map(_.path): _*).count()

    val mem = MemoryStream[KV](spark)
    val q = LakeStream.startStagedAppend(mem.toDF(), dir, "k", ckpt)
    try {
      mem.addData(KV(100L, 200L), KV(101L, 202L))
      q.processAllAvailable()
      mem.addData(KV(102L, 204L))
      q.processAllAvailable()
      // every batch advanced staging; main never moved
      assert(refCount("staging") == 103L)
      assert(refCount("main") == 100L)
      assert(Manifest.refHead(spark, dir, "staging").get._1 == 2)
      assert(Manifest.refHead(spark, dir, "main").get._1 == 0)

      // audit the staging read, then publish: one CAS pointer move
      // sharing the audited snapshot by name
      val audited = Manifest.refHead(spark, dir, "staging").get._2
      assert(spark.read
        .parquet(Manifest.readRef(spark, dir, "staging").map(_.path): _*)
        .filter(col("v") =!= col("k") * 2).count() == 0L)
      assert(Manifest.fastForward(spark, dir, "main", from = "staging").isRight)
      assert(refCount("main") == 103L)
      assert(Manifest.refHead(spark, dir, "main").get._2 == audited)
    } finally q.stop()
  }
}
