package graft

import java.nio.file.Files

import graft.streaming.DedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[DedupStream]] — streaming near-dup dedup at ingest:
  * first-writer-wins against the accepted corpus, min-id-wins within a
  * batch, replay-idempotent, candidates off the per-batch signature
  * segments only. */
class DedupStreamSpec extends SparkSpec {

  import spark.implicits._
  import DedupStreamSpec.Doc

  private def words(tag: String, n: Int): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")
  private val tA = words("apple", 50)
  // near-dup of tA: one word swapped mid-text (jaccard ≈ 0.89)
  private val tA2 = tA.replace("apple25", "pear25")
  private val tB = words("bridge", 50)
  private val tC = words("cobalt", 50)
  private val tD = words("dune", 50)
  private val tE = words("ember", 50)

  private def acceptedIds(dir: String): Set[Long] =
    DedupStream.accepted(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet

  test("first-writer-wins across batches, min-id within a batch, chains collapse") {
    val dir = Files.createTempDirectory("graft-dedupstream").toString
    val ckpt = Files.createTempDirectory("graft-dedupstream-ckpt").toString
    val mem = MemoryStream[Doc](spark)
    val q = DedupStream.start(mem.toDF(), dir, ckpt)
    try {
      // batch 0: 3 is an exact dup of 1 (min id 1 survives); 2 unique
      mem.addData(Doc(1L, tA), Doc(2L, tB), Doc(3L, tA))
      q.processAllAvailable()
      assert(acceptedIds(dir) == Set(1L, 2L))

      // batch 1: doc 0 is a NEAR dup of corpus doc 1 — dropped even
      // though its id is SMALLER (first-writer-wins, not global-min);
      // 13 exact-dups corpus 2 — dropped; 11 is new; 12 dups 11
      // within-batch (11 survives); chain 30≈31≈32 keeps 30
      mem.addData(Doc(0L, tA2), Doc(11L, tC), Doc(12L, tC), Doc(13L, tB),
        Doc(30L, tE), Doc(31L, tE), Doc(32L, tE))
      q.processAllAvailable()
      assert(acceptedIds(dir) == Set(1L, 2L, 11L, 30L))
    } finally q.stop()

    // restart from the same checkpoint: batch 2 dedups against
    // everything batches 0–1 accepted
    val q2 = DedupStream.start(mem.toDF(), dir, ckpt)
    try {
      mem.addData(Doc(20L, tD), Doc(21L, tA))
      q2.processAllAvailable()
      assert(acceptedIds(dir) == Set(1L, 2L, 11L, 30L, 20L))
      // texts stored are the survivors' own
      val kept = DedupStream.accepted(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(kept(1L) == tA && kept(20L) == tD)
    } finally q2.stop()

    // replayed batch converges: re-running an already-applied batch id
    // overwrites its own output from unchanged inputs — same corpus
    val before = acceptedIds(dir)
    DedupStream.acceptBatch(spark, dir,
      Seq(Doc(20L, tD), Doc(21L, tA)).toDF(), 2L)
    assert(acceptedIds(dir) == before, "replayed batch must converge")
  }

  test("segment compaction: same accepted set before and after, covered tiers dropped") {
    val dir = Files.createTempDirectory("graft-dedupstream3").toString
    DedupStream.acceptBatch(spark, dir,
      Seq(Doc(1L, tA), Doc(2L, tB), Doc(3L, tA)).toDF(), 0L)
    DedupStream.acceptBatch(spark, dir,
      Seq(Doc(10L, tA2), Doc(11L, tC)).toDF(), 1L)
    assert(acceptedIds(dir) == Set(1L, 2L, 11L))
    // compact the committed batches into the partitioned index tier
    val idx = DedupStream.compactSegments(spark, dir, through = 1L)
    assert(idx.isDefined)
    assert(new java.io.File(s"$dir/index-v1/_SUCCESS").exists())
    assert(!new java.io.File(s"$dir/sigs/batch-0").exists() &&
      !new java.io.File(s"$dir/sigs/batch-1").exists(),
      "covered segments must be dropped after the index commits")
    // the next tick dedups against the compacted index exactly as it
    // would have against the segments
    DedupStream.acceptBatch(spark, dir,
      Seq(Doc(20L, tC), Doc(21L, tD)).toDF(), 2L)
    assert(acceptedIds(dir) == Set(1L, 2L, 11L, 21L),
      "20 must still lose to corpus doc 11 through the compacted index")
    // idempotent re-compaction, and a second level folds index + newer
    // segments together
    assert(DedupStream.compactSegments(spark, dir, 1L).isDefined)
    DedupStream.compactSegments(spark, dir, 2L)
    assert(new java.io.File(s"$dir/index-v2/_SUCCESS").exists())
    assert(!new java.io.File(s"$dir/index-v1").exists(),
      "older index dropped once superseded")
    DedupStream.acceptBatch(spark, dir, Seq(Doc(30L, tB)).toDF(), 3L)
    assert(acceptedIds(dir) == Set(1L, 2L, 11L, 21L))
  }

  test("short docs (under 3 tokens) are never near-dup candidates") {
    val dir = Files.createTempDirectory("graft-dedupstream2").toString
    DedupStream.acceptBatch(spark, dir,
      Seq(Doc(1L, "hi"), Doc(2L, "hi"), Doc(3L, tA)).toDF(), 0L)
    // both "hi" docs survive — no shingles, no candidates, no claim
    assert(acceptedIds(dir) == Set(1L, 2L, 3L))
  }
}

object DedupStreamSpec {
  case class Doc(doc_id: Long, text: String)
}
