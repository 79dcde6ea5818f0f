package graft

import java.nio.file.Files

import graft.streaming.RateIngest
import org.apache.spark.sql.functions._

/** [[RateIngest]] — Kafka-shaped offset-tracked micro-batch ingest:
  * deterministic offset→content, idempotent per-offset ledger commits
  * under redelivery, restart-from-checkpoint offset resume. These are
  * the process-death semantics the stream_rate_offsets oracle can't
  * see. */
class RateIngestSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val Rows = 40

  private def ledgerMap(root: String): Map[Long, (Long, Long, Long)] =
    RateIngest.ledger(spark, root)
      .select(col("batch_id"), col("n_rows"), col("sum_value"),
        col("sum_tokens"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("three batches: offset-derived content, ledger matches the arithmetic") {
    val root = Files.createTempDirectory("graft-rate").toString
    RateIngest.runBatches(spark, sfDir, root, 3, Rows)
    val led = ledgerMap(root)
    assert(Set(0L, 1L, 2L).subsetOf(led.keySet))
    (0L to 2L).foreach { b =>
      val (n, sv, _) = led(b)
      assert(n == Rows)
      val lo = b * Rows; val hi = lo + Rows - 1
      assert(sv == (lo + hi) * Rows / 2,
        s"batch $b sum_value: got $sv")
    }
  }

  test("redelivery is a no-op: a replayed batch cannot overwrite its commit") {
    val root = Files.createTempDirectory("graft-rate-redeliver").toString
    RateIngest.runBatches(spark, sfDir, root, 2, Rows)
    val before = ledgerMap(root)(1L)
    // redeliver batch 1 with WRONG content (a poisoned replay): the
    // committed ledger row must win — first writer per offset range
    import spark.implicits._
    val poisoned = Seq(999999L, 999998L).toDF("value")
    val did = RateIngest.commitBatch(spark, sfDir, root, poisoned, 1L)
    assert(!did, "redelivered batch must be skipped, not re-committed")
    assert(ledgerMap(root)(1L) == before)
  }

  test("restart from checkpoint resumes at the next offset, old commits untouched") {
    val root = Files.createTempDirectory("graft-rate-restart").toString
    RateIngest.runBatches(spark, sfDir, root, 2, Rows)
    val before = (0L to 1L).map(b => b -> ledgerMap(root)(b)).toMap
    // second drain, SAME checkpoint: the source must resume at batch 2
    // (offset recovery), not restart at 0 — and batches 0-1 stay as
    // committed
    RateIngest.runBatches(spark, sfDir, root, 4, Rows)
    val led = ledgerMap(root)
    (0L to 1L).foreach(b => assert(led(b) == before(b)))
    (2L to 3L).foreach { b =>
      val lo = b * Rows; val hi = lo + Rows - 1
      assert(led(b)._2 == (lo + hi) * Rows / 2,
        s"resumed batch $b must carry the NEXT offset range's values")
    }
  }

  test("a torn commit (dir without _SUCCESS) is rewritten by the replay") {
    val root = Files.createTempDirectory("graft-rate-torn").toString
    RateIngest.runBatches(spark, sfDir, root, 1, Rows)
    // simulate a torn batch-1 write: data present, no _SUCCESS marker
    import spark.implicits._
    val torn = new java.io.File(s"$root/ledger/batch-1")
    Seq((1L, 0L, 0L, 0L, 0L))
      .toDF("batch_id", "n_rows", "n_matched", "sum_value", "sum_tokens")
      .write.mode("overwrite").parquet(torn.toString)
    new java.io.File(torn, "_SUCCESS").delete()
    assert(!RateIngest.committedIds(spark, root).contains(1L))
    val redo = spark.range(Rows, 2L * Rows).select(col("id").as("value"))
    val did = RateIngest.commitBatch(spark, sfDir, root, redo, 1L)
    assert(did, "a torn (uncommitted) batch must be re-committed")
    val (n, sv, _) = ledgerMap(root)(1L)
    assert(n == Rows && sv == (Rows + 2 * Rows - 1) * Rows / 2)
  }
}
