package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Kafka-shaped micro-batch ingestion: an OFFSET-TRACKED unbounded
  * source drained in micro-batches, each batch committed to a
  * downstream ledger EXACTLY ONCE under at-least-once delivery.
  *
  * The reference pipeline is explicitly batch
  * (/root/reference/docs/documentation.md:35-39); this is the shape it
  * grows into when the CSV drop-folder becomes a message bus. Spark's
  * `rate-micro-batch` source stands in for a Kafka topic — it has the
  * two properties that make Kafka integration hard and make this a
  * faithful rehearsal: (1) batch N's CONTENT is a pure function of its
  * OFFSET RANGE (values `[N·rows, (N+1)·rows)`), exactly like a Kafka
  * partition's `[startOffset, endOffset)` slice, and (2) the engine
  * checkpoint only records offsets, so a restart REDELIVERS the last
  * uncommitted batch — the sink, not the source, owns effectively-once.
  *
  * The sink side is the documented production pattern for
  * `foreachBatch` (Spark Structured Streaming guide, "obtain
  * deduplicated output" / idempotent writes by batchId): the ledger
  * commit for batch N is a directory keyed BY N whose `_SUCCESS`
  * marker is the commit point — a redelivered batch sees the marker
  * and no-ops, a torn write (dir without marker) is overwritten by the
  * replay. First writer wins per offset range; replays converge.
  *
  * Per-batch work is deliberately a real distributed enrichment, not a
  * pass-through: the batch's offset range derives a doc_id window, the
  * `documents` scan is PRUNED to that window (range predicate pushed to
  * parquet row groups — an O(delta) tick against a 100 TB corpus), and
  * the batch aggregates land as one ledger row. At 100 TB this is a
  * Kafka → lakehouse bronze-tier ingest: offsets → idempotent
  * partition commits, checkpoint restart → offset resume (pinned by
  * RateIngestSpec), no state on any executor.
  */
object RateIngest {

  /** Committed ledger batch ids (dirs with a `_SUCCESS` marker). */
  def committedIds(spark: SparkSession, root: String): Seq[Long] = {
    val p = new Path(s"$root/ledger")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(d => d.getName.startsWith("batch-") &&
        fs.exists(new Path(d, "_SUCCESS")))
      .flatMap(d => scala.util.Try(
        d.getName.stripPrefix("batch-").toLong).toOption)
      .sorted
  }

  /** Idempotent ledger commit for one micro-batch. Returns false (and
    * does NO work — not even the enrichment scan) when batch `id` is
    * already committed: that is the redelivery path, and doing the
    * work again before noticing would turn "effectively once" into
    * "at least once with matching results", which breaks the moment a
    * batch's work has side effects. The enrichment joins the batch's
    * values against `documents` doc_ids with the range predicate
    * derived FIRST, so the corpus scan is partition-pruned to the
    * batch's window. */
  def commitBatch(spark: SparkSession, dir: String, root: String,
      batch: DataFrame, id: Long): Boolean = {
    val out = new Path(s"$root/ledger/batch-$id")
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(out, "_SUCCESS"))) return false
    val vals = batch.select(col("value").cast("long").as("value"))
    // one-row bounds aggregate (broadcastable) — NEVER a driver collect
    // of the batch; the batch is small here but the pattern must hold
    // when a batch is a billion Kafka records
    val bounds = vals.agg(
      min(col("value")).as("lo"), max(col("value")).as("hi"),
      count(lit(1)).as("n_rows"), sum(col("value")).as("sum_value"))
    val Array(b) = bounds.collect() // 1 row by construction
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    // enrichment scan PRUNED to the batch's offset-derived window: the
    // range predicate reaches the parquet row groups, so a tick reads
    // O(delta) of the corpus no matter how big the corpus is
    val docs = graft.T.documents(spark, dir)
      .filter(col("doc_id") >= lo && col("doc_id") <= hi)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val matched = vals.join(docs, col("value") === col("doc_id"))
      .agg(count(lit(1)).as("n_matched"),
        coalesce(sum(col("toks")), lit(0L)).as("sum_tokens"))
    val row = bounds.crossJoin(matched) // 1×1 — a literal join, not data
      .select(lit(id).cast("long").as("batch_id"),
        col("n_rows").cast("long"),
        col("n_matched").cast("long"),
        col("sum_value").cast("long"),
        col("sum_tokens").cast("long"))
    row.coalesce(1).write.mode("overwrite").parquet(out.toString)
    true
  }

  /** Start the offset-tracked ingest: `rate-micro-batch` (batch N =
    * values `[N·rowsPerBatch, (N+1)·rowsPerBatch)`, the deterministic
    * offset→content contract) into the idempotent ledger sink. */
  def start(spark: SparkSession, dir: String, root: String,
      rowsPerBatch: Int): StreamingQuery =
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("startTimestamp", "0")
      .option("advanceMillisPerBatch", "1000")
      .load()
      .writeStream
      .option("checkpointLocation", s"$root/chk")
      .foreachBatch { (b: DataFrame, id: Long) =>
        commitBatch(b.sparkSession, dir, root, b, id)
        ()
      }
      .start()

  /** Drain the stream until ledger batches `0..n-1` are committed,
    * then stop. The source is unbounded (like the topic it stands in
    * for) — "done" is a LEDGER predicate, not source exhaustion. */
  def runBatches(spark: SparkSession, dir: String, root: String,
      n: Int, rowsPerBatch: Int, timeoutMs: Long = 120000L): Unit = {
    val need = (0L until n.toLong).toSet
    if (need.subsetOf(committedIds(spark, root).toSet)) return
    val q = start(spark, dir, root, rowsPerBatch)
    try {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (!need.subsetOf(committedIds(spark, root).toSet)) {
        if (System.nanoTime() > deadline)
          throw new IllegalStateException(
            s"rate ingest: batches $need not committed in ${timeoutMs}ms " +
              s"(have ${committedIds(spark, root).mkString(",")})")
        // poll, don't processAllAvailable(): an unbounded source always
        // has "more available", so that call would never return — the
        // default trigger is already draining batch after batch
        Thread.sleep(100)
      }
    } finally q.stop()
  }

  /** The committed ledger (batch_id, n_rows, n_matched, sum_value,
    * sum_tokens). */
  def ledger(spark: SparkSession, root: String): DataFrame = {
    val dirs = committedIds(spark, root)
      .map(id => s"$root/ledger/batch-$id")
    if (dirs.isEmpty)
      spark.range(0).select(col("id").as("batch_id"),
        col("id").as("n_rows"), col("id").as("n_matched"),
        col("id").as("sum_value"), col("id").as("sum_tokens")).limit(0)
    else spark.read.parquet(dirs: _*)
  }
}
