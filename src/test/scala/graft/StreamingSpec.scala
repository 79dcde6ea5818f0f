package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming semantics: incremental execution of the SAME
  * transforms the batch suite uses, plus watermark-driven emission and
  * custom keyed state. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val eventsBatch1 = Seq(
    Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.50),
    Ev(2, ts("2024-01-01 10:20:00"), 1, "view", 2.25),
    Ev(3, ts("2024-01-01 10:40:00"), 2, "click", 4.00))
  private val eventsBatch2 = Seq(
    // advances event time far enough to close the 10:00 window
    Ev(4, ts("2024-01-01 13:30:00"), 1, "click", 8.00))

  test("tumblingHourly emits a closed window once the watermark passes") {
    // Default (continuous microbatch) trigger with processAllAvailable
    // barriers: guarantees batch1 and batch2 land in separate microbatches
    // so the watermark actually advances. (AvailableNow would terminate as
    // soon as the data present at start is consumed — racy vs. addData.)
    val mem = MemoryStream[Ev](spark)
    val q2 = EventStreams.tumblingHourly(mem.toDF())
      .writeStream.format("memory").queryName("tumbling2")
      .outputMode("append").start()
    mem.addData(eventsBatch1: _*)
    q2.processAllAvailable()
    mem.addData(eventsBatch2: _*)
    q2.processAllAvailable()
    // Closed windows are emitted by a trailing no-data microbatch that
    // processAllAvailable does not wait for — poll before stopping.
    val deadline = System.currentTimeMillis + 30000
    while (spark.table("tumbling2").count() < 2 &&
      System.currentTimeMillis < deadline) Thread.sleep(200)
    q2.stop()

    val rows = spark.table("tumbling2")
      .orderBy("win_start", "event_type").collect()
    // watermark = 13:30 - 2h = 11:30 > 11:00 → the 10:00 window is final
    assert(rows.map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      == Seq(("click", 2L, 5.50), ("view", 1L, 2.25)))
  }

  test("streaming and batch produce identical tumbling aggregates") {
    val batch = (eventsBatch1 ++ eventsBatch2).toDF()
    val fromBatch = EventStreams.tumblingHourly(batch)
      .orderBy("win_start", "event_type")
      .collect().map(_.toSeq).toSeq
    // batch execution of the same function ignores the watermark and
    // computes every window — the closed-window subset must agree with
    // what streaming emitted (asserted above); here we pin the full set.
    assert(fromBatch.size == 3)
    assert(fromBatch.map(_.apply(2)) == Seq(2L, 1L, 1L))
  }

  test("sessionized: gap > 30 min splits; events within gap merge") {
    val batch = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 7, "click", 1.00),
      Ev(2, ts("2024-01-01 10:20:00"), 7, "view", 2.00), // merges (gap 20m)
      Ev(3, ts("2024-01-01 11:30:00"), 7, "click", 3.00) // new session
    ).toDF()
    val rows = EventStreams.sessionized(batch)
      .orderBy("session_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_events") == 2)
    assert(rows(0).getAs[Timestamp]("session_end") == ts("2024-01-01 10:50:00"))
    assert(rows(1).getAs[Long]("n_events") == 1)
  }

  test("dropDuplicatesWithinWatermark emits each event_id once") {
    val mem = MemoryStream[Ev](spark)
    val q = EventStreams.dedupedEvents(mem.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    mem.addData(eventsBatch1: _*)
    q.processAllAvailable()
    mem.addData(eventsBatch1.head) // duplicate delivery, same batch window
    mem.addData(eventsBatch2: _*)
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("deduped").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L))
  }

  test("file source → file sink e2e: checkpointed recovery does not re-emit") {
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val outDir = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val schema = spark.createDataFrame(Seq.empty[Ev]).schema

    def start() = EventStreams.tumblingHourly(
        spark.readStream.schema(schema).parquet(inDir))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    def outRows(): Long =
      try spark.read.parquet(outDir).count() catch { case _: Throwable => 0L }

    // batch 1 lands, no window closes yet (watermark still behind)
    eventsBatch1.toDF().write.mode("append").parquet(inDir)
    val q1 = start()
    q1.processAllAvailable()
    // batch 2 advances the watermark past the 10:00 window
    eventsBatch2.toDF().write.mode("append").parquet(inDir)
    q1.processAllAvailable()
    val deadline = System.currentTimeMillis + 30000
    while (outRows() < 2 && System.currentTimeMillis < deadline) Thread.sleep(200)
    q1.stop()
    assert(outRows() == 2) // click+view aggregates of the closed 10:00 window

    // restart from the checkpoint: nothing new → nothing re-emitted
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(outRows() == 2)

    val rows = spark.read.parquet(outDir)
      .orderBy("win_start", "event_type").collect()
    assert(rows.map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      == Seq(("click", 2L, 5.50), ("view", 1L, 2.25)))
  }

  test("foreachBatch → keyed JDBC upsert: duplicate delivery converges to once") {
    import java.sql.DriverManager
    import graft.sinks.JdbcUpsert
    import org.apache.spark.sql.types._
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val url = "jdbc:derby:memory:streamdb;create=true"
    def q1(sql: String): Long = {
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery(sql)
        rs.next(); rs.getLong(1)
      } finally conn.close()
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("user_id", LongType),
      StructField("value", DoubleType)))
    JdbcUpsert.ensureTable(url, "stream_events", schema, Seq("event_id"),
      ifNotExistsSyntax = false)

    val mem = MemoryStream[Ev](spark)
    val q = mem.toDF().select(col("event_id"), col("user_id"), col("value"))
      .writeStream
      .foreachBatch(JdbcUpsert.streamWriter(url, "stream_events",
        Seq("event_id"), JdbcUpsert.AnsiMerge()))
      .outputMode("append").start()
    mem.addData(eventsBatch1: _*)
    q.processAllAvailable()
    assert(q1("SELECT COUNT(*) FROM stream_events") == 3)
    // at-least-once delivery: a replayed event plus new data — the keyed
    // upsert absorbs the duplicate, the new row lands
    mem.addData(eventsBatch1.head)
    mem.addData(eventsBatch2: _*)
    q.processAllAvailable()
    q.stop()
    assert(q1("SELECT COUNT(*) FROM stream_events") == 4)
    assert(q1("SELECT COUNT(*) FROM stream_events WHERE event_id = 1") == 1)
  }

  test("stream-stream interval join pairs purchases with in-window clicks") {
    val mem = MemoryStream[Ev](spark)
    val q = EventStreams.clickToPurchase(mem.toDF())
      .writeStream.format("memory").queryName("c2p")
      .outputMode("append").start()
    mem.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 10:30:00"), 1, "purchase", 9.0), // joins click 1
      Ev(3, ts("2024-01-01 09:00:00"), 2, "click", 1.0),
      Ev(4, ts("2024-01-01 10:30:00"), 2, "purchase", 9.0), // click too old
      Ev(5, ts("2024-01-01 10:40:00"), 3, "purchase", 9.0)) // no click
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("c2p")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(rows == Seq((2L, 1L)))
  }

  test("flatMapGroupsWithState keeps per-user running totals across batches") {
    val mem = MemoryStream[Ev](spark)
    val q = EventStreams.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    mem.addData(eventsBatch1: _*)
    q.processAllAvailable()
    mem.addData(eventsBatch2: _*)
    q.processAllAvailable()
    q.stop()
    val last = spark.table("running")
      .groupBy("user_id").agg(max("n_events").as("n"), max("sum_value").as("s"))
      .orderBy("user_id").collect()
    assert(last.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      == Seq((1L, 3L, 11.75), (2L, 1L, 4.00)))
  }

  test("transformWithState matches the flatMapGroupsWithState twin") {
    // transformWithState runs only on the RocksDB state-store provider
    // (named typed state slots + changelog checkpointing); scope the
    // provider override to this query and restore the default after.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev](spark)
      val q = EventStreams.runningTotalsTws(mem.toDS())
        .writeStream.format("memory").queryName("running_tws")
        .outputMode("update").start()
      mem.addData(eventsBatch1: _*)
      q.processAllAvailable()
      mem.addData(eventsBatch2: _*)
      q.processAllAvailable()
      q.stop()
      val last = spark.table("running_tws")
        .groupBy("user_id").agg(max("n_events").as("n"), max("sum_value").as("s"))
        .orderBy("user_id").collect()
      // identical to the flatMapGroupsWithState totals above
      assert(last.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        == Seq((1L, 3L, 11.75), (2L, 1L, 4.00)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
