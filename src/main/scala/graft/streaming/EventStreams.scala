package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming mirror of the batch event-time suite
  * (graft.queries.Events). Every transform here is a plain
  * `DataFrame => DataFrame` over an `events`-shaped frame — the SAME
  * function serves `spark.read` (batch) and `spark.readStream`
  * (incremental); Catalyst plans the stateful version when the source is
  * streaming. That one-logical-plan/two-execution-modes property is the
  * whole point of mirroring batch semantics in Structured Streaming.
  *
  * Watermarks bound state: an aggregation over a watermarked column can
  * drop window state once event time passes window-end + delay — without
  * it, 100 TB of stream history accumulates in the state store.
  */
object EventStreams {
  private val D = DecimalType(18, 2)

  /** Tumbling 1h windows per event_type, 2h late-data allowance.
    * Streaming: append-mode emits each window once, on watermark pass. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Native session windows, 30-minute gap — the streaming twin of the
    * batch lag/cumsum idiom in Events.session (identical gap rule). */
  def sessionized(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Stream–stream interval join: each purchase joined to same-user
    * clicks at most 1 hour earlier. Both sides watermarked; the time
    * bound on the join condition is what lets Spark EVICT buffered click
    * state once the watermark passes click_ts + 1h — an unbounded-range
    * stream join would buffer both streams forever. Batch execution of
    * the same function degenerates to the bucketless range join. */
  def clickToPurchase(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Streaming exact dedup by event_id within the watermark horizon —
    * the at-least-once → effectively-once repair step in front of any
    * downstream aggregate. dropDuplicatesWithinWatermark keeps one state
    * entry per id only until the watermark passes it (bounded state; a
    * plain dropDuplicates on a stream would grow state forever). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  /** Custom keyed state: per-user running totals via
    * flatMapGroupsWithState (update mode) — the escape hatch for
    * semantics windowed aggregates can't express. State is one small
    * record per user; timeout config would evict idle users in a
    * production deployment. */
  def runningTotals(events: Dataset[Ev]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Ev], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var s = BigDecimal(prev.sum_value).setScale(2)
          batch.foreach { e =>
            n += 1
            s += BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          }
          val next = UserRunning(userId, n, s.toDouble)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** The same per-user running totals through Spark 4's
    * transformWithState — the successor API to (flat)MapGroupsWithState.
    * State is DECLARED as named typed slots on the processor handle
    * (value/list/map state, per-slot TTL policy) instead of one opaque
    * blob, so the runtime can evolve, expire, and inspect slots
    * independently; execution requires the RocksDB state-store provider
    * (changelog-checkpointed, spillable) — the store that actually holds
    * up when keyed state reaches 100 TB-cluster cardinalities.
    * Semantics are pinned to the flatMapGroupsWithState twin by
    * StreamingSpec (identical outputs, batch after batch). */
  class RunningTotalsProcessor extends StatefulProcessor[Long, Ev, UserRunning] {
    @transient private var totals: ValueState[UserRunning] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserRunning]("totals",
        Encoders.product[UserRunning], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val prev =
        if (totals.exists()) totals.get() else UserRunning(userId, 0L, 0.0)
      var n = prev.n_events
      var s = BigDecimal(prev.sum_value).setScale(2)
      rows.foreach { e =>
        n += 1
        s += BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      }
      val next = UserRunning(userId, n, s.toDouble)
      totals.update(next)
      Iterator.single(next)
    }
  }

  def runningTotalsTws(events: Dataset[Ev]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
