package graft.queries

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time processing over the events table (SURVEY §2b B14/B15):
  * tumbling + sliding windows, gap-based sessionization, JSON prop
  * extraction, and per-user funnel transitions — all as batch queries
  * whose window semantics mirror Structured Streaming's (`window()` is
  * the same function in both modes; the streaming mirror lives in
  * graft.streaming).
  *
  * Oracle-parity: epoch-aligned `window(ts, "1 hour")` starts ≡ DuckDB
  * `date_trunc('hour', ts)`; value sums fold through DECIMAL(18,2)
  * (order-independent) and surface as double; session/gap arithmetic is
  * integer microseconds (`unix_micros` ⇔ `epoch_us`).
  *
  * 100 TB shape: every query is one shuffle on its natural key
  * (window-start / user_id) with map-side partial aggregation; the
  * sessionizer's per-user sort is bounded by per-user event counts, and
  * user_id-skew falls to AQE. No driver materialization anywhere.
  */
object Events {
  private val D = DecimalType(18, 2)
  private def dsum(c: Column) = sum(c.cast(D)).cast("double")

  private def ev(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.events(spark, dir)
  }

  // -------------------------------------------------------------------
  // events_tumbling_hourly — tumbling 1h window × event_type (B15).
  private def tumbling(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  private val tumblingSql =
    """SELECT date_trunc('hour', ts) AS win_start, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  // -------------------------------------------------------------------
  // events_sliding_2h — sliding 2h window, 1h slide: each event lands in
  // two epoch-aligned windows. Oracle expands the membership explicitly.
  private def sliding(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("n_events"),
        col("sum_value"))
      .orderBy(col("win_start"))

  private val slidingSql =
    """WITH w AS (
      |  SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
      |                 date_trunc('hour', ts)]) AS win_start, value
      |  FROM events)
      |SELECT win_start, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM w GROUP BY win_start ORDER BY win_start""".stripMargin

  // -------------------------------------------------------------------
  // events_session — gap-based sessionization, 30-minute inactivity gap:
  // lag → new-session flag → running sum = session id (the batch idiom
  // for session windows; `session_window()` is the streaming twin).
  private def session(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > lit(1800L * 1000000L), 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .cast("double") / lit(1e6)).as("duration_s"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  private val sessionSql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM g)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS DOUBLE) / 1e6 AS duration_s,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  // -------------------------------------------------------------------
  // events_session_native — the same sessionization through Spark's OWN
  // session_window() API (batch mode; identical function in Structured
  // Streaming, where it additionally merges across micro-batches under a
  // watermark). Semantics differ from the manual gap idiom at exactly
  // one boundary: session_window closes when the NEXT event starts ≥
  // gap after the current one (the manual spelling keeps strictly->gap
  // pairs together), so the oracle replays the ≥ rule. session_end is
  // last_event + gap by definition — also replayed. Physical shape:
  // Spark plans UpdatingSessionsExec / MergingSessionsExec over one
  // shuffle on user_id — same scale story as the manual window pass.
  private def sessionNative(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  private val sessionNativeSql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM g)
      |SELECT user_id,
      |  MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_start""".stripMargin

  // -------------------------------------------------------------------
  // events_scd2_state — slowly-changing-dimension type-2 build from the
  // event stream: per user, consecutive runs of the same event_type
  // collapse into one validity interval [valid_from, valid_to) with a
  // dense version number and an is_current flag (valid_to NULL = open).
  // This is the CDC→dimension-history shape every warehouse needs
  // (reference csv_2_db_pipeline's upsert keeps only the LATEST row per
  // key — SCD2 is the "keep the whole history queryable" upgrade), and
  // the natural batch twin of transformWithState's per-key state
  // timeline. Point-in-time lookups against the result are the as-of
  // join (`join_asof_events`).
  //
  // 100 TB shape: two window passes over the SAME (user_id → ts,
  // event_id) ordering — one shuffle, one sort, both windows pipelined
  // in a single stage; per-user run-lengths bound the state. No
  // self-join against "the next change" (the O(n²) naive spelling).
  private def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  private val scd2Sql =
    """WITH r AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events),
      |runs AS (
      |  SELECT user_id, ts, event_id, event_type FROM r
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version,
      |  event_type, ts AS valid_from, lead(ts) OVER w AS valid_to,
      |  (lead(ts) OVER w IS NULL) AS is_current
      |FROM runs
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  // -------------------------------------------------------------------
  // events_drift_ks — two-sample Kolmogorov–Smirnov drift test between
  // the early and late halves of the stream: KS = max_v |F1(v) − F2(v)|
  // over the empirical CDFs of `value` — the distribution-drift monitor
  // a training-data pipeline runs on every new crawl/period before
  // mixing it in (mean/variance checks miss shape changes; KS doesn't).
  // Exact and engine-identical: values land on the 2dp cent grid, the
  // CDFs are integer counts, and the max runs over the CROSS-MULTIPLIED
  // form |f1·n2 − f2·n1| (one int64 max, no per-point division); the
  // single division happens once at the end, and the drift verdict
  // (KS > 0.1) is the all-integer compare 10·ks_num > n1·n2.
  //
  // Scale: two hash aggregates (events → per-cent counts) + one window
  // over the VALUE GRID — bounded by distinct 2dp values, never event
  // count — + a 1-row broadcast of the totals. (The cross-multiplied
  // int64 max holds to n1·n2 < 9e18, i.e. ~3e9 rows per side; past
  // that, scale the counts before crossing.)
  private def driftKs(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val grid = ev(spark, dir)
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        (col("ts") >= cut).as("late"))
      .groupBy(col("cents"))
      .agg(sum(when(!col("late"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("late"), 1L).otherwise(0L)).as("c2"))
    // declared single partition over the bounded value grid (pmod
    // constant key — see curate_token_budget)
    val w = Window.partitionBy(
        pmod(coalesce(col("cents"), lit(0L)), lit(1L)))
      .orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.select(
      sum(col("c1")).over(w).as("f1"), sum(col("c2")).over(w).as("f2"))
    val tot = grid.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .groupBy(col("n1"), col("n2"))
      .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
        .as("ks_num"))
      .select(col("n1"), col("n2"),
        round(col("ks_num").cast("double") /
          (col("n1").cast("double") * col("n2").cast("double")), 9).as("ks"),
        (lit(10) * col("ks_num") > col("n1") * col("n2")).as("drifted"))
  }

  private val driftKsSql =
    """WITH g AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END)
      |      AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c2
      |  FROM events GROUP BY cents),
      |c AS (
      |  SELECT SUM(c1) OVER w AS f1, SUM(c2) OVER w AS f2 FROM g
      |  WINDOW w AS (ORDER BY cents
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |        CAST(SUM(c2) AS BIGINT) AS n2 FROM g),
      |k AS (SELECT CAST(MAX(ABS(f1 * n2 - f2 * n1)) AS BIGINT) AS ks_num
      |      FROM c, t)
      |SELECT n1, n2,
      |  ROUND(CAST(ks_num AS DOUBLE)
      |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 9) AS ks,
      |  (10 * ks_num > n1 * n2) AS drifted
      |FROM k, t""".stripMargin

  // -------------------------------------------------------------------
  // events_drift_mix — the CATEGORICAL half of the drift family (KS
  // above is the continuous half): total-variation distance between the
  // early/late event-type mixes, TV = ½·Σ_types |p1 − p2| — the "did
  // the crawl's composition shift" check (domain mix, language mix,
  // event mix) run before blending a new period in. Same integer
  // discipline as the KS: per-type counts cross-multiplied against the
  // opposite total (|c1·n2 − c2·n1|, summed exactly), ONE division at
  // the end, and the verdict (TV > 0.05) as the all-integer compare
  // 10·tv_num > n1·n2. Two hash aggregates at |types| cardinality —
  // nothing here scales with event count but the first count pass.
  private def driftMix(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val g = ev(spark, dir)
      .select(col("event_type"), (col("ts") >= cut).as("late"))
      .groupBy(col("event_type"))
      .agg(sum(when(!col("late"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("late"), 1L).otherwise(0L)).as("c2"))
    val tot = g.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    g.crossJoin(broadcast(tot))
      .groupBy(col("n1"), col("n2"))
      .agg(sum(abs(col("c1") * col("n2") - col("c2") * col("n1")))
        .as("tv2num"))
      .select(col("n1"), col("n2"),
        round(col("tv2num").cast("double") /
          (lit(2.0) * col("n1").cast("double") * col("n2").cast("double")),
          9).as("tv"),
        (lit(10) * col("tv2num") > lit(2) * col("n1") * col("n2"))
          .as("drifted"))
  }

  private val driftMixSql =
    """WITH g AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END)
      |      AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c2
      |  FROM events GROUP BY event_type),
      |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |        CAST(SUM(c2) AS BIGINT) AS n2 FROM g),
      |k AS (SELECT CAST(SUM(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS tv2num
      |      FROM g, t)
      |SELECT n1, n2,
      |  ROUND(CAST(tv2num AS DOUBLE)
      |    / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 9) AS tv,
      |  (10 * tv2num > 2 * n1 * n2) AS drifted
      |FROM k, t""".stripMargin

  // -------------------------------------------------------------------
  // events_trailing_1h — EVENT-TIME range frame: for every event, the
  // count and value-sum of the same user's events in the trailing hour
  // (`RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW`) — the
  // rate-limit / fraud-velocity shape, and the window capability
  // window_range_frame's NUMERIC range doesn't cover: the frame is
  // bounded by the ORDER-BY VALUE (timestamps), not a row count, so
  // ts-ties are peers sharing one frame and the result needs no
  // tie-break to be deterministic. One shuffle + one sort per user;
  // the frame scan is the sliding two-pointer pass inside WindowExec,
  // O(events-in-hour) state per user.
  private def trailing1h(spark: SparkSession, dir: String): DataFrame = {
    ev(spark, dir).selectExpr(
      "user_id", "event_id", "ts",
      "CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) " +
        "AS BIGINT) AS n_1h",
      "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id " +
        "ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND " +
        "CURRENT ROW) AS DOUBLE) AS sum_1h")
      .orderBy(col("user_id"), col("event_id"))
  }

  private val trailing1hSql =
    """SELECT user_id, event_id, ts,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // -------------------------------------------------------------------
  // events_cdc_apply — CDC-log compaction: materialize the final
  // snapshot from an ordered op log with DELETE tombstones (the Kafka
  // log-compaction / Debezium-apply semantics — the "apply the change
  // stream to get current state" half of the lake family, where
  // `lake_merge_upsert` is the file-level twin and `lake_mor_diff`
  // emits the log). Op mapping over the events stream: 'error' rows are
  // tombstones, everything else upserts `value`. Last writer per key by
  // (ts, event_id) wins; a key whose LAST op is a tombstone vanishes
  // from the snapshot entirely — the semantics a plain
  // last-value-per-key groupBy gets wrong (it would resurrect the
  // pre-delete value).
  //
  // 100 TB shape: one shuffle on the key; ONE window pass computes both
  // the winner (row_number) and the op count (count over the unframed
  // partition) — no self-join of log against log, no global sort.
  /** The log-compaction core over any (user_id, ts, event_id, op,
    * value) frame — exposed for the property spec, which folds random
    * op logs in plain Scala and demands agreement. */
  private[graft] def cdcApplyOn(log: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    log
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops",
        count(lit(1)).over(Window.partitionBy(col("user_id"))).cast("long"))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("value").as("last_value"),
        col("ts").as("updated_at"), col("n_ops"))
      .orderBy(col("user_id"))
  }

  private def cdcApply(spark: SparkSession, dir: String): DataFrame =
    cdcApplyOn(ev(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
          .as("op"),
        col("value")))

  private val cdcApplySql =
    """WITH log AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, value
      |  FROM events),
      |r AS (
      |  SELECT user_id, ts, op, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops
      |  FROM log)
      |SELECT user_id, value AS last_value, ts AS updated_at, n_ops
      |FROM r WHERE rn = 1 AND op <> 'D'
      |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------------
  // events_user_timeline — per-user training-sequence assembly: the
  // chronological interaction history as ONE array column per user
  // (the "conversation / behavior sequence" input shape for sequence
  // models). Determinism trick: collect_list is partition-order-
  // dependent, so the elements carry their own (ts, event_id) sort key
  // inside a struct and sort_array orders them AFTER the shuffle —
  // order-independent aggregation, reproducible on any cluster. The
  // emitted columns stay scalar-comparable for the oracle: sequence
  // length, first/last step, and the joined type path.
  //
  // 100 TB shape: one hash aggregate on user_id (no window, no sort of
  // the whole table); per-user arrays bound memory by the per-key
  // history length, the same contract as any sessionizer. A hot user
  // falls to AQE or the ops/Skew salting primitives.
  private def timeline(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
          unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type")))).as("steps"))
      .select(col("user_id"),
        size(col("steps")).cast("long").as("n_steps"),
        col("steps")(0)("event_type").as("first_type"),
        element_at(col("steps"), -1)("event_type").as("last_type"),
        array_join(expr("transform(steps, s -> s.event_type)"), ">")
          .as("type_path"))
      .orderBy(col("user_id"))

  private val timelineSql =
    """WITH t AS (
      |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(len(types) AS BIGINT) AS n_steps,
      |  types[1] AS first_type, types[-1] AS last_type,
      |  list_aggregate(types, 'string_agg', '>') AS type_path
      |FROM t ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------------
  // events_forward_fill — gap-filled hourly series with forward fill:
  // the monitoring-dashboard shape (a metric stream must emit a value
  // for EVERY bucket; an empty hour repeats the last observation, a
  // leading gap reads 0). The dense (type × hour) spine is built from
  // the AGGREGATED frame's bounds — sequence() over the global hour
  // range crossed with the distinct types, a broadcast-sized grid —
  // and the fill is `last(n, ignoreNulls)` over a per-type window of
  // |hours| rows. Raw events are touched exactly once (the hourly
  // aggregate); spine, join, and window all run at grid cardinality —
  // the same never-window-raw-events discipline as events_anomaly_hourly.
  private def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = ev(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val hours = hourly.agg(min(col("hour_start")).as("lo"),
        max(col("hour_start")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)"))
        .as("hour_start"))
    val spine = hours.crossJoin(
      broadcast(hourly.select(col("event_type")).distinct()))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("hour_start", "event_type"), "left")
      .withColumn("filled", col("n").isNull)
      .withColumn("n_filled",
        coalesce(last(col("n"), ignoreNulls = true).over(w), lit(0L)))
      .select(col("event_type"), col("hour_start"), col("n_filled"),
        col("filled"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  private val forwardFillSql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT MIN(hour_start) AS lo, MAX(hour_start) AS hi FROM hourly),
      |hours AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      |  FROM b),
      |spine AS (
      |  SELECT hour_start, event_type
      |  FROM hours, (SELECT DISTINCT event_type FROM hourly) t),
      |j AS (
      |  SELECT s.hour_start, s.event_type, n
      |  FROM spine s LEFT JOIN hourly USING (hour_start, event_type))
      |SELECT event_type, hour_start,
      |  COALESCE(last_value(n IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY hour_start
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS n_filled,
      |  n IS NULL AS filled
      |FROM j ORDER BY event_type, hour_start""".stripMargin

  // -------------------------------------------------------------------
  // events_interpolate — LINEAR interpolation across observation gaps,
  // the step past events_forward_fill's last-value carry: the series is
  // the hourly mean event value per type, and an hour with no events of
  // a type is a MISSING observation (unlike a count, where absent means
  // zero), so a gap interior hour gets prev + (next − prev) ·
  // elapsed/gap_len. Two window passes over the dense spine carry
  // (value, epoch-hour) of the nearest observation in each direction —
  // per-type partitions, grid cardinality, never a window over raw
  // events. Spine edges (no observation on one side) stay null:
  // interpolation never extrapolates.
  //
  // Cross-engine floats: the observed means are DECIMAL-exact sums
  // divided once by a count; the interpolation is three IEEE ops on
  // those exact operands plus an integer hour ratio, spelled in the
  // same order both engines, rounded 6dp on emit.
  private def interpolate(spark: SparkSession, dir: String): DataFrame = {
    val hourly = ev(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg((sum(col("value").cast(DecimalType(18, 6))).cast("double") /
        count(lit(1))).as("v"))
    val hours = hourly.agg(min(col("hour_start")).as("lo"),
        max(col("hour_start")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)"))
        .as("hour_start"))
    val spine = hours.crossJoin(
      broadcast(hourly.select(col("event_type")).distinct()))
    val wB = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(hourly, Seq("hour_start", "event_type"), "left")
      .withColumn("h", expr("unix_seconds(hour_start) div 3600"))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wB))
      .withColumn("ph",
        last(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wB))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wF))
      .withColumn("nh",
        first(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wF))
      .withColumn("v_interp", round(expr(
        "CASE WHEN v IS NOT NULL THEN v " +
          "WHEN pv IS NULL OR nv IS NULL THEN NULL " +
          "ELSE pv + (nv - pv) * ((h - ph) / (nh - ph)) END"), 6))
      .withColumn("interpolated", col("v").isNull && col("v_interp").isNotNull)
      .select(col("event_type"), col("hour_start"),
        round(col("v"), 6).as("v_obs"), col("v_interp"), col("interpolated"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  private val interpolateSql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT MIN(hour_start) AS lo, MAX(hour_start) AS hi FROM hourly),
      |hours AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      |  FROM b),
      |spine AS (
      |  SELECT hour_start, event_type
      |  FROM hours, (SELECT DISTINCT event_type FROM hourly) t),
      |j AS (
      |  SELECT s.hour_start, s.event_type, v,
      |    epoch(s.hour_start) // 3600 AS h
      |  FROM spine s LEFT JOIN hourly USING (hour_start, event_type)),
      |w AS (
      |  SELECT event_type, hour_start, v, h,
      |    last_value(v IGNORE NULLS) OVER wb AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      |      OVER wb AS ph,
      |    first_value(v IGNORE NULLS) OVER wf AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
      |      OVER wf AS nh
      |  FROM j
      |  WINDOW
      |    wb AS (PARTITION BY event_type ORDER BY h
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY event_type ORDER BY h
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_type, hour_start, ROUND(v, 6) AS v_obs,
      |  ROUND(CASE WHEN v IS NOT NULL THEN v
      |    WHEN pv IS NULL OR nv IS NULL THEN NULL
      |    ELSE pv + (nv - pv) * ((h - ph) / (nh - ph)) END, 6) AS v_interp,
      |  v IS NULL AND (pv IS NOT NULL AND nv IS NOT NULL) AS interpolated
      |FROM w ORDER BY event_type, hour_start""".stripMargin

  // -------------------------------------------------------------------
  // events_rolling_median — median-filtered hourly baseline (the robust
  // twin of events_anomaly_hourly's mean/σ z-score: one crawler burst
  // poisons a trailing MEAN for 24 hours, but shifts a trailing MEDIAN
  // not at all — the baseline a rate-limiter or spike detector should
  // subtract). Trailing 25-hour window over the SAME dense spine as
  // events_forward_fill (empty hours are real zeros, so they must enter
  // the window), emitted only where the window is full.
  //
  // Integer-exact by construction: the median of 25 integers is the
  // 13th order statistic — element_at(array_sort(...), 13) here,
  // CAST(median(...) AS BIGINT) in DuckDB (interpolation never fires on
  // an odd count) — and the spike verdict n ≥ 4·med+1 compares
  // integers. No doubles anywhere. The collect_list window materializes
  // 25-element arrays at GRID cardinality (types × hours), never over
  // raw events — the same bounded-state shape as events_ewma.
  private def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val hourly = ev(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val hours = hourly.agg(min(col("hour_start")).as("lo"),
        max(col("hour_start")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)"))
        .as("hour_start"))
    val spine = hours.crossJoin(
      broadcast(hourly.select(col("event_type")).distinct()))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(-24, Window.currentRow)
    spine.join(hourly, Seq("hour_start", "event_type"), "left")
      .withColumn("cnt", coalesce(col("n"), lit(0L)))
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("med",
        element_at(array_sort(collect_list(col("cnt")).over(w)), 13))
      .filter(col("k") === 25)
      .withColumn("is_spike", col("cnt") >= col("med") * 4 + 1)
      .select(col("event_type"), col("hour_start"), col("cnt"),
        col("med"), col("is_spike"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  private val rollingMedianSql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT MIN(hour_start) AS lo, MAX(hour_start) AS hi FROM hourly),
      |hours AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      |  FROM b),
      |spine AS (
      |  SELECT hour_start, event_type
      |  FROM hours, (SELECT DISTINCT event_type FROM hourly) t),
      |j AS (
      |  SELECT s.hour_start, s.event_type, COALESCE(n, 0) AS cnt
      |  FROM spine s LEFT JOIN hourly USING (hour_start, event_type)),
      |r AS (
      |  SELECT event_type, hour_start, cnt,
      |    COUNT(*) OVER w AS k,
      |    CAST(median(cnt) OVER w AS BIGINT) AS med
      |  FROM j
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
      |    ROWS BETWEEN 24 PRECEDING AND CURRENT ROW))
      |SELECT event_type, hour_start, cnt, med,
      |  cnt >= med * 4 + 1 AS is_spike
      |FROM r WHERE k = 25
      |ORDER BY event_type, hour_start""".stripMargin

  // -------------------------------------------------------------------
  // events_ewma — exponentially time-decayed hourly activity (the
  // recency-weighted feature a freshness ranker or rate-limiter reads):
  // ewma_t = Σ_{j=0..23} cnt_{t−j} · 2^{−j} over the SAME dense spine
  // as events_forward_fill (decay against wall-clock hours, so empty
  // hours must decay the signal — windowing the sparse frame would
  // silently skip them). Determinism is by construction, not rounding:
  // the weights are dyadic (2^{−j}, exactly representable), the counts
  // are small integers, and every partial sum fits the double mantissa
  // exactly — so the fold is associative to the bit and both engines
  // agree regardless of evaluation order. The 24 lag terms share one
  // window spec → a single window pass at GRID cardinality; raw events
  // are touched once for the hourly aggregate.
  private def ewma(spark: SparkSession, dir: String): DataFrame = {
    val hourly = ev(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val hours = hourly.agg(min(col("hour_start")).as("lo"),
        max(col("hour_start")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)"))
        .as("hour_start"))
    val spine = hours.crossJoin(
      broadcast(hourly.select(col("event_type")).distinct()))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
    val decayed = (0 until 24).map(j =>
      coalesce(lag(col("cnt"), j).over(w), lit(0L)).cast("double") *
        lit(math.pow(0.5, j)))
    spine.join(hourly, Seq("hour_start", "event_type"), "left")
      .withColumn("cnt", coalesce(col("n"), lit(0L)))
      .withColumn("ewma24", decayed.reduce(_ + _))
      .select(col("event_type"), col("hour_start"), col("cnt"),
        col("ewma24"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  private val ewmaSql = {
    // weights ride as DOUBLE on both engines: a DECIMAL(38,23) sum would
    // be exact but DuckDB's decimal→double cast double-rounds (int128 /
    // 10^23 — two inexact steps, 1-ulp drift vs Spark's double fold).
    // Every 2^-j weight and every partial sum is dyadic within the
    // 53-bit mantissa, so the left-associated DOUBLE chain is EXACT and
    // identical in both engines.
    val terms = (0 until 24).map { j =>
      val wj = java.math.BigDecimal.valueOf(0.5).pow(j).toPlainString
      s"COALESCE(lag(cnt, $j) OVER w, 0) * CAST($wj AS DOUBLE)"
    }.mkString(" +\n      |    ")
    s"""WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT MIN(hour_start) AS lo, MAX(hour_start) AS hi FROM hourly),
      |hours AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      |  FROM b),
      |spine AS (
      |  SELECT hour_start, event_type
      |  FROM hours, (SELECT DISTINCT event_type FROM hourly) t),
      |j AS (
      |  SELECT s.hour_start, s.event_type, COALESCE(n, 0) AS cnt
      |  FROM spine s LEFT JOIN hourly USING (hour_start, event_type))
      |SELECT event_type, hour_start, cnt,
      |  $terms AS ewma24
      |FROM j
      |WINDOW w AS (PARTITION BY event_type ORDER BY hour_start)
      |ORDER BY event_type, hour_start""".stripMargin
  }

  // -------------------------------------------------------------------
  // events_props_extract — JSON-in-string props (B14): typed extraction
  // via from_json, bucketed aggregation over the extracted value.
  private def props(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .withColumn("k", expr("from_json(props, 'k INT').k"))
      .groupBy(expr("k div 10").cast("int").as("k_bucket"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("k_bucket"))

  private val propsSql =
    """WITH e AS (
      |  SELECT CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
      |SELECT CAST(k // 10 AS INT) AS k_bucket, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(k) AS min_k, MAX(k) AS max_k
      |FROM e GROUP BY k_bucket ORDER BY k_bucket""".stripMargin

  // -------------------------------------------------------------------
  // events_variant_extract — the same JSON props through Spark 4's
  // VARIANT type (B14, modern form): parse_json encodes the document
  // ONCE into the binary variant format, and variant_get does typed
  // path extraction on that encoding. At 100 TB this is the
  // semi-structured fast path — shredded binary navigation instead of
  // per-row string re-parsing for every accessed field, with no
  // up-front schema declaration (contrast events_props_extract's
  // from_json, which needs the schema and re-parses per field list).
  private def variantExtract(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .withColumn("k", expr("variant_get(parse_json(props), '$.k', 'int')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  private val variantExtractSql =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // events_variant_stored — the parse-once/extract-many VARIANT
  // lifecycle: events mirrored ONCE with props parsed into a STORED
  // binary variant column (fingerprint-memoized parquet, same validity
  // contract as the layout mirrors), then typed path navigation on the
  // stored encoding — no JSON string parsing at query time at all. At
  // 100 TB this is the ingest-side move that makes every downstream
  // extraction columnar-speed; VariantStorageSpec pins the round-trip.
  private def variantMirror(spark: SparkSession, dir: String): String = {
    val fp = graft.ops.IncrementalDedup.sourceFingerprint(spark, s"$dir/events.parquet")
    val tag = s"events_variant_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-variant/$tag"
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success))
      ev(spark, dir).withColumn("v", expr("parse_json(props)")).drop("props")
        .write.mode("overwrite").parquet(path)
    path
  }

  private def variantStored(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val path = variantMirror(spark, dir)
    graft.T.readCached(spark, path)
      .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"))
      .orderBy(col("event_type"))
  }

  private val variantStoredSql =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // events_funnel — per-user event-type transition counts: lead over the
  // per-user timeline, grouped by (from, to) pair.
  private def funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(spark, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val funnelSql =
    """WITH t AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events)
      |SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
      |FROM t WHERE to_type IS NOT NULL
      |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin

  // -------------------------------------------------------------------
  // join_asof_events — as-of join, an operator Spark lacks natively: for
  // every purchase, the most recent click by the same user at or before
  // the purchase time. Implemented the 100 TB-safe way — NOT a range join:
  // union both sides tagged, one shuffle+sort per user_id, and a running
  // `last(click, ignoreNulls)` window carries the latest click forward
  // into each purchase row (linear in events, no candidate pairs at all).
  // At equal timestamps the click sorts first (side 0 < 1) ⇒ inclusive
  // "at or before", matching DuckDB's native ASOF JOIN (>=) oracle.
  private def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val clickStruct = "struct<click_ts:timestamp,click_id:bigint>"
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        struct(col("ts").as("click_ts"), col("event_id").as("click_id")).as("click"),
        lit(null).cast("long").as("purchase_id"), lit(0).as("side"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(null).cast(clickStruct).as("click"),
        col("event_id").as("purchase_id"), lit(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click", last(col("click"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("purchase_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("last_click.click_id").as("click_id"),
        col("last_click.click_ts").as("click_ts"),
        ((unix_micros(col("ts")) - unix_micros(col("last_click.click_ts")))
          .cast("double") / 1e6).as("gap_s"))
      .orderBy(col("purchase_id"))
  }

  // Oracle: DuckDB's native ASOF JOIN. Timestamps are truncated to µs on
  // both sides (make_timestamp ∘ epoch_us) because the engine works in
  // Spark's microsecond TimestampType while the parquet carries ns.
  private val asofJoinSql =
    """WITH p AS (SELECT event_id, user_id, make_timestamp(epoch_us(ts)) AS ts
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id, user_id, make_timestamp(epoch_us(ts)) AS ts
      |      FROM events WHERE event_type = 'click')
      |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |  c.event_id AS click_id, c.ts AS click_ts,
      |  CAST(epoch_us(p.ts) - epoch_us(c.ts) AS DOUBLE) / 1e6 AS gap_s
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY purchase_id""".stripMargin

  // -------------------------------------------------------------------
  // events_retention — cohort retention: users bucketed by first-seen
  // week; each (cohort week × weeks-since-cohort) cell counts distinct
  // active users. Three shuffles, each on strictly reduced data
  // (distinct user-days → per-user min → cohort cells); the user-cohort
  // join keys on user_id, so at 100 TB it co-partitions with the
  // per-user aggregate that produced it — AQE sees both sides already
  // hashed. All arithmetic is integer day/week math ⇒ bit-exact in both
  // engines.
  private def retention(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val act = ev(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val cohort = act.groupBy(col("user_id")).agg(min(col("d")).as("c"))
    act.join(cohort, "user_id")
      .groupBy(
        floor(datediff(col("c"), epoch) / 7).cast("long").as("cohort_week"),
        floor(datediff(col("d"), col("c")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  private val retentionSql =
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |cohort AS (SELECT user_id, MIN(d) AS c FROM act GROUP BY user_id)
      |SELECT
      |  CAST(floor(date_diff('day', DATE '1970-01-01', c) / 7) AS BIGINT) AS cohort_week,
      |  CAST(floor(date_diff('day', c, d) / 7) AS BIGINT) AS week_offset,
      |  CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
      |FROM act JOIN cohort ON act.user_id = cohort.user_id
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  // -------------------------------------------------------------------
  // events_topk_daily — heavy hitters per time window: daily event-type
  // leaderboard (top-3 by count, count-desc/type-asc determinism). The
  // composite every ops dashboard runs: windowed aggregate (map-side
  // partial) then a SMALL ranked window over the aggregated groups —
  // the row_number sees |windows|x|types| rows, never raw events, so
  // the full-sort cost of the rank is bounded by the aggregate's output
  // at any scale.
  private def topkDaily(spark: SparkSession, dir: String): DataFrame = {
    val counts = ev(spark, dir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))
    val w = Window.partitionBy(col("win_start"))
      .orderBy(col("n_events").desc, col("event_type"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .orderBy(col("win_start"), col("rank"))
  }

  private val topkDailySql =
    """WITH c AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2)
      |SELECT win_start, event_type, n_events, CAST(rank AS INT) AS rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY win_start ORDER BY n_events DESC, event_type) AS rank
      |  FROM c)
      |WHERE rank <= 3
      |ORDER BY win_start, rank""".stripMargin

  // -------------------------------------------------------------------
  // events_anomaly_hourly — trailing z-score anomaly detection: each
  // (hour, type) count is scored against the mean/std of the SAME
  // type's previous 24 hourly counts (rows-frame window, no leakage of
  // the current value into its own baseline). The ops-monitoring shape:
  // |z| >= 2 rows are the alert feed. Determinism: the baseline moments
  // derive from INTEGER count sums, and every double step after —
  // divisions, the explicit mu*mu square, subtraction, sqrt — is an
  // IEEE-exact-or-correctly-rounded op computed identically by both
  // engines, so even the 6dp-rounded z agrees bit-for-bit. greatest(,0)
  // clamps the tiny negative variances float cancellation can produce.
  // Scale: one hash aggregate to |hours|x|types| rows, then a window
  // over that aggregate — never over raw events.
  private def anomalyHourly(spark: SparkSession, dir: String): DataFrame = {
    val hourly = ev(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("win_start"))
      .rowsBetween(-24, -1)
    hourly
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("sq", sum(col("n") * col("n")).over(w))
      .filter(col("k") >= 12)
      .withColumn("mu", col("s").cast("double") / col("k").cast("double"))
      .withColumn("sd", sqrt(greatest(
        col("sq").cast("double") / col("k").cast("double") -
          col("mu") * col("mu"), lit(0.0))))
      .filter(col("sd") > 0)
      .withColumn("z", round((col("n").cast("double") - col("mu")) / col("sd"), 6))
      .filter(abs(col("z")) >= 2)
      .select(col("win_start"), col("event_type"), col("n"),
        round(col("mu"), 6).as("mu"), col("z"))
      .orderBy(col("win_start"), col("event_type"))
  }

  private val anomalyHourlySql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS win_start, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |base AS (
      |  SELECT win_start, event_type, n,
      |    COUNT(*) OVER tw AS k, SUM(n) OVER tw AS s, SUM(n * n) OVER tw AS sq
      |  FROM hourly
      |  WINDOW tw AS (PARTITION BY event_type ORDER BY win_start
      |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |m AS (
      |  SELECT win_start, event_type, n,
      |    CAST(s AS DOUBLE) / CAST(k AS DOUBLE) AS mu,
      |    sqrt(greatest(CAST(sq AS DOUBLE) / CAST(k AS DOUBLE) -
      |      (CAST(s AS DOUBLE) / CAST(k AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(k AS DOUBLE)),
      |      0)) AS sd
      |  FROM base WHERE k >= 12),
      |z AS (
      |  SELECT win_start, event_type, n, mu,
      |    ROUND((CAST(n AS DOUBLE) - mu) / sd, 6) AS z
      |  FROM m WHERE sd > 0)
      |SELECT win_start, event_type, n, ROUND(mu, 6) AS mu, z
      |FROM z WHERE abs(z) >= 2
      |ORDER BY win_start, event_type""".stripMargin

  // -------------------------------------------------------------------
  // events_ts_quarantine — dead-letter discipline for dirty timestamps:
  // the reference's 3-format date parse (src/transform.py date fallback
  // chain, F2) + clean/rejected split (P5) applied to the EVENT stream.
  // A deterministic "raw arrival" string is derived from each event (its
  // own ts re-serialized in one of three wire formats by event_id % 4;
  // the fourth branch is corrupted), then re-ingested through a
  // try-parse fallback chain: ISO → US-style → epoch-seconds; rows no
  // format accepts route to quarantine with a reason instead of
  // poisoning the batch — the loader-bug lesson (VERDICT r5) as an
  // operator. All comparisons ride integer epoch SECONDS (the wire
  // formats are second-grain), so both engines agree exactly.
  // 100 TB shape: stateless per-row parse + one small-key aggregate —
  // map-side combined, no shuffle beyond the 8-group rollup.
  private def tsQuarantine(spark: SparkSession, dir: String): DataFrame = {
    val raw = ev(spark, dir)
      .select(col("event_id"), col("ts"),
        pmod(col("event_id"), lit(4)).cast("int").as("fmt"))
      .withColumn("raw_ts",
        when(col("fmt") === 0, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
          .when(col("fmt") === 1, date_format(col("ts"), "MM/dd/yyyy HH:mm:ss"))
          .when(col("fmt") === 2, unix_seconds(col("ts")).cast("string"))
          .otherwise(concat(lit("corrupt:"), col("event_id").cast("string"))))
    raw
      .withColumn("parsed_s", coalesce(
        unix_seconds(to_timestamp(col("raw_ts"), "yyyy-MM-dd HH:mm:ss")),
        unix_seconds(to_timestamp(col("raw_ts"), "MM/dd/yyyy HH:mm:ss")),
        col("raw_ts").cast("long")))
      .withColumn("outcome",
        when(col("parsed_s").isNotNull, lit("parsed"))
          .otherwise(lit("quarantined:unparseable_ts")))
      .groupBy(col("fmt"), col("outcome"))
      .agg(count(lit(1)).as("n"), sum(col("parsed_s")).as("sum_epoch_s"))
      .orderBy(col("fmt"), col("outcome"))
  }

  private val tsQuarantineSql =
    """WITH raw AS (
      |  SELECT event_id, CAST(event_id % 4 AS INT) AS fmt,
      |    CASE CAST(event_id % 4 AS INT)
      |      WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
      |      WHEN 1 THEN strftime(ts, '%m/%d/%Y %H:%M:%S')
      |      WHEN 2 THEN CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS VARCHAR)
      |      ELSE 'corrupt:' || CAST(event_id AS VARCHAR) END AS raw_ts
      |  FROM events),
      |p AS (
      |  SELECT fmt, COALESCE(
      |      CAST(epoch(try_strptime(raw_ts, '%Y-%m-%d %H:%M:%S')) AS BIGINT),
      |      CAST(epoch(try_strptime(raw_ts, '%m/%d/%Y %H:%M:%S')) AS BIGINT),
      |      TRY_CAST(raw_ts AS BIGINT)) AS parsed_s
      |  FROM raw)
      |SELECT fmt,
      |  CASE WHEN parsed_s IS NOT NULL THEN 'parsed'
      |       ELSE 'quarantined:unparseable_ts' END AS outcome,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(parsed_s) AS BIGINT) AS sum_epoch_s
      |FROM p GROUP BY 1, 2 ORDER BY fmt, outcome""".stripMargin

  // -------------------------------------------------------------------
  // events_late_watermark — out-of-order arrival diagnostic, the batch
  // measurement that SIZES a streaming watermark: using event_id as the
  // arrival-order proxy, per-user lateness = (max event time seen so
  // far) − (this event's time); aggregated per type into out-of-order
  // counts, >1h-late counts, and max/total lateness. Integer
  // microseconds end to end. One bounded per-user window (running max,
  // no full-partition sort spill) + one |types|-key aggregate.
  private def lateWatermark(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("late_us", max(col("us")).over(w) - col("us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_out_of_order"),
        sum(when(col("late_us") > 3600000000L, 1L).otherwise(0L)).as("n_late_1h"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).as("sum_late_us"))
      .orderBy(col("event_type"))
  }

  private val lateWatermarkSql =
    """WITH w AS (
      |  SELECT event_type,
      |    MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      - epoch_us(ts) AS late_us
      |  FROM events)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_order,
      |  CAST(SUM(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1h,
      |  CAST(MAX(late_us) AS BIGINT) AS max_late_us,
      |  CAST(SUM(late_us) AS BIGINT) AS sum_late_us
      |FROM w GROUP BY 1 ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // events_daily_percentiles — exact P50/P95/P99 value bands per day,
  // the ops-dashboard order statistic (latency/size/value bands) computed
  // the grid way: counts per (day, cents) first — cardinality bounded
  // by distinct 2dp values × days, never event count — then the k-th
  // smallest as "least cents whose cumulative count reaches ⌈p·n/100⌉",
  // an all-integer compare (100·cf ≥ p·n). No per-event window, no
  // sketch: the percentile is EXACT and the window runs at grid
  // cardinality — the same discipline as the KS drift monitor.
  private def dailyPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val g = ev(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day"), col("cents"))
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy(col("day")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("cf", sum(col("c")).over(wc))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("day"))))
    def pick(p: Int) =
      min(when(col("cf") * 100 >= col("n") * p, col("cents"))).as(s"p${p}_cents")
    cum.groupBy(col("day"))
      .agg(max(col("n")).as("n_events"), pick(50), pick(95), pick(99))
      .orderBy(col("day"))
  }

  private val dailyPercentilesSql =
    """WITH g AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT day, cents,
      |    SUM(c) OVER (PARTITION BY day ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cf,
      |    SUM(c) OVER (PARTITION BY day) AS n
      |  FROM g)
      |SELECT day, CAST(MAX(n) AS BIGINT) AS n_events,
      |  CAST(MIN(CASE WHEN 100 * cf >= 50 * n THEN cents END) AS BIGINT) AS p50_cents,
      |  CAST(MIN(CASE WHEN 100 * cf >= 95 * n THEN cents END) AS BIGINT) AS p95_cents,
      |  CAST(MIN(CASE WHEN 100 * cf >= 99 * n THEN cents END) AS BIGINT) AS p99_cents
      |FROM c GROUP BY day ORDER BY day""".stripMargin

  // -------------------------------------------------------------------
  // approx_sample_estimate — approximate query processing with an error
  // CONTRACT: count and sum per type estimated from a deterministic
  // 13/256 (≈5.08%) content-addressed sample (first md5 byte of the
  // event id < 0x0d — the curation suite's draw idiom, so the sample is
  // IDENTICAL in both engines and the whole row is hash-exact, unlike
  // rand()-sampling). The estimate is one IEEE division; the relative
  // error rides as integer basis points (all-integer cross-multiply,
  // exact), and the ≤25% acceptance bound is an integer compare — the
  // B19 sketch-contract discipline applied to sampling. At 100 TB this
  // is the interactive tier: scan 5% of the firehose, answer with known
  // error, escalate to exact only when the bound trips.
  private def sampleEstimate(spark: SparkSession, dir: String): DataFrame = {
    val base = ev(spark, dir).select(col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
      (substring(md5(col("event_id").cast("string")), 1, 2) < "0d").as("ins"))
    base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("ins"), 1L).otherwise(0L)).as("n_sample"),
        sum(col("cents")).as("sum_cents_exact"),
        sum(when(col("ins"), col("cents")).otherwise(0L)).as("sum_cents_sample"))
      .selectExpr("event_type", "n_exact", "n_sample",
        "CAST(n_sample * 256 AS DOUBLE) / CAST(13 AS DOUBLE) AS est_n",
        "CAST(abs(n_sample * 256 - n_exact * 13) * 10000 div (n_exact * 13) AS BIGINT) AS err_bp_n",
        "abs(n_sample * 256 - n_exact * 13) * 4 <= n_exact * 13 AS n_within",
        "sum_cents_exact", "sum_cents_sample",
        "CAST(sum_cents_sample * 256 AS DOUBLE) / CAST(13 AS DOUBLE) AS est_sum_cents",
        "CAST(abs(sum_cents_sample * 256 - sum_cents_exact * 13) * 10000 div (sum_cents_exact * 13) AS BIGINT) AS err_bp_sum",
        "abs(sum_cents_sample * 256 - sum_cents_exact * 13) * 4 <= sum_cents_exact * 13 AS sum_within")
      .orderBy(col("event_type"))
  }

  private val sampleEstimateSql =
    """WITH b AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |    substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '0d' AS ins
      |  FROM events),
      |a AS (
      |  SELECT event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n_exact,
      |    CAST(SUM(CASE WHEN ins THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
      |    CAST(SUM(cents) AS BIGINT) AS sum_cents_exact,
      |    CAST(SUM(CASE WHEN ins THEN cents ELSE 0 END) AS BIGINT) AS sum_cents_sample
      |  FROM b GROUP BY event_type)
      |SELECT event_type, n_exact, n_sample,
      |  CAST(n_sample * 256 AS DOUBLE) / CAST(13 AS DOUBLE) AS est_n,
      |  CAST(abs(n_sample * 256 - n_exact * 13) * 10000 // (n_exact * 13) AS BIGINT) AS err_bp_n,
      |  abs(n_sample * 256 - n_exact * 13) * 4 <= n_exact * 13 AS n_within,
      |  sum_cents_exact, sum_cents_sample,
      |  CAST(sum_cents_sample * 256 AS DOUBLE) / CAST(13 AS DOUBLE) AS est_sum_cents,
      |  CAST(abs(sum_cents_sample * 256 - sum_cents_exact * 13) * 10000 // (sum_cents_exact * 13) AS BIGINT) AS err_bp_sum,
      |  abs(sum_cents_sample * 256 - sum_cents_exact * 13) * 4 <= sum_cents_exact * 13 AS sum_within
      |FROM a ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // events_heavy_hitters — SpaceSaving top-k (Metwally et al., ICDT'05)
  // as a native bounded-state aggregate (functions/SpaceSaving.scala):
  // per day, the top-3 event types by frequency out of a 64-counter
  // summary. Per-group distinct (5 types) is under capacity, so the
  // sketch is EXACT and deterministic here — which is what lets DuckDB
  // hash-check it from plain counts; the eviction path is exercised by
  // sketch_heavy_hitters_contract below and property-pinned in
  // SpaceSavingSpec. At 100 TB the sketch's O(m) partials shuffle
  // `capacity` counters per partition instead of the key universe —
  // the difference between "top slugs per day over a firehose" as one
  // map-side pass vs a full groupBy shuffle.
  private def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    T.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(expr("space_saving(event_type, 64)").as("hh"))
      .select(col("day"), explode(col("hh")).as("e"))
      .select(col("day"), col("e.value").as("event_type"),
        col("e.cnt").as("cnt"))
      // tiny window: |days| × ≤64 summary rows, not the event count
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("day"))
          .orderBy(col("cnt").desc, col("event_type"))))
      .filter(col("rank") <= 3)
      .orderBy(col("day"), col("rank"))
  }

  private val heavyHittersSql =
    """WITH c AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT day, event_type, cnt,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY day ORDER BY cnt DESC, event_type) AS INT) AS rank
      |  FROM c)
      |SELECT day, event_type, cnt, rank FROM r WHERE rank <= 3
      |ORDER BY day, rank""".stripMargin

  // sketch_heavy_hitters_contract — the guarantee gate for the eviction
  // path (B19 pattern). A deterministic skewed key (half the stream on 3
  // hot slugs, the other half spread over ~150 user keys) overflows the
  // 64-counter summary, so counters ARE evicted; the SpaceSaving theorem
  // says every key with true frequency > N/64 must still be reported,
  // with count − err ≤ true ≤ count. Spark emits, per heavy key, its
  // exact count plus the found/bounds booleans computed against its own
  // sketch; the oracle recomputes the heavy set and exact counts and
  // asserts the theorem's booleans — DuckDB has no heavy-hitter sketch,
  // so TRUE here is the CONTRACT the hash compare holds Spark to, same
  // as the error-bound columns of approx_distinct_check.
  private def heavyHittersContract(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    val keyed = T.events(spark, dir).withColumn("k",
      when(pmod(col("event_id"), lit(2)) === 0,
        concat(lit("hot_"), pmod(col("event_id"), lit(3)).cast("string")))
        .otherwise(concat(lit("u"), col("user_id").cast("string"))))
    val sketch = keyed.agg(expr("space_saving(k, 64)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value").as("k"), col("e.cnt").as("s_cnt"),
        col("e.err").as("s_err"))
    val truth = keyed.groupBy(col("k"))
      .agg(count(lit(1)).as("true_cnt"))
    val n = keyed.agg(count(lit(1)).as("n"))
    truth.crossJoin(broadcast(n))
      .filter(col("true_cnt") * 64 > col("n")) // heavy: true freq > N/64
      .join(sketch, Seq("k"), "left")
      .select(col("k"), col("true_cnt"),
        col("s_cnt").isNotNull.as("found"),
        (col("s_cnt").isNotNull &&
          col("s_cnt") - col("s_err") <= col("true_cnt") &&
          col("true_cnt") <= col("s_cnt")).as("bounds_ok"))
      .orderBy(col("k"))
  }

  private val heavyHittersContractSql =
    """WITH keyed AS (
      |  SELECT CASE WHEN event_id % 2 = 0
      |    THEN 'hot_' || CAST(event_id % 3 AS VARCHAR)
      |    ELSE 'u' || CAST(user_id AS VARCHAR) END AS k
      |  FROM events),
      |t AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM keyed GROUP BY k),
      |n AS (SELECT COUNT(*) AS n FROM keyed)
      |SELECT k, true_cnt, TRUE AS found, TRUE AS bounds_ok
      |FROM t, n WHERE true_cnt * 64 > n ORDER BY k""".stripMargin

  // -------------------------------------------------------------------
  // events_attribution_last — last-click attribution, the composite the
  // range join (join_range_events) and as-of join (join_asof_events)
  // exist to serve: a purchase is attributed iff the same user clicked
  // within the hour before it [purchase_ts − 1h, purchase_ts), credit
  // going to the LATEST such click. Per day: purchase count, attributed
  // count, attributed revenue (decimal-exact), and total click→purchase
  // latency in integer µs over attributed pairs.
  //
  // 100 TB shape: the purchase side explodes to 2 hour buckets and
  // equi-joins clicks on (user, bucket) + residual range filter —
  // candidate volume is bounded by per-user-hour co-residency, never
  // the O(clicks × purchases) BNLJ the naive time-proximity spelling
  // degenerates to. The per-purchase last-click then folds as max()
  // (no window), and the day rollup is an ordinary partial+final hash
  // aggregate. Latency sums ride as int64 µs — associative, no float.
  private def attributionLast(spark: SparkSession, dir: String): DataFrame = {
    val H = 3600000000L // 1h in µs
    val e = ev(spark, dir).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), col("ts"),
      unix_micros(col("ts")).as("us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("us").as("c_us"),
        floor(col("us") / H).as("cb"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"), col("ts"),
        col("us"))
    val lastClick = purch
      .withColumn("b",
        explode(array(floor(col("us") / H) - 1, floor(col("us") / H))))
      .join(clicks, col("user_id") === col("c_uid") && col("b") === col("cb"))
      .filter(col("c_us") < col("us") && col("c_us") >= col("us") - H)
      .groupBy(col("event_id")).agg(max(col("c_us")).as("last_click_us"))
    purch.join(lastClick, Seq("event_id"), "left")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("last_click_us")).as("n_attributed"),
        sum(when(col("last_click_us").isNotNull, col("value")).cast(D))
          .cast("double").as("attributed_value"),
        sum(when(col("last_click_us").isNotNull,
          col("us") - col("last_click_us"))).as("total_latency_us"))
      .orderBy(col("day"))
  }

  private val attributionLastSql =
    """WITH p AS (
      |  SELECT event_id, user_id, value, ts, epoch_us(ts) AS us
      |  FROM events WHERE event_type = 'purchase'),
      |a AS (
      |  SELECT p.event_id, MAX(epoch_us(c.ts)) AS last_click_us
      |  FROM p JOIN events c
      |    ON c.event_type = 'click' AND c.user_id = p.user_id
      |   AND epoch_us(c.ts) < p.us AND epoch_us(c.ts) >= p.us - 3600000000
      |  GROUP BY p.event_id)
      |SELECT CAST(date_trunc('day', p.ts) AS TIMESTAMP) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(COUNT(a.last_click_us) AS BIGINT) AS n_attributed,
      |  CAST(SUM(CASE WHEN a.last_click_us IS NOT NULL
      |    THEN CAST(p.value AS DECIMAL(18,2)) END) AS DOUBLE)
      |    AS attributed_value,
      |  CAST(SUM(CASE WHEN a.last_click_us IS NOT NULL
      |    THEN p.us - a.last_click_us END) AS BIGINT) AS total_latency_us
      |FROM p LEFT JOIN a USING (event_id)
      |GROUP BY 1 ORDER BY day""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("events_heavy_hitters", heavyHitters, Some(heavyHittersSql)),
    QueryDef("sketch_heavy_hitters_contract", heavyHittersContract,
      Some(heavyHittersContractSql)),
    QueryDef("approx_sample_estimate", sampleEstimate, Some(sampleEstimateSql)),
    QueryDef("events_daily_percentiles", dailyPercentiles, Some(dailyPercentilesSql)),
    QueryDef("events_ts_quarantine", tsQuarantine, Some(tsQuarantineSql)),
    QueryDef("events_late_watermark", lateWatermark, Some(lateWatermarkSql)),
    QueryDef("events_forward_fill", forwardFill, Some(forwardFillSql)),
    QueryDef("events_interpolate", interpolate, Some(interpolateSql)),
    QueryDef("events_ewma", ewma, Some(ewmaSql)),
    QueryDef("events_rolling_median", rollingMedian, Some(rollingMedianSql)),
    QueryDef("events_anomaly_hourly", anomalyHourly, Some(anomalyHourlySql)),
    QueryDef("events_topk_daily", topkDaily, Some(topkDailySql)),
    QueryDef("events_tumbling_hourly", tumbling, Some(tumblingSql)),
    QueryDef("events_sliding_2h", sliding, Some(slidingSql)),
    QueryDef("events_session", session, Some(sessionSql)),
    QueryDef("events_session_native", sessionNative, Some(sessionNativeSql)),
    QueryDef("events_scd2_state", scd2, Some(scd2Sql)),
    QueryDef("events_cdc_apply", cdcApply, Some(cdcApplySql)),
    QueryDef("events_trailing_1h", trailing1h, Some(trailing1hSql)),
    QueryDef("events_drift_ks", driftKs, Some(driftKsSql)),
    QueryDef("events_drift_mix", driftMix, Some(driftMixSql)),
    QueryDef("events_user_timeline", timeline, Some(timelineSql)),
    QueryDef("events_props_extract", props, Some(propsSql)),
    QueryDef("events_variant_extract", variantExtract, Some(variantExtractSql)),
    QueryDef("events_variant_stored", variantStored, Some(variantStoredSql)),
    QueryDef("events_funnel", funnel, Some(funnelSql)),
    QueryDef("events_retention", retention, Some(retentionSql)),
    QueryDef("join_asof_events", asofJoin, Some(asofJoinSql)),
    QueryDef("events_attribution_last", attributionLast,
      Some(attributionLastSql))
  )
}
