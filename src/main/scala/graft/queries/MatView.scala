package graft.queries

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Materialized-view routing over the events table (SURVEY B47): a
  * day×type summary maintained like every other memoized artifact
  * (fingerprint-keyed, built once), and [[graft.plans.SummaryRewrite]]
  * routing matching raw-table aggregates onto it at optimization time.
  *
  * The gate query `mv_rewrite_daily` is written in the PORTABLE raw
  * spelling — groupBy(date_trunc('day', ts), event_type) with
  * count/sum/min/max — and the oracle recomputes from raw rows in
  * DuckDB, so the driver's hash compare proves the routed plan is
  * semantics-preserving, not merely plausible. MatViewSpec pins the
  * plan side: the optimized plan scans the summary parquet and never
  * touches events.parquet; non-routable shapes (avg, other columns)
  * still scan raw.
  */
object MatView {
  private val D = DecimalType(18, 2)

  /** Build-or-reuse the summary at `grain` ("day"/"hour"); returns its
    * path. Partial sums ride as DECIMAL so downstream re-aggregation is
    * exact, and `uhll` carries a mergeable DataSketches HLL partial of
    * the bucket's distinct users — `hll_union_agg` is the merge law for
    * distinct counting, the one aggregate n/sum/min/max cannot answer
    * (mv_distinct_users_daily gates it). The bucket column is NAMED
    * after the grain — the rule looks it up by that name; extra columns
    * are invisible to the routing grammar. The `_u` in the path versions
    * the summary LAYOUT: fingerprint memoization only keys on the
    * source, so a schema change must move the mirror path or stale
    * sketchless mirrors from older sessions would satisfy the reuse
    * check. */
  private[graft] def ensureSummary(spark: SparkSession, dir: String,
      grain: String = "day"): String = {
    Ctx.prep(spark)
    val fp = graft.ops.IncrementalDedup.sourceFingerprint(spark, s"$dir/events.parquet")
    val tag = if (grain == "day") "daily" else "hourly"
    val path = s"${sys.props("java.io.tmpdir")}/graft-mirrors/events_${tag}_u_$fp"
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      // The rebuild aggregate below matches the routing grammar itself:
      // if events.parquet was regenerated in-session, a route registered
      // under the PREVIOUS fingerprint would feed this build from the
      // stale summary (ADVICE r6). Drop this source's routes first and
      // bypass the rule for the write — the rebuild must scan raw.
      graft.plans.SummaryRewrite.deregister(s"$dir/events.parquet")
      graft.plans.SummaryRewrite.withBypass {
        T.events(spark, dir)
          .groupBy(date_trunc(grain, col("ts")).as(grain), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(D)).as("sum_value_dec"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"),
            hll_sketch_agg(col("user_id")).as("uhll"))
          .write.mode("overwrite").parquet(path)
      }
    }
    path
  }

  /** Ensure both summaries exist and their routes are registered; the
    * rule itself rides the standard injection paths (GraftExtensions /
    * VecExprs.register). Both builds complete BEFORE either route is
    * registered — ensureSummary deregisters the source's routes when it
    * has to rebuild, so registering between the two builds would let the
    * second build drop the first's fresh route. Also registers the
    * ORDERS summary (below): one entry point keeps Verify's
    * pre-registration and Bench's warm pass enabling the SAME route set,
    * so verified plans stay equal to benched plans (ADVICE r6). */
  private[graft] def enableRouting(spark: SparkSession, dir: String): Unit = {
    graft.functions.VecExprs.register(spark)
    val dayPath = ensureSummary(spark, dir, "day")
    val hourPath = ensureSummary(spark, dir, "hour")
    graft.plans.SummaryRewrite.register(s"$dir/events.parquet", "day", dayPath)
    graft.plans.SummaryRewrite.register(s"$dir/events.parquet", "hour", hourPath)
    val ordersPath = ensureOrdersSummary(spark, dir)
    graft.plans.SummaryRewrite.register(s"$dir/orders.parquet", "day",
      ordersPath, OrdersSchema)
  }

  /** The navigator is schema-generic (SummaryRewrite.SummarySchema) —
    * the orders rollup proves it on a second table WITH TWO dimensions:
    * day(o_orderdate) × o_orderstatus × o_orderpriority over
    * o_totalprice. A query grouping by a SUBSET of the dims (day ×
    * status — mv_rewrite_orders_daily) still routes: the rewritten
    * Aggregate keeps its grouping and simply re-aggregates the finer
    * dim rows, the same rollup law as the hour→day grain fallback. */
  private val OrdersSchema = graft.plans.SummaryRewrite.SummarySchema(
    "o_orderdate", Seq("o_orderstatus", "o_orderpriority"), "o_totalprice")

  private[graft] def ensureOrdersSummary(spark: SparkSession,
      dir: String): String = {
    Ctx.prep(spark)
    val fp = graft.ops.IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    // `_p` versions the layout (added priority dim) — fingerprint
    // memoization keys on the source only, so a schema change must
    // move the mirror path
    val path = s"${sys.props("java.io.tmpdir")}/graft-mirrors/orders_daily_p_$fp"
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      graft.plans.SummaryRewrite.deregister(s"$dir/orders.parquet")
      graft.plans.SummaryRewrite.withBypass {
        T.orders(spark, dir)
          .groupBy(date_trunc("day", col("o_orderdate")).as("day"),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(D)).as("sum_value_dec"),
            min(col("o_totalprice")).as("min_value"),
            max(col("o_totalprice")).as("max_value"))
          .write.mode("overwrite").parquet(path)
      }
    }
    path
  }

  // Same raw portable spelling as mv_rewrite_daily, on a DIFFERENT
  // table with different column names — proving the navigator routes by
  // registered schema, not by knowing the events table.
  private def mvOrdersDaily(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.orders(spark, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("day"), col("o_orderstatus"))
  }

  private val mvOrdersDailySql =
    """SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
      |  o_orderstatus,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY 1, 2 ORDER BY day, o_orderstatus""".stripMargin

  // Exact-dims twin: all three grouping columns (day × status ×
  // priority) — the dims-exact route; mv_rewrite_orders_daily above is
  // the dims-SUBSET route over the same summary. A filter on the second
  // dim rides along to prove multi-dim predicate re-anchoring.
  private def mvOrdersByPriority(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.orders(spark, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).cast("double").as("sum_price"))
      .orderBy(col("day"), col("o_orderstatus"), col("o_orderpriority"))
  }

  private val mvOrdersByPrioritySql =
    """SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
      |  o_orderstatus, o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY 1, 2, 3 ORDER BY day, o_orderstatus, o_orderpriority""".stripMargin

  // The raw portable spelling — identical to what a user ignorant of the
  // summary would write. SummaryRewrite reroutes it; the oracle (and
  // MatViewSpec's results-parity check) prove the answers don't move.
  private def mvDaily(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("day"), col("event_type"))
  }

  private val mvDailySql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  // Coarser grain than the summary: group by day only. The same rollup
  // answers it (re-aggregation over |types| rows per day) — the
  // aggregate-navigator case where the view is FINER than the query.
  private def mvDailyTotal(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .orderBy(col("day"))
  }

  private val mvDailyTotalSql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // The #1 dashboard shape (VERDICT r6 top item): a time-range + type
  // filter under the aggregate. The WHERE stays in the PORTABLE raw
  // spelling; SummaryRewrite peels it, re-anchors the day-aligned ts
  // bounds and the event_type predicate onto the summary's own columns,
  // and the plan reads |days in range|×|types| rows instead of the
  // firehose. The oracle recomputes from RAW rows with the same WHERE,
  // so the filtered route is hash-proven exact; MatViewSpec pins the
  // plan swap AND the refusals (misaligned bound, value predicate).
  private def mvDailyFiltered(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .filter(col("ts") >= to_timestamp(lit("2024-01-08 00:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-22 00:00:00")) &&
        col("event_type").isin("click", "purchase", "view"))
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("day"), col("event_type"))
  }

  private val mvDailyFilteredSql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-22 00:00:00'
      |  AND event_type IN ('click', 'purchase', 'view')
      |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  // Hour-aligned (NOT day-aligned) bound on a day-grain query: the day
  // summary cannot answer it (the 06:00 cut splits a day bucket), so the
  // navigator must route onto the HOUR summary and re-aggregate — the
  // filtered twin of the finer-view-answers-coarser-query fallback.
  private def mvDayFromHoursFiltered(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .filter(col("ts") >= to_timestamp(lit("2024-01-05 06:00:00")))
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .orderBy(col("day"), col("event_type"))
  }

  private val mvDayFromHoursFilteredSql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-05 06:00:00'
      |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  // -------------------------------------------------------------------
  // mv_incremental_refresh — maintaining the routed summary WITHOUT a
  // rebuild: base partials (90% of events by id-hash) merged with a
  // delta's partials through the aggregate merge law — Σn adds, decimal
  // sums add exactly, min/max fold. The oracle recomputes flat over ALL
  // events, so refresh ≡ rebuild is proven on real data — the operation
  // an ingest tick runs at 100 TB, where rebuilding the summary means
  // re-scanning the firehose. (agg_incremental_merge pins the same law
  // on orders; this is the law applied to B47's routed view.)
  private def mvIncrementalRefresh(spark: SparkSession, dir: String): DataFrame = {
    val ev = T.events(spark, dir)
    def partials(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).as("sum_dec"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
    val base = partials(ev.filter(pmod(col("event_id"), lit(10)) =!= 0))
    val delta = partials(ev.filter(pmod(col("event_id"), lit(10)) === 0))
    base.unionByName(delta)
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("sum_dec")).cast("double").as("sum_value"),
        min(col("min_v")).as("min_value"),
        max(col("max_v")).as("max_value"))
      .orderBy(col("day"), col("event_type"))
  }

  private val mvIncrementalRefreshSql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  // -------------------------------------------------------------------
  // mv_distinct_users_daily — distinct counting at SUMMARY cost: the one
  // dashboard aggregate the n/sum/min/max partials cannot answer
  // (distinct is not decomposable — SummaryRewrite's no-fire grammar
  // refuses it by design). The summary's `uhll` column carries a
  // mergeable DataSketches HLL partial per (day, type) bucket;
  // `hll_union_agg` across the day's buckets IS the merge law for
  // distinct, so per-day distinct users costs |types| sketch unions
  // instead of a firehose distinct-shuffle. Routed answers must be
  // bit-exact, so this is NOT a silent rewrite: the query asks the
  // summary explicitly and the contract is B19-style — each engine
  // computes its OWN estimate (DuckDB: approx_count_distinct, also HLL)
  // against its OWN exact count and both emit the same within-5% verdict
  // alongside the hash-matched exact values.
  private def mvDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val sumPath = ensureSummary(spark, dir, "day")
    val est = graft.T.readCached(spark, sumPath)
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("uhll"))).as("est"))
    val exact = T.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    exact.join(est, Seq("day"))
      .select(col("day"), col("n_exact"),
        (abs(col("est") - col("n_exact")) * 20 <= col("n_exact")).as("est_ok"))
      .orderBy(col("day"))
  }

  private val mvDistinctUsersSql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
      |  abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id)) * 20
      |    <= COUNT(DISTINCT user_id) AS est_ok
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // Month grain — NO month summary exists; the navigator re-truncs the
  // day summary's buckets (calendar grains compose over day:
  // trunc_month(trunc_day(ts)) ≡ trunc_month(ts)), so the monthly
  // dashboard re-aggregates ~30 day rows per month instead of scanning
  // the firehose. Same mechanism as the hour→day fallback, one level up
  // the grain lattice.
  private def mvMonthly(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .groupBy(date_trunc("month", col("ts")).as("month"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("month"), col("event_type"))
  }

  private val mvMonthlySql =
    """SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events GROUP BY 1, 2 ORDER BY month, event_type""".stripMargin

  // Extractor spellings — `dayofweek(ts)` grouping with a
  // `dayofmonth(ts)` predicate: both are constant within a day bucket,
  // so the navigator re-anchors them onto the day summary's bucket
  // column (the seasonality-profile dashboard shape, no date_trunc
  // anywhere in the query text). Minute-level extractors refuse —
  // no stored grain can answer them.
  private def mvDowProfile(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .filter(dayofmonth(col("ts")) <= 15)
      .groupBy(dayofweek(col("ts")).as("dow"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .orderBy(col("dow"), col("event_type"))
  }

  private val mvDowProfileSql =
    """SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE date_part('day', ts) <= 15
      |GROUP BY 1, 2 ORDER BY dow, event_type""".stripMargin

  // FILTER-clause aggregates — the pivot/dashboard shape: one row per
  // day, one conditional aggregate per segment, spelled with the
  // standard SQL FILTER (WHERE …) clause. The predicates reference only
  // dimension columns, so they apply WHOLE-BUCKET on the summary (every
  // raw row of a (day, type) bucket passes or fails together) and the
  // navigator keeps the FILTER, re-anchored on the summary's own
  // columns — |days|×|types| rows scanned for a five-way segmented
  // dashboard instead of five passes over the firehose. count FILTER
  // coalesces to 0 (a day where no bucket passes must count 0, not
  // NULL); sum/max FILTER keep their NULL-when-empty contract. The
  // oracle recomputes every segment from RAW rows.
  private def mvPivot(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_all"),
        expr("count(1) FILTER (WHERE event_type = 'click')").as("n_click"),
        expr("count(1) FILTER (WHERE event_type = 'purchase')")
          .as("n_purchase"),
        expr("sum(cast(value as decimal(18,2))) FILTER " +
          "(WHERE event_type = 'purchase')").cast("double")
          .as("purchase_value"),
        expr("max(value) FILTER (WHERE event_type IN ('click','view'))")
          .as("max_click_view"))
      .orderBy(col("day"))
  }

  private val mvPivotSql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_all,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |    FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value,
      |  MAX(value) FILTER (WHERE event_type IN ('click','view')) AS max_click_view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // ROLLUP at summary cost — the grouping-sets navigator: the Aggregate
  // sits on an Expand (one replay per grouping set), and SummaryRewrite
  // swaps the Expand's source for the summary, re-anchoring the
  // grouping variants and riding the partials through every projection.
  // Detail rows, per-day subtotals AND the grand total all re-aggregate
  // |days|×|types| summary rows — the original Data-Cube claim that one
  // stored rollup answers the whole lattice below it. Subtotal NULLs
  // are labeled 'ALL' post-aggregate in both engines; the oracle
  // recomputes GROUP BY ROLLUP from RAW rows.
  private def mvRollup(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .rollup(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"),
        min(col("value")).as("min_value"))
      .select(
        coalesce(date_format(col("day"), "yyyy-MM-dd"), lit("ALL"))
          .as("day_s"),
        coalesce(col("event_type"), lit("ALL")).as("type_s"),
        col("n_events"), col("sum_value"), col("min_value"))
      .orderBy(col("day_s"), col("type_s"))
  }

  private val mvRollupSql =
    """SELECT
      |  COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day_s,
      |  COALESCE(event_type, 'ALL') AS type_s,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value
      |FROM events
      |GROUP BY ROLLUP (date_trunc('day', ts), event_type)
      |ORDER BY day_s, type_s""".stripMargin

  // count(DISTINCT dim) at summary cost — the one distinct that IS
  // decomposable: the summary holds every (day, event_type) pair
  // present in raw, so per-day type diversity re-aggregates exactly as
  // distinct over the summary's own dim column (distinct over the
  // MEASURE or user_id stays refused — not answerable from partials;
  // the stored HLL partial covers that approximately via
  // mv_distinct_users_daily).
  private def mvTypeDiversity(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("event_type")).as("n_types"),
        count(lit(1)).as("n_events"))
      .orderBy(col("day"))
  }

  private val mvTypeDiversitySql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // avg at summary cost — avg(cast(value as decimal(18,2))) routes as
  // Σsum/Σn through Average's own decimal division tree (bit-equal to
  // the raw plan; the parity net covers it). Cross-engine, the result
  // is pinned EXACTLY by scaling to integer micros: Spark's avg yields
  // DECIMAL(22,6) = the 12dp HALF_UP quotient re-rounded to 6dp; the
  // oracle replicates both rounding steps in HUGEINT arithmetic
  // ((2·x + d) // (2·d) is HALF_UP for the non-negative values here),
  // so the hash compare needs no float tolerance.
  private def mvAvg(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (avg(col("value").cast(D)) * lit(1000000)).cast("long")
          .as("avg_micros"))
      .orderBy(col("day"), col("event_type"))
  }

  private val mvAvgSql =
    """WITH g AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS HUGEINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |q AS (
      |  SELECT day, event_type, n_events,
      |    (2 * cents * 10000000000 + n_events) // (2 * n_events) AS q12
      |  FROM g)
      |SELECT day, event_type, n_events,
      |  CAST((2 * q12 + 1000000) // 2000000 AS BIGINT) AS avg_micros
      |FROM q ORDER BY day, event_type""".stripMargin

  // Hour grain — routes to the hour summary (exact-grain match); the
  // day-grain gates above keep routing to the day summary, and
  // MatViewSpec additionally pins the NAVIGATOR fallback: with only the
  // hour route registered, a day-grain query re-aggregates the hour
  // buckets (trunc composes: day(hour(ts)) = day(ts)).
  private def mvHourly(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  private val mvHourlySql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // -------------------------------------------------------------------
  // mv_trend_7d — the trend dashboard at SUMMARY cost: a 7-day trailing
  // window (event-time RANGE frame, so missing days shrink the frame
  // instead of silently widening it) over the day×type summary —
  // |days|×|types| rows through one window pass, the firehose never
  // scanned. Decimal partials keep the trailing sums exact; the oracle
  // recomputes the daily rollup from RAW rows and applies the same
  // frame, so the summary-backed series is hash-proven equal to the
  // raw-data series.
  private def mvTrend7d(spark: SparkSession, dir: String): DataFrame = {
    val sumPath = ensureSummary(spark, dir, "day")
    Ctx.prep(spark)
    graft.T.readCached(spark, sumPath)
      .select(col("day"), col("event_type"), col("n"), col("sum_value_dec"))
      .selectExpr("day", "event_type",
        "CAST(sum(sum_value_dec) OVER (PARTITION BY event_type ORDER BY day " +
          "RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) " +
          "AS DOUBLE) AS trail7_value",
        "CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day " +
          "RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) " +
          "AS BIGINT) AS trail7_n")
      .orderBy(col("day"), col("event_type"))
  }

  private val mvTrend7dSql =
    """WITH d AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |    COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS s
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type,
      |  CAST(SUM(s) OVER w AS DOUBLE) AS trail7_value,
      |  CAST(SUM(n) OVER w AS BIGINT) AS trail7_n
      |FROM d
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY day, event_type""".stripMargin

  // -------------------------------------------------------------------
  // mv_rewrite_having — HAVING over a routed aggregate: the clause is a
  // Filter ABOVE the Aggregate, so the summary swap happens underneath
  // it untouched; the post-aggregate threshold then filters
  // |days|×|types| summary-answered groups. Oracle recomputes both the
  // aggregate and the HAVING from RAW rows (MatViewSpec pins the plan
  // side; this gate is the cross-engine value proof).
  private def mvHaving(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .filter(col("n_events") > 40)
      .orderBy(col("day"), col("event_type"))
  }

  private val mvHavingSql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 HAVING COUNT(*) > 40
      |ORDER BY day, event_type""".stripMargin

  // -------------------------------------------------------------------
  // mv_rewrite_joined — the STAR-SCHEMA dashboard (VERDICT r7 #1): an
  // aggregate over events ⋈ dim, where the dim is a small broadcastable
  // lookup keyed on the summary-carried event_type. The rollup commutes
  // with the join because the join key is bucket-constant — every raw
  // row of a (day, event_type) bucket matches the same dim rows — so
  // SummaryRewrite swaps the fact side for the summary UNDER the join:
  // the plan joins |days|×|types| rows to a 5-row dim instead of
  // dragging the firehose through the join. The dim stays in-query
  // (a VALUES lookup), the oracle recomputes from RAW joined rows, and
  // MatViewSpec pins the swap plus the refusals (join on user_id — not
  // bucket-constant; fact-fact self-join).
  private[graft] def typeDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "conversion"), ("signup", "conversion"),
      ("error", "ops")).toDF("event_type", "category")
  }

  private val typeDimSqlValues =
    """(VALUES ('click','engagement'), ('view','engagement'),
      |  ('purchase','conversion'), ('signup','conversion'),
      |  ('error','ops')) AS d(event_type, category)""".stripMargin

  private def mvJoined(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .join(typeDim(spark), "event_type")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("category"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("day"), col("category"))
  }

  private val mvJoinedSql =
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, d.category,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       |  MIN(value) AS min_value, MAX(value) AS max_value
       |FROM events e JOIN $typeDimSqlValues USING (event_type)
       |GROUP BY 1, 2 ORDER BY day, category""".stripMargin

  // The filtered star: a WHERE over the dim side (category) AND a
  // day-aligned time bound — dim predicates ride above the rebuilt
  // join untouched, the ts bound re-anchors on the summary's bucket.
  private def mvJoinedFiltered(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .join(typeDim(spark), "event_type")
      .filter(col("category") =!= "ops" &&
        col("ts") >= to_timestamp(lit("2024-01-10 00:00:00")))
      .groupBy(date_trunc("day", col("ts")).as("day"), col("category"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .orderBy(col("day"), col("category"))
  }

  private val mvJoinedFilteredSql =
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, d.category,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events e JOIN $typeDimSqlValues USING (event_type)
       |WHERE d.category <> 'ops' AND ts >= TIMESTAMP '2024-01-10 00:00:00'
       |GROUP BY 1, 2 ORDER BY day, category""".stripMargin

  // -------------------------------------------------------------------
  // mv_rewrite_snowflake — the dim→dim CHAIN (VERDICT r8 #4): events ⋈
  // type_dim ⋈ category_dim, aggregated at (day, org). The navigator
  // peels BOTH joins (left-deep, one dim per step), swaps the fact scan
  // for the day summary, and re-stacks the joins over |days|×|types|
  // rows — the second join's key (category) is itself a dim-side
  // column, so it rides through the condition re-anchor untouched.
  // Without chain support the firehose pays both joins row-wise.
  private[graft] def categoryDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("engagement", "growth"), ("conversion", "revenue"),
      ("ops", "platform")).toDF("category", "org")
  }

  private val categoryDimSqlValues =
    """(VALUES ('engagement','growth'), ('conversion','revenue'),
      |  ('ops','platform')) AS c(category, org)""".stripMargin

  private def mvSnowflake(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .join(typeDim(spark), "event_type")
      .join(categoryDim(spark), "category")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("org"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .orderBy(col("day"), col("org"))
  }

  private val mvSnowflakeSql =
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, c.org,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events e JOIN $typeDimSqlValues USING (event_type)
       |JOIN $categoryDimSqlValues USING (category)
       |GROUP BY 1, 2 ORDER BY day, org""".stripMargin

  // -------------------------------------------------------------------
  // mv_rewrite_left — LEFT join to an INCOMPLETE dim (VERDICT r8 #4):
  // the lookup has no 'error' row, so those buckets NULL-extend. The
  // rollup still commutes: the join key is bucket-constant, so
  // NULL-extension is bucket-UNIFORM — every raw row of an unmatched
  // bucket lands in the NULL-category group exactly as the unmatched
  // summary bucket does. The category grouping keeps the NULL group
  // (both engines), and the oracle orders NULLS FIRST to match Spark.
  // MatViewSpec pins the refusals: a LEFT join whose condition also
  // references the fact's value column (not bucket-constant) and
  // dim-LEFT-JOIN-fact (dim-only rows no bucket accounts for) both
  // stay on the firehose.
  private[graft] def partialTypeDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "conversion"), ("signup", "conversion"))
      .toDF("event_type", "category")
  }

  private val partialTypeDimSqlValues =
    """(VALUES ('click','engagement'), ('view','engagement'),
      |  ('purchase','conversion'), ('signup','conversion'))
      |  AS d(event_type, category)""".stripMargin

  private def mvLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    enableRouting(spark, dir)
    T.events(spark, dir)
      .join(partialTypeDim(spark), Seq("event_type"), "left")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("category"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .orderBy(col("day"), col("category"))
  }

  private val mvLeftJoinSql =
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, d.category,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events e LEFT JOIN $partialTypeDimSqlValues USING (event_type)
       |GROUP BY 1, 2 ORDER BY day, category NULLS FIRST""".stripMargin

  // mv_advisor_lattice — HRU'96 greedy view selection (Harinarayan/
  // Rajaraman/Ullman, "Implementing Data Cubes Efficiently", SIGMOD'96)
  // over the events lattice: time grains hour→day→month→total crossed
  // with dim sets {event_type}/{} — 8 nodes, root = hour×event_type.
  // The navigator answers "which summary serves this query"; this gate
  // is the layer above it: "which summaries should exist". One firehose
  // pass materializes the FINEST node's frame; every coarser view size
  // re-aggregates those rows (trunc composes — never the raw table
  // again), so size estimation costs one scan no matter how many
  // lattice nodes are priced (at 100 TB the counts would ride
  // approx_count_distinct sketches; MvAdvisor is agnostic). The greedy
  // arithmetic is O(k·|lattice|²) driver work — metadata-scale. Output:
  // every node with its exact row count, its HRU benefit against
  // S = {root} (= |covered nodes| × (rows(root) − rows(v)), the cost
  // reduction materializing it buys every query it can answer), and
  // whether greedy picks it first. The oracle replays sizes from raw
  // rows and the benefit/argmax arithmetic in SQL; MvAdvisorSpec pins
  // the full k-step greedy against an independent brute force and the
  // HRU (1−1/e) bound's monotone-benefit corollary.
  /** Price the 8-node events lattice with ONE firehose pass (the
    * finest node's frame; every coarser size re-aggregates it — trunc
    * composes). Shared by the pricing gate and the e2e loop, and
    * MEMOIZED per (session, corpus): the advisor's lifecycle is
    * price-once-per-corpus-build, and the priced lattice is 8 longs —
    * repeated gates re-derive the greedy from the cached sizes, not
    * from another firehose pass. */
  private val latticeMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String),
    (Seq[graft.ops.MvAdvisor.View], graft.ops.MvAdvisor.View)]()

  private def eventsLattice(spark: SparkSession, dir: String)
      : (Seq[graft.ops.MvAdvisor.View], graft.ops.MvAdvisor.View) =
    latticeMemo.computeIfAbsent((spark, dir), _ =>
      eventsLatticeUncached(spark, dir))

  private def eventsLatticeUncached(spark: SparkSession, dir: String)
      : (Seq[graft.ops.MvAdvisor.View], graft.ops.MvAdvisor.View) = {
    import graft.ops.MvAdvisor.View
    val fin = T.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"),
        col("event_type").as("et"))
      .agg(count(lit(1)).as("n"))
      .cache()
    def rowsOf(grain: String, withDim: Boolean): Long = {
      val cols = (grain match {
        case "total" => Seq.empty[org.apache.spark.sql.Column]
        case "hour"  => Seq(col("h"))
        case g       => Seq(date_trunc(g, col("h")))
      }) ++ (if (withDim) Seq(col("et")) else Seq.empty)
      if (cols.isEmpty) 1L else fin.select(cols: _*).distinct().count()
    }
    val views = for {
      (g, tl) <- Seq("hour" -> 3, "day" -> 2, "month" -> 1, "total" -> 0)
      (d, dl) <- Seq("event_type" -> 1, "" -> 0)
    } yield View(s"$g:$d", rowsOf(g, dl == 1), Seq(tl, dl))
    fin.unpersist()
    (views, views.find(_.key == Seq(3, 1)).get)
  }

  private def mvAdvisorLattice(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    import graft.ops.MvAdvisor
    val (views, root) = eventsLattice(spark, dir)
    val pick1 = MvAdvisor.greedy(views, root, 1).headOption.map(_.view.name)
    val rows = views.map { v =>
      val b = if (v eq root) 0L else MvAdvisor.benefit(v, Seq(root), views)
      val Array(g, d) = v.name.split(":", -1)
      (g, d, v.rows, b, pick1.contains(v.name))
    }
    import spark.implicits._
    rows.toDF("time_grain", "dim_set", "view_rows", "benefit1", "picked1")
      .orderBy(col("time_grain"), col("dim_set"))
  }

  private val mvAdvisorLatticeSql =
    """WITH sizes AS (
      |  SELECT 'hour' AS g, 'event_type' AS d, 3 AS tl, 1 AS dl, COUNT(*) AS n
      |    FROM (SELECT DISTINCT date_trunc('hour', ts), event_type FROM events)
      |  UNION ALL SELECT 'hour', '', 3, 0, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('hour', ts) FROM events)
      |  UNION ALL SELECT 'day', 'event_type', 2, 1, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('day', ts), event_type FROM events)
      |  UNION ALL SELECT 'day', '', 2, 0, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('day', ts) FROM events)
      |  UNION ALL SELECT 'month', 'event_type', 1, 1, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('month', ts), event_type FROM events)
      |  UNION ALL SELECT 'month', '', 1, 0, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('month', ts) FROM events)
      |  UNION ALL SELECT 'total', 'event_type', 0, 1, COUNT(*)
      |    FROM (SELECT DISTINCT event_type FROM events)
      |  UNION ALL SELECT 'total', '', 0, 0, 1
      |), ben AS (
      |  SELECT v.g, v.d, v.n,
      |    CASE WHEN v.tl = 3 AND v.dl = 1 THEN 0
      |         ELSE (SELECT COUNT(*) FROM sizes w
      |                WHERE w.tl <= v.tl AND w.dl <= v.dl)
      |              * ((SELECT n FROM sizes r WHERE r.tl = 3 AND r.dl = 1)
      |                 - v.n)
      |    END AS b
      |  FROM sizes v
      |), pick AS (
      |  SELECT g, d FROM ben WHERE b > 0
      |  ORDER BY b DESC, n ASC, g ASC, d ASC LIMIT 1)
      |SELECT b1.g AS time_grain, b1.d AS dim_set,
      |  CAST(b1.n AS BIGINT) AS view_rows, CAST(b1.b AS BIGINT) AS benefit1,
      |  EXISTS (SELECT 1 FROM pick p WHERE p.g = b1.g AND p.d = b1.d)
      |    AS picked1
      |FROM ben b1 ORDER BY time_grain, dim_set""".stripMargin

  // -------------------------------------------------------------------
  // mv_advisor_workload — the advisor under a MEASURED workload
  // (VERDICT r8 #6): weights come from a query log, not supplied
  // constants. The oracle must replay the weighting, so this gate's
  // log is a data-derived proxy it can see — every event row is "one
  // dashboard query" at a lattice node chosen by its event_type (the
  // ops types hit hourly dashboards, conversions hit daily/total
  // rollups) — while the production entry point for the REAL log is
  // [[graft.ops.MvAdvisor.workloadFromHistory]], which feeds per-query
  // medians from BENCH_FULL_HISTORY.jsonl through the same weight
  // parameter (MvAdvisorSpec covers it: a skewed history flips the
  // greedy pick). Output per node: its own workload mass, the mass it
  // COVERS, the workload-weighted HRU benefit, the weighted greedy's
  // first pick, and the DROP hint — covered mass 0 means no query the
  // workload ever runs could route there, so materializing (or
  // keeping) it is pure storage.
  private def mvAdvisorWorkload(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    import graft.ops.MvAdvisor
    val (views, root) = eventsLattice(spark, dir)
    val nodeOf = Map(
      "click" -> "hour:event_type", "view" -> "hour:",
      "purchase" -> "day:event_type", "signup" -> "total:",
      "error" -> "month:event_type")
    val w: Map[String, Long] = T.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("c")).collect()
      .toSeq.map(r => (nodeOf.getOrElse(r.getString(0), "month:"), r.getLong(1)))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum }
    val weight: MvAdvisor.View => Long = v => w.getOrElse(v.name, 0L)
    val pick1 = MvAdvisor.greedy(views, root, 1, weight)
      .headOption.map(_.view.name)
    val drops = MvAdvisor.dropHints(views, weight).map(_.name).toSet
    val rows = views.map { v =>
      val covered = views.filter(MvAdvisor.covers(v, _)).map(weight).sum
      val b = if (v eq root) 0L
        else MvAdvisor.benefit(v, Seq(root), views, weight)
      val Array(g, d) = v.name.split(":", -1)
      (g, d, v.rows, weight(v), covered, b, pick1.contains(v.name),
        drops.contains(v.name))
    }
    import spark.implicits._
    rows.toDF("time_grain", "dim_set", "view_rows", "node_weight",
        "covered_weight", "benefit1", "picked1", "drop_hint")
      .orderBy(col("time_grain"), col("dim_set"))
  }

  private val mvAdvisorWorkloadSql =
    """WITH wmap AS (
      |  SELECT
      |    CASE event_type WHEN 'click' THEN 'hour' WHEN 'view' THEN 'hour'
      |      WHEN 'purchase' THEN 'day' WHEN 'signup' THEN 'total'
      |      ELSE 'month' END AS g,
      |    CASE event_type WHEN 'click' THEN 'event_type'
      |      WHEN 'purchase' THEN 'event_type' WHEN 'error' THEN 'event_type'
      |      ELSE '' END AS d,
      |    COUNT(*) AS wt
      |  FROM events GROUP BY 1, 2
      |), sizes AS (
      |  SELECT 'hour' AS g, 'event_type' AS d, 3 AS tl, 1 AS dl, COUNT(*) AS n
      |    FROM (SELECT DISTINCT date_trunc('hour', ts), event_type FROM events)
      |  UNION ALL SELECT 'hour', '', 3, 0, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('hour', ts) FROM events)
      |  UNION ALL SELECT 'day', 'event_type', 2, 1, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('day', ts), event_type FROM events)
      |  UNION ALL SELECT 'day', '', 2, 0, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('day', ts) FROM events)
      |  UNION ALL SELECT 'month', 'event_type', 1, 1, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('month', ts), event_type FROM events)
      |  UNION ALL SELECT 'month', '', 1, 0, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('month', ts) FROM events)
      |  UNION ALL SELECT 'total', 'event_type', 0, 1, COUNT(*)
      |    FROM (SELECT DISTINCT event_type FROM events)
      |  UNION ALL SELECT 'total', '', 0, 0, 1
      |), ws AS (
      |  SELECT s.*, COALESCE((SELECT SUM(wt) FROM wmap m
      |    WHERE m.g = s.g AND m.d = s.d), 0) AS node_wt
      |  FROM sizes s
      |), cov AS (
      |  SELECT v.*,
      |    (SELECT COALESCE(SUM(w.node_wt), 0) FROM ws w
      |      WHERE w.tl <= v.tl AND w.dl <= v.dl) AS cov_wt
      |  FROM ws v
      |), ben AS (
      |  SELECT *, CASE WHEN tl = 3 AND dl = 1 THEN 0
      |    ELSE cov_wt * ((SELECT n FROM sizes r WHERE r.tl = 3 AND r.dl = 1)
      |                   - n) END AS b
      |  FROM cov
      |), pick AS (
      |  SELECT g, d FROM ben WHERE b > 0
      |  ORDER BY b DESC, n ASC, g ASC, d ASC LIMIT 1)
      |SELECT g AS time_grain, d AS dim_set, CAST(n AS BIGINT) AS view_rows,
      |  CAST(node_wt AS BIGINT) AS node_weight,
      |  CAST(cov_wt AS BIGINT) AS covered_weight,
      |  CAST(b AS BIGINT) AS benefit1,
      |  EXISTS (SELECT 1 FROM pick p WHERE p.g = ben.g AND p.d = ben.d)
      |    AS picked1,
      |  cov_wt = 0 AS drop_hint
      |FROM ben ORDER BY time_grain, dim_set""".stripMargin

  // mv_advisor_shift — the advisor under a WORKLOAD SHIFT (VERDICT r9
  // #5): the same lattice priced under two query logs — W1 the "daily
  // era" (dashboards at day/month/total grains) and W2 the "realtime
  // migration" (every dashboard moved to hour grains) — and the whole
  // decision delta in one table: per node, both workloads' weights,
  // covered mass, the greedy pick under each, and the DROP hints. The
  // shift flips the pick (day:event_type → hour:) and flips six nodes
  // to droppable — under W2 nothing the workload runs can route to any
  // day/month/total view, so a W1-era materialization of day:event_type
  // is pure storage. MvAdvisorSpec's lifecycle test ACTS on exactly
  // this table: materialize W1's pick, shift, materialize W2's pick,
  // unregister + vacuum the now-hinted summary — and the day-grain
  // dashboard query stays green THROUGH the vacuum because the
  // navigator falls back to the finer hour summary. The gate
  // hard-requires the expected picks (a testdata regen that moves them
  // must fail loudly, not silently re-map the lifecycle), and the
  // oracle replays both weightings, both picks, and both drop sets.
  private def mvAdvisorShift(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    import graft.ops.MvAdvisor
    val (views, root) = eventsLattice(spark, dir)
    val nodeW1 = Map("click" -> "day:event_type", "view" -> "day:",
      "purchase" -> "month:event_type", "signup" -> "total:",
      "error" -> "month:event_type")
    val nodeW2 = Map("purchase" -> "hour:event_type",
      "error" -> "hour:event_type")
    val counts = T.events(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def wmap(nodeOf: Map[String, String], dflt: String): Map[String, Long] =
      counts.toSeq.map { case (t, c) => nodeOf.getOrElse(t, dflt) -> c }
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum }
    val w1 = wmap(nodeW1, "month:")
    val w2 = wmap(nodeW2, "hour:")
    val f1: MvAdvisor.View => Long = v => w1.getOrElse(v.name, 0L)
    val f2: MvAdvisor.View => Long = v => w2.getOrElse(v.name, 0L)
    val p1 = MvAdvisor.greedy(views, root, 1, f1).headOption.map(_.view.name)
    val p2 = MvAdvisor.greedy(views, root, 1, f2).headOption.map(_.view.name)
    require(p1.contains("day:event_type") && p2.contains("hour:"),
      s"workload-shift picks moved ($p1, $p2) — the testdata changed " +
        "shape; re-derive the lifecycle mapping before trusting this gate")
    val d1 = MvAdvisor.dropHints(views, f1).map(_.name).toSet
    val d2 = MvAdvisor.dropHints(views, f2).map(_.name).toSet
    val rows = views.map { v =>
      val cov1 = views.filter(MvAdvisor.covers(v, _)).map(f1).sum
      val cov2 = views.filter(MvAdvisor.covers(v, _)).map(f2).sum
      val Array(g, d) = v.name.split(":", -1)
      (g, d, v.rows, f1(v), f2(v), cov1, cov2,
        p1.contains(v.name), p2.contains(v.name),
        d1.contains(v.name), d2.contains(v.name))
    }
    import spark.implicits._
    rows.toDF("time_grain", "dim_set", "view_rows", "w1_weight",
        "w2_weight", "w1_covered", "w2_covered", "picked_w1", "picked_w2",
        "drop_w1", "drop_w2")
      .orderBy(col("time_grain"), col("dim_set"))
  }

  private val mvAdvisorShiftSql =
    """WITH m1 AS (
      |  SELECT
      |    CASE event_type WHEN 'click' THEN 'day' WHEN 'view' THEN 'day'
      |      WHEN 'purchase' THEN 'month' WHEN 'signup' THEN 'total'
      |      ELSE 'month' END AS g,
      |    CASE event_type WHEN 'click' THEN 'event_type'
      |      WHEN 'purchase' THEN 'event_type' WHEN 'error' THEN 'event_type'
      |      ELSE '' END AS d,
      |    COUNT(*) AS wt
      |  FROM events GROUP BY 1, 2
      |), m2 AS (
      |  SELECT 'hour' AS g,
      |    CASE WHEN event_type IN ('purchase', 'error') THEN 'event_type'
      |      ELSE '' END AS d,
      |    COUNT(*) AS wt
      |  FROM events GROUP BY 1, 2
      |), sizes AS (
      |  SELECT 'hour' AS g, 'event_type' AS d, 3 AS tl, 1 AS dl, COUNT(*) AS n
      |    FROM (SELECT DISTINCT date_trunc('hour', ts), event_type FROM events)
      |  UNION ALL SELECT 'hour', '', 3, 0, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('hour', ts) FROM events)
      |  UNION ALL SELECT 'day', 'event_type', 2, 1, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('day', ts), event_type FROM events)
      |  UNION ALL SELECT 'day', '', 2, 0, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('day', ts) FROM events)
      |  UNION ALL SELECT 'month', 'event_type', 1, 1, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('month', ts), event_type FROM events)
      |  UNION ALL SELECT 'month', '', 1, 0, COUNT(*)
      |    FROM (SELECT DISTINCT date_trunc('month', ts) FROM events)
      |  UNION ALL SELECT 'total', 'event_type', 0, 1, COUNT(*)
      |    FROM (SELECT DISTINCT event_type FROM events)
      |  UNION ALL SELECT 'total', '', 0, 0, 1
      |), ws AS (
      |  SELECT s.*,
      |    COALESCE((SELECT SUM(wt) FROM m1 WHERE m1.g = s.g AND m1.d = s.d),
      |      0) AS wt1,
      |    COALESCE((SELECT SUM(wt) FROM m2 WHERE m2.g = s.g AND m2.d = s.d),
      |      0) AS wt2
      |  FROM sizes s
      |), cov AS (
      |  SELECT v.*,
      |    (SELECT COALESCE(SUM(w.wt1), 0) FROM ws w
      |      WHERE w.tl <= v.tl AND w.dl <= v.dl) AS cov1,
      |    (SELECT COALESCE(SUM(w.wt2), 0) FROM ws w
      |      WHERE w.tl <= v.tl AND w.dl <= v.dl) AS cov2
      |  FROM ws v
      |), ben AS (
      |  SELECT *,
      |    CASE WHEN tl = 3 AND dl = 1 THEN 0
      |      ELSE cov1 * ((SELECT n FROM sizes r WHERE r.tl = 3 AND r.dl = 1)
      |                   - n) END AS b1,
      |    CASE WHEN tl = 3 AND dl = 1 THEN 0
      |      ELSE cov2 * ((SELECT n FROM sizes r WHERE r.tl = 3 AND r.dl = 1)
      |                   - n) END AS b2
      |  FROM cov
      |), pick1 AS (
      |  SELECT g, d FROM ben WHERE b1 > 0
      |  ORDER BY b1 DESC, n ASC, g ASC, d ASC LIMIT 1
      |), pick2 AS (
      |  SELECT g, d FROM ben WHERE b2 > 0
      |  ORDER BY b2 DESC, n ASC, g ASC, d ASC LIMIT 1)
      |SELECT g AS time_grain, d AS dim_set, CAST(n AS BIGINT) AS view_rows,
      |  CAST(wt1 AS BIGINT) AS w1_weight, CAST(wt2 AS BIGINT) AS w2_weight,
      |  CAST(cov1 AS BIGINT) AS w1_covered, CAST(cov2 AS BIGINT) AS w2_covered,
      |  EXISTS (SELECT 1 FROM pick1 p WHERE p.g = ben.g AND p.d = ben.d)
      |    AS picked_w1,
      |  EXISTS (SELECT 1 FROM pick2 p WHERE p.g = ben.g AND p.d = ben.d)
      |    AS picked_w2,
      |  cov1 = 0 AS drop_w1,
      |  cov2 = 0 AS drop_w2
      |FROM ben ORDER BY time_grain, dim_set""".stripMargin

  // mv_advisor_e2e — the loop CLOSED: advise → materialize → route.
  // The advisor prices the lattice and picks its top view; the gate
  // refuses to proceed unless the pick is the day×event_type node (it
  // is, at every SF, by a wide margin — a data regen that changed the
  // winner should fail loudly here, not silently materialize the wrong
  // thing), materializes/registers exactly that summary through the
  // shared enableRouting entry point, and then runs the dashboard
  // query at the picked grain in the PORTABLE raw spelling — which
  // SummaryRewrite routes onto the advisor-chosen summary. The oracle
  // recomputes from raw rows, so the whole loop is hash-proven
  // semantics-preserving; MatViewSpec pins that the routed plan scans
  // the summary. At 100 TB this is the workflow: the advisor runs on
  // lattice statistics (one pass, or sketches), its picks feed the
  // same summary-build machinery ingest already maintains, and every
  // dashboard query written naively against the firehose rides them.
  private def mvAdvisorE2e(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val (views, root) = eventsLattice(spark, dir)
    val pick = graft.ops.MvAdvisor.greedy(views, root, 1)
      .headOption.map(_.view.name)
      .getOrElse(sys.error("advisor found no positive-benefit view"))
    require(pick == "day:event_type",
      s"advisor picked '$pick', not day:event_type — the testdata " +
        "changed shape; extend the pick→summary mapping before trusting " +
        "this gate again")
    enableRouting(spark, dir) // materializes + registers the picked view
    T.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast("double").as("sum_value"))
      .orderBy(col("day"), col("event_type"))
  }

  private val mvAdvisorE2eSql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("mv_advisor_lattice", mvAdvisorLattice, Some(mvAdvisorLatticeSql)),
    QueryDef("mv_advisor_workload", mvAdvisorWorkload,
      Some(mvAdvisorWorkloadSql)),
    QueryDef("mv_advisor_shift", mvAdvisorShift, Some(mvAdvisorShiftSql)),
    QueryDef("mv_advisor_e2e", mvAdvisorE2e, Some(mvAdvisorE2eSql)),
    QueryDef("mv_rewrite_daily", mvDaily, Some(mvDailySql)),
    QueryDef("mv_rewrite_joined", mvJoined, Some(mvJoinedSql)),
    QueryDef("mv_rewrite_snowflake", mvSnowflake, Some(mvSnowflakeSql)),
    QueryDef("mv_rewrite_left", mvLeftJoin, Some(mvLeftJoinSql)),
    QueryDef("mv_rewrite_joined_filtered", mvJoinedFiltered,
      Some(mvJoinedFilteredSql)),
    QueryDef("mv_rewrite_daily_filtered", mvDailyFiltered,
      Some(mvDailyFilteredSql)),
    QueryDef("mv_rewrite_day_from_hours_filtered", mvDayFromHoursFiltered,
      Some(mvDayFromHoursFilteredSql)),
    QueryDef("mv_rewrite_daily_total", mvDailyTotal, Some(mvDailyTotalSql)),
    QueryDef("mv_rewrite_orders_daily", mvOrdersDaily, Some(mvOrdersDailySql)),
    QueryDef("mv_rewrite_orders_by_priority", mvOrdersByPriority,
      Some(mvOrdersByPrioritySql)),
    QueryDef("mv_rewrite_pivot", mvPivot, Some(mvPivotSql)),
    QueryDef("mv_rewrite_avg", mvAvg, Some(mvAvgSql)),
    QueryDef("mv_rewrite_rollup", mvRollup, Some(mvRollupSql)),
    QueryDef("mv_rewrite_type_diversity", mvTypeDiversity,
      Some(mvTypeDiversitySql)),
    QueryDef("mv_rewrite_hourly", mvHourly, Some(mvHourlySql)),
    QueryDef("mv_rewrite_monthly", mvMonthly, Some(mvMonthlySql)),
    QueryDef("mv_rewrite_dow_profile", mvDowProfile, Some(mvDowProfileSql)),
    QueryDef("mv_distinct_users_daily", mvDistinctUsers,
      Some(mvDistinctUsersSql)),
    QueryDef("mv_incremental_refresh", mvIncrementalRefresh,
      Some(mvIncrementalRefreshSql)),
    QueryDef("mv_trend_7d", mvTrend7d, Some(mvTrend7dSql)),
    QueryDef("mv_rewrite_having", mvHaving, Some(mvHavingSql))
  )
}
