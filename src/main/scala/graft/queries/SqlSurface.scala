package graft.queries

import graft.{Ctx, QueryDef, T}
import graft.sql.Views
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Queries that enter through the declarative SQL surface
  * ([[graft.sql.Views]]) — SQL text in, DataFrame out — proving the
  * engine is consumable without the Scala API. Two deliberate extremes:
  *
  *  - `sql_q6_forecast`: the Spark query text IS the oracle text,
  *    character for character — the surface is ANSI enough that the
  *    same statement runs unmodified on both engines.
  *  - `sql_rabin_karp`: SQL text calling a graft-registered custom
  *    Catalyst expression (`rabin_karp`) — extensions are first-class
  *    in the SQL surface, not Scala-only, and still plan to the
  *    codegen'd expression (PlanSpec pins it).
  */
object SqlSurface {

  // -------------------------------------------------------------------
  // sql_q6_forecast — TPC-H Q6 shape (scan-filter-aggregate, zero
  // joins): the canonical "does the filter reach the scan" probe. All
  // three predicates push to parquet; the aggregate folds through exact
  // DECIMAL and surfaces one double. Same text on Spark and DuckDB.
  private val q6Text =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  private def q6(spark: SparkSession, dir: String): DataFrame =
    Views.sql(spark, dir, q6Text)

  // -------------------------------------------------------------------
  // sql_rabin_karp — the registered custom expression, invoked from SQL
  // text. Same polynomial fold as doc_rolling_hash's portable spelling,
  // but entering through the function registry: SQL users get the
  // codegen'd expression directly (no optimizer-rule rewrite needed).
  private def sqlRabin(spark: SparkSession, dir: String): DataFrame =
    Views.sql(spark, dir,
      "SELECT doc_id, rabin_karp(text) AS rhash FROM documents ORDER BY doc_id")

  private val sqlRabinSql =
    """SELECT doc_id,
      |  list_reduce(list_transform(range(1, length(text) + 1),
      |    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
      |    (a, c) -> (a * 31 + c) % 1000000007) AS rhash
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // sql_recursive_months — WITH RECURSIVE (new in Spark 4) generating a
  // month spine over the full order-date domain, left-joined to per-
  // month order aggregates: the canonical gap-filling time-series shape
  // (TPC-H orders stop 1998-08, so the spine's 1998-09..12 rows
  // materialize with zero counts — rows a plain GROUP BY can never
  // emit). The recursion is O(#months) single rows — driver-trivial
  // state; the aggregate side is the usual partial-aggregated hash
  // aggregate, joined on an equi month key (a string key, because
  // Spark's date_trunc returns TIMESTAMP while DuckDB's returns DATE —
  // date_format/strftime give an engine-identical join key).
  private val recMonthsText =
    """WITH RECURSIVE months(m) AS (
      |  SELECT DATE '1992-01-01'
      |  UNION ALL SELECT m + INTERVAL '1' MONTH FROM months
      |  WHERE m < DATE '1998-12-01')
      |SELECT date_format(m, 'yyyy-MM') AS month_key,
      |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
      |    AS total_price
      |FROM months LEFT JOIN orders
      |  ON date_format(o_orderdate, 'yyyy-MM') = date_format(m, 'yyyy-MM')
      |GROUP BY month_key
      |ORDER BY month_key""".stripMargin

  private def recMonths(spark: SparkSession, dir: String): DataFrame =
    Views.sql(spark, dir, recMonthsText)

  private val recMonthsSql =
    """WITH RECURSIVE months(m) AS (
      |  SELECT DATE '1992-01-01'
      |  UNION ALL SELECT m + INTERVAL '1' MONTH FROM months
      |  WHERE m < DATE '1998-12-01')
      |SELECT strftime(m, '%Y-%m') AS month_key,
      |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
      |    AS total_price
      |FROM months LEFT JOIN orders
      |  ON strftime(o_orderdate, '%Y-%m') = strftime(m, '%Y-%m')
      |GROUP BY month_key
      |ORDER BY month_key""".stripMargin

  // -------------------------------------------------------------------
  // sql_lateral_topk — LATERAL correlated subquery: top-3 customers by
  // balance per nation, the "for each row, run this parameterized
  // query" shape. Catalyst decorrelates the LATERAL into a ranked
  // window join (no per-row re-execution); the SAME text runs on
  // DuckDB, so the statement itself is the oracle, q6-style.
  private val lateralTopkText =
    """SELECT n_name AS nation, c_name, c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 3) t
      |ORDER BY nation, c_acctbal DESC, c_name""".stripMargin

  private def lateralTopk(spark: SparkSession, dir: String): DataFrame =
    Views.sql(spark, dir, lateralTopkText)

  // -------------------------------------------------------------------
  // sql_udaf_weighted_avg — a typed Aggregator invoked from SQL TEXT:
  // `functions.udaf` wraps graft's exact-decimal WeightedAvg and
  // `spark.udf.register` puts it in the session registry, so plain SQL
  // users get the custom aggregate (partial/merge/finish runs as a real
  // two-phase hash aggregate — same shuffle shape as any built-in agg).
  // Completes the SQL-surface story: custom scalar expressions
  // (sql_rabin_karp) AND custom aggregates are both SQL-callable.
  // Oracle replays the exact-decimal fold relationally.
  private def sqlUdafWavg(spark: SparkSession, dir: String): DataFrame = {
    // register once per session: re-registering WARNs in the bench tail
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("wavg")))
      spark.udf.register("wavg",
        org.apache.spark.sql.functions.udaf(graft.functions.Udafs.WeightedAvg))
    Views.sql(spark, dir,
      """SELECT l_returnflag, wavg(l_extendedprice, l_quantity) AS wavg_price,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  private val sqlUdafWavgSql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------
  // sql_mv_daily — the materialized-view routing rule (SURVEY B47)
  // firing on SQL TEXT: the statement is the portable raw aggregate a
  // BI tool would emit against the events view; by optimization time the
  // temp-view alias and the no-op CAST are gone and SummaryRewrite plans
  // the scan onto the day×type summary (MatViewSpec pins the swap for
  // the SQL path too). Same text runs on DuckDB = the oracle, q6-style
  // — which here means the oracle recomputes from RAW rows while Spark
  // reads the summary, so the hash match proves the route exact.
  private val sqlMvDailyText =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  private def sqlMvDaily(spark: SparkSession, dir: String): DataFrame = {
    graft.queries.MatView.enableRouting(spark, dir)
    Views.sql(spark, dir, sqlMvDailyText)
  }

  // The filtered-dashboard spelling on SQL TEXT (VERDICT r6 top item):
  // the WHERE's day-aligned ts bounds + type predicate are peeled by
  // SummaryRewrite and re-anchored onto the summary columns, so the BI
  // statement a tool emits verbatim routes too. Same text is the DuckDB
  // oracle over RAW rows — the routed filter is hash-proven exact.
  private val sqlMvDailyFilteredText =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-22 00:00:00'
      |  AND event_type <> 'error'
      |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  private def sqlMvDailyFiltered(spark: SparkSession, dir: String): DataFrame = {
    graft.queries.MatView.enableRouting(spark, dir)
    Views.sql(spark, dir, sqlMvDailyFilteredText)
  }

  // The pivot-dashboard spelling on SQL TEXT: standard FILTER (WHERE …)
  // conditional aggregates, one per segment. SummaryRewrite re-anchors
  // each FILTER's dim predicate onto the summary columns (whole-bucket
  // predicates; count FILTER coalesces to 0), so the segmented
  // dashboard statement a BI tool emits verbatim routes too. Same text
  // is the DuckDB oracle over RAW rows.
  private val sqlMvPivotText =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_all,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
      |    AS n_click,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |    FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  private def sqlMvPivot(spark: SparkSession, dir: String): DataFrame = {
    graft.queries.MatView.enableRouting(spark, dir)
    Views.sql(spark, dir, sqlMvPivotText)
  }

  // GROUP BY ROLLUP on SQL TEXT — the grouping-sets navigator firing on
  // the verbatim warehouse spelling: the parser/analyzer produce the
  // same Aggregate-over-Expand shape as DataFrame .rollup, so
  // SummaryRewrite swaps the Expand's source for the day summary and
  // detail rows, subtotals and the grand total all re-aggregate
  // |days|×|types| summary rows. Same text is the DuckDB oracle over
  // RAW rows (strftime/date_format labels differ per engine, so the
  // oracle carries its own spelling).
  private val sqlMvRollupText =
    """SELECT
      |  COALESCE(date_format(date_trunc('day', ts), 'yyyy-MM-dd'), 'ALL')
      |    AS day_s,
      |  COALESCE(event_type, 'ALL') AS type_s,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY ROLLUP (date_trunc('day', ts), event_type)
      |ORDER BY day_s, type_s""".stripMargin

  private val sqlMvRollupOracle =
    """SELECT
      |  COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL')
      |    AS day_s,
      |  COALESCE(event_type, 'ALL') AS type_s,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY ROLLUP (date_trunc('day', ts), event_type)
      |ORDER BY day_s, type_s""".stripMargin

  private def sqlMvRollup(spark: SparkSession, dir: String): DataFrame = {
    graft.queries.MatView.enableRouting(spark, dir)
    Views.sql(spark, dir, sqlMvRollupText)
  }

  // HAVING on SQL TEXT (VERDICT r7 #7): the analyzer plans HAVING as a
  // Filter over the Aggregate's output, so the route fires on the
  // Aggregate underneath and the threshold filters summary-cheap rows.
  // Same text runs on DuckDB over RAW rows.
  private val sqlMvHavingText =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 HAVING COUNT(*) > 40
      |ORDER BY day, event_type""".stripMargin

  private def sqlMvHaving(spark: SparkSession, dir: String): DataFrame = {
    graft.queries.MatView.enableRouting(spark, dir)
    Views.sql(spark, dir, sqlMvHavingText)
  }

  // GROUP BY GROUPING SETS on SQL TEXT — the explicit-lattice spelling
  // (detail, per-type, grand total); the analyzer builds the same
  // Aggregate-over-Expand as ROLLUP, so the navigator swaps the source
  // and every set re-aggregates summary rows. Engine-specific date
  // formatting keeps a separate oracle spelling, like sql_mv_rollup.
  private val sqlMvGsetsText =
    """SELECT
      |  COALESCE(date_format(date_trunc('day', ts), 'yyyy-MM-dd'), 'ALL')
      |    AS day_s,
      |  COALESCE(event_type, 'ALL') AS type_s,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY GROUPING SETS ((date_trunc('day', ts), event_type),
      |  (event_type), ())
      |ORDER BY day_s, type_s""".stripMargin

  private val sqlMvGsetsOracle =
    """SELECT
      |  COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL')
      |    AS day_s,
      |  COALESCE(event_type, 'ALL') AS type_s,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY GROUPING SETS ((date_trunc('day', ts), event_type),
      |  (event_type), ())
      |ORDER BY day_s, type_s""".stripMargin

  private def sqlMvGsets(spark: SparkSession, dir: String): DataFrame = {
    graft.queries.MatView.enableRouting(spark, dir)
    Views.sql(spark, dir, sqlMvGsetsText)
  }

  // The STAR-SCHEMA dashboard on SQL TEXT (VERDICT r7 #1): aggregate
  // over events joined to an inline VALUES dimension on the
  // summary-carried event_type. SummaryRewrite swaps the fact side for
  // the summary UNDER the join (MatViewSpec pins the swap); the same
  // text runs on DuckDB over RAW joined rows.
  private val sqlMvJoinedText =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, d.category,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events e JOIN (VALUES ('click','engagement'),
      |  ('view','engagement'), ('purchase','conversion'),
      |  ('signup','conversion'), ('error','ops'))
      |  AS d(event_type, category) USING (event_type)
      |GROUP BY 1, 2 ORDER BY day, category""".stripMargin

  private def sqlMvJoined(spark: SparkSession, dir: String): DataFrame = {
    graft.queries.MatView.enableRouting(spark, dir)
    Views.sql(spark, dir, sqlMvJoinedText)
  }

  // -------------------------------------------------------------------
  // sql_window_topk — the PORTABLE top-k-per-group window spelling on
  // SQL TEXT. The statement is what a BI tool emits (row_number window,
  // rn <= 3 filter, rank column dropped); WindowTopKRewrite swaps in the
  // bounded-heap TopKPerGroup operator — no partition sort, ≤ groups·k
  // rows through the exchange (SqlSurfaceSpec pins the physical node).
  // Same text is the DuckDB oracle; o_orderkey tie-break totalizes the
  // order so both engines keep identical survivors.
  private val sqlWindowTopkText =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  private def sqlWindowTopk(spark: SparkSession, dir: String): DataFrame =
    Views.sql(spark, dir, sqlWindowTopkText)

  // sql_rollup — ROLLUP grouping sets on SQL text, planned onto the same
  // single-shuffle Expand+HashAggregate as the DataFrame rollup gates
  // (B5). NULLS FIRST pinned in the text: Spark's ASC default is
  // nulls-first, DuckDB's is nulls-last — the oracle must sort the
  // subtotal rows identically or the row hash misaligns.
  private val sqlRollupText =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  private def sqlRollup(spark: SparkSession, dir: String): DataFrame =
    Views.sql(spark, dir, sqlRollupText)

  // sql_heavy_hitters — the bounded-state SpaceSaving aggregate invoked
  // from SQL TEXT (functions/SpaceSaving.scala): per-day top event types
  // off a 64-counter summary, exploded and ranked. Under capacity the
  // sketch is exact (see events_heavy_hitters), so the oracle recomputes
  // from plain counts; the point here is that the sketch surface is
  // first-class in SQL, not Scala-only — same contract as sql_rabin_karp
  // for scalar expressions and sql_udaf_weighted_avg for UDAFs.
  private val sqlHeavyText =
    """SELECT day, event_type, cnt, rank FROM (
      |  SELECT day, e.value AS event_type, e.cnt AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY day
      |      ORDER BY e.cnt DESC, e.value) AS rank
      |  FROM (
      |    SELECT day, explode(s) AS e FROM (
      |      SELECT date_trunc('day', ts) AS day,
      |        space_saving(event_type, 64) AS s
      |      FROM events GROUP BY 1))) t
      |WHERE rank <= 3 ORDER BY day, rank""".stripMargin

  private def sqlHeavy(spark: SparkSession, dir: String): DataFrame =
    Views.sql(spark, dir, sqlHeavyText)

  private val sqlHeavyOracle =
    """WITH c AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type, cnt, rank FROM (
      |  SELECT day, event_type, cnt,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY day ORDER BY cnt DESC, event_type) AS INT) AS rank
      |  FROM c) t
      |WHERE rank <= 3 ORDER BY day, rank""".stripMargin

  // sql_pipe_syntax — Spark 4's SQL pipe operators (SPARK-49555): the
  // linear FROM |> WHERE |> AGGREGATE |> ORDER BY spelling plans to the
  // exact same scan-filter-aggregate as the nested classic form. The
  // oracle is the classic ANSI spelling — proving the pipe surface is
  // sugar over identical semantics, not a dialect fork.
  private val sqlPipeText =
    """FROM orders
      ||> WHERE o_orderstatus = 'F'
      ||> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
      |     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |   GROUP BY o_orderpriority
      ||> ORDER BY o_orderpriority""".stripMargin

  private def sqlPipe(spark: SparkSession, dir: String): DataFrame =
    Views.sql(spark, dir, sqlPipeText)

  private val sqlPipeOracle =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // sql_parameterized — named parameter markers (Spark 3.4+): the query
  // text carries :lo/:hi/:status placeholders and the values bind at
  // execution, the injection-safe surface a service exposes. The oracle
  // inlines the same literals.
  private def sqlParameterized(spark: SparkSession, dir: String): DataFrame =
    Views.register(spark, dir).sql(
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= CAST(:lo AS TIMESTAMP)
        |  AND o_orderdate < CAST(:hi AS TIMESTAMP)
        |  AND o_orderstatus = :status
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      Map("lo" -> "1995-01-01", "hi" -> "1996-01-01", "status" -> "O"))

  private val sqlParameterizedOracle =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-01-01'
      |  AND o_orderstatus = 'O'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // sql_join_hints — the join-strategy hint surface: SHUFFLE_HASH forces
  // a shuffled hash join where the planner's default for a small dim is
  // broadcast. Hints are the 100 TB escape hatch when statistics mislead
  // (a "small" side that explodes after filters, a broadcast that OOMs);
  // results must be hint-invariant, so the oracle is the plain join and
  // SqlSurfaceSpec pins that the physical strategy actually moved.
  private val sqlJoinHintsText =
    """SELECT /*+ SHUFFLE_HASH(c) */ c.c_mktsegment,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  private def sqlJoinHints(spark: SparkSession, dir: String): DataFrame =
    Views.sql(spark, dir, sqlJoinHintsText)

  private val sqlJoinHintsOracle =
    """SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  // fn_collation_distinct — Spark 4 collations: UTF8_LCASE equality
  // folds case at COMPARE time (no data rewrite), here counting brands
  // case-insensitively over a deterministically case-mangled key. The
  // oracle lowers explicitly — proving collated distinct ≡ lower()
  // distinct on this (ASCII) domain while the engine-side spelling keeps
  // the original bytes intact.
  private def collationDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.Ctx.prep(spark)
    T.part(spark, dir)
      .withColumn("k",
        when(pmod(col("p_partkey"), org.apache.spark.sql.functions.lit(2)) === 0,
          upper(col("p_brand"))).otherwise(lower(col("p_brand"))))
      .agg(
        countDistinct(collate(col("k"), "UTF8_LCASE")).as("n_brands_ci"),
        countDistinct(col("k")).as("n_brands_cs"))
  }

  private val collationDistinctSql =
    """SELECT CAST(COUNT(DISTINCT lower(k)) AS BIGINT) AS n_brands_ci,
      |  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_brands_cs
      |FROM (SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
      |             ELSE lower(p_brand) END AS k FROM part)""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("sql_join_hints", sqlJoinHints, Some(sqlJoinHintsOracle)),
    QueryDef("fn_collation_distinct", collationDistinct,
      Some(collationDistinctSql)),
    QueryDef("sql_pipe_syntax", sqlPipe, Some(sqlPipeOracle)),
    QueryDef("sql_parameterized", sqlParameterized,
      Some(sqlParameterizedOracle)),
    QueryDef("sql_heavy_hitters", sqlHeavy, Some(sqlHeavyOracle)),
    QueryDef("sql_q6_forecast", q6, Some(q6Text)),
    QueryDef("sql_rabin_karp", sqlRabin, Some(sqlRabinSql)),
    QueryDef("sql_recursive_months", recMonths, Some(recMonthsSql)),
    QueryDef("sql_lateral_topk", lateralTopk, Some(lateralTopkText)),
    QueryDef("sql_udaf_weighted_avg", sqlUdafWavg, Some(sqlUdafWavgSql)),
    QueryDef("sql_mv_daily", sqlMvDaily, Some(sqlMvDailyText)),
    QueryDef("sql_mv_daily_filtered", sqlMvDailyFiltered,
      Some(sqlMvDailyFilteredText)),
    QueryDef("sql_mv_pivot", sqlMvPivot, Some(sqlMvPivotText)),
    QueryDef("sql_mv_rollup", sqlMvRollup, Some(sqlMvRollupOracle)),
    QueryDef("sql_mv_having", sqlMvHaving, Some(sqlMvHavingText)),
    QueryDef("sql_mv_gsets", sqlMvGsets, Some(sqlMvGsetsOracle)),
    QueryDef("sql_mv_joined", sqlMvJoined, Some(sqlMvJoinedText)),
    QueryDef("sql_window_topk", sqlWindowTopk, Some(sqlWindowTopkText)),
    QueryDef("sql_rollup", sqlRollup, Some(sqlRollupText)))
}
