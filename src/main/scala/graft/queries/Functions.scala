package graft.queries

import graft.{Ctx, QueryDef, T}
import graft.functions.Udafs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Extended function surface (SURVEY §2b B16/B17): a scalar built-in
  * battery (projection-only — codegen'd, zero shuffles), one real Scala
  * UDF (the reference's multi-format date parse as an opaque-function
  * fallback; the production path is the `coalesce(to_date…)` expression
  * in graft.etl.Transform, which Catalyst can push/prune/fold — the UDF
  * exists to exercise the extension surface and document its cost), and
  * the two typed Aggregators from graft.functions.Udafs running as real
  * partial/final Catalyst aggregates.
  */
object Functions {
  private val D = DecimalType(18, 2)

  // -------------------------------------------------------------------
  // fn_scalar_battery — string/date/math built-ins over orders, all
  // bit-deterministic cross-engine (no libm-dependent fns like log/exp —
  // sqrt IS exact by IEEE 754).
  private def battery(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.orders(spark, dir).select(
      col("o_orderkey"),
      upper(substring(col("o_orderpriority"), 1, 3)).as("pri3"),
      length(col("o_orderpriority")).as("pri_len"),
      regexp_extract(col("o_orderpriority"), "(\\d+)", 1).as("pri_num"),
      abs(col("o_totalprice").cast(D)).cast("double").as("abs_price"),
      round(col("o_totalprice").cast(D) / lit(1000).cast(D), 1)
        .cast("double").as("price_k"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dom"),
      datediff(lit("1995-01-01").cast("date"), col("o_orderdate"))
        .as("days_to_95"),
      pmod(col("o_orderkey"), lit(7)).as("key_mod7"),
      sqrt(col("o_orderkey").cast("double")).as("key_sqrt"),
      concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("tag"))
      .orderBy(col("o_orderkey"))
  }

  private val batterySql =
    """SELECT o_orderkey,
      |  upper(substring(o_orderpriority, 1, 3)) AS pri3,
      |  CAST(length(o_orderpriority) AS INT) AS pri_len,
      |  regexp_extract(o_orderpriority, '(\d+)', 1) AS pri_num,
      |  CAST(abs(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS abs_price,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) / CAST(1000 AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_k,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1995-01-01') AS INT) AS days_to_95,
      |  o_orderkey % 7 AS key_mod7,
      |  sqrt(CAST(o_orderkey AS DOUBLE)) AS key_sqrt,
      |  o_orderstatus || '#' || o_orderpriority AS tag
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // fn_date_parse_udf — the reference's try-3-formats parse (reference
  // src/transform.py:7-23) as a Scala UDF over synthesized date strings,
  // aggregated to per-year counts. NULL year (unparseable) → -1.
  // single-letter day/month patterns: strptime's %d/%m/%b accept
  // unpadded fields ("1/2/2020", "Mar 5 2020"), and so must the twin —
  // the same VERDICT r11 #6 leniency etl/Transform.parseDate carries
  private val Formats = Seq("yyyy-M-d", "d/M/yyyy", "MMM d yyyy")

  private def parseDateUdf = udf { (s: String) =>
    if (s == null) null
    else {
      val t = s.trim
      Formats.iterator.map { f =>
        try java.sql.Date.valueOf(java.time.LocalDate.parse(t,
          java.time.format.DateTimeFormatter.ofPattern(f, java.util.Locale.US)))
        catch { case _: java.time.format.DateTimeParseException => null }
      }.collectFirst { case d if d != null => d }.orNull
    }
  }

  private def dateParse(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val k = col("o_orderkey")
    T.orders(spark, dir)
      .select(
        when(k % 4 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .when(k % 4 === 1, date_format(col("o_orderdate"), "dd/MM/yyyy"))
          .when(k % 4 === 2, date_format(col("o_orderdate"), "MMM dd yyyy"))
          .otherwise(lit("not-a-date")).as("ds"))
      .withColumn("parsed", parseDateUdf(col("ds")))
      .groupBy(coalesce(year(col("parsed")), lit(-1)).as("yr"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("yr"))
  }

  private val dateParseSql =
    """WITH ds AS (
      |  SELECT CASE
      |    WHEN o_orderkey % 4 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
      |    WHEN o_orderkey % 4 = 1 THEN strftime(o_orderdate, '%d/%m/%Y')
      |    WHEN o_orderkey % 4 = 2 THEN strftime(o_orderdate, '%b %d %Y')
      |    ELSE 'not-a-date' END AS s
      |  FROM orders),
      |p AS (
      |  SELECT COALESCE(try_strptime(s, '%Y-%m-%d'),
      |                  try_strptime(s, '%d/%m/%Y'),
      |                  try_strptime(s, '%b %d %Y')) AS parsed
      |  FROM ds)
      |SELECT CAST(COALESCE(year(parsed), -1) AS INT) AS yr,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM p GROUP BY yr ORDER BY yr""".stripMargin

  // -------------------------------------------------------------------
  // fn_weighted_avg — typed Aggregator as a Catalyst UDAF: quantity-
  // weighted mean extended price per return flag.
  private def weightedAvg(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val wavg = udaf(Udafs.WeightedAvg)
    T.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val weightedAvgSql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------
  // fn_median_value — exact-median Aggregator per event_type (DuckDB
  // interpolation rule). CAUTION — memory bound: each group's buffer
  // holds every value in the group, so this is strictly for
  // bounded-size groups (here ~N/5 doubles per buffer — fine at test
  // SF, an executor OOM at raw scale). The production path for
  // unbounded groups is fn_median_approx below (percentile_approx,
  // O(accuracy) buffer), gated against DuckDB with a tolerance oracle.
  private def median(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val med = udaf(Udafs.ExactMedian)
    T.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(med(col("value")).as("median_value"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  private val medianSql =
    """SELECT event_type, median(value) AS median_value,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // fn_median_approx — the bounded-memory scale path for medians:
  // percentile_approx (Greenwald–Khanna summary, O(accuracy) buffer per
  // group) instead of ExactMedian's O(group-size) buffer above.
  // Approx sketches aren't bit-reproducible across engines, so the gated
  // claim is the error CONTRACT: each engine checks its own approx
  // median against its own exact median and reports whether it lands
  // within 2% — both must say yes. (DuckDB's approx_quantile is a
  // t-digest; same contract, different sketch.) 2% because GK returns an
  // actual element while the exact even-n median interpolates BETWEEN
  // two elements: at n≈200 (sf0.001 groups) the element-to-midpoint gap
  // alone approaches value-spacing/median ≈ 1%, independent of sketch
  // accuracy. The exact percentile here is the check, not the scale
  // path.
  private def medianApprox(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_med"),
        expr("percentile(value, 0.5)").as("exact_med"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        (abs(col("approx_med") - col("exact_med")) <=
          greatest(abs(col("exact_med")), lit(1.0)) * 0.02).as("within_tol"))
      .orderBy(col("event_type"))
  }

  private val medianApproxSql =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  abs(approx_quantile(value, 0.5) - median(value))
      |    <= greatest(abs(median(value)), 1.0) * 0.02 AS within_tol
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------------
  // fn_null_battery — null-handling scalar surface: coalesce / nullif /
  // nvl2-style dispatch / null-aware counting, exercised over
  // in-plan-synthesized nulls (the driver tables are fully populated, so
  // the null paths must be forced to actually execute). Pure projection
  // + one aggregate — map-side at any scale.
  private def nullBattery(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val k = col("o_orderkey")
    T.orders(spark, dir)
      .select(col("o_orderkey"),
        when(k % 3 === 0, col("o_orderpriority")).as("p3"), // null 2/3 of rows
        nullif(col("o_orderstatus"), lit("O")).as("s"))
      .select(
        coalesce(col("p3"), lit("<missing>")).as("p_filled"),
        when(col("p3").isNull, "absent").otherwise("present").as("p_flag"),
        coalesce(col("s"), lit("open")).as("s_filled"))
      .groupBy(col("p_filled"), col("p_flag"), col("s_filled"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("p_filled"), col("p_flag"), col("s_filled"))
  }

  private val nullBatterySql =
    """WITH b AS (
      |  SELECT CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END AS p3,
      |    nullif(o_orderstatus, 'O') AS s
      |  FROM orders)
      |SELECT coalesce(p3, '<missing>') AS p_filled,
      |  CASE WHEN p3 IS NULL THEN 'absent' ELSE 'present' END AS p_flag,
      |  coalesce(s, 'open') AS s_filled,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM b GROUP BY 1, 2, 3 ORDER BY p_filled, p_flag, s_filled""".stripMargin

  // -------------------------------------------------------------------
  // fn_percentile_battery — exact interpolated quantiles (p25/p50/p75/
  // p90) per order status: Spark `percentile` and DuckDB `quantile_cont`
  // share the definition q = lower + (upper−lower)·frac at rank
  // p·(n−1), so values agree to the last ULP on the same doubles;
  // rounded to 4dp so a ULP wobble in the interpolation multiply can't
  // flip the hash. Exact percentile sorts per group — the bounded-memory
  // scale path is fn_median_approx's sketch; this battery is the
  // reference-precision check.
  private def percentileBattery(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    def p(q: Double, name: String) =
      round(expr(s"percentile(o_totalprice, $q)"), 4).as(name)
    T.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), p(0.25, "p25"), p(0.5, "p50"),
        p(0.75, "p75"), p(0.9, "p90"))
      .orderBy(col("o_orderstatus"))
  }

  private val percentileBatterySql =
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // fn_datetrunc_battery — calendar truncation lattice: orders per month
  // with the month's week-aligned and quarter/year anchors. date_trunc
  // is the partition-pruning workhorse at scale (daily/monthly partition
  // keys derive from it); both engines truncate weeks to Monday (ISO).
  private def datetruncBattery(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
      .agg(count(lit(1)).as("n"),
        min(date_trunc("week", col("o_orderdate")).cast("date")).as("first_week"),
        max(to_date(col("o_orderdate"))).as("last_day"))
      .withColumn("quarter_start",
        date_trunc("quarter", col("month_start")).cast("date"))
      .withColumn("year_start", date_trunc("year", col("month_start")).cast("date"))
      .orderBy(col("month_start"))
  }

  private val datetruncBatterySql =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(CAST(date_trunc('week', o_orderdate) AS DATE)) AS first_week,
      |  MAX(CAST(o_orderdate AS DATE)) AS last_day,
      |  CAST(date_trunc('quarter', CAST(date_trunc('month', o_orderdate) AS DATE)) AS DATE) AS quarter_start,
      |  CAST(date_trunc('year', CAST(date_trunc('month', o_orderdate) AS DATE)) AS DATE) AS year_start
      |FROM orders GROUP BY 1 ORDER BY month_start""".stripMargin

  // -------------------------------------------------------------------
  // fn_mode_priority — deterministic mode: most frequent order priority
  // per status. Built-in `mode()` breaks ties arbitrarily in both
  // engines, so the gated form IS the deterministic idiom: count per
  // value, rank by (count desc, value asc), keep rank 1. Two shuffles,
  // both on already-tiny data.
  private def modePriority(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val counts = T.orders(spark, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("cnt").desc, col("o_orderpriority"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("cnt").as("n_mode"))
      .orderBy(col("o_orderstatus"))
  }

  private val modePrioritySql =
    """SELECT o_orderstatus, o_orderpriority AS mode_priority,
      |  CAST(cnt AS BIGINT) AS n_mode FROM (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY COUNT(*) DESC, o_orderpriority) AS rk
      |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
      |WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // fn_try_battery — the ANSI-safe try_* family (Spark 3.2+/4): each
  // returns NULL where the strict operator would raise — division by
  // zero, int64 overflow, malformed cast, out-of-bounds element — which
  // is the semantics a fault-tolerant 100 TB pipeline wants (one bad row
  // must not kill a 10-hour job; the null routes to the dead-letter
  // split instead). The engine pins ANSI OFF session-wide for the
  // reference's coerce contract, but try_* documents intent per
  // EXPRESSION and keeps the same answer if a consumer turns ANSI on.
  // Counts + 6dp-rounded min/max keep the oracle float-safe (no
  // cross-engine sum of division doubles).
  private def tryBattery(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.orders(spark, dir)
      .select(
        (col("o_orderkey") % 5).as("m"),
        expr("try_divide(o_totalprice, o_orderkey % 5)").as("d"),
        expr("try_add(o_orderkey, 9223372036854775807L)").as("a"),
        expr("try_cast(o_orderpriority AS INT)").as("c"),
        expr("try_element_at(array(o_orderstatus), 5)").as("e"))
      .groupBy(col("m"))
      .agg(
        count(lit(1)).as("n"),
        count(col("d")).as("n_div_ok"),
        round(min(col("d")), 6).as("min_div"),
        round(max(col("d")), 6).as("max_div"),
        count(col("a")).as("n_add_ok"),
        count(col("c")).as("n_cast_ok"),
        count(col("e")).as("n_elem_ok"))
      .orderBy(col("m"))
  }

  private val tryBatterySql =
    """WITH b AS (
      |  SELECT o_orderkey % 5 AS m,
      |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
      |         ELSE o_totalprice / (o_orderkey % 5) END AS d,
      |    CASE WHEN o_orderkey = 0 THEN 9223372036854775807 END AS a,
      |    TRY_CAST(o_orderpriority AS INT) AS c,
      |    ([o_orderstatus])[5] AS e
      |  FROM orders)
      |SELECT m, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(d) AS BIGINT) AS n_div_ok,
      |  ROUND(MIN(d), 6) AS min_div, ROUND(MAX(d), 6) AS max_div,
      |  CAST(COUNT(a) AS BIGINT) AS n_add_ok,
      |  CAST(COUNT(c) AS BIGINT) AS n_cast_ok,
      |  CAST(COUNT(e) AS BIGINT) AS n_elem_ok
      |FROM b GROUP BY m ORDER BY m""".stripMargin

  // -------------------------------------------------------------------
  // fn_array_battery — the higher-order array surface (B16's collection
  // half): collect_list→sort_array (order-independent array build),
  // aggregate (fold), zip_with + reverse (positional pairing), filter,
  // element_at (±index), array_contains, sequence, flatten, slice —
  // all integer-exact, all codegen-friendly lambdas over SMALL per-row
  // arrays (≤7 lineitems per order — the interpreted-HOF rule from
  // SCALE.md holds: per-row work is O(array), never O(corpus)). The
  // oracle never mirrors the array functions: DuckDB REPLAYS each
  // quantity relationally (self-join for the reversed pairing, closed
  // forms for the sequence fold), so a Spark HOF bug cannot hide behind
  // an identical oracle bug.
  private def arrayBattery(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.lineitem(spark, dir)
      .filter(col("l_orderkey") % 97 === 0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber").cast("long"))).as("arr"))
      .select(
        col("l_orderkey"),
        size(col("arr")).cast("long").as("n"),
        expr("aggregate(arr, 0L, (acc, x) -> acc + x)").as("sum_ln"),
        expr("""aggregate(zip_with(arr, reverse(arr), (x, y) -> x * y),
                0L, (acc, x) -> acc + x)""").as("dot_rev"),
        expr("size(filter(arr, x -> x % 2 = 0))").cast("long").as("n_even"),
        element_at(col("arr"), 1).as("ln_min"),
        element_at(col("arr"), -1).as("ln_max"),
        expr("array_contains(arr, 3L)").as("has3"),
        expr("""aggregate(sequence(1L, cast(size(arr) as long)),
                0L, (acc, x) -> acc + x * x)""").as("sq_pyramid"),
        size(flatten(array(col("arr"), slice(col("arr"), 1, 2))))
          .cast("long").as("n_flat2"))
      .orderBy(col("l_orderkey"))
  }

  private val arrayBatterySql =
    """WITH b AS (
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
      |    CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber)
      |      AS BIGINT) AS i,
      |    CAST(COUNT(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n
      |  FROM lineitem WHERE l_orderkey % 97 = 0),
      |p AS (
      |  SELECT a.l_orderkey, a.ln, a.n, r.ln AS rev
      |  FROM b a JOIN b r
      |    ON a.l_orderkey = r.l_orderkey AND r.i = a.n + 1 - a.i)
      |SELECT l_orderkey,
      |  CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(SUM(ln) AS BIGINT) AS sum_ln,
      |  CAST(SUM(ln * rev) AS BIGINT) AS dot_rev,
      |  CAST(SUM(CASE WHEN ln % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
      |  MIN(ln) AS ln_min,
      |  MAX(ln) AS ln_max,
      |  bool_or(ln = 3) AS has3,
      |  CAST(MAX(n) * (MAX(n) + 1) * (2 * MAX(n) + 1) // 6 AS BIGINT)
      |    AS sq_pyramid,
      |  CAST(MAX(n) + LEAST(MAX(n), 2) AS BIGINT) AS n_flat2
      |FROM p GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("fn_array_battery", arrayBattery, Some(arrayBatterySql)),
    QueryDef("fn_try_battery", tryBattery, Some(tryBatterySql)),
    QueryDef("fn_null_battery", nullBattery, Some(nullBatterySql)),
    QueryDef("fn_percentile_battery", percentileBattery, Some(percentileBatterySql)),
    QueryDef("fn_datetrunc_battery", datetruncBattery, Some(datetruncBatterySql)),
    QueryDef("fn_mode_priority", modePriority, Some(modePrioritySql)),
    QueryDef("fn_scalar_battery", battery, Some(batterySql)),
    QueryDef("fn_date_parse_udf", dateParse, Some(dateParseSql)),
    QueryDef("fn_weighted_avg", weightedAvg, Some(weightedAvgSql)),
    QueryDef("fn_median_value", median, Some(medianSql)),
    QueryDef("fn_median_approx", medianApprox, Some(medianApproxSql))
  )
}
