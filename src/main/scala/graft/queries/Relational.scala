package graft.queries

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational core (SURVEY.md §2b B1–B10): joins, hash aggregates,
  * rollup/cube/grouping-sets, windows, top-k, set ops, dedup — all over the
  * driver's TPC-H-ish tables, all expressed declaratively so Catalyst does
  * pushdown / pruning / partial aggregation / join selection.
  *
  * Oracle-parity conventions:
  *  - every floating-point aggregate is computed as an EXACT decimal sum
  *    (associative → partition-order independent) and cast to double at the
  *    end; Spark and DuckDB then agree bit-for-bit.
  *  - every output carries a deterministic total ORDER BY on a unique key.
  *  - rollup/cube NULL placeholders are coalesced to 'ALL' so null-ordering
  *    differences between engines can't bite.
  *
  * Scale notes (100 TB): region/nation are the only sides we broadcast
  * (truly bounded dims). customer⋈orders⋈lineitem are shuffle joins on
  * their keys — Catalyst plans sort-merge with AQE skew handling. The
  * events range join is bucketized (minute buckets exploded to [b, b+1])
  * so it stays an equi-join + residual filter instead of a BNLJ.
  */
object Relational {
  private val D = DecimalType(18, 2)
  private def dec(c: Column) = c.cast(D)
  /** exact decimal sum of a 2dp-valued double column, surfaced as double */
  private def dsum(c: Column) = sum(dec(c)).cast("double")

  // -------------------------------------------------------------------
  // q1_lineitem_agg — TPC-H Q1 shape (B3: hash aggregate, partial+final).
  private def q1(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -------------------------------------------------------------------
  // q3_shipping_priority — B1 3-way equi join + agg + top-k. Shuffle joins
  // on o_orderkey / o_custkey; filters push to each parquet scan.
  private def q3(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val cust = T.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = T.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val li   = T.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"),
        col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |  AND l_shipdate > TIMESTAMP '1997-01-01'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // -------------------------------------------------------------------
  // q5_nation_revenue — B1 5-way join; region/nation broadcast (bounded
  // dims), fact joins shuffle. Revenue per nation of the customer.
  private def q5(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val reg = T.region(spark, dir).filter(col("r_name").isin("ASIA", "EUROPE"))
    val nat = T.nation(spark, dir)
    val cust = T.customer(spark, dir)
    val ord = T.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("2000-01-01").cast("timestamp"))
    val li = T.lineitem(spark, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q5Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA','EUROPE')
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '2000-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // -------------------------------------------------------------------
  // join_left_orders — B1 left outer: every customer with order count /
  // total (zero-order customers kept, sums coalesced).
  private def joinLeft(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val cust = T.customer(spark, dir)
    val ord = T.orders(spark, dir)
    val perCust = ord.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders_raw"), dsum(col("o_totalprice")).as("total_raw"))
    cust.join(perCust, cust("c_custkey") === perCust("o_custkey"), "left")
      .select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"),
        coalesce(col("n_orders_raw"), lit(0L)).as("n_orders"),
        coalesce(col("total_raw"), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  private val joinLeftSql =
    """SELECT c_custkey, c_name, c_mktsegment,
      |  CAST(COALESCE(o.n_orders_raw, 0) AS BIGINT) AS n_orders,
      |  COALESCE(o.total_raw, 0.0) AS total_spent
      |FROM customer
      |LEFT JOIN (
      |  SELECT o_custkey, COUNT(*) AS n_orders_raw,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_raw
      |  FROM orders GROUP BY o_custkey) o ON c_custkey = o.o_custkey
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------------
  // join_semi / join_anti — B1 EXISTS / NOT EXISTS as left_semi/left_anti
  // (no payload from the right side ⇒ cheaper shuffle than inner+distinct).
  private def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val cust = T.customer(spark, dir)
    val ord = T.orders(spark, dir).filter(col("o_orderstatus") === "F")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val joinSemiSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  private def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val cust = T.customer(spark, dir)
    val ord = T.orders(spark, dir)
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val joinAntiSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------------
  // join_range_events — B2 range join: pairs of events of the same user
  // ≤60s apart. Bucketized: left side explodes to minute buckets [b, b+1]
  // so Spark plans an equi-join on (user_id, bucket) + residual range
  // filter instead of a quadratic BNLJ — the 100 TB-safe shape.
  private def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val ev = T.events(spark, dir).select(
      col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val left = ev
      .withColumn("bucket", explode(array(floor(col("us") / 60000000L),
        floor(col("us") / 60000000L) + 1)))
      .select(col("event_id").as("id1"), col("user_id"), col("us").as("us1"),
        col("bucket"))
    val right = ev.select(col("event_id").as("id2"), col("user_id").as("uid2"),
      col("us").as("us2"), floor(col("us") / 60000000L).as("bucket2"))
    left.join(right,
        left("user_id") === right("uid2") && left("bucket") === right("bucket2"))
      .filter(col("us2") > col("us1") && col("us2") - col("us1") <= 60000000L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  private val rangeJoinSql =
    """SELECT a.user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND epoch_us(b.ts) > epoch_us(a.ts)
      | AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin

  // -------------------------------------------------------------------
  // rollup_lineitem — B5 rollup with subtotal + grand-total rows.
  private def rollupQ(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  private val rollupSql =
    """SELECT COALESCE(l_returnflag,'ALL') AS returnflag,
      |  COALESCE(l_linestatus,'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // -------------------------------------------------------------------
  // cube_orders — B5 cube over two order dims.
  private def cubeQ(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))
  }

  private val cubeSql =
    """SELECT COALESCE(o_orderstatus,'ALL') AS status,
      |  COALESCE(o_orderpriority,'ALL') AS priority,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // -------------------------------------------------------------------
  // grouping_sets_orders — B5 GROUPING SETS in one aggregation pass
  // (not a union of groupBys — one shuffle, expand-side combine).
  private def groupingSetsQ(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.orders(spark, dir).createOrReplaceTempView("orders_gsets")
    spark.sql(
      """SELECT COALESCE(o_orderstatus,'ALL') AS status,
        |  COALESCE(o_orderpriority,'ALL') AS priority,
        |  COUNT(*) AS n
        |FROM orders_gsets
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  private val groupingSetsSql =
    """SELECT COALESCE(o_orderstatus,'ALL') AS status,
      |  COALESCE(o_orderpriority,'ALL') AS priority,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  // -------------------------------------------------------------------
  // window_rank_orders — B6/B7 ranking trio + top-3 per customer. The
  // window order (price desc, orderkey) is total ⇒ deterministic ranks.
  private def windowRank(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"), col("rnk"), col("drnk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val windowRankSql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // -------------------------------------------------------------------
  // window_ntile_battery — the distribution-rank window quartet (B6):
  // ntile(4) quartile assignment, percent_rank, cume_dist, and
  // nth_value(…, 2) per customer over a TOTAL order (price desc,
  // orderkey — determinism discipline of the family). percent_rank =
  // (rank−1)/(n−1) and cume_dist = peers≤current/n are integer ratios
  // evaluated in one double division on both engines — bit-identical
  // operands, bit-identical result. ntile's uneven-split rule (larger
  // buckets first) is the SQL standard on both. One partitioned
  // window, no corpus-sized single-partition shuffle.
  private def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T.orders(spark, dir)
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("prank", percent_rank().over(w))
      .withColumn("cdist", cume_dist().over(w))
      .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("quartile"), col("prank"), col("cdist"), col("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val windowNtileSql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(NTILE(4) OVER w AS INT) AS quartile,
      |  PERCENT_RANK() OVER w AS prank,
      |  CUME_DIST() OVER w AS cdist,
      |  NTH_VALUE(o_totalprice, 2) OVER w AS second_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // window_lag_lead — B6 analytic functions over event-time order.
  private def windowLagLead(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    T.orders(spark, dir)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("days_since_prev",
        datediff(to_date(col("o_orderdate")), to_date(lag(col("o_orderdate"), 1).over(w))))
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"), col("o_totalprice"),
        col("prev_price"), col("next_price"), col("days_since_prev"))
      .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
  }

  private val windowLagLeadSql =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
      |  LAG(o_totalprice, 1) OVER w AS prev_price,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  CAST(date_diff('day', CAST(LAG(o_orderdate, 1) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // window_running_sum — B6 frame: running revenue per customer. Running
  // sum over exact decimals ⇒ frame-order deterministic in both engines.
  private def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.orders(spark, dir)
      .withColumn("running_total", sum(dec(col("o_totalprice"))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"), col("running_total"))
      .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))
  }

  private val windowRunningSql =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders
      |ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // topk_global_orders — B7/B8 global top-k: orderBy+limit ⇒ Spark plans
  // TakeOrderedAndProject (per-partition heap, no full sort at scale).
  private def topkGlobal(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  private val topkGlobalSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // set_intersect / set_except — B9 set ops (distinct semantics).
  private def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
    val a = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
    val b = o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey"))
    a.intersect(b).orderBy(col("o_custkey"))
  }

  private val setIntersectSql =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      |ORDER BY o_custkey""".stripMargin

  private def setExcept(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
    val a = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
    val b = o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey"))
    a.except(b).orderBy(col("o_custkey"))
  }

  private val setExceptSql =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      |ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------------------
  // set ops, ALL variants (B9): bag semantics — duplicates preserved
  // exactly (Spark plans these as aggregate+generate over per-side
  // counts, not a distinct).
  private def setIntersectAll(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
    val a = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
    val b = o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey"))
    a.intersectAll(b).orderBy(col("o_custkey"))
  }

  private val setIntersectAllSql =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      |INTERSECT ALL
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      |ORDER BY o_custkey""".stripMargin

  private def setExceptAll(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
    val a = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
    val b = o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey"))
    a.exceptAll(b).orderBy(col("o_custkey"))
  }

  private val setExceptAllSql =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      |ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------------------
  // join_full_years — B1 full outer join: per-customer order counts for
  // two years, keeping customers active in either (keys coalesced).
  private def joinFull(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
    val a = o.filter(year(col("o_orderdate")) === 1997)
      .groupBy(col("o_custkey").as("k97")).agg(count(lit(1)).as("n_1997"))
    val b = o.filter(year(col("o_orderdate")) === 1998)
      .groupBy(col("o_custkey").as("k98")).agg(count(lit(1)).as("n_1998"))
    a.join(b, col("k97") === col("k98"), "full_outer")
      .select(
        coalesce(col("k97"), col("k98")).as("o_custkey"),
        coalesce(col("n_1997"), lit(0L)).as("n_1997"),
        coalesce(col("n_1998"), lit(0L)).as("n_1998"))
      .orderBy(col("o_custkey"))
  }

  private val joinFullSql =
    """SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
      |  CAST(COALESCE(a.n, 0) AS BIGINT) AS n_1997,
      |  CAST(COALESCE(b.n, 0) AS BIGINT) AS n_1998
      |FROM (SELECT o_custkey, COUNT(*) AS n FROM orders
      |      WHERE year(o_orderdate) = 1997 GROUP BY o_custkey) a
      |FULL JOIN (SELECT o_custkey, COUNT(*) AS n FROM orders
      |      WHERE year(o_orderdate) = 1998 GROUP BY o_custkey) b
      |  ON a.o_custkey = b.o_custkey
      |ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------------------
  // set_union_custkeys — B9 UNION (distinct) with provenance counts: which
  // side(s) each key came from, via a pre-aggregated unionByName (partial
  // aggregation on each branch before the union ⇒ the union shuffles
  // already-reduced keys, not raw rows).
  private def setUnion(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
    val a = o.filter(year(col("o_orderdate")) === 1997)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_1997"))
      .withColumn("n_1998", lit(0L))
    val b = o.filter(year(col("o_orderdate")) === 1998)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_1998"))
      .withColumn("n_1997", lit(0L))
    a.unionByName(b)
      .groupBy(col("o_custkey"))
      .agg(sum(col("n_1997")).as("n_1997"), sum(col("n_1998")).as("n_1998"))
      .orderBy(col("o_custkey"))
  }

  private val setUnionSql =
    """SELECT o_custkey, CAST(SUM(n_1997) AS BIGINT) AS n_1997,
      |  CAST(SUM(n_1998) AS BIGINT) AS n_1998
      |FROM (
      |  SELECT o_custkey, COUNT(*) AS n_1997, 0 AS n_1998
      |  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
      |  UNION ALL
      |  SELECT o_custkey, 0 AS n_1997, COUNT(*) AS n_1998
      |  FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey)
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------------------
  // distinct_counts — B4 exact distinct aggregation.
  private def distinctCounts(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  private val distinctCountsSql =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------
  // approx_distinct — B4 HLL sketch (approx_count_distinct) at COARSE
  // precision (rsd=0.02 — the cheap wide-fleet setting; _check below
  // gates the tight rsd=0.005 one). Sketch values aren't bit-reproducible
  // across engines, so for five rounds this shipped rows-only; round 7
  // gives it the same checkable contract as approx_distinct_check: each
  // engine computes its OWN sketch and its OWN exact distinct and emits
  // whether the sketch landed within 8% relative error (4σ at rsd=0.02;
  // DuckDB's HLL sits near 1.6% typical) — a boolean plus the exact
  // count, both engine-agreeable, so the driver hash-compares it like
  // every other gate. The sketch is the one-pass 100 TB path; the exact
  // distinct here is the check, not the plan.
  private def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double") /
          col("exact_parts") <= 0.08).as("within_8pct"))
      .orderBy(col("l_returnflag"))
  }

  private val approxDistinctSql =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey)) * 1.0
      |    / COUNT(DISTINCT l_partkey) <= 0.08 AS within_8pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------
  // approx_distinct_check — closes the sketch-vs-oracle gap left by
  // approx_distinct_parts: HLL sketches aren't bit-reproducible across
  // engines, but the *error contract* is. Each engine computes its own
  // approx distinct (Spark HLL++ rsd=0.005, DuckDB HyperLogLog) and its
  // own exact distinct, and emits whether the approximation landed
  // within 2% relative error — a boolean both engines can agree on.
  // The sketch is the one-pass 100 TB path; the exact distinct here is
  // the check, not the plan.
  // -------------------------------------------------------------------
  // audit_expectations — a declarative data-quality expectation suite
  // (the Deequ/Great-Expectations shape) evaluated in ONE pass over the
  // fact table: completeness (non-null rate), uniqueness (distinct/
  // total on the PK), domain membership (status ∈ known set), and a
  // range bound (non-negative totalprice), each reported as
  // (constraint, metric, pass). One aggregate computes every counter —
  // no per-constraint scans — and the metrics are int/int → double
  // divisions, engine-exact. The reference's row-level validation
  // battery (P1–P6) quarantines BAD ROWS; this is the complementary
  // DATASET-level contract a warehouse gate checks before publishing a
  // snapshot. At 100 TB: one map-side-combined pass, 4 counters.
  private def auditExpectations(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val m = T.orders(spark, dir).agg(
      count(lit(1)).as("n"),
      count(col("o_custkey")).as("n_cust"),
      countDistinct(col("o_orderkey")).as("n_keys"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("n_dom"),
      sum(when(col("o_totalprice") >= 0, 1L).otherwise(0L)).as("n_pos"))
    m.select(expr(
      """stack(4,
        |  'complete_custkey', CAST(n_cust AS DOUBLE) / n,
        |  'unique_orderkey',  CAST(n_keys AS DOUBLE) / n,
        |  'domain_status',    CAST(n_dom AS DOUBLE) / n,
        |  'nonneg_totalprice', CAST(n_pos AS DOUBLE) / n
        |) AS (check_name, metric)""".stripMargin))
      .withColumn("pass", col("metric") >= 1.0)
      .orderBy(col("check_name"))
  }

  private val auditExpectationsSql =
    """WITH m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(o_custkey) AS BIGINT) AS n_cust,
      |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
      |    CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_dom,
      |    CAST(SUM(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      |  FROM orders),
      |r AS (
      |  SELECT 'complete_custkey' AS check_name, CAST(n_cust AS DOUBLE) / n AS metric FROM m
      |  UNION ALL SELECT 'unique_orderkey', CAST(n_keys AS DOUBLE) / n FROM m
      |  UNION ALL SELECT 'domain_status', CAST(n_dom AS DOUBLE) / n FROM m
      |  UNION ALL SELECT 'nonneg_totalprice', CAST(n_pos AS DOUBLE) / n FROM m)
      |SELECT check_name, metric, metric >= 1.0 AS pass
      |FROM r ORDER BY check_name""".stripMargin

  // -------------------------------------------------------------------
  // agg_incremental_merge — incremental aggregate maintenance: the
  // materialized-view discipline at 100 TB is "never recompute the
  // world" — keep DECOMPOSABLE partial states (count, exact sum, min,
  // max) per group and fold a delta's states into the base's with the
  // aggregate's own merge law; derived values (avg) are computed only
  // at read time, never maintained. This query PROVES the law on real
  // data: orders split into a base (o_orderkey%10 ≠ 7) and a delta
  // (= 7), each aggregated independently, merged with null-safe
  // state algebra (full-outer join, coalesce-to-identity, least/great),
  // while the ORACLE is the flat single-pass GROUP BY over all rows —
  // merged-states ≡ recompute, hash-exact. The sum state is
  // DECIMAL-exact so the merge is associative to the bit (a double sum
  // would drift with the split point); avg divides once at the end,
  // the same two operands both engines.
  private def incrementalAggMerge(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
    def states(df: DataFrame, tag: String): DataFrame = df
      .groupBy((col("o_custkey") % 100).as("seg"))
      .agg(count(lit(1)).as(s"n_$tag"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as(s"s_$tag"),
        min(col("o_orderdate")).as(s"lo_$tag"),
        max(col("o_orderdate")).as(s"hi_$tag"))
    val base = states(o.filter(col("o_orderkey") % 10 =!= 7), "b")
    val delta = states(o.filter(col("o_orderkey") % 10 === 7), "d")
    val zero = lit(0).cast(DecimalType(28, 2))
    base.join(delta, Seq("seg"), "full_outer")
      .select(col("seg"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("s_b"), zero) + coalesce(col("s_d"), zero))
          .cast("double").as("revenue"),
        least(col("lo_b"), col("lo_d")).as("first_date"),
        greatest(col("hi_b"), col("hi_d")).as("last_date"))
      .withColumn("avg_revenue", col("revenue") / col("n_orders"))
      .select(col("seg"), col("n_orders"), col("revenue"),
        col("avg_revenue"), col("first_date"), col("last_date"))
      .orderBy(col("seg"))
  }

  private val incrementalAggMergeSql =
    """SELECT o_custkey % 100 AS seg,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    AS avg_revenue,
      |  MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // histogram_equidepth — equi-DEPTH (quantile) histogram over order
  // totals, the complement of histogram_orders' fixed-width buckets: a
  // skewed distribution collapses a fixed-width profile into one hot
  // bucket, while deciles adapt to the mass. Computed the 100 TB way —
  // NOT a global-sort ntile (a single-partition window is the
  // anti-pattern PrefixSums exists to kill): pass 1 is one aggregate
  // producing the 9 interior decile boundaries (exact interpolated
  // percentile here; percentile_approx's t-digest is the drop-in at raw
  // scale), pass 2 is a map-side bucket assignment against the
  // broadcast boundary array + a 10-group aggregate. Ties at a boundary
  // go LOW (strict > in the rank), matching the SQL spelling; Spark's
  // `percentile` and DuckDB's `quantile_cont` share linear
  // interpolation (the fn_percentile_battery parity), so the boundary
  // doubles — and therefore every bucket id — are bit-identical.
  private def histogramEquidepth(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
    val b = o.agg(expr(
      "percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
      .as("bs"))
    o.crossJoin(broadcast(b))
      .withColumn("decile",
        expr("size(filter(bs, x -> o_totalprice > x))").cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy(col("decile"))
  }

  private val histogramEquidepthSql =
    """WITH b AS (
      |  SELECT quantile_cont(o_totalprice,
      |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
      |  FROM orders)
      |SELECT CAST(len(list_filter(bs, x -> o_totalprice > x)) AS INT) AS decile,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      |FROM orders, b
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // histogram_equidepth_approx — the RAW-SCALE variant of the above:
  // decile bounds from the mergeable quantile SKETCH (percentile_approx
  // / approx_quantile — bounded state, partial/final aggregation, no
  // per-group value buffer), gated the B19 way: sketches aren't
  // bit-reproducible cross-engine, so each engine buckets by its OWN
  // sketch bounds and checks its OWN bucket masses against the
  // equi-depth contract (every decile holds 10% ± 3pp of rows), and the
  // CONTRACT VERDICT is what must agree. Integer-exact check:
  // |100·n − 10·n_tot| ≤ 3·n_tot.
  private def histogramEquidepthApprox(spark: SparkSession,
      dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
    val b = o.agg(
      expr("percentile_approx(o_totalprice, " +
        "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9), 10000)").as("bs"),
      count(lit(1)).as("n_tot"))
    o.crossJoin(broadcast(b))
      .withColumn("decile",
        expr("size(filter(bs, x -> o_totalprice > x))").cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), first(col("n_tot")).as("n_tot"))
      .select(col("decile"),
        (abs(lit(100) * col("n") - lit(10) * col("n_tot")) <=
          lit(3) * col("n_tot")).as("mass_ok"))
      .orderBy(col("decile"))
  }

  private val histogramEquidepthApproxSql =
    """WITH b AS (
      |  SELECT approx_quantile(o_totalprice,
      |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs,
      |    CAST(COUNT(*) AS BIGINT) AS n_tot
      |  FROM orders),
      |g AS (
      |  SELECT CAST(len(list_filter(bs, x -> o_totalprice > x)) AS INT)
      |      AS decile,
      |    CAST(COUNT(*) AS BIGINT) AS n, MAX(n_tot) AS n_tot
      |  FROM orders, b GROUP BY 1)
      |SELECT decile, (abs(100 * n - 10 * n_tot) <= 3 * n_tot) AS mass_ok
      |FROM g ORDER BY decile""".stripMargin

  // -------------------------------------------------------------------
  // ivm_join_delta — incremental maintenance of a JOIN view (the other
  // half of agg_incremental_merge's never-recompute-the-world story:
  // that query merges aggregate states under new rows of ONE table;
  // this one maintains V = O ⋈ L when BOTH sides take deltas). The
  // algebra: with O = O_b ∪ ΔO and L = L_b ∪ ΔL,
  //     ΔV  =  ΔO ⋈ L  ∪  O_b ⋈ ΔL
  // — two delta-driven joins whose probe side is delta-sized (the ΔO⋈ΔL
  // cross term rides inside ΔO ⋈ L), which is why a 100 TB view costs
  // O(|Δ| · join) per refresh instead of O(|table| · join). The rows
  // feed the same decomposable states as the aggregate query (count +
  // DECIMAL-exact sum), merged null-safely onto the base view's states;
  // the ORACLE is the flat recompute over the full tables — delta
  // algebra ≡ recompute, hash-exact.
  private def ivmJoinDelta(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = T.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val oB = o.filter(col("o_orderkey") % 10 =!= 3)
    val oD = o.filter(col("o_orderkey") % 10 === 3)
    val lB = l.filter(col("l_linenumber") % 3 =!= 0)
    val lD = l.filter(col("l_linenumber") % 3 === 0)
    def joined(oo: DataFrame, ll: DataFrame): DataFrame =
      oo.join(ll, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("l_quantity"))
    def states(rows: DataFrame, tag: String): DataFrame = rows
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as(s"n_$tag"),
        sum(dec(col("l_quantity"))).as(s"q_$tag"))
    val base = states(joined(oB, lB), "b")
    val delta = states(joined(oD, l).unionByName(joined(oB, lD)), "d")
    val zero = lit(0).cast(DecimalType(28, 2))
    base.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
          .as("n_lines"),
        (coalesce(col("q_b"), zero) + coalesce(col("q_d"), zero))
          .cast("double").as("sum_qty"))
      .orderBy(col("o_custkey"))
  }

  private val ivmJoinDeltaSql =
    """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  private def approxDistinctCheck(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.005).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double") /
          col("exact_parts") <= 0.02).as("within_2pct"))
      .orderBy(col("l_returnflag"))
  }

  private val approxDistinctCheckSql =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey)) * 1.0
      |    / COUNT(DISTINCT l_partkey) <= 0.02 AS within_2pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------
  // salted_agg_orders — graft.ops.Skew.saltedAggregate run through the
  // correctness gate: revenue + order count per order status (3 hot
  // keys — exactly the cardinality where one reducer would take the
  // whole table at scale, the case AQE's skew splitting can't reach for
  // aggregation). Phase 1 groups on (status, salt-of-row) across 16
  // buckets; phase 2 merges partials on status. The oracle is the PLAIN
  // unsalted GROUP BY — the rewrite is only correct if they agree on
  // real data. Decimal partials keep the sums exact, so the two-phase
  // merge cannot drift from the one-phase answer.
  private def saltedAgg(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val dec = DecimalType(18, 2)
    val base = T.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
    graft.ops.Skew.saltedAggregate(base, Seq("o_orderstatus"), buckets = 16)(
      partial = Seq(
        sum(col("o_totalprice").cast(dec)).as("p_rev"),
        count(lit(1)).as("p_n")),
      merge = Seq(
        sum(col("p_rev")).cast("double").as("revenue"),
        sum(col("p_n")).as("n_orders")))
      .orderBy(col("o_orderstatus"))
  }

  private val saltedAggSql =
    """SELECT o_orderstatus,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // salted_join_suppliers — graft.ops.Skew.saltedJoin through the gate:
  // lineitem⋈supplier on l_suppkey with an 8-way salt. 100 suppliers
  // over 600k+ lines is exactly the hot-key shape where one reducer
  // inherits a whole key's rows; the salt spreads each key over 8 tasks
  // by replicating the (small, but not broadcast-safe at real scale)
  // right side. The oracle is the PLAIN unsalted join — the rewrite
  // must be answer-identical on real data, including duplicate keys.
  private def saltedJoinQ(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val dec = DecimalType(18, 2)
    val li = T.lineitem(spark, dir)
      .select(col("l_suppkey").as("k"),
        (col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast(dec))).as("v"))
    val sup = T.supplier(spark, dir)
      .select(col("s_suppkey").as("k"), col("s_nationkey"))
    graft.ops.Skew.saltedJoin(li, sup, "k", buckets = 8)
      .groupBy(col("s_nationkey"))
      .agg(sum(col("v")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("s_nationkey"))
  }

  private val saltedJoinSql =
    """SELECT s_nationkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // -------------------------------------------------------------------
  // sketch_kmv_custkey — KMV (k-minimum-values) distinct sketch
  // (Bar-Yossef et al., RANDOM'02) through the native bounded-state
  // imperative aggregate [[graft.functions.KmvBottomK]]: per nation,
  // the 32 smallest md5(c_custkey) hashes. The sketch state is k
  // entries however big the group — partial-aggregated map-side,
  // merged associatively — where collect_set would carry the whole
  // distinct set through the shuffle; that bounded-buffer shape is the
  // distinct-count answer at 100 TB. Unlike the other sketches the
  // RESULT is deterministic (bottom-k of a fixed hash is a pure
  // function of the value set), so the oracle replays it hash-exactly
  // with ROW_NUMBER OVER (ORDER BY hash) — and the cardinality
  // estimate (k−1)·16^15/hk (hk = the k-th minimum's 60-bit hex
  // prefix) is the same IEEE arithmetic both engines, with its
  // within-50% contract as a checked column. Groups under k hold their
  // whole distinct set: the sketch IS exact there, est = k_held.
  private val KmvK = 32

  private def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    T.customer(spark, dir)
      .select(col("c_nationkey"), col("c_custkey"),
        md5(col("c_custkey").cast("string")).as("h"))
      .groupBy(col("c_nationkey"))
      .agg(expr(s"kmv_bottomk(h, $KmvK)").as("ks"),
        countDistinct(col("c_custkey")).as("n_exact"))
      .withColumn("k_held", size(col("ks")).cast("long"))
      .withColumn("kth_hash", element_at(col("ks"), size(col("ks"))))
      .withColumn("est",
        when(col("k_held") < KmvK, col("k_held").cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * lit(1152921504606846976.0) /
            conv(substring(col("kth_hash"), 1, 15), 16, 10).cast("long")))
      .withColumn("est_ok",
        abs(col("est") - col("n_exact")) / col("n_exact") <= 0.5)
      .select(col("c_nationkey"), col("n_exact"), col("k_held"),
        col("kth_hash"), col("est"), col("est_ok"))
      .orderBy(col("c_nationkey"))
  }

  private val kmvDistinctSql =
    s"""WITH h AS (
       |  SELECT c_nationkey, c_custkey, md5(CAST(c_custkey AS VARCHAR)) AS h
       |  FROM customer),
       |ranked AS (
       |  SELECT c_nationkey, h,
       |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY h) AS r
       |  FROM (SELECT DISTINCT c_nationkey, h FROM h)),
       |bot AS (
       |  SELECT c_nationkey, MAX(h) AS kth_hash,
       |    CAST(COUNT(*) AS BIGINT) AS k_held
       |  FROM ranked WHERE r <= $KmvK GROUP BY c_nationkey),
       |ex AS (
       |  SELECT c_nationkey, CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_exact
       |  FROM customer GROUP BY c_nationkey),
       |j AS (
       |  SELECT c_nationkey, n_exact, k_held, kth_hash,
       |    CASE WHEN k_held < $KmvK THEN CAST(k_held AS DOUBLE)
       |         ELSE CAST(${KmvK - 1} AS DOUBLE) * 1152921504606846976.0 /
       |              CAST('0x' || substr(kth_hash, 1, 15) AS BIGINT) END AS est
       |  FROM bot JOIN ex USING (c_nationkey))
       |SELECT c_nationkey, n_exact, k_held, kth_hash, est,
       |  abs(est - n_exact) / n_exact <= 0.5 AS est_ok
       |FROM j ORDER BY c_nationkey""".stripMargin

  // -------------------------------------------------------------------
  // sketch_kmv_jaccard — KMV set-OVERLAP estimation (Beyer et al.,
  // SIGMOD'07 "distinct sampling" / the theta-sketch set-op idea): the
  // Jaccard and intersection size of two key sets — custkeys with 'F'
  // orders vs custkeys with 'O' orders — from two bounded k-entry
  // sketches alone. S_U = bottom-k of S_A ∪ S_B is a uniform sample of
  // the union's distinct values, so |S_U ∩ S_A ∩ S_B| / |S_U| estimates
  // J(A,B) and J·est(|A∪B|) estimates |A∩B|.
  //
  // At 100 TB this is THE corpus-overlap question ("how much of crawl B
  // is already in A?") answered by two map-side partial-aggregated
  // 128-entry buffers instead of a full distinct-join of both key sets;
  // the exact columns exist here only to audit the error contract, like
  // the other B19 sketches. Deterministic (bottom-k of a fixed hash), so
  // the oracle replays it hash-exactly — the estimate columns, the exact
  // columns, and both error-gate verdicts all match bitwise.
  private val KmvJK = 128

  private def kmvJaccard(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    val o = T.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderstatus"),
        md5(col("o_custkey").cast("string")).as("h"))
    def sk(status: String, as: String): DataFrame =
      o.filter(col("o_orderstatus") === status)
        .agg(expr(s"kmv_bottomk(h, $KmvJK)").as(as),
          countDistinct(col("o_custkey")).as(s"n_${as.last}"))
    // exact intersection: distinct-key semi join, audit-only
    val exInter = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
      .join(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")).distinct(),
        "o_custkey")
      .agg(count(lit(1)).as("n_inter"))
    sk("F", "ska").crossJoin(sk("O", "skb")).crossJoin(broadcast(exInter))
      .withColumn("su",
        slice(array_sort(array_distinct(concat(col("ska"), col("skb")))), 1, KmvJK))
      .withColumn("k_u", size(col("su")).cast("long"))
      .withColumn("kth_hash", element_at(col("su"), size(col("su"))))
      .withColumn("n_common",
        size(array_intersect(array_intersect(col("su"), col("ska")), col("skb")))
          .cast("long"))
      .withColumn("jacc_est",
        expr("cast(n_common as double) / cast(k_u as double)"))
      .withColumn("union_est",
        when(col("k_u") < KmvJK, col("k_u").cast("double"))
          .otherwise(lit((KmvJK - 1).toDouble) * lit(1152921504606846976.0) /
            conv(substring(col("kth_hash"), 1, 15), 16, 10).cast("long")))
      .withColumn("inter_est", expr("jacc_est * union_est"))
      .withColumn("jacc_exact",
        expr("cast(n_inter as double) / cast(n_a + n_b - n_inter as double)"))
      .withColumn("jacc_ok", expr("abs(jacc_est - jacc_exact) <= 0.1"))
      .withColumn("inter_ok",
        expr("abs(inter_est - n_inter) / cast(n_inter as double) <= 0.25"))
      .select(col("k_u"), col("kth_hash"), col("n_common"),
        col("n_a"), col("n_b"), col("n_inter"),
        col("jacc_est"), col("jacc_exact"), col("union_est"), col("inter_est"),
        col("jacc_ok"), col("inter_ok"))
  }

  private val kmvJaccardSql =
    s"""WITH a AS (
       |  SELECT DISTINCT o_custkey, md5(CAST(o_custkey AS VARCHAR)) AS h
       |  FROM orders WHERE o_orderstatus = 'F'),
       |b AS (
       |  SELECT DISTINCT o_custkey, md5(CAST(o_custkey AS VARCHAR)) AS h
       |  FROM orders WHERE o_orderstatus = 'O'),
       |ba AS (SELECT h FROM (
       |  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r FROM a) WHERE r <= $KmvJK),
       |bb AS (SELECT h FROM (
       |  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r FROM b) WHERE r <= $KmvJK),
       |su AS (SELECT h FROM (
       |  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r
       |  FROM (SELECT h FROM ba UNION SELECT h FROM bb)) WHERE r <= $KmvJK),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_u, MAX(h) AS kth_hash FROM su),
       |cm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM su
       |  WHERE h IN (SELECT h FROM ba) AND h IN (SELECT h FROM bb)),
       |ex AS (SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM a
       |     WHERE o_custkey IN (SELECT o_custkey FROM b)) AS n_inter),
       |est AS (
       |  SELECT k_u, kth_hash, n_common, n_a, n_b, n_inter,
       |    cast(n_common as double) / cast(k_u as double) AS jacc_est,
       |    CASE WHEN k_u < $KmvJK THEN CAST(k_u AS DOUBLE)
       |         ELSE CAST(${KmvJK - 1} AS DOUBLE) * 1152921504606846976.0 /
       |              CAST('0x' || substr(kth_hash, 1, 15) AS BIGINT) END AS union_est,
       |    cast(n_inter as double) / cast(n_a + n_b - n_inter as double) AS jacc_exact
       |  FROM st, cm, ex)
       |SELECT k_u, kth_hash, n_common, n_a, n_b, n_inter,
       |  jacc_est, jacc_exact, union_est, jacc_est * union_est AS inter_est,
       |  abs(jacc_est - jacc_exact) <= 0.1 AS jacc_ok,
       |  abs(jacc_est * union_est - n_inter) / cast(n_inter as double) <= 0.25 AS inter_ok
       |FROM est""".stripMargin

  // -------------------------------------------------------------------
  // sketch_countmin_custkey — Count-Min sketch (Cormode & Muthukrishnan
  // 2005) as a pure aggregation: depth 3 × width 128 counters, hash row
  // d of key k = rabin_karp("d:k") mod 128 (the codegen'd polynomial
  // hash, replayable in any engine). The sketch build is one explode +
  // hash aggregate — 3·|rows| increments partial-aggregated map-side
  // down to 384 cells, the mergeable-summary shape that answers
  // frequency queries over 100 TB without a per-key GROUP BY. The query
  // audits the estimate contract on 6 probe keys: est >= exact always
  // (counters only overcount), and est - exact <= ⌊(e/W)·N⌋ is the
  // Markov bound, checked as a column so the gate pins BOTH engines to
  // the same sketch, same estimates, same bound verdicts.
  private val CmsW = 128
  private def cmsCell(keyExpr: String): org.apache.spark.sql.Column =
    pmod(expr(
      s"rabin_karp(concat(cast(d as string), ':', cast($keyExpr as string)))"),
      lit(CmsW))

  private def countMin(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    val o = T.orders(spark, dir)
    val depths = array(lit(0), lit(1), lit(2))
    val cms = o.select(col("o_custkey"))
      .withColumn("d", explode(depths))
      .withColumn("cell", cmsCell("o_custkey"))
      .groupBy(col("d"), col("cell")).agg(count(lit(1)).as("n"))
    val probes = o.filter(col("o_custkey") <= 5)
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("exact_n"))
    val ph = probes
      .withColumn("d", explode(depths))
      .withColumn("cell", cmsCell("k"))
    val ntot = o.agg(count(lit(1)).as("ntot"))
    ph.join(cms, Seq("d", "cell"))
      .groupBy(col("k"), col("exact_n")).agg(min(col("n")).as("cms_est"))
      .crossJoin(broadcast(ntot))
      .select(col("k").as("o_custkey"), col("exact_n"), col("cms_est"),
        (col("cms_est") - col("exact_n")).as("overcount"),
        (col("cms_est") - col("exact_n") <=
          floor(lit(2.718281828459045) / lit(CmsW) * col("ntot")).cast("long"))
          .as("within_bound"))
      .orderBy(col("o_custkey"))
  }

  private val countMinSql =
    s"""WITH rows_d AS (
       |  SELECT o_custkey, d,
       |    list_reduce(list_transform(
       |      range(1, length(CAST(d AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR)) + 1),
       |      i -> CAST(ascii(substr(CAST(d AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR), i, 1)) AS BIGINT)),
       |      (a, c) -> (a * 31 + c) % 1000000007) % $CmsW AS cell
       |  FROM orders, unnest([0,1,2]) AS t(d)),
       |cms AS (SELECT d, cell, COUNT(*) AS n FROM rows_d GROUP BY 1, 2),
       |probes AS (SELECT o_custkey AS k, COUNT(*) AS exact_n
       |           FROM orders WHERE o_custkey <= 5 GROUP BY 1),
       |ph AS (
       |  SELECT k, exact_n, d,
       |    list_reduce(list_transform(
       |      range(1, length(CAST(d AS VARCHAR) || ':' || CAST(k AS VARCHAR)) + 1),
       |      i -> CAST(ascii(substr(CAST(d AS VARCHAR) || ':' || CAST(k AS VARCHAR), i, 1)) AS BIGINT)),
       |      (a, c) -> (a * 31 + c) % 1000000007) % $CmsW AS cell
       |  FROM probes, unnest([0,1,2]) AS t(d)),
       |est AS (SELECT k, exact_n, MIN(n) AS cms_est FROM ph JOIN cms USING (d, cell) GROUP BY 1, 2)
       |SELECT k AS o_custkey, exact_n, cms_est, cms_est - exact_n AS overcount,
       |  cms_est - exact_n <= CAST(floor(CAST(2.718281828459045 AS DOUBLE) / $CmsW
       |    * (SELECT COUNT(*) FROM orders)) AS BIGINT) AS within_bound
       |FROM est ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------------------
  // unpivot_lineitem — wide→long melt (the inverse of pivot above): the
  // four lineitem measures unpivot into (measure, val) rows, then
  // aggregate per returnflag × measure. Spark's native Dataset.unpivot
  // is a zero-shuffle projection (one Expand node, no join/union scan
  // duplication); the oracle spells the same thing as UNION ALL.
  private def unpivotQ(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").as("quantity"),
        col("l_extendedprice").as("extendedprice"),
        col("l_discount").as("discount"), col("l_tax").as("tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
        "measure", "val")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(sum(col("val").cast(DecimalType(18, 2))).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("measure"))
  }

  private val unpivotSql =
    """WITH u AS (
      |  SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'tax', l_tax FROM lineitem)
      |SELECT l_returnflag, measure,
      |  CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM u GROUP BY 1, 2 ORDER BY l_returnflag, measure""".stripMargin

  // -------------------------------------------------------------------
  // histogram_orders — fixed-width value histogram over order totals:
  // bucket = floor(price/50k)·50k. One map-side projection + one hash
  // aggregate on ~a dozen buckets — the cheapest possible distribution
  // profile at any scale. Bucket ids are exact (IEEE double division is
  // deterministic), min/max are exact doubles.
  private def histogramQ(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.orders(spark, dir)
      .groupBy((floor(col("o_totalprice") / 50000) * 50000).cast("long")
        .as("bucket_lo"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("bucket_lo"))
  }

  private val histogramSql =
    """SELECT CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket_lo,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY 1 ORDER BY bucket_lo""".stripMargin

  // -------------------------------------------------------------------
  // stats_orders — second-moment statistics (stddev/covariance/
  // correlation of price vs order day) computed from EXACT integer power
  // sums, so the one-pass shuffle stays a plain partial/final hash
  // aggregate AND the result is bit-identical cross-engine. Two traps
  // this dodges: (1) built-in stddev/corr stream doubles in partition
  // order — nondeterministic last ULPs; (2) DuckDB casts DECIMAL(p,s>0)
  // to double as int128→double THEN ÷10^s — two roundings, while the
  // JVM rounds the decimal once, so even exact decimal sums diverge by
  // an ULP once they pass 2^53. Fix: keep every moment at scale 0
  // (prices in integer CENTS, days as integers) — the only
  // decimal→double conversion left is a single correctly-rounded
  // int→double in both engines — then run the identical double-op
  // sequence, with the n·Σ−Σ² combination still in exact decimal.
  private def statsQ(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val xc = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast(DecimalType(19, 0))
    val yD = col("yday").cast(DecimalType(14, 0))
    val agg = T.orders(spark, dir)
      .withColumn("yday",
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(xc).cast(DecimalType(19, 0)).as("sx"),
        sum((xc * xc).cast(DecimalType(25, 0))).cast(DecimalType(25, 0)).as("sxx"),
        sum(yD).cast(DecimalType(14, 0)).as("sy"),
        sum((yD * yD).cast(DecimalType(19, 0))).cast(DecimalType(19, 0)).as("syy"),
        sum((xc * yD).cast(DecimalType(24, 0))).cast(DecimalType(24, 0)).as("sxy"))
    val nD = col("n").cast(DecimalType(10, 0))
    // exact integer combinations: n·Σx² − (Σx)², n·Σxy − ΣxΣy, n·Σy² − (Σy)²
    val withM = agg.select(col("o_orderstatus"), col("n"),
      (nD * col("sxx") - col("sx") * col("sx")).cast(DecimalType(38, 0)).as("vn"),
      (nD * col("sxy") - col("sx") * col("sy")).cast(DecimalType(38, 0)).as("cn"),
      (nD * col("syy") - col("sy") * col("sy")).cast(DecimalType(38, 0)).as("wn"))
    val nd = col("n").cast("double")
    val vnd = col("vn").cast("double")
    val cnd = col("cn").cast("double")
    val wnd = col("wn").cast("double")
    withM.select(col("o_orderstatus"), col("n"),
      (sqrt(vnd / (nd * (nd - 1))) / 100).as("stddev_price"),
      (cnd / (nd * (nd - 1)) / 100).as("covar_price_day"),
      (cnd / (sqrt(vnd) * sqrt(wnd))).as("corr_price_day"))
      .orderBy(col("o_orderstatus"))
  }

  private val statsSql =
    """WITH b AS (
      |  SELECT o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(19,0)) AS xc,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS DECIMAL(14,0)) AS y
      |  FROM orders),
      |a AS (
      |  SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(xc) AS DECIMAL(19,0)) AS sx,
      |    CAST(SUM(CAST(xc*xc AS DECIMAL(25,0))) AS DECIMAL(25,0)) AS sxx,
      |    CAST(SUM(y) AS DECIMAL(14,0)) AS sy,
      |    CAST(SUM(CAST(y*y AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS syy,
      |    CAST(SUM(CAST(xc*y AS DECIMAL(24,0))) AS DECIMAL(24,0)) AS sxy
      |  FROM b GROUP BY 1),
      |m AS (
      |  SELECT o_orderstatus, n,
      |    CAST(CAST(n AS DECIMAL(10,0)) * sxx - sx * sx AS DECIMAL(38,0)) AS vn,
      |    CAST(CAST(n AS DECIMAL(10,0)) * sxy - sx * sy AS DECIMAL(38,0)) AS cn,
      |    CAST(CAST(n AS DECIMAL(10,0)) * syy - sy * sy AS DECIMAL(38,0)) AS wn
      |  FROM a)
      |SELECT o_orderstatus, n,
      |  sqrt(CAST(vn AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / 100 AS stddev_price,
      |  CAST(cn AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) / 100 AS covar_price_day,
      |  CAST(cn AS DOUBLE) / (sqrt(CAST(vn AS DOUBLE)) * sqrt(CAST(wn AS DOUBLE))) AS corr_price_day
      |FROM m ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------------------------------
  // join_nullsafe_priority — null-safe equality join (`<=>` ⇔ IS NOT
  // DISTINCT FROM): the one equi-join variant where NULL keys MATCH
  // each other instead of dropping out — the semantics dimension tables
  // with "unknown" rows need. Catalyst still plans it as a hash/SMJ
  // equi-join (the null-safe operator is a join key, not a residual
  // filter), so the scale shape is identical to a plain equi-join.
  // Nulls are synthesized in-plan (nullif on the hottest priority) so
  // the null-match path actually executes.
  private def joinNullsafe(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
      .withColumn("k", nullif(col("o_orderpriority"), lit("1-URGENT")))
    val a = o.filter(col("o_orderkey") % 2 === 0)
      .groupBy(col("k")).agg(count(lit(1)).as("n_even"))
    val b = o.filter(col("o_orderkey") % 2 === 1)
      .groupBy(col("k").as("kb")).agg(count(lit(1)).as("n_odd"))
    a.join(b, col("k") <=> col("kb"))
      .select(col("k"), col("n_even"), col("n_odd"))
      .orderBy(col("k").asc_nulls_first)
  }

  private val joinNullsafeSql =
    """WITH o AS (SELECT nullif(o_orderpriority, '1-URGENT') AS k, o_orderkey
      |           FROM orders),
      |a AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_even
      |      FROM o WHERE o_orderkey % 2 = 0 GROUP BY k),
      |b AS (SELECT k AS kb, CAST(COUNT(*) AS BIGINT) AS n_odd
      |      FROM o WHERE o_orderkey % 2 = 1 GROUP BY k)
      |SELECT k, n_even, n_odd FROM a JOIN b ON k IS NOT DISTINCT FROM kb
      |ORDER BY k NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------
  // window_rank_stats — the analytic-rank family completing B6: ntile
  // quartiles, percent_rank, cume_dist, and first/last over an explicit
  // whole-partition frame. The window orders on a UNIQUE key pair
  // (price, orderkey) so rank-derived doubles — (rank−1)/(n−1),
  // rows≤cur/n — are identical integer-division results in both
  // engines; ntile's uneven-bucket rule (earlier buckets get the extra
  // row) is the SQL-standard one both implement.
  // -------------------------------------------------------------------
  // window_share_of_total — percent-of-total composite: revenue share
  // per priority via an unbounded window over the AGGREGATED groups.
  // The empty-partition window is a scale trap on raw rows (single
  // partition), but here it sees exactly |groups| rows (5), which is
  // the correct and bounded place for it at any corpus size. Shares
  // divide exact-decimal sums cast to double — one IEEE division,
  // identical both engines — and round to 6dp.
  private def shareOfTotal(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val g = T.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(dec(col("o_totalprice"))).as("tp"))
    // declared single partition over the |priorities|-row aggregate
    // (pmod constant key — see curate_token_budget)
    g.withColumn("grand", sum(col("tp")).over(
      Window.partitionBy(pmod(hash(col("o_orderpriority")).cast("long"),
        lit(1L)))))
      .select(col("o_orderpriority"), col("n_orders"),
        col("tp").cast("double").as("total_price"),
        round(col("tp").cast("double") / col("grand").cast("double"), 6)
          .as("share"))
      .orderBy(col("o_orderpriority"))
  }

  private val shareOfTotalSql =
    """WITH g AS (
      |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tp
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, n_orders, CAST(tp AS DOUBLE) AS total_price,
      |  ROUND(CAST(tp AS DOUBLE) / CAST(SUM(tp) OVER () AS DOUBLE), 6) AS share
      |FROM g ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // profile_key_skew — the skew DIAGNOSTIC that decides when ops.Skew's
  // salting is worth its overhead: per-key cardinality histogram in
  // power-of-two buckets over lineitem's join key. Two partial-
  // aggregated passes (per-key counts, then |keys| rows into ≤64
  // buckets); the integer bit-length bucketing from curate_length_
  // buckets (no float log2). A healthy key prints a tight histogram;
  // a hot key surfaces as a lonely high bucket — the trigger for
  // salted_agg_orders / salted_join_suppliers.
  private def keySkew(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("k_n"))
      .select(
        when(col("k_n") === 1, 1L)
          .otherwise(expr("shiftleft(1L, length(bin(k_n - 1)))"))
          .as("bucket_cap"),
        col("k_n"))
      .groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_keys"), sum(col("k_n")).as("n_rows"))
      .orderBy(col("bucket_cap"))
  }

  private val keySkewSql =
    """WITH k AS (
      |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k_n
      |  FROM lineitem GROUP BY l_orderkey),
      |b AS (
      |  SELECT CASE WHEN k_n = 1 THEN 1
      |              ELSE CAST(1 << length(bin(k_n - 1)) AS BIGINT) END AS bucket_cap,
      |    k_n
      |  FROM k)
      |SELECT bucket_cap, CAST(COUNT(*) AS BIGINT) AS n_keys,
      |  CAST(SUM(k_n) AS BIGINT) AS n_rows
      |FROM b GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin

  // -------------------------------------------------------------------
  // audit_fk_integrity — referential-integrity sweep across the whole
  // star schema: for every FK edge, the orphan count (child keys with
  // no parent) via anti-join aggregates. This is the data-quality gate
  // a warehouse runs after every load (the reference's dead-letter
  // split is the row-level version; this is the cross-table one). Each
  // edge is one anti join; the small parents broadcast, the fact-side
  // edges shuffle on the key — all seven run in one job tree. Zero
  // orphans on the generator's data; the query's value is the SHAPE
  // (the count is the assertion a production run would alert on).
  private def fkIntegrity(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    def orphans(edge: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame =
      child.select(col(ck)).join(parent.select(col(pk)),
          col(ck) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(edge).as("fk_edge"), col("n_orphans"))
    val li = T.lineitem(spark, dir); val o = T.orders(spark, dir)
    val c = T.customer(spark, dir); val s = T.supplier(spark, dir)
    val p = T.part(spark, dir); val n = T.nation(spark, dir)
    val r = T.region(spark, dir)
    orphans("customer.nation", c, "c_nationkey", n, "n_nationkey")
      .unionByName(orphans("lineitem.order", li, "l_orderkey", o, "o_orderkey"))
      .unionByName(orphans("lineitem.part", li, "l_partkey", p, "p_partkey"))
      .unionByName(orphans("lineitem.supplier", li, "l_suppkey", s, "s_suppkey"))
      .unionByName(orphans("nation.region", n, "n_regionkey", r, "r_regionkey"))
      .unionByName(orphans("orders.customer", o, "o_custkey", c, "c_custkey"))
      .unionByName(orphans("supplier.nation", s, "s_nationkey", n, "n_nationkey"))
      .orderBy(col("fk_edge"))
  }

  private val fkIntegritySql =
    """SELECT 'customer.nation' AS fk_edge, CAST(COUNT(*) AS BIGINT) AS n_orphans
      |FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
      |UNION ALL
      |SELECT 'lineitem.order', CAST(COUNT(*) AS BIGINT) FROM lineitem
      |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |UNION ALL
      |SELECT 'lineitem.part', CAST(COUNT(*) AS BIGINT) FROM lineitem
      |WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
      |UNION ALL
      |SELECT 'lineitem.supplier', CAST(COUNT(*) AS BIGINT) FROM lineitem
      |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
      |UNION ALL
      |SELECT 'nation.region', CAST(COUNT(*) AS BIGINT) FROM nation
      |WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region)
      |UNION ALL
      |SELECT 'orders.customer', CAST(COUNT(*) AS BIGINT) FROM orders
      |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |UNION ALL
      |SELECT 'supplier.nation', CAST(COUNT(*) AS BIGINT) FROM supplier
      |WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)
      |ORDER BY fk_edge""".stripMargin

  private def windowRankStats(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("cheapest_key", first(col("o_orderkey")).over(full))
      .withColumn("priciest_key", last(col("o_orderkey")).over(full))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }

  private val windowRankStatsSql =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  first_value(o_orderkey) OVER (PARTITION BY o_orderstatus
      |    ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cheapest_key,
      |  last_value(o_orderkey) OVER (PARTITION BY o_orderstatus
      |    ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // topk_per_group_custom — the custom physical operator
  // (plans/TopKPerGroup: LogicalPlan + SparkStrategy + SparkPlan,
  // SURVEY §4.3 option (c)) through the correctness gate: top-3 orders
  // by price per customer. Its oracle is the window row_number idiom —
  // the two must agree row-for-row; PlanSpec pins that the custom
  // TopKPerGroup node (bounded heaps, no partition sort) actually
  // planned, and TopKSpec covers ties/small groups/k overrun.
  private def topkCustom(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val o = T.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    graft.ops.TopK.perGroup(o, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  }

  private val topkCustomSql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // q13_custdist — TPC-H Q13 shape: aggregation OF an aggregation across
  // a left join (order count per customer → customer count per order
  // count). Two shuffles, both on already-reduced data.
  private def q13(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val cust = T.customer(spark, dir)
    val ord = T.orders(spark, dir)
    val perCust = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // -------------------------------------------------------------------
  // window_range_frame — B6 RANGE frame (value-based, vs the row-based
  // frames above): per order, how many orders the same customer placed in
  // the trailing 30 days. Ordering key is integer epoch-days so RANGE
  // arithmetic is exact in both engines.
  private def windowRange(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("order_day"))
      .rangeBetween(-30, Window.currentRow)
    T.orders(spark, dir)
      .withColumn("order_day",
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("n_last_30d", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("order_day"),
        col("n_last_30d"))
      .orderBy(col("o_custkey"), col("order_day"), col("o_orderkey"))
  }

  private val windowRangeSql =
    """SELECT o_custkey, o_orderkey, order_day,
      |  CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY order_day
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_30d
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS order_day
      |  FROM orders)
      |ORDER BY o_custkey, order_day, o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // pivot_priority_status — pivot (long → wide): order counts per priority
  // pivoted across status values. Explicit value list ⇒ deterministic
  // columns and a single-pass pivot aggregate (no value-discovery job);
  // oracle spells it as portable conditional aggregation.
  private def pivotQ(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("n_f"),
        col("O").as("n_o"), col("P").as("n_p"))
      .orderBy(col("o_orderpriority"))
  }

  private val pivotSql =
    """SELECT o_orderpriority,
      |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
      |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
      |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // subquery_above_avg — scalar subquery: orders above the global average
  // price. Catalyst plans the aggregate once and broadcasts the scalar;
  // the threshold folds through an exact decimal sum so both engines
  // compare against the bit-identical double.
  private def aboveAvg(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.orders(spark, dir).createOrReplaceTempView("orders_sq")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_sq
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders_sq)
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val aboveAvgSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |  FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // dedup_lineitem — B10 exact dedup, deterministic variant: keep the
  // first row per (l_partkey, l_suppkey) under a total order. This is
  // also the upsert/last-write-wins primitive (row_number = 1).
  private def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    // keep-first-per-key as a min_by AGGREGATE instead of a
    // row_number window (guide §2.3 — aggregate before you shuffle):
    // the window shipped every lineitem row to the exchange and sorted
    // each partition; the aggregate partial-combines map-side, so the
    // shuffle carries at most one row per (partkey, suppkey) per map
    // task — on a dedup-shaped corpus that is the dup-factor reduction.
    // Identical rows: (l_orderkey, l_linenumber) is unique within a
    // group, so min_by over that struct IS "rn = 1" under the same
    // total order.
    T.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min_by(
        struct(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
        struct(col("l_orderkey"), col("l_linenumber"))).as("m"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("m.l_orderkey").as("l_orderkey"),
        col("m.l_linenumber").as("l_linenumber"),
        col("m.l_quantity").as("l_quantity"))
      .orderBy(col("l_partkey"), col("l_suppkey"))
  }

  private val dedupExactSql =
    """SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_quantity
      |FROM (
      |  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |    ROW_NUMBER() OVER (PARTITION BY l_partkey, l_suppkey
      |      ORDER BY l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn = 1
      |ORDER BY l_partkey, l_suppkey""".stripMargin

  // -------------------------------------------------------------------
  // join_bucketed_colocated — the co-located join: lineitem and orders
  // mirrored ONCE into bucketed+sorted tables on the order key
  // (ops.Bucketing, fingerprint-memoized like the LSH index), then
  // fact⋈fact join + per-order aggregation both run on the bucket
  // layout — zero shuffle before the final presentation sort
  // (BucketingSpec + PlanSpec pin the no-exchange property). At 100 TB
  // this converts the dominant per-query cost of a star-schema
  // workload (re-shuffling the fact tables for every orderkey join)
  // into a one-time ingest cost. The aggregation keys extend the
  // bucket key, so hash-partitioning on l_orderkey already satisfies
  // the aggregate's clustering requirement — no exchange there either.
  private def joinBucketed(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val lt = graft.ops.Bucketing.ensure(spark, dir, "lineitem", "l_orderkey")
    val ot = graft.ops.Bucketing.ensure(spark, dir, "orders", "o_orderkey")
    val l = spark.table(lt)
    val o = spark.table(ot)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice")).as("order_price"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_orderkey"))
  }

  private val joinBucketedSql =
    """SELECT l_orderkey, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_price,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_orderkey, o_orderpriority
      |ORDER BY l_orderkey""".stripMargin

  // -------------------------------------------------------------------
  // scan_dsv2_pushdown — the custom DataSource V2 connector
  // (sources/GraftGen) under a selective aggregate. The id-range
  // conjuncts are CONSUMED by the source (the scan's pushedRange
  // narrows to [10000,50000) — excluded rows are never generated;
  // GraftGenSpec pins it), the k-parity residual stays a post-scan
  // Catalyst filter, and column pruning reaches the reader. Row content
  // is pure int64 arithmetic on id, so the oracle replays the source
  // from DuckDB's range().
  private def dsv2Scan(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    spark.read.format("graftgen")
      .option("rows", 60000L).option("partitions", 8)
      .load()
      .filter(col("id") >= 10000L && col("id") < 50000L && col("k") % 2 === 0)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        dsum(col("val")).as("sum_val"))
      .orderBy(col("grp"))
  }

  private val dsv2ScanSql =
    """WITH t AS (
      |  SELECT range AS id,
      |    CAST((range * 2654435761) % 97 AS INT) AS k,
      |    'g' || CAST(range % 10 AS VARCHAR) AS grp,
      |    CAST((range * 13 + 7) % 1000 AS DOUBLE) / 10.0 AS v
      |  FROM range(0, 60000))
      |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
      |FROM t
      |WHERE id >= 10000 AND id < 50000 AND k % 2 = 0
      |GROUP BY grp ORDER BY grp""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("scan_dsv2_pushdown", dsv2Scan, Some(dsv2ScanSql)),
    QueryDef("join_bucketed_colocated", joinBucketed, Some(joinBucketedSql)),
    QueryDef("q1_lineitem_agg", q1, Some(q1Sql)),
    QueryDef("q3_shipping_priority", q3, Some(q3Sql)),
    QueryDef("q5_nation_revenue", q5, Some(q5Sql)),
    QueryDef("join_left_orders", joinLeft, Some(joinLeftSql)),
    QueryDef("join_semi_customers", joinSemi, Some(joinSemiSql)),
    QueryDef("join_anti_customers", joinAnti, Some(joinAntiSql)),
    QueryDef("join_range_events", rangeJoin, Some(rangeJoinSql)),
    QueryDef("rollup_lineitem", rollupQ, Some(rollupSql)),
    QueryDef("cube_orders", cubeQ, Some(cubeSql)),
    QueryDef("grouping_sets_orders", groupingSetsQ, Some(groupingSetsSql)),
    QueryDef("window_rank_orders", windowRank, Some(windowRankSql)),
    QueryDef("window_ntile_battery", windowNtile, Some(windowNtileSql)),
    QueryDef("window_lag_lead", windowLagLead, Some(windowLagLeadSql)),
    QueryDef("window_running_sum", windowRunning, Some(windowRunningSql)),
    QueryDef("window_range_frame", windowRange, Some(windowRangeSql)),
    QueryDef("q13_custdist", q13, Some(q13Sql)),
    QueryDef("topk_global_orders", topkGlobal, Some(topkGlobalSql)),
    QueryDef("set_intersect_custkeys", setIntersect, Some(setIntersectSql)),
    QueryDef("set_except_custkeys", setExcept, Some(setExceptSql)),
    QueryDef("set_union_custkeys", setUnion, Some(setUnionSql)),
    QueryDef("set_intersect_all_custkeys", setIntersectAll, Some(setIntersectAllSql)),
    QueryDef("set_except_all_custkeys", setExceptAll, Some(setExceptAllSql)),
    QueryDef("join_full_years", joinFull, Some(joinFullSql)),
    QueryDef("distinct_counts", distinctCounts, Some(distinctCountsSql)),
    QueryDef("pivot_priority_status", pivotQ, Some(pivotSql)),
    QueryDef("subquery_above_avg", aboveAvg, Some(aboveAvgSql)),
    QueryDef("approx_distinct_parts", approxDistinct, Some(approxDistinctSql)),
    QueryDef("agg_incremental_merge", incrementalAggMerge, Some(incrementalAggMergeSql)),
    QueryDef("ivm_join_delta", ivmJoinDelta, Some(ivmJoinDeltaSql)),
    QueryDef("histogram_equidepth", histogramEquidepth, Some(histogramEquidepthSql)),
    QueryDef("histogram_equidepth_approx", histogramEquidepthApprox,
      Some(histogramEquidepthApproxSql)),
    QueryDef("audit_expectations", auditExpectations, Some(auditExpectationsSql)),
    QueryDef("approx_distinct_check", approxDistinctCheck, Some(approxDistinctCheckSql)),
    QueryDef("salted_agg_orders", saltedAgg, Some(saltedAggSql)),
    QueryDef("salted_join_suppliers", saltedJoinQ, Some(saltedJoinSql)),
    QueryDef("sketch_countmin_custkey", countMin, Some(countMinSql)),
    QueryDef("sketch_kmv_custkey", kmvDistinct, Some(kmvDistinctSql)),
    QueryDef("sketch_kmv_jaccard", kmvJaccard, Some(kmvJaccardSql)),
    QueryDef("unpivot_lineitem", unpivotQ, Some(unpivotSql)),
    QueryDef("histogram_orders", histogramQ, Some(histogramSql)),
    QueryDef("stats_orders", statsQ, Some(statsSql)),
    QueryDef("topk_per_group_custom", topkCustom, Some(topkCustomSql)),
    QueryDef("window_rank_stats", windowRankStats, Some(windowRankStatsSql)),
    QueryDef("window_share_of_total", shareOfTotal, Some(shareOfTotalSql)),
    QueryDef("profile_key_skew", keySkew, Some(keySkewSql)),
    QueryDef("audit_fk_integrity", fkIntegrity, Some(fkIntegritySql)),
    QueryDef("join_nullsafe_priority", joinNullsafe, Some(joinNullsafeSql)),
    QueryDef("dedup_lineitem", dedupExact, Some(dedupExactSql))
  )
}
