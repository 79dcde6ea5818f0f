package graft.queries

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TPC-H-adapted analytics battery (round 4): the remaining join-heavy
  * TPC-H shapes expressible over the driver's star schema — correlated
  * EXISTS / NOT EXISTS, two-sided nation-pair volume, market share with a
  * conditional ratio, LIKE-filtered profit rollup, group-HAVING large
  * orders, disjunctive multi-branch predicates, and a scalar-subquery +
  * anti-join customer screen.
  *
  * The reference (a 506-line pandas CSV→Postgres pipeline) has none of
  * these; they are layer-B extensions in the spirit of SURVEY.md §2b B1-B9,
  * chosen because each exercises a distinct Catalyst planning capability
  * the simpler battery doesn't: semi/anti joins driven by *correlated*
  * predicates (q4, q22), the same dimension broadcast twice under two
  * roles (q7, q8), conditional aggregation feeding a ratio (q8, q14),
  * HAVING over a grouped fact (q18), and a disjunction of
  * brand/size/quantity bands that must stay a single scan (q19).
  *
  * Scale notes (100 TB):
  *  - region/nation are the only explicit broadcasts (truly bounded:
  *    5/25 rows at any SF). supplier/part/customer joins are left to
  *    Catalyst + AQE: at bench SF they auto-broadcast under the 10 MB
  *    threshold; at cluster scale they become shuffle joins on their keys
  *    without a code change — exactly the "declare, don't schedule" rule.
  *  - every fact-side filter (dates, returnflag, brand bands) sits
  *    directly on the scan so it pushes into the parquet reader;
  *    the disjunctive q19 predicate references only lineitem+part
  *    columns, so Catalyst pushes the quantity bands to the lineitem
  *    scan and the brand/size bands to the part scan before the join.
  *  - q4/q22 (N)OT EXISTS plan as left-semi/left-anti hash joins — no
  *    per-row subquery execution; the correlated predicate becomes a
  *    join condition evaluated stream-side.
  *  - all money aggregates fold through exact DECIMAL(18,2) products
  *    (associative, partition-order independent) and surface as one
  *    correctly-rounded double — the suite's cross-engine float rule.
  */
object Tpch {
  private val D = DecimalType(18, 2)
  private def dec(c: Column) = c.cast(D)
  /** exact decimal revenue term: price * (1 - discount) */
  private def vol: Column = dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount")))
  private val volSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  // -------------------------------------------------------------------
  // q4_priority_exists — TPC-H Q4 shape: orders (one year) having at least
  // one lineitem shipped >60 days after the order date; count per
  // priority. The correlated EXISTS is a left-semi join whose condition
  // spans both sides — Catalyst evaluates it inside the hash join, never
  // as a per-row subquery.
  private def q4(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val ord = T.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val li = T.lineitem(spark, dir)
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // q7_nation_volume — TPC-H Q7 shape: shipping volume between two
  // nations, split by supplier-nation / customer-nation / year. The
  // 25-row nation dim is broadcast twice under two roles; both dims are
  // pre-filtered to the two nations of interest so the fact tables are
  // pruned by the (broadcast) joins before the shuffle joins run.
  private def q7(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val pair = Seq("NATION_1", "NATION_2")
    val sn = broadcast(T.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val cn = broadcast(T.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation")))
    val li = T.lineitem(spark, dir)
    val ord = T.orders(spark, dir)
    val cust = T.customer(spark, dir)
    val sup = T.supplier(spark, dir)
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(sn, col("s_nationkey") === col("sn_key"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(cn, col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(sum(vol).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q7Sql =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
       |  CAST(SUM($volSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |WHERE sn.n_name IN ('NATION_1','NATION_2')
       |  AND cn.n_name IN ('NATION_1','NATION_2')
       |  AND sn.n_name <> cn.n_name
       |GROUP BY sn.n_name, cn.n_name, CAST(year(l_shipdate) AS INTEGER)
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // -------------------------------------------------------------------
  // q8_market_share — TPC-H Q8 shape: NATION_3 suppliers' share of PROMO
  // volume sold into ASIA, by order year. Conditional aggregation: the
  // numerator is SUM over a predicate (null-skipping, no ELSE — matches
  // SUM(CASE WHEN … THEN v END)); numerator and denominator are exact
  // decimal sums cast to double SEPARATELY, then one IEEE division, so
  // both engines agree bit-for-bit.
  private def q8(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val reg = broadcast(T.region(spark, dir).filter(col("r_name") === "ASIA"))
    val cn = broadcast(T.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region")))
    val sn = broadcast(T.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val prt = T.part(spark, dir).filter(col("p_type") === "PROMO")
    val ord = T.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val li = T.lineitem(spark, dir)
    li.join(prt, li("l_partkey") === prt("p_partkey"))
      .join(T.supplier(spark, dir), li("l_suppkey") === col("s_suppkey"))
      .join(sn, col("s_nationkey") === col("sn_key"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(T.customer(spark, dir), ord("o_custkey") === col("c_custkey"))
      .join(cn, col("c_nationkey") === col("cn_key"))
      .join(reg, col("cn_region") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", vol)).cast("double") /
            sum(vol).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q8Sql =
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN $volSql END) AS DOUBLE)
       |    / CAST(SUM($volSql) AS DOUBLE) AS mkt_share
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |JOIN region ON cn.n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate <  TIMESTAMP '1998-01-01'
       |GROUP BY CAST(year(o_orderdate) AS INTEGER)
       |ORDER BY o_year""".stripMargin

  // -------------------------------------------------------------------
  // q9_product_profit — TPC-H Q9 shape (no partsupp table in this schema,
  // so profit = discounted revenue): profit from parts whose name
  // contains 'gear', by supplier nation and ship year. The LIKE filter
  // prunes part before the join; nation broadcasts.
  private def q9(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val prt = T.part(spark, dir).filter(col("p_name").contains("gear"))
    val nat = broadcast(T.nation(spark, dir))
    val li = T.lineitem(spark, dir)
    li.join(prt, li("l_partkey") === prt("p_partkey"))
      .join(T.supplier(spark, dir), li("l_suppkey") === col("s_suppkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(sum(vol).cast("double").as("profit"))
      .orderBy(col("nation"), col("l_year"))
  }

  private val q9Sql =
    s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS l_year,
       |  CAST(SUM($volSql) AS DOUBLE) AS profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%gear%'
       |GROUP BY n_name, CAST(year(l_shipdate) AS INTEGER)
       |ORDER BY nation, l_year""".stripMargin

  // -------------------------------------------------------------------
  // q10_returned_items — TPC-H Q10 shape: top 20 customers by revenue
  // lost to returns ('R' lineitems) in a half-year window.
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val ord = T.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-07-01").cast("timestamp"))
    val li = T.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val nat = broadcast(T.nation(spark, dir))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(T.customer(spark, dir), ord("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
      .agg(sum(vol).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    s"""SELECT c_custkey, c_name, n_name, c_acctbal,
       |  CAST(SUM($volSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate <  TIMESTAMP '1997-07-01'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name, c_acctbal
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  // -------------------------------------------------------------------
  // q14_promo_revenue — TPC-H Q14 shape: percent of one quarter's revenue
  // from PROMO parts. Single-row conditional ratio; numerator and
  // denominator cast to double separately (see q8), then (num*100)/den
  // in identical IEEE order on both engines.
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val li = T.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-04-01").cast("timestamp"))
    li.join(T.part(spark, dir), li("l_partkey") === col("p_partkey"))
      .agg((sum(when(col("p_type") === "PROMO", vol)).cast("double") * lit(100.0) /
            sum(vol).cast("double")).as("promo_revenue_pct"))
  }

  private val q14Sql =
    s"""SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $volSql END) AS DOUBLE) * 100.0
       |    / CAST(SUM($volSql) AS DOUBLE) AS promo_revenue_pct
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
       |  AND l_shipdate <  TIMESTAMP '1998-04-01'""".stripMargin

  // -------------------------------------------------------------------
  // q18_large_volume — TPC-H Q18 shape: orders whose total quantity
  // exceeds 250, with their customer. The HAVING is a post-aggregation
  // filter on the grouped fact; the customer join runs AFTER the
  // aggregate has shrunk orders to the few large ones (join reorder by
  // hand here — the aggregate output is tiny, so at any scale this side
  // broadcasts).
  private def q18(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val big = T.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
      .filter(col("total_qty") > 250)
    val ord = T.orders(spark, dir)
    big.join(ord, big("l_orderkey") === ord("o_orderkey"))
      .join(T.customer(spark, dir), ord("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"), col("o_totalprice"),
        col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_custkey, c_name, o_orderkey,
      |  CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // -------------------------------------------------------------------
  // q19_disjunctive — TPC-H Q19 shape: revenue from three disjunctive
  // brand/size/quantity bands. The disjunction must NOT break pushdown:
  // Catalyst distributes it — quantity bounds (lineitem-only) and
  // brand/size bounds (part-only) each push to their scan as an OR-band
  // filter, and the full predicate re-checks after the join.
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val li = T.lineitem(spark, dir)
    val branch1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 21)
    val branch2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
      col("l_quantity").between(10, 30)
    val branch3 = col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
      col("l_quantity").between(20, 40)
    li.join(T.part(spark, dir), li("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(sum(vol).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q19Sql =
    s"""SELECT CAST(SUM($volSql) AS DOUBLE) AS revenue,
       |  CAST(COUNT(*) AS BIGINT) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  // -------------------------------------------------------------------
  // q22_idle_customers — TPC-H Q22 shape: well-funded customers (balance
  // above the positive-balance average) with no orders since 1999,
  // grouped by nation. Scalar subquery = one-row broadcast cross join
  // (the suite's tf-idf idiom); NOT EXISTS = left-anti hash join.
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val cust = T.customer(spark, dir)
    val threshold = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    val recent = T.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  private val q22Sql =
    """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  // -------------------------------------------------------------------
  // q2_min_bal_supplier — TPC-H Q2 shape (no partsupp: "supply cost"
  // becomes supplier account balance, "supplies the part" becomes
  // "shipped the part" via distinct lineitem pairs): for each size-15
  // part, the EUROPE supplier(s) with the minimum balance among
  // those who shipped it. The correlated MIN subquery is a window MIN
  // over the part key — one shuffle on p_partkey, no per-row subquery,
  // and the same plan shape DuckDB's decorrelator produces.
  private def q2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Ctx.prep(spark)
    val eur = T.supplier(spark, dir)
      .join(broadcast(T.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(spark, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val prt = T.part(spark, dir)
      .filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_name"))
    // broadcast the ~2%-selective part filter BELOW the pair dedup
    // (guide §2.3 — shuffle fewer bytes): the distinct exchange now
    // carries only size-15 parts' (partkey, suppkey) pairs instead of
    // every pair in lineitem. Identical rows: p_partkey is unique, so
    // join-then-distinct ≡ distinct-then-join on the same columns.
    val pairs = T.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(prt), col("p_partkey") === col("l_partkey"))
      .select(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .distinct()
    val cand = pairs
      .join(eur, col("l_suppkey") === col("s_suppkey"))
    cand
      .withColumn("min_bal", min(col("s_acctbal")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("s_acctbal") === col("min_bal"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  private val q2Sql =
    """WITH cand AS (
      |  SELECT p_partkey, p_name, s_name, s_acctbal, n_name
      |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) lp
      |  JOIN part ON p_partkey = l_partkey AND p_size = 15
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      |FROM (SELECT *, MIN(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal FROM cand)
      |WHERE s_acctbal = min_bal
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // -------------------------------------------------------------------
  // q11_part_value — TPC-H Q11 shape (partsupp value → shipped revenue):
  // parts whose total discounted revenue exceeds 0.075% of the corpus-wide
  // total. The global threshold is a one-row broadcast (the suite's
  // scalar-subquery idiom) computed in the SAME exact-decimal domain as
  // the per-part values, cast to double only at the comparison — so both
  // engines compare identical doubles. Two scans of lineitem (per-part
  // agg + global agg), each fully partial-aggregated map-side.
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val li = T.lineitem(spark, dir)
    val pv = li.groupBy(col("l_partkey").as("p_partkey")).agg(sum(vol).as("vdec"))
    // the global total rolls up from the per-part decimal sums instead
    // of a second full lineitem scan (guide §1.2): DECIMAL addition is
    // exact and order-independent, so Σ_parts(Σ_part vol) ≡ Σ vol
    // bit-for-bit, and the rollup input is |parts| rows; the broadcast
    // side now shares pv's shuffle via exchange reuse instead of
    // re-scanning the fact table
    val tot = pv.agg(sum(col("vdec")).as("tdec"))
    pv.crossJoin(broadcast(tot))
      .filter(col("vdec").cast("double") > col("tdec").cast("double") * lit(0.00075))
      .select(col("p_partkey"), col("vdec").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  private val q11Sql =
    s"""SELECT l_partkey AS p_partkey, CAST(SUM($volSql) AS DOUBLE) AS part_value
       |FROM lineitem
       |GROUP BY l_partkey
       |HAVING CAST(SUM($volSql) AS DOUBLE) >
       |  (SELECT CAST(SUM($volSql) AS DOUBLE) FROM lineitem) * 0.00075
       |ORDER BY part_value DESC, p_partkey""".stripMargin

  // -------------------------------------------------------------------
  // q12_priority_lines — TPC-H Q12 shape (no l_shipmode: the split key is
  // order priority instead): for lines shipped in 1997, count
  // high-priority (1-URGENT/2-HIGH) vs low-priority lines per line
  // status. Conditional COUNT via null-skipping SUM-of-CASE; the orders
  // side carries only (key, priority) into the join.
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val li = T.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
    val ord = T.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  private val q12Sql =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // -------------------------------------------------------------------
  // q15_top_supplier — TPC-H Q15 shape: the supplier(s) with maximum
  // revenue in 1997Q1. The MAX is compared IN THE EXACT DECIMAL DOMAIN
  // (never double equality — the one place a float rule would be a
  // correctness bug, since ties must be exact); the one-row max
  // broadcasts against the per-supplier aggregate.
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val rev = T.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(vol).as("rdec"))
    val top = rev.agg(max(col("rdec")).as("mdec"))
    rev.crossJoin(broadcast(top))
      .filter(col("rdec") === col("mdec"))
      .join(T.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rdec").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q15Sql =
    s"""WITH rev AS (
       |  SELECT l_suppkey, SUM($volSql) AS rdec
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate <  TIMESTAMP '1997-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(rdec AS DOUBLE) AS total_revenue
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE rdec = (SELECT MAX(rdec) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  // -------------------------------------------------------------------
  // q16_supplier_cnt — TPC-H Q16 shape: distinct-supplier counts per
  // (brand, size) for non-PROMO, non-Brand#1 parts, excluding
  // "complained-about" suppliers (here: negative balance) — the NOT IN
  // becomes a left-anti hash join (keys are non-null, so the semantics
  // coincide). Distinct pairs come from lineitem, deduped BEFORE the
  // joins so the count-distinct aggregate sees minimal rows.
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val pairs = T.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val prt = T.part(spark, dir)
      .filter(col("p_type") =!= "PROMO" && col("p_brand") =!= "Brand#1")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val bad = T.supplier(spark, dir).filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey"))
    pairs.join(prt, col("l_partkey") === col("p_partkey"))
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  private val q16Sql =
    """SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) lp
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_type <> 'PROMO' AND p_brand <> 'Brand#1'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  // -------------------------------------------------------------------
  // q17_small_qty — TPC-H Q17 shape: revenue from Brand#23 lineitems
  // whose quantity is below half the part's average quantity. The
  // correlated AVG decorrelates to a per-part aggregate joined back to
  // the fact — the aggregate output is |parts|-sized, so at any SF the
  // join's build side is the small one. avg = exact-decimal sum cast to
  // double, divided by the bigint count: identical IEEE steps on both
  // engines, then one 0.5× and one < in matching order.
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val li = T.lineitem(spark, dir)
    val pavg = li.groupBy(col("l_partkey").as("avg_pk"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
    val prt = T.part(spark, dir).filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey"))
    li.join(prt, col("l_partkey") === col("p_partkey"))
      .join(pavg, col("l_partkey") === col("avg_pk"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("small_qty_revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q17Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN (SELECT l_partkey AS avg_pk,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |      FROM lineitem GROUP BY l_partkey) pa ON l_partkey = avg_pk
      |WHERE p_brand = 'Brand#23' AND l_quantity < 0.5 * avg_qty""".stripMargin

  // -------------------------------------------------------------------
  // q20_excess_shipments — TPC-H Q20 shape (availqty → shipped quantity):
  // suppliers who shipped more than 30% of the 1997 total of some 'gear'
  // part. Two aggregations over the same filtered join (per-part total,
  // per-supplier-part share), equi-joined on the part key; the qualifying
  // supplier set then semi-joins the supplier dim. Everything after the
  // first aggregate is |parts|+|suppliers|-sized.
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val gear = T.part(spark, dir).filter(col("p_name").contains("gear"))
      .select(col("p_partkey"))
    val li97 = T.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .join(gear, col("l_partkey") === col("p_partkey"))
    val tot = li97.groupBy(col("l_partkey").as("tot_pk"))
      .agg(sum(dec(col("l_quantity"))).as("tot_qty"))
    val bySupp = li97.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("supp_qty"))
    val qualifying = bySupp.join(tot, col("l_partkey") === col("tot_pk"))
      .filter(col("supp_qty").cast("double") > col("tot_qty").cast("double") * lit(0.3))
      .select(col("l_suppkey")).distinct()
    T.supplier(spark, dir)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  private val q20Sql =
    """WITH li97 AS (
      |  SELECT l_suppkey, l_partkey, l_quantity
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%gear%'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01'),
      |tot AS (SELECT l_partkey AS tot_pk, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS tot_qty
      |        FROM li97 GROUP BY l_partkey),
      |bysupp AS (SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
      |           FROM li97 GROUP BY l_suppkey, l_partkey)
      |SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM bysupp JOIN tot ON l_partkey = tot_pk
      |  WHERE CAST(supp_qty AS DOUBLE) > CAST(tot_qty AS DOUBLE) * 0.3)
      |ORDER BY s_suppkey""".stripMargin

  // -------------------------------------------------------------------
  // q21_waiting_supplier — TPC-H Q21 shape (no commit/receipt dates:
  // "late" = shipped >90 days after the order date): per supplier, count
  // late lines in finalized multi-supplier orders where NO other supplier
  // was also late. EXISTS → left-semi, NOT EXISTS → left-anti, both with
  // compound conditions spanning the two sides — Catalyst evaluates them
  // inside the hash joins; the per-order line set is never re-scanned
  // per row.
  private def q21(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val ord = T.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = T.lineitem(spark, dir)
    val lines = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
    val l1 = lines.filter(col("late"))
    val other = lines.select(col("l_orderkey").as("o2_key"), col("l_suppkey").as("o2_supp"))
    val otherLate = l1.select(col("l_orderkey").as("o3_key"), col("l_suppkey").as("o3_supp"))
    l1
      .join(other,
        col("l_orderkey") === col("o2_key") && col("l_suppkey") =!= col("o2_supp"),
        "left_semi")
      .join(otherLate,
        col("l_orderkey") === col("o3_key") && col("l_suppkey") =!= col("o3_supp"),
        "left_anti")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(T.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  private val q21Sql =
    """WITH lines AS (
      |  SELECT l_orderkey, l_suppkey,
      |    l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_suppkey, s_name, CAST(numwait AS BIGINT) AS numwait
      |FROM (
      |  SELECT l1.l_suppkey, COUNT(*) AS numwait
      |  FROM lines l1
      |  WHERE l1.late
      |    AND EXISTS (SELECT 1 FROM lines l2
      |                WHERE l2.l_orderkey = l1.l_orderkey
      |                  AND l2.l_suppkey <> l1.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM lines l3
      |                    WHERE l3.l_orderkey = l1.l_orderkey
      |                      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |  GROUP BY l1.l_suppkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |ORDER BY numwait DESC, s_suppkey
      |LIMIT 20""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q2_min_bal_supplier", q2, Some(q2Sql)),
    QueryDef("q11_part_value", q11, Some(q11Sql)),
    QueryDef("q12_priority_lines", q12, Some(q12Sql)),
    QueryDef("q15_top_supplier", q15, Some(q15Sql)),
    QueryDef("q16_supplier_cnt", q16, Some(q16Sql)),
    QueryDef("q17_small_qty", q17, Some(q17Sql)),
    QueryDef("q20_excess_shipments", q20, Some(q20Sql)),
    QueryDef("q21_waiting_supplier", q21, Some(q21Sql)),
    QueryDef("q4_priority_exists", q4, Some(q4Sql)),
    QueryDef("q7_nation_volume", q7, Some(q7Sql)),
    QueryDef("q8_market_share", q8, Some(q8Sql)),
    QueryDef("q9_product_profit", q9, Some(q9Sql)),
    QueryDef("q10_returned_items", q10, Some(q10Sql)),
    QueryDef("q14_promo_revenue", q14, Some(q14Sql)),
    QueryDef("q18_large_volume", q18, Some(q18Sql)),
    QueryDef("q19_disjunctive", q19, Some(q19Sql)),
    QueryDef("q22_idle_customers", q22, Some(q22Sql))
  )
}
