package graft.queries

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational core (SURVEY.md §2b B1–B10): joins, hash aggregates,
  * rollup/cube/grouping-sets, windows, top-k, set ops, dedup — all over the
  * driver's TPC-H-ish tables, all expressed declaratively so Catalyst does
  * pushdown / pruning / partial aggregation / join selection.
  *
  * Oracle-parity convention: every floating-point aggregate is computed as
  * an EXACT decimal sum (associative → partition-order independent) and only
  * cast to double at the end. Spark and DuckDB then produce bit-identical
  * doubles. Every query output carries a deterministic total ORDER BY.
  */
object Relational {
  private val D = DecimalType(18, 2)
  /** exact decimal view of a double column that carries 2dp values */
  private def dec(c: org.apache.spark.sql.Column) = c.cast(D)

  // -------------------------------------------------------------------
  // q1_lineitem_agg — TPC-H Q1 shape (B3: hash aggregate, partial+final).
  // Filter pushes to the parquet scan; Catalyst plans partial_sum on the
  // map side so at 100 TB the shuffle carries 6 groups, not 6e9 rows.
  private def q1(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val li = T.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q1_lineitem_agg", q1, Some(q1Sql))
  )
}
