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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("sql_q6_forecast", q6, Some(q6Text)),
    QueryDef("sql_rabin_karp", sqlRabin, Some(sqlRabinSql)))
}
