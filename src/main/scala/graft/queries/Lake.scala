package graft.queries

import graft.{Ctx, QueryDef, T}
import graft.ops.{DenseIds, IncrementalDedup}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lake/storage utilities that round out the engine's table-format and
  * id-management surface:
  *
  *  - `scan_orc_mirror` — the same query answers from an ORC copy of a
  *    parquet table: a write-once, fingerprint-memoized format mirror
  *    (the multi-format lake reality — Spark's scan stack treats ORC
  *    and Parquet as interchangeable columnar sources, with the same
  *    predicate pushdown and column pruning).
  *  - `ids_dense_assign` — globally dense 0-based ids + contiguous
  *    shard assignment without a single-partition window
  *    ([[graft.ops.DenseIds]] has the two-pass offset argument).
  */
object Lake {

  private def dec(c: Column) = c.cast(DecimalType(18, 2))

  // -------------------------------------------------------------------
  // scan_orc_mirror — ORC format mirror, then a selective aggregate
  // over it. The mirror is written ONCE per source fingerprint (same
  // memoization as every graft mirror: regenerated inputs land at a
  // fresh path and rebuild; a _SUCCESS-marked mirror is reused). The
  // aggregate must match the oracle running on the ORIGINAL parquet —
  // proving the format hop is lossless for the engine's type set
  // (int64, double, string, timestamp).
  //
  // Scale note: the ORC scan gets the same treatment as parquet —
  // `PushedFilters` carries the o_orderstatus predicate to the reader
  // and only the 3 referenced columns are materialized. At 100 TB a
  // format mirror is a compaction-time decision, not a query-time one;
  // queries are layout-agnostic by construction.
  private def orcMirror(spark: SparkSession, dir: String): String = {
    val fp = IncrementalDedup.sourceFingerprint(spark, s"$dir/orders.parquet")
    val tag = s"orders_orc_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-orc/$tag"
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success)) {
      T.orders(spark, dir).write.mode("overwrite").orc(path)
    }
    path
  }

  private def orcScan(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    spark.read.orc(orcMirror(spark, dir))
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val orcScanSql =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------
  // ids_dense_assign — stamp every document with a dense, contiguous,
  // 0-based id in doc_id order, then derive its training-shard number
  // (64 docs per shard, contiguous — the "pack N examples per output
  // file" addressing a dataloader expects). ROW_NUMBER() OVER (ORDER BY
  // doc_id) is the spec but a single-partition window physically; the
  // implementation is the two-pass partition-offset scheme in
  // [[DenseIds]], whose driver state is #partitions longs, not rows.
  private val ShardSize = 64

  private def idsAssign(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    DenseIds.assign(
      T.documents(spark, dir).select(col("doc_id"), col("lang"), col("n_chars")),
      "doc_id", "dense_id")
      .withColumn("shard", expr(s"dense_id div $ShardSize"))
      .select(col("doc_id"), col("dense_id"), col("shard"))
      .orderBy(col("dense_id"))
  }

  private val idsAssignSql =
    s"""SELECT doc_id,
      |  ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS dense_id,
      |  CAST((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // $ShardSize AS BIGINT) AS shard
      |FROM documents
      |ORDER BY dense_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("scan_orc_mirror", orcScan, Some(orcScanSql)),
    QueryDef("ids_dense_assign", idsAssign, Some(idsAssignSql))
  )
}
