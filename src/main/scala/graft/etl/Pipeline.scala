package graft.etl

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The flagship end-to-end pipeline (reference main.py:41-136), driven by a
  * deterministic "messy sales CSV" synthesized from the orders table so the
  * DuckDB oracle can derive the identical input. Every dirty-data path of
  * the reference is exercised: blank/null ids, garbage numerics, three date
  * formats plus unparseable, null / invalid statuses, negative prices.
  *
  * Modulo classes on o_orderkey decide each row's fate — the same CASE
  * logic appears in the oracle SQL (RAW_CTE below).
  */
object Pipeline {

  /** Synthesize the raw (all-string, pre-transform) sales frame. */
  def rawSales(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val k = col("o_orderkey")
    T.orders(spark, dir).select(
      k.as("k"),
      when(k % 31 === 0, lit(null: String))
        .when(k % 23 === 0, lit("   "))
        .otherwise(concat(lit(" t"), k.cast("string"), lit(" ")))
        .as("transaction_id"),
      when(k % 37 === 0, lit("garbage"))
        .otherwise(col("o_custkey").cast("string")).as("customer_id"),
      concat(lit("  "), col("o_orderpriority"), lit(" ")).as("product_name"),
      when(k % 41 === 0, lit("NaNqty"))
        .otherwise((k % 10).cast("string")).as("quantity"),
      when(k % 43 === 0, lit("-5.00"))
        .when(k % 47 === 0, lit(null: String))
        .when(k % 53 === 0, lit("abc"))
        .otherwise(col("o_totalprice").cast(DecimalType(12, 2)).cast("string"))
        .as("unit_price"),
      when(k % 4 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .when(k % 4 === 1, date_format(col("o_orderdate"), "dd/MM/yyyy"))
        .when(k % 4 === 2, date_format(col("o_orderdate"), "MMM dd yyyy"))
        .otherwise(lit("not-a-date")).as("transaction_date"),
      concat(lit(" "), col("o_orderstatus"), lit("Region ")).as("region"),
      when(k % 5 === 0, lit(" Completed "))
        .when(k % 5 === 1, lit("PENDING"))
        .when(k % 5 === 2, lit("cancelled"))
        .when(k % 5 === 3, lit(null: String))
        .otherwise(when(k % 59 === 0, lit("bogus")).otherwise(lit("pending")))
        .as("status"))
  }

  /** transform + reasons, still carrying the k ordering key — shared by
    * all six pipeline queries. Materialized ONCE per source fingerprint
    * as a parquet mirror (the same write-once discipline as every graft
    * layout): the synth+transform+validate work is paid on the first
    * build ever, and every later query — and every later SESSION — reads
    * the columnar result instead of re-deriving it. All carried types
    * (strings, int, decimal, date, array<string> reasons) round-trip
    * parquet losslessly, so the DuckDB oracle's relational replay still
    * matches bit-for-bit. This is §4.3's fork-once discipline promoted
    * from session cache to storage: at 100 TB the validated split IS a
    * table you write at ingest, not a lineage you recompute per query. */
  def validated(spark: SparkSession, dir: String): DataFrame = {
    val fp = graft.ops.IncrementalDedup
      .sourceFingerprint(spark, s"$dir/orders.parquet")
    val tag = s"pipeline_validated_${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft-pipeline/$tag"
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(success))
      Validate.withReasons(Transform(rawSales(spark, dir)))
        .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  private def outCols: Seq[Column] = Seq(
    col("transaction_id"), col("customer_id"), col("product_name"),
    col("quantity"), col("unit_price").cast("double").as("unit_price"),
    col("transaction_date"), col("region"), col("status"),
    col("total_sale").cast("double").as("total_sale"))

  private def clean(spark: SparkSession, dir: String): DataFrame =
    validated(spark, dir)
      .filter(size(col("reasons")) === 0)
      .select(outCols: _*)
      .orderBy(col("transaction_id"))

  /** Dead-letter shape (reference src/load.py:122-138): transaction_id,
    * serialized row, pipe-joined reasons. The reference serializes the
    * post-transform row dict (str(row.to_dict()), src/load.py:130); we
    * produce the semantic equivalent with an explicit, engine-portable
    * key=value serialization.
    */
  private def rejected(spark: SparkSession, dir: String): DataFrame = {
    val ser = concat(
      lit("{transaction_id="), coalesce(col("transaction_id"), lit("None")),
      lit(", customer_id="), coalesce(col("customer_id").cast("string"), lit("None")),
      lit(", product_name="), col("product_name"),
      lit(", quantity="), coalesce(col("quantity").cast("string"), lit("None")),
      lit(", unit_price="), coalesce(col("unit_price").cast("string"), lit("None")),
      lit(", transaction_date="), coalesce(col("transaction_date").cast("string"), lit("None")),
      lit(", region="), col("region"),
      lit(", status="), col("status"),
      lit(", total_sale="), coalesce(col("total_sale").cast("string"), lit("None")),
      lit("}"))
    validated(spark, dir)
      .filter(size(col("reasons")) > 0)
      .select(col("transaction_id"), ser.as("raw_data"),
        Validate.reasonString.as("rejection_reason"))
      .orderBy(col("raw_data"))
  }

  /** Run summary (reference main.py:125-136): input/clean/rejected counts
    * plus rejection-rate KPI.
    */
  private def summary(spark: SparkSession, dir: String): DataFrame =
    validated(spark, dir).agg(
      count(lit(1)).as("n_input"),
      sum(when(size(col("reasons")) === 0, 1L).otherwise(0L)).as("n_clean"),
      sum(when(size(col("reasons")) > 0, 1L).otherwise(0L)).as("n_rejected"),
      (sum(when(size(col("reasons")) > 0, 1L).otherwise(0L)) * 100.0 /
        count(lit(1))).as("rejection_rate_pct"))

  /** Ops query over the dead-letter table (reference
    * docs/documentation.md:101-105): rejections by reason, most common
    * first.
    */
  private def reasonCounts(spark: SparkSession, dir: String): DataFrame =
    rejected(spark, dir)
      .groupBy(col("rejection_reason"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("rejection_reason"))

  /** Upsert semantics (reference src/load.py:77-104) as a pure-DataFrame
    * last-write-wins merge the oracle can check: re-ingest a subset with
    * updated payloads; per key the newest batch wins (INSERT … ON
    * CONFLICT DO UPDATE equivalence). The JDBC sink itself is
    * graft.sinks.JdbcUpsert.
    */
  private def upsert(spark: SparkSession, dir: String): DataFrame = {
    val base = validated(spark, dir)
      .filter(size(col("reasons")) === 0)
      .select(col("k"), col("transaction_id"), col("product_name"),
        col("total_sale").cast("double").as("total_sale"))
    val batch1 = base.withColumn("batch", lit(1))
    val batch2 = base.filter(col("k") % 5 === 0)
      .withColumn("product_name", concat(lit("UPDATED "), col("product_name")))
      .withColumn("batch", lit(2))
    val w = Window.partitionBy(col("transaction_id"))
      .orderBy(col("batch").desc)
    batch1.unionByName(batch2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("transaction_id"), col("product_name"), col("total_sale"),
        col("batch"))
      .orderBy(col("transaction_id"))
  }

  /** Load verification (reference README.md:136-147): row distribution
    * across the two target tables with percentage.
    */
  private def loadVerification(spark: SparkSession, dir: String): DataFrame = {
    val v = validated(spark, dir)
    val counts = v.agg(
      sum(when(size(col("reasons")) === 0, 1L).otherwise(0L)).as("clean"),
      sum(when(size(col("reasons")) > 0, 1L).otherwise(0L)).as("rej"))
    val byTable = counts.select(
      lit("sales_transactions").as("table_name"), col("clean").as("n_rows"),
      (col("clean") * 100.0 / (col("clean") + col("rej"))).as("pct"))
      .unionByName(counts.select(
        lit("rejected_rows").as("table_name"), col("rej").as("n_rows"),
        (col("rej") * 100.0 / (col("clean") + col("rej"))).as("pct")))
    byTable.orderBy(col("table_name"))
  }

  // =====================================================================
  // Oracle SQL — shared CTE prefix mirroring rawSales/Transform/Validate.
  private val RawCte =
    """WITH raw AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 31 = 0 THEN NULL
      |         WHEN o_orderkey % 23 = 0 THEN '   '
      |         ELSE CONCAT(' t', CAST(o_orderkey AS VARCHAR), ' ') END AS transaction_id,
      |    CASE WHEN o_orderkey % 37 = 0 THEN 'garbage'
      |         ELSE CAST(o_custkey AS VARCHAR) END AS customer_id,
      |    CONCAT('  ', o_orderpriority, ' ') AS product_name,
      |    CASE WHEN o_orderkey % 41 = 0 THEN 'NaNqty'
      |         ELSE CAST(o_orderkey % 10 AS VARCHAR) END AS quantity,
      |    CASE WHEN o_orderkey % 43 = 0 THEN '-5.00'
      |         WHEN o_orderkey % 47 = 0 THEN NULL
      |         WHEN o_orderkey % 53 = 0 THEN 'abc'
      |         ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) END AS unit_price,
      |    CASE CAST(o_orderkey % 4 AS INT)
      |         WHEN 0 THEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
      |         WHEN 1 THEN strftime(CAST(o_orderdate AS DATE), '%d/%m/%Y')
      |         WHEN 2 THEN strftime(CAST(o_orderdate AS DATE), '%b %d %Y')
      |         ELSE 'not-a-date' END AS transaction_date,
      |    CONCAT(' ', o_orderstatus, 'Region ') AS region,
      |    CASE CAST(o_orderkey % 5 AS INT)
      |         WHEN 0 THEN ' Completed '
      |         WHEN 1 THEN 'PENDING'
      |         WHEN 2 THEN 'cancelled'
      |         WHEN 3 THEN NULL
      |         ELSE CASE WHEN o_orderkey % 59 = 0 THEN 'bogus' ELSE 'pending' END END AS status
      |  FROM orders
      |), transformed AS (
      |  SELECT k,
      |    UPPER(TRIM(transaction_id)) AS transaction_id,
      |    TRY_CAST(customer_id AS INTEGER) AS customer_id,
      |    TRIM(product_name) AS product_name,
      |    TRY_CAST(quantity AS INTEGER) AS quantity,
      |    TRY_CAST(unit_price AS DECIMAL(10,2)) AS unit_price,
      |    CAST(COALESCE(
      |      try_strptime(TRIM(transaction_date), '%Y-%m-%d'),
      |      try_strptime(TRIM(transaction_date), '%d/%m/%Y'),
      |      try_strptime(TRIM(transaction_date), '%b %d %Y')) AS DATE) AS transaction_date,
      |    LOWER(TRIM(region)) AS region,
      |    COALESCE(LOWER(TRIM(status)), 'unknown') AS status
      |  FROM raw
      |), derived AS (
      |  SELECT *, ROUND(quantity * unit_price, 2) AS total_sale FROM transformed
      |), checked AS (
      |  SELECT *, list_filter([
      |    CASE WHEN transaction_id IS NULL OR TRIM(transaction_id) = '' THEN 'missing_transaction_id' END,
      |    CASE WHEN transaction_date IS NULL THEN 'unparseable or missing transaction date' END,
      |    CASE WHEN unit_price IS NULL OR unit_price <= 0 THEN 'unit_price must be a positive number' END,
      |    CASE WHEN total_sale IS NULL THEN 'total_sale could not be computed' END,
      |    CASE WHEN status NOT IN ('completed','pending','cancelled','unknown') THEN CONCAT('invalid status value: ', status) END
      |  ], x -> x IS NOT NULL) AS reasons FROM derived
      |)""".stripMargin

  private val cleanSql = RawCte +
    """
      |SELECT transaction_id, customer_id, product_name, quantity,
      |  CAST(unit_price AS DOUBLE) AS unit_price, transaction_date, region,
      |  status, CAST(total_sale AS DOUBLE) AS total_sale
      |FROM checked WHERE len(reasons) = 0
      |ORDER BY transaction_id""".stripMargin

  private val rejectedSql = RawCte +
    """
      |SELECT transaction_id,
      |  CONCAT('{transaction_id=', COALESCE(transaction_id,'None'),
      |    ', customer_id=', COALESCE(CAST(customer_id AS VARCHAR),'None'),
      |    ', product_name=', product_name,
      |    ', quantity=', COALESCE(CAST(quantity AS VARCHAR),'None'),
      |    ', unit_price=', COALESCE(CAST(unit_price AS VARCHAR),'None'),
      |    ', transaction_date=', COALESCE(CAST(transaction_date AS VARCHAR),'None'),
      |    ', region=', region,
      |    ', status=', status,
      |    ', total_sale=', COALESCE(CAST(total_sale AS VARCHAR),'None'), '}') AS raw_data,
      |  array_to_string(reasons, ' | ') AS rejection_reason
      |FROM checked WHERE len(reasons) > 0
      |ORDER BY raw_data""".stripMargin

  private val summarySql = RawCte +
    """
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
      |  CAST(SUM(CASE WHEN len(reasons) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
      |  CAST(SUM(CASE WHEN len(reasons) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
      |  SUM(CASE WHEN len(reasons) > 0 THEN 1 ELSE 0 END) * 100.0 / COUNT(*) AS rejection_rate_pct
      |FROM checked""".stripMargin

  private val reasonCountsSql = RawCte +
    """
      |SELECT array_to_string(reasons, ' | ') AS rejection_reason,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM checked WHERE len(reasons) > 0
      |GROUP BY array_to_string(reasons, ' | ')
      |ORDER BY n DESC, rejection_reason""".stripMargin

  private val upsertSql = RawCte +
    """
      |, base AS (
      |  SELECT k, transaction_id, product_name,
      |    CAST(total_sale AS DOUBLE) AS total_sale
      |  FROM checked WHERE len(reasons) = 0
      |), both_batches AS (
      |  SELECT transaction_id, product_name, total_sale, 1 AS batch FROM base
      |  UNION ALL
      |  SELECT transaction_id, CONCAT('UPDATED ', product_name), total_sale, 2 AS batch
      |  FROM base WHERE k % 5 = 0
      |)
      |SELECT transaction_id, product_name, total_sale, CAST(batch AS INT) AS batch
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY transaction_id ORDER BY batch DESC) AS rn
      |  FROM both_batches)
      |WHERE rn = 1
      |ORDER BY transaction_id""".stripMargin

  private val loadVerificationSql = RawCte +
    """
      |, counts AS (
      |  SELECT SUM(CASE WHEN len(reasons) = 0 THEN 1 ELSE 0 END) AS clean,
      |    SUM(CASE WHEN len(reasons) > 0 THEN 1 ELSE 0 END) AS rej
      |  FROM checked)
      |SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows, pct FROM (
      |  SELECT 'sales_transactions' AS table_name, clean AS n_rows,
      |    clean * 100.0 / (clean + rej) AS pct FROM counts
      |  UNION ALL
      |  SELECT 'rejected_rows', rej, rej * 100.0 / (clean + rej) FROM counts)
      |ORDER BY table_name""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("pipeline_clean", clean, Some(cleanSql)),
    QueryDef("pipeline_rejected", rejected, Some(rejectedSql)),
    QueryDef("pipeline_summary", summary, Some(summarySql)),
    QueryDef("pipeline_reason_counts", reasonCounts, Some(reasonCountsSql)),
    QueryDef("pipeline_upsert_merge", upsert, Some(upsertSql)),
    QueryDef("pipeline_load_verification", loadVerification, Some(loadVerificationSql))
  )
}
