package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spark-native re-expression of the reference transform stage
  * (reference src/transform.py:25-57). All operations are Column
  * expressions — one narrow projection, no shuffle, fully codegen'd;
  * at 100 TB this stage is map-side only.
  *
  * Coerce semantics: pandas `to_numeric(errors="coerce")` ⇔ non-ANSI
  * CAST (null on failure) — Ctx.prep pins ANSI off.
  */
object Transform {

  /** Multi-format date parse (reference src/transform.py:7-23):
    * try "%Y-%m-%d", "%d/%m/%Y", "%b %d %Y" in order, null if all fail.
    * `to_date(c, fmt)` is null-on-mismatch, exactly the loop's semantics;
    * the reference strips the string first (`str(date_str).strip()`).
    */
  val DateFormats: Seq[String] = Seq("yyyy-MM-dd", "dd/MM/yyyy", "MMM dd yyyy")

  def parseDate(c: Column): Column =
    coalesce(DateFormats.map(f => to_date(trim(c), f)): _*)

  /** Full transform: casts (F1), date parse (F2), string normalization
    * (F3-F5), status lower→fill-"unknown" order preserved (F6,
    * reference src/transform.py:50-51 — a null status must NOT be
    * lowercased before filling), derived total_sale (F7).
    */
  def apply(df: DataFrame): DataFrame = df
    .withColumn("quantity", col("quantity").cast("int"))
    .withColumn("unit_price", col("unit_price").cast(DecimalType(10, 2)))
    .withColumn("customer_id", col("customer_id").cast("int"))
    .withColumn("transaction_date", parseDate(col("transaction_date")))
    .withColumn("region", lower(trim(col("region"))))
    .withColumn("product_name", trim(col("product_name")))
    .withColumn("transaction_id", upper(trim(col("transaction_id"))))
    .withColumn("status", coalesce(lower(trim(col("status"))), lit("unknown")))
    .withColumn("total_sale", round(col("quantity") * col("unit_price"), 2))
}
