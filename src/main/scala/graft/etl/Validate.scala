package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Spark-native re-expression of the reference row-validation stage
  * (reference src/validate.py:47-113). Collects ALL violated rules per
  * row (reference design point: the engineer fixing the source needs the
  * full picture), then splits clean vs rejected.
  *
  * Note: the reference's invalid-status branch appends a tuple
  * (`reasons.append(f"...", row["status"])`, src/validate.py:110) which
  * would crash `" | ".join`; we implement the evident intent,
  * "invalid status value: <status>".
  */
object Validate {
  val ValidStatuses: Seq[String] =
    Seq("completed", "pending", "cancelled", "unknown") // src/validate.py:17

  /** All five business rules as one array column; nulls filtered out so
    * only violated rules remain (reference src/validate.py:89-113).
    */
  def reasonsCol: Column = filter(
    array(
      when(col("transaction_id").isNull || trim(col("transaction_id")) === "",
        lit("missing_transaction_id")),
      when(col("transaction_date").isNull,
        lit("unparseable or missing transaction date")),
      when(col("unit_price").isNull || col("unit_price") <= 0,
        lit("unit_price must be a positive number")),
      when(col("total_sale").isNull,
        lit("total_sale could not be computed")),
      when(!col("status").isin(ValidStatuses: _*),
        concat(lit("invalid status value: "), col("status")))),
    x => x.isNotNull)

  def withReasons(df: DataFrame): DataFrame =
    df.withColumn("reasons", reasonsCol)

  /** Pipe-joined reason string for the dead-letter row
    * (reference src/validate.py:67).
    */
  def reasonString: Column = concat_ws(" | ", col("reasons"))

  /** Two-output split. Spark has no single-pass multi-output operator, so
    * the validated frame is persisted once and filtered twice — without
    * the persist a nondeterministic upstream could route a row into both
    * or neither output (SURVEY §4.3). Caller unpersists after both sides
    * are consumed.
    */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val validated = withReasons(df).persist(StorageLevel.MEMORY_AND_DISK)
    val clean = validated.filter(size(col("reasons")) === 0).drop("reasons")
    val rejected = validated.filter(size(col("reasons")) > 0)
    (clean, rejected)
  }

  /** Structural validation (reference src/validate.py:19-45): required
    * column set present after normalize, non-empty input, duplicate-PK
    * probe (warn-only). Driver-side on metadata; only the dup probe and
    * the emptiness check touch data.
    */
  val ExpectedColumns: Set[String] = Set(
    "transaction_id", "customer_id", "product_name", "quantity",
    "unit_price", "transaction_date", "region", "status")

  final case class StructuralReport(missing: Set[String], empty: Boolean,
      duplicateIds: Long) {
    def ok: Boolean = missing.isEmpty && !empty
  }

  def validateStructure(df: DataFrame): StructuralReport = {
    val actual = df.columns.map(_.trim.toLowerCase).toSet
    val missing = ExpectedColumns -- actual
    if (missing.nonEmpty) return StructuralReport(missing, empty = false, 0L)
    val empty = df.isEmpty
    val dups =
      if (empty) 0L
      else df.groupBy(col("transaction_id")).count()
        .filter(col("count") > 1)
        .agg(coalesce(sum(col("count") - 1), lit(0L)))
        .head.getLong(0)
    StructuralReport(missing, empty, dups)
  }
}
