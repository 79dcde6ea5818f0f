package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) source — the interchange format
  * web-scrape and LLM-training corpora actually arrive in. Design rules
  * for 100 TB ingestion:
  *
  *  - '''Explicit schema, never inference''': `spark.read.json` without
  *    a schema runs a full inference SCAN before the real read — two
  *    passes over the corpus. Callers pass the expected schema; drift is
  *    handled by the mode below, not by re-inferring.
  *  - '''PERMISSIVE + corrupt-record capture''': a malformed line must
  *    neither kill the job (FAILFAST at row 10^12 wastes the cluster)
  *    nor vanish (silent DROPMALFORMED loses data evidence). Bad lines
  *    land whole in `_corrupt_record` — the same never-drop contract as
  *    the reference's dead-letter table (src/validate.py:53).
  *  - '''Schema drift tolerance''': missing fields read as null, extra
  *    fields are ignored — both are per-row, map-side decisions; a
  *    drifted producer can't force a reload.
  *
  * The returned frame is split-parallel like any text source: JSONL's
  * one-object-per-line framing is what makes byte-range splits safe
  * (a multi-line JSON array would serialize the whole file through one
  * task — the format choice IS the scale decision).
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL with the caller's schema plus the corrupt-record
    * column. `columnNameOfCorruptRecord` must be IN the schema for
    * PERMISSIVE capture to keep the raw line. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"caller schema must not predefine $CorruptCol")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Clean/rejected fork, mirroring the pipeline's split contract:
    * rows with a captured corrupt payload go to the dead-letter side
    * with the raw line preserved.
    *
    * PERSISTS the parsed frame (required: Spark refuses a query whose
    * only file-scan column is the internal corrupt record — the
    * documented contract is "cache the parsed results first", which is
    * also the one-pass cost model the pipeline's own split uses). The
    * caller unpersists when both forks are consumed. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clean = cached.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val rejected = cached.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, rejected)
  }
}
