package graft.queries

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary payloads + typed metadata as
  * first-class DataFrame columns (SURVEY §2b B14 extension). Payloads
  * are synthesized deterministically from documents (unhex(md5(text)))
  * so the DuckDB oracle derives byte-identical blobs — the point is to
  * prove binary columns flow through scans, projections, groupBys and
  * parquet round-trips with exact semantics (length, slicing, hex,
  * hashing), which is the engine-level contract image/audio pipelines
  * rely on. Decode itself is the injectable boundary in
  * graft.multimodal.Media (unit-tested with the deterministic stub).
  */
object Multimodal {

  /** documents → opaque payload + typed meta (media_type, w, h, frames) */
  private def media(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      unhex(md5(col("text"))).as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      (col("doc_id") % 24 + 1).cast("int").as("n_frames"))
  }

  // -------------------------------------------------------------------
  // mm_payload_stats — binary columns survive aggregation: per-type byte
  // accounting + slice/hex round-trip on the payload.
  private def payloadStats(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .withColumn("head_hex", substring(hex(col("payload")), 1, 8))
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length(col("payload")).cast("long")).as("total_bytes"),
        sum((col("width") * col("height")).cast("long") * col("n_frames"))
          .as("total_pixels"),
        min(col("head_hex")).as("min_head_hex"),
        max(col("head_hex")).as("max_head_hex"))
      .orderBy(col("media_type"))

  private val payloadStatsSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    unhex(md5(text)) AS payload,
      |    CAST(n_chars % 640 AS INT) AS width,
      |    CAST(n_chars % 480 AS INT) AS height,
      |    CAST(doc_id % 24 + 1 AS INT) AS n_frames
      |  FROM documents)
      |SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n_assets,
      |  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
      |  CAST(SUM(CAST(width AS BIGINT) * height * n_frames) AS BIGINT) AS total_pixels,
      |  MIN(substring(hex(payload), 1, 8)) AS min_head_hex,
      |  MAX(substring(hex(payload), 1, 8)) AS max_head_hex
      |FROM m GROUP BY media_type ORDER BY media_type""".stripMargin

  // -------------------------------------------------------------------
  // mm_frame_budget — metadata-first frame sampling (stride 4): the
  // per-asset decode budget BEFORE any byte is decoded. ceil-div in
  // integers both sides.
  private def frameBudget(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .withColumn("sampled_frames",
        greatest(expr("(n_frames + 3) div 4"), lit(1)).cast("int"))
      .groupBy(col("media_type"))
      .agg(
        sum(col("n_frames").cast("long")).as("raw_frames"),
        sum(col("sampled_frames").cast("long")).as("budget_frames"))
      .orderBy(col("media_type"))

  private val frameBudgetSql =
    """WITH m AS (
      |  SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    CAST(doc_id % 24 + 1 AS INT) AS n_frames
      |  FROM documents)
      |SELECT media_type,
      |  CAST(SUM(n_frames) AS BIGINT) AS raw_frames,
      |  CAST(SUM(greatest((n_frames + 3) // 4, 1)) AS BIGINT) AS budget_frames
      |FROM m GROUP BY media_type ORDER BY media_type""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("mm_payload_stats", payloadStats, Some(payloadStatsSql)),
    QueryDef("mm_frame_budget", frameBudget, Some(frameBudgetSql))
  )
}
