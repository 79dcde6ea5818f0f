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

  // -------------------------------------------------------------------
  // mm_byte_entropy — corpus-hygiene scoring on the raw BYTES: per-asset
  // byte histogram → distinct-byte count, modal-byte frequency (both
  // integers) and Shannon entropy (nats). The histogram is exact integer
  // arithmetic in both engines; entropy is the only float and is rounded
  // to 6dp (the emb_cluster_profile discipline — ulp-proof, far above
  // libm noise). At 100 TB this is the cheap first-pass filter that
  // catches truncated/constant/encrypted payloads BEFORE any decode:
  // one narrow pass over payload bytes, no codec, map-side aggregable.
  private def byteEntropy(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .select(col("doc_id"), col("media_type"),
        explode(expr(
          "transform(sequence(0, length(payload) - 1), " +
            "i -> cast(conv(substring(hex(payload), 2 * i + 1, 2), 16, 10) as int))"))
          .as("byte"))
      .groupBy(col("doc_id"), col("media_type"), col("byte"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("media_type"))
      .agg(
        count(lit(1)).cast("int").as("distinct_bytes"),
        max(col("c")).cast("int").as("modal_freq"),
        round(
          log(sum(col("c")).cast("double")) -
            sum(col("c").cast("double") * log(col("c").cast("double"))) /
            sum(col("c")).cast("double"), 6).as("entropy_6dp"))
      .orderBy(col("doc_id"))

  private val byteEntropySql =
    """WITH b AS (
      |  SELECT doc_id,
      |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    CAST(('0x' || substring(md5(text), 2 * i.i + 1, 2)) AS INT) AS byte
      |  FROM documents, (SELECT unnest(range(0, 16)) AS i) i),
      |h AS (
      |  SELECT doc_id, media_type, byte, COUNT(*) AS c
      |  FROM b GROUP BY doc_id, media_type, byte)
      |SELECT doc_id, media_type,
      |  CAST(COUNT(*) AS INT) AS distinct_bytes,
      |  CAST(MAX(c) AS INT) AS modal_freq,
      |  round(ln(CAST(SUM(c) AS DOUBLE))
      |    - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
      |      / CAST(SUM(c) AS DOUBLE), 6) AS entropy_6dp
      |FROM h GROUP BY doc_id, media_type ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // mm_blob_pointers — the out-of-row blob layout: payloads pack into
  // shard files and rows carry only (shard_path, offset, len) pointers.
  // Offsets are a per-shard exclusive running sum of lengths in doc_id
  // order — the existing window idiom, all BIGINT arithmetic, exact in
  // both engines. This is the 100 TB shape for large media: parquet
  // holds the pointer triple (scan-cheap, prunable), bulk bytes live in
  // append-only shard files, and the offset assignment is one window
  // over metadata — never a pass over payload bytes.
  private def blobPointers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard_path")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    media(spark, dir)
      .select(col("doc_id"), col("media_type"),
        concat(lit("blobs/shard_"), lpad((col("doc_id") % 8).cast("string"), 2, "0"),
          lit(".bin")).as("shard_path"),
        length(col("payload")).cast("long").as("len"))
      .withColumn("offset", coalesce(sum(col("len")).over(w), lit(0L)))
      .select(col("doc_id"), col("media_type"), col("shard_path"),
        col("offset"), col("len"))
      .orderBy(col("doc_id"))
  }

  private val blobPointersSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    'blobs/shard_' || lpad(CAST(doc_id % 8 AS VARCHAR), 2, '0') || '.bin'
      |      AS shard_path,
      |    CAST(octet_length(unhex(md5(text))) AS BIGINT) AS len
      |  FROM documents)
      |SELECT doc_id, media_type, shard_path,
      |  CAST(COALESCE(SUM(len) OVER (PARTITION BY shard_path ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS offset,
      |  len
      |FROM m ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // mm_frame_sample — per-clip frame SELECTION (not just the budget
  // count): stride-4 sampling enumerated as (doc_id, frame_idx) rows via
  // sequence-explode, restricted to video assets. The explode runs
  // executor-side — a 10k-frame clip never materializes driver-side —
  // and the selected set is pure integer arithmetic, so the oracle
  // replays it exactly with generate_series.
  private def frameSample(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(expr("sequence(0, n_frames - 1, 4)")).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx").cast("int").as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))

  private val frameSampleSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    CAST(doc_id % 24 + 1 AS INT) AS n_frames
      |  FROM documents)
      |SELECT doc_id, n_frames, CAST(f.frame_idx AS INT) AS frame_idx
      |FROM m, LATERAL (SELECT unnest(generate_series(0, n_frames - 1, 4))
      |  AS frame_idx) f
      |WHERE media_type = 'video'
      |ORDER BY doc_id, frame_idx""".stripMargin

  // -------------------------------------------------------------------
  // mm_neardup_payloads — near-duplicate detection at BYTE grain, the
  // dedup story carried across modalities (VERDICT r10 #8): the mm_*
  // family profiled payloads but never deduped them. Each blob is
  // fingerprinted per 16-byte BLOCK (the content id of that block — a
  // re-encode or trim that preserves most blocks preserves most
  // fingerprints, the same economics as CDC chunking in backup
  // systems), block fingerprints are banded exactly like MinHash
  // (per-band minimum over salted hashes), and candidates come off the
  // SAME banded generator the text near-dup path uses
  // ([[TextOps.bandCandidates]]) — candidate volume linear by
  // construction. Verify is in-candidate only: distinct-block-set
  // intersection ≥ 6 of 8. The fixture derives each payload as the
  // concatenation of per-slice md5 blocks of the text (deterministic,
  // oracle-replayable), and the query re-derives blocks by SLICING THE
  // BLOB — binary substring → hex — so the byte path itself is what's
  // proven; docs under 256 chars are excluded (their tail slices would
  // be empty for every doc and collide universally).
  private def media2(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val blockMd5s = (0 until 8).map(j => md5(substring(col("text"), j * 32 + 1, 32)))
    T.documents(spark, dir).filter(col("n_chars") >= 256).select(
      col("doc_id"),
      unhex(concat(blockMd5s: _*)).as("payload"))
  }

  private def neardupPayloads(spark: SparkSession, dir: String): DataFrame = {
    val m = media2(spark, dir)
    val blocks = m.select(col("doc_id"), explode(expr(
      "transform(sequence(0, 7), j -> hex(substring(payload, j * 16 + 1, 16)))"))
      .as("bh"))
    val bands = spark.range(4).select(col("id").cast("int").as("band"))
    val sigs = blocks.crossJoin(broadcast(bands))
      .groupBy(col("doc_id"), col("band"))
      .agg(min(md5(concat_ws(":", col("band"), col("bh")))).as("sig"))
    val cand = TextOps.bandCandidates(sigs)
    val sets = m.select(col("doc_id"), expr(
      "array_distinct(transform(sequence(0, 7), j -> hex(substring(payload, j * 16 + 1, 16))))")
      .as("bs"))
    val sa = sets.select(col("doc_id").as("doc_a"), col("bs").as("ba"))
    val sb = sets.select(col("doc_id").as("doc_b"), col("bs").as("bb"))
    cand.join(sa.hint("shuffle_hash"), "doc_a")
      .join(sb.hint("shuffle_hash"), "doc_b")
      .withColumn("n_shared",
        size(array_intersect(col("ba"), col("bb"))).cast("long"))
      .filter(col("n_shared") >= 6)
      .select(col("doc_a"), col("doc_b"), col("n_shared"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val neardupPayloadsSql =
    """WITH m AS (SELECT doc_id, text FROM documents WHERE n_chars >= 256),
      |blk AS (
      |  SELECT doc_id, j.j AS j,
      |    upper(md5(substr(text, CAST(j.j * 32 + 1 AS BIGINT), 32))) AS bh
      |  FROM m, (SELECT unnest(range(8)) AS j) j),
      |sig AS (
      |  SELECT doc_id, b.band AS band,
      |    MIN(md5(CAST(b.band AS VARCHAR) || ':' || bh)) AS sig
      |  FROM blk, (SELECT unnest(range(4)) AS band) b
      |  GROUP BY doc_id, b.band),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM sig x JOIN sig y
      |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
      |sets AS (
      |  SELECT doc_id, list_distinct(list(bh)) AS bs FROM blk GROUP BY doc_id)
      |SELECT doc_a, doc_b,
      |  CAST(len(list_distinct(list_intersect(a.bs, b.bs))) AS BIGINT) AS n_shared
      |FROM cand JOIN sets a ON doc_a = a.doc_id
      |          JOIN sets b ON doc_b = b.doc_id
      |WHERE len(list_distinct(list_intersect(a.bs, b.bs))) >= 6
      |ORDER BY doc_a, doc_b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("mm_payload_stats", payloadStats, Some(payloadStatsSql)),
    QueryDef("mm_neardup_payloads", neardupPayloads, Some(neardupPayloadsSql)),
    QueryDef("mm_frame_budget", frameBudget, Some(frameBudgetSql)),
    QueryDef("mm_byte_entropy", byteEntropy, Some(byteEntropySql)),
    QueryDef("mm_blob_pointers", blobPointers, Some(blobPointersSql)),
    QueryDef("mm_frame_sample", frameSample, Some(frameSampleSql))
  )
}
