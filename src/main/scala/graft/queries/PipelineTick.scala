package graft.queries

import graft.{Ctx, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** pipeline_ingest_tick — the COMPOSED ingest micro-batch
  * ([[graft.streaming.IngestTick]]): one delta through append →
  * streaming near-dup dedup → incremental ER (over the dedup
  * SURVIVORS) → incremental semantic dedup → IVF delta segment → stats
  * sidecars → summary refresh, all invisible until one conditional-put
  * head commit. The gate emits (stage, metric, value) rows READ BACK
  * from the committed artifacts; the oracle replays the ENTIRE tick in
  * SQL — the dedup chain (band signatures, first-writer-wins, within-
  * batch components), entity resolution re-based on the accepted sets,
  * the frozen-quantizer semantic tick (the dedup_semantic_incremental
  * oracle verbatim as a subquery), and the stats/summary aggregates —
  * and must land on the same numbers. Crash-consistency (a kill between
  * every pair of stages converges to the same committed state) is
  * IngestTickSpec's pin; SQL can't see process death.
  */
object PipelineTick {

  private def tickRoot(spark: SparkSession, dir: String): String = {
    import graft.ops.IncrementalDedup.sourceFingerprint
    val fpd = sourceFingerprint(spark, s"$dir/documents.parquet")
    val fpe = sourceFingerprint(spark, s"$dir/embeddings.parquet")
    val tag = s"t1_${dir}_${fpd}_$fpe".replaceAll("[^A-Za-z0-9._-]", "_")
    s"${sys.props("java.io.tmpdir")}/graft-ingesttick/$tag"
  }

  private def ingestTick(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val root = tickRoot(spark, dir)
    graft.streaming.IngestTick.runTick(spark, dir, root)
    graft.streaming.IngestTick.metrics(spark, dir, root)
  }

  /** The dedup tick chain — identical semantics to the
    * dedup_stream_ingest oracle (two arrivals, first-writer-wins,
    * min-id-wins within the batch); kept CTE-for-CTE so a divergence
    * in one gate implicates the other. */
  // MATERIALIZED on every multiply-referenced CTE: DuckDB inlines plain
  // CTEs, and the 17-metric assembly re-expanded the whole chain per
  // reference — >20k file opens at sf0.001. Exceptions: acc0/acc1/
  // accall/still stay PLAIN — materializing any of them trips a DuckDB
  // 1.0.0 internal error ("Failed to cast physical operator to type")
  // in the materialized-CTE × recursive-CTE interaction; their bodies
  // are cheap joins over the materialized sh/mh/base layers, so the
  // re-expansion is bounded.
  private val dedupCtes =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
      |sh AS MATERIALIZED (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(tokens)-1),
      |    i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS s3
      |  FROM toks WHERE len(tokens) >= 3),
      |mh AS MATERIALIZED (
      |  SELECT doc_id, b.band AS band,
      |    list_min(list_transform(s3, s -> md5(CAST(b.band AS VARCHAR) || ':' || s))) AS sig
      |  FROM sh, (SELECT unnest(range(4)) AS band) b),
      |c0 AS MATERIALIZED (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0),
      |d1 AS MATERIALIZED (SELECT doc_id FROM documents WHERE doc_id % 20 = 0),
      |cand0 AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM mh x JOIN mh y
      |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
      |  WHERE x.doc_id % 20 <> 0 AND y.doc_id % 20 <> 0),
      |v0 AS (
      |  SELECT doc_a, doc_b FROM cand0
      |  JOIN sh a ON doc_a = a.doc_id JOIN sh b ON doc_b = b.doc_id
      |  WHERE len(list_intersect(a.s3, b.s3)) > 0
      |    AND CAST(len(list_intersect(a.s3, b.s3)) AS DOUBLE) /
      |        (len(a.s3) + len(b.s3) - len(list_intersect(a.s3, b.s3))) >= 0.8),
      |e0 AS (SELECT doc_a, doc_b FROM v0 UNION ALL SELECT doc_b, doc_a FROM v0),
      |r0(src, dst) AS (
      |  SELECT DISTINCT doc_a, doc_a FROM e0
      |  UNION
      |  SELECT r.src, e.doc_b FROM r0 r JOIN e0 e ON r.dst = e.doc_a),
      |l0 AS (SELECT src, MIN(dst) AS lab FROM r0 GROUP BY src),
      |acc0 AS (
      |  SELECT c0.doc_id FROM c0 LEFT JOIN l0 ON c0.doc_id = l0.src
      |  WHERE l0.src IS NULL OR l0.lab = c0.doc_id),
      |candc AS (
      |  SELECT DISTINCT dx.doc_id AS d, cx.doc_id AS c
      |  FROM mh dx JOIN mh cx ON dx.band = cx.band AND dx.sig = cx.sig
      |  JOIN d1 ON dx.doc_id = d1.doc_id
      |  JOIN acc0 ON cx.doc_id = acc0.doc_id),
      |dropc AS (
      |  SELECT DISTINCT d AS doc_id FROM candc
      |  JOIN sh a ON d = a.doc_id JOIN sh b ON c = b.doc_id
      |  WHERE len(list_intersect(a.s3, b.s3)) > 0
      |    AND CAST(len(list_intersect(a.s3, b.s3)) AS DOUBLE) /
      |        (len(a.s3) + len(b.s3) - len(list_intersect(a.s3, b.s3))) >= 0.8),
      |still AS (
      |  SELECT doc_id FROM d1
      |  WHERE doc_id NOT IN (SELECT doc_id FROM dropc)),
      |cand1 AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM mh x JOIN mh y
      |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
      |  JOIN still sa ON x.doc_id = sa.doc_id
      |  JOIN still sb ON y.doc_id = sb.doc_id),
      |v1 AS (
      |  SELECT doc_a, doc_b FROM cand1
      |  JOIN sh a ON doc_a = a.doc_id JOIN sh b ON doc_b = b.doc_id
      |  WHERE len(list_intersect(a.s3, b.s3)) > 0
      |    AND CAST(len(list_intersect(a.s3, b.s3)) AS DOUBLE) /
      |        (len(a.s3) + len(b.s3) - len(list_intersect(a.s3, b.s3))) >= 0.8),
      |e1 AS (SELECT doc_a, doc_b FROM v1 UNION ALL SELECT doc_b, doc_a FROM v1),
      |r1(src, dst) AS (
      |  SELECT DISTINCT doc_a, doc_a FROM e1
      |  UNION
      |  SELECT r.src, e.doc_b FROM r1 r JOIN e1 e ON r.dst = e.doc_a),
      |l1 AS (SELECT src, MIN(dst) AS lab FROM r1 GROUP BY src),
      |acc1 AS (
      |  SELECT still.doc_id FROM still LEFT JOIN l1 ON still.doc_id = l1.src
      |  WHERE l1.src IS NULL OR l1.lab = still.doc_id),
      |accall AS (SELECT doc_id FROM acc0 UNION ALL SELECT doc_id FROM acc1)""".stripMargin

  /** ER re-based on the ACCEPTED sets: base resolution over acc0, tick
    * candidates = band collisions touching acc1, shared verify rule,
    * contraction to base reps, min-participating-base-rep ids. */
  private val erCtes =
    """da AS MATERIALIZED (
      |  SELECT doc_id, lang, substr(text, 1, 40) AS head, n_chars
      |  FROM documents),
      |ebcand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM mh x JOIN mh y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
      |  JOIN acc0 ax ON x.doc_id = ax.doc_id
      |  JOIN acc0 ay ON y.doc_id = ay.doc_id),
      |ebpairs AS (
      |  SELECT doc_a, doc_b
      |  FROM ebcand JOIN da a ON ebcand.doc_a = a.doc_id
      |              JOIN da b ON ebcand.doc_b = b.doc_id
      |  WHERE a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 12
      |    AND levenshtein(a.head, b.head) <= 12),
      |ebedges AS (SELECT doc_a, doc_b FROM ebpairs
      |            UNION ALL SELECT doc_b, doc_a FROM ebpairs),
      |ebreach(src, dst) AS (
      |  SELECT DISTINCT doc_a, doc_a FROM ebedges
      |  UNION
      |  SELECT r.src, e.doc_b FROM ebreach r JOIN ebedges e ON r.dst = e.doc_a),
      |eblab AS (SELECT src, MIN(dst) AS lab FROM ebreach GROUP BY src),
      |base_m AS MATERIALIZED (
      |  SELECT acc0.doc_id, COALESCE(lab, acc0.doc_id) AS rep
      |  FROM acc0 LEFT JOIN eblab ON acc0.doc_id = eblab.src),
      |edcand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM mh x JOIN mh y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
      |  JOIN accall ax ON x.doc_id = ax.doc_id
      |  JOIN accall ay ON y.doc_id = ay.doc_id
      |  WHERE x.doc_id % 20 = 0 OR y.doc_id % 20 = 0),
      |edpairs AS (
      |  SELECT doc_a, doc_b
      |  FROM edcand JOIN da a ON edcand.doc_a = a.doc_id
      |              JOIN da b ON edcand.doc_b = b.doc_id
      |  WHERE a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 12
      |    AND levenshtein(a.head, b.head) <= 12),
      |ecedges0 AS MATERIALIZED (
      |  SELECT CASE WHEN doc_a % 20 = 0 THEN doc_a ELSE ma.rep END AS na,
      |         CASE WHEN doc_b % 20 = 0 THEN doc_b ELSE mb.rep END AS nb
      |  FROM edpairs
      |  LEFT JOIN base_m ma ON edpairs.doc_a = ma.doc_id
      |  LEFT JOIN base_m mb ON edpairs.doc_b = mb.doc_id),
      |ecedges AS (SELECT na, nb FROM ecedges0 WHERE na <> nb
      |            UNION ALL SELECT nb, na FROM ecedges0 WHERE na <> nb),
      |ecreach(src, dst) AS (
      |  SELECT DISTINCT na, na FROM ecedges
      |  UNION
      |  SELECT r.src, e.nb FROM ecreach r JOIN ecedges e ON r.dst = e.na),
      |eclab AS MATERIALIZED (SELECT src, MIN(dst) AS lab FROM ecreach GROUP BY src),
      |eents AS MATERIALIZED (
      |  SELECT lab,
      |    COALESCE(MIN(CASE WHEN src % 20 <> 0 THEN src END), MIN(src)) AS entity_id
      |  FROM eclab GROUP BY lab),
      |ememb AS MATERIALIZED (
      |  SELECT e.entity_id, c.src AS doc_id
      |  FROM eclab c JOIN eents e ON c.lab = e.lab WHERE c.src % 20 = 0
      |  UNION ALL
      |  SELECT e.entity_id, bm.doc_id
      |  FROM eclab c JOIN eents e ON c.lab = e.lab
      |  JOIN base_m bm ON bm.rep = c.src
      |  WHERE c.src % 20 <> 0
      |  UNION ALL
      |  SELECT doc_id AS entity_id, doc_id FROM acc1
      |  WHERE doc_id NOT IN (SELECT src FROM eclab WHERE src % 20 = 0))""".stripMargin

  private lazy val ingestTickSql: String = {
    val semSql = Similarity.defs
      .find(_.name == "dedup_semantic_incremental")
      .flatMap(_.oracle)
      .getOrElse(sys.error("dedup_semantic_incremental oracle missing"))
    s"""WITH RECURSIVE $dedupCtes,
       |$erCtes,
       |sem AS MATERIALIZED (SELECT * FROM ($semSql)),
       |accdocs AS MATERIALIZED (
       |  SELECT dd.doc_id, dd.lang, dd.n_chars
       |  FROM documents dd JOIN accall ON dd.doc_id = accall.doc_id),
       |bylang AS MATERIALIZED (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM accdocs GROUP BY lang)
       |SELECT stage, metric, value FROM (
       |  SELECT '01_dedup' AS stage, 'accepted_base' AS metric,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM acc0) AS value
       |  UNION ALL SELECT '01_dedup', 'accepted_delta',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM acc1)
       |  UNION ALL SELECT '01_dedup', 'dropped_delta',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM d1) -
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM acc1)
       |  UNION ALL SELECT '02_er', 'entities_touched',
       |    (SELECT CAST(COUNT(DISTINCT entity_id) AS BIGINT) FROM ememb)
       |  UNION ALL SELECT '02_er', 'entities_minted',
       |    (SELECT CAST(COUNT(DISTINCT entity_id) AS BIGINT) FROM ememb
       |     WHERE entity_id % 20 = 0)
       |  UNION ALL SELECT '02_er', 'entities_extended',
       |    (SELECT CAST(COUNT(DISTINCT entity_id) AS BIGINT) FROM ememb
       |     WHERE entity_id % 20 <> 0)
       |  UNION ALL SELECT '03_semantic', 'delta_vecs',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM sem)
       |  UNION ALL SELECT '03_semantic', 'accepted_vecs',
       |    (SELECT CAST(SUM(accepted) AS BIGINT) FROM sem)
       |  UNION ALL SELECT '03_semantic', 'dup_vecs',
       |    (SELECT CAST(COUNT(*) - SUM(accepted) AS BIGINT) FROM sem)
       |  UNION ALL SELECT '04_ivf', 'indexed_delta_vecs',
       |    (SELECT CAST(SUM(accepted) AS BIGINT) FROM sem)
       |  UNION ALL SELECT '05_stats', 'chars_max',
       |    (SELECT CAST(MAX(n_chars) AS BIGINT) FROM accdocs)
       |  UNION ALL SELECT '05_stats', 'chars_min',
       |    (SELECT CAST(MIN(n_chars) AS BIGINT) FROM accdocs)
       |  UNION ALL SELECT '05_stats', 'docs_rows',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM accdocs)
       |  UNION ALL SELECT '05_stats', 'lang_ndv',
       |    (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM accdocs)
       |  UNION ALL SELECT '06_summary', 'lang_rows_max',
       |    (SELECT MAX(n) FROM bylang)
       |  UNION ALL SELECT '06_summary', 'langs',
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM bylang)
       |  UNION ALL SELECT '06_summary', 'rows_total',
       |    (SELECT CAST(SUM(n) AS BIGINT) FROM bylang)
       |) ORDER BY stage, metric""".stripMargin
  }

  // -------------------------------------------------------------------
  // stream_rate_offsets — Kafka-shaped offset-tracked micro-batch ingest
  // ([[graft.streaming.RateIngest]]): an unbounded rate-micro-batch
  // source (batch N = values [N·700, (N+1)·700) — content is a pure
  // function of the offset range, the Kafka contract) drained through
  // an idempotent per-offset ledger sink. The gate runs three batches
  // through the REAL StreamingQuery (checkpointed offsets, foreachBatch
  // commit-by-batchId) and emits the ledger; the oracle recomputes each
  // batch's aggregates from the offset arithmetic plus the same pruned
  // documents window. Redelivery idempotence and restart-from-
  // checkpoint offset resume are RateIngestSpec's pins — SQL can't see
  // process death.
  private val RateRows = 700
  private val RateBatches = 3

  private def streamRateOffsets(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    import graft.ops.IncrementalDedup.sourceFingerprint
    val fp = sourceFingerprint(spark, s"$dir/documents.parquet")
    val root = s"${sys.props("java.io.tmpdir")}/graft-rateingest/r1_" +
      s"${dir}_$fp".replaceAll("[^A-Za-z0-9._-]", "_")
    val marker = new org.apache.hadoop.fs.Path(root, "_GRAFT_RATE_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) graft.ops.BuildLedger.timed("rateingest/drain") {
      graft.streaming.RateIngest.runBatches(
        spark, dir, root, RateBatches, RateRows)
      fs.create(marker, true).close()
    }
    graft.streaming.RateIngest.ledger(spark, root)
      .filter(col("batch_id") < RateBatches) // extra in-flight batches may
      .orderBy(col("batch_id"))              // commit before stop() lands
  }

  private val streamRateOffsetsSql =
    s"""WITH b(batch_id) AS (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT))),
       |w AS (SELECT batch_id, batch_id * $RateRows AS lo,
       |             batch_id * $RateRows + ${RateRows - 1} AS hi FROM b)
       |SELECT w.batch_id,
       |  CAST($RateRows AS BIGINT) AS n_rows,
       |  CAST((SELECT COUNT(*) FROM documents d
       |        WHERE d.doc_id BETWEEN w.lo AND w.hi) AS BIGINT) AS n_matched,
       |  CAST((w.lo + w.hi) * $RateRows / 2 AS BIGINT) AS sum_value,
       |  CAST(COALESCE((SELECT SUM(len(string_split(d.text, ' ')))
       |        FROM documents d
       |        WHERE d.doc_id BETWEEN w.lo AND w.hi), 0) AS BIGINT) AS sum_tokens
       |FROM w ORDER BY batch_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("pipeline_ingest_tick", ingestTick,
      Some(graft.sql.DuckCte.materialized(ingestTickSql))),
    QueryDef("stream_rate_offsets", streamRateOffsets,
      Some(streamRateOffsetsSql)))
}
