package graft.queries

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over the embeddings table (SURVEY §2b B12): exact
  * brute-force cosine top-k as the correctness baseline, a sign-LSH
  * bucketed variant as the scale path, plus embedding statistics and
  * near-duplicate pair mining.
  *
  * All vector math is array expressions over `array<double>` — `zip_with`
  * + `aggregate` compile to codegen'd loops; no UDFs, no collect. Dot
  * products fold left-to-right in element order, which DuckDB's
  * `list_reduce` mirrors exactly ⇒ bit-identical doubles.
  *
  * 100 TB shape: the query set (k probes) broadcasts against the corpus —
  * a map-side scan per probe batch. The LSH variant hashes each vector to
  * a bucket (map-side) and only searches same-bucket candidates, turning
  * O(Q·N) into O(Q·N/2^bits); an IVF coarse quantizer would slot into the
  * same plan (bucket = nearest centroid id).
  */
object Similarity {

  /** vectors as array<double> with precomputed L2 norm. All dot products
    * go through the codegen'd VecDot expression (graft.functions.VecExprs)
    * — the interpreted HOF fold was the bench hotspot of this suite. */
  private[queries] def vecs(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    T.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))
  }

  private val dotVQ = "vec_dot(v, qv)"

  // -------------------------------------------------------------------
  // ann_cosine_topk — brute-force exact top-5 neighbors for 10 probes.
  private def annTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val pairs = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(dotVQ) / (col("nrm") * col("qn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val normCte =
    """WITH e AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, label, v,
      |    sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
      |  FROM e
      |)""".stripMargin

  private val annTopkSql = normCte +
    """
      |, q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
      |pairs AS (
      |  SELECT query_id, vec_id AS neighbor_id,
      |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * qv[i]), (a, b) -> a + b)
      |      / (nrm * qn) AS cosine
      |  FROM n, q WHERE vec_id <> query_id)
      |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      |  FROM pairs)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------------
  // ann_lsh_topk — sign-LSH: 3 deterministic hyperplanes (the first three
  // corpus vectors), bucket = sign bits of the plane dots. Probes search
  // only their own bucket (≈1/8 of the corpus).
  private def withBuckets(e: DataFrame): DataFrame = {
    val planes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("plane_id"), col("v").as("qv"))
    e.crossJoin(broadcast(planes))
      .withColumn("d", expr(dotVQ))
      .groupBy(col("vec_id"))
      .agg(sum(
        when(col("d") >= 0,
          when(col("plane_id") === 0, 4)
            .when(col("plane_id") === 1, 2).otherwise(1))
          .otherwise(0)).cast("int").as("bucket"))
  }

  private def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val b = withBuckets(e)
    val eb = e.join(b, "vec_id")
    val q = eb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qb"))
    val cand = eb.join(broadcast(q),
        col("bucket") === col("qb") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(dotVQ) / (col("nrm") * col("qn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("bucket"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val annLshSql = normCte +
    """
      |, planes AS (SELECT vec_id AS plane_id, v AS pv FROM n WHERE vec_id < 3),
      |buckets AS (
      |  SELECT n.vec_id,
      |    CAST(SUM(CASE WHEN list_reduce(list_transform(range(1, len(v)+1),
      |        i -> v[i] * pv[i]), (a, b) -> a + b) >= 0
      |      THEN CASE plane_id WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 1 END
      |      ELSE 0 END) AS INT) AS bucket
      |  FROM n, planes GROUP BY n.vec_id),
      |eb AS (SELECT n.vec_id, v, nrm, bucket FROM n JOIN buckets ON n.vec_id = buckets.vec_id),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qb FROM eb WHERE vec_id < 10),
      |cand AS (
      |  SELECT query_id, vec_id AS neighbor_id, bucket,
      |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * qv[i]), (a, b) -> a + b)
      |      / (nrm * qn) AS cosine
      |  FROM eb JOIN q ON bucket = qb AND vec_id <> query_id)
      |SELECT query_id, neighbor_id, bucket, cosine, CAST(rank AS INT) AS rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      |  FROM cand)
      |WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------------
  // ann_ivf_topk — IVF (inverted-file) ANN with a TRAINED coarse
  // quantizer: centroids come from deterministic Lloyd's k-means
  // (ops.KMeans — fixed init = 8 lowest-id vectors, fixed 3 rounds,
  // decimal-exact component means), so the oracle replays the training
  // loop CTE-by-CTE and re-derives identical cells. Every vector is
  // assigned to its nearest learned cell; probes search only their
  // nprobe=2 nearest cells. Assignment is N×C codegen'd dots, map-side
  // after a centroid broadcast; search cost drops from O(Q·N) to
  // O(Q·N·nprobe/C). Same plan at 100 TB: training touches the corpus
  // iters times map-side (or a hash-sample of it), the index is k·dim
  // values broadcast everywhere.
  private val IvfK = 8
  private val IvfIters = 3

  /** Trained coarse quantizers, one per (session, corpus dir). Training
    * is deterministic (fixed init/rounds/tie-breaks), so the trained
    * k-row frame is PERSISTED as a fingerprint-keyed parquet sidecar:
    * within a session repeated calls reuse the in-memory frame, and a
    * NEW session reads the sidecar back (doubles round-trip parquet
    * losslessly) instead of re-running the Lloyd loop — the real IVF
    * lifecycle: train once per corpus build, serve from the index
    * forever. A regenerated corpus changes the fingerprint and
    * retrains. */
  // memos hold the materialized PATH, never a localCheckpoint'ed frame
  // (VERDICT r12 #9): a checkpointed-DataFrame memo pins executor blocks
  // and the session for the JVM lifetime and is unrecoverable on
  // executor loss (checkpoint blocks have no lineage). A parquet re-read
  // of k centroid/codebook rows is scan-trivial and recomputable on any
  // executor — the trained-index gates join the resilience battery.
  private val centMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def trainedCentroids(spark: SparkSession, dir: String): DataFrame =
    graft.T.readCached(spark, centMemo.computeIfAbsent((spark, dir), _ => {
      val fp = graft.ops.IncrementalDedup
        .sourceFingerprint(spark, s"$dir/embeddings.parquet")
      val tag = s"ivf_cent_${IvfK}x${IvfIters}_${dir}_$fp"
        .replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"${sys.props("java.io.tmpdir")}/graft-ivf/$tag"
      val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(success)) graft.ops.BuildLedger.timed(tag) {
        val e = vecs(spark, dir)
        graft.ops.KMeans.train(
          e.select(col("vec_id"), col("v"), col("nrm")), IvfK, IvfIters)
          .write.mode("overwrite").parquet(path)
      }
      path
    }))

  private def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = trainedCentroids(spark, dir)
      .select(col("cent_id"), col("cv").as("qv"), col("cn"))
    // nearest cell per corpus vector: max_by aggregate (ordering key
    // struct(ccos, -cent_id) = highest cosine, ties to lowest cell) —
    // partial-aggregates the N·C scored rows to N map-side, where the
    // old row_number window shuffled and sorted all N·C
    val scored = e.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
    val corpus = scored.groupBy(col("vec_id"))
      .agg(
        max_by(col("cent_id"), struct(col("ccos"), (-col("cent_id")).as("nc")))
          .as("cell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
    // nearest 2 cells per probe: the rank-2 window only ever sees the
    // 10 probe vectors × C cells — filter FIRST, then rank
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val probes = scored.filter(col("vec_id") < 10)
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") <= 2)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cent_id").as("qcell"))
    val cand = corpus.join(broadcast(probes),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(dotVQ) / (col("nrm") * col("qn")))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cell"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The k-means training loop unrolled to CTEs — one block per Lloyd
    * round, mirroring ops.KMeans step for step (cosine assignment with
    * lowest-cent_id ties, DECIMAL(28,12)-exact component means). `k` is
    * a SQL expression so the cell count can be data-derived (the scaled
    * k-NN join trains at C = ⌈√N⌉ via a scalar subquery) as well as a
    * pinned literal. */
  private def ivfTrainingCtes(k: String, iters: Int, corpus: String = "n",
      initCorpus: String = null, stridedSeed: Boolean = false): String = {
    val ic = Option(initCorpus).getOrElse(corpus)
    val sb = new StringBuilder
    // Seed rule. Pinned-k gates keep the k lowest ids (k ≤ the corpus's
    // duplicate-free id window). Data-derived k uses a STRIDED seed —
    // ids ≡ 0 (mod ⌊N/k⌋) — because at C = ⌈√N⌉ the lowest-id window is
    // pathological on replica-structured corpora: ScaleGen's rotation
    // replicas make ids 0..C near-copies of ~C/n_replica base vectors,
    // duplicate seeds collapse to duplicate centroids (Lloyd can never
    // separate them: identical cells tie-break identically every round),
    // and the effective cell count craters — measured at sf30: 192
    // cells where C = 775, inflating the k-NN candidate volume
    // Σ|cell|² by 4× (and ~16× at sf100 — THE superlinear wall VERDICT
    // r12 #1 attributed to exchange payload). Strided ids sample the
    // whole id range: ~k distinct base vectors, cells ≈ k, candidates
    // back on the N²/C contract. The oracle replays the same stride
    // from the same counts, so the changed quantizer is still
    // hash-proven end-to-end.
    if (stridedSeed) sb.append(
      s""", kk AS (SELECT CAST(($k) AS BIGINT) AS k)
         |, seedw AS (SELECT k, GREATEST(1, (SELECT COUNT(*) FROM $ic) // k) AS s FROM kk)
         |, cent0 AS (SELECT vec_id AS cent_id, v AS cv FROM $ic, seedw
         |            WHERE vec_id % s = 0 AND vec_id < s * k)""".stripMargin)
    else sb.append(
      s", cent0 AS (SELECT vec_id AS cent_id, v AS cv FROM $ic WHERE vec_id < $k)")
    for (t <- 1 to iters) {
      val prev = s"cent${t - 1}"
      val cur = s"cent$t"
      sb.append(s"""
        |, ${cur}_n AS (
        |  SELECT cent_id, cv,
        |    sqrt(list_reduce(list_transform(cv, x -> x * x), (a, b) -> a + b)) AS cn
        |  FROM $prev),
        |${cur}_assign AS (
        |  SELECT vec_id, v, cent_id,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
        |      list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * cv[i]), (a, b) -> a + b)
        |        / (nrm * cn) DESC, cent_id) AS r
        |  FROM $corpus, ${cur}_n),
        |${cur}_comp AS (
        |  SELECT cent_id, unnest(range(1, len(v)+1)) AS pos, unnest(v) AS x
        |  FROM ${cur}_assign WHERE r = 1),
        |$cur AS (
        |  SELECT cent_id, list(m ORDER BY pos) AS cv FROM (
        |    SELECT cent_id, pos,
        |      CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
        |    FROM ${cur}_comp GROUP BY cent_id, pos)
        |  GROUP BY cent_id)""".stripMargin)
    }
    sb.append(s"""
      |, cent AS (
      |  SELECT cent_id, cv,
      |    sqrt(list_reduce(list_transform(cv, x -> x * x), (a, b) -> a + b)) AS cn
      |  FROM cent$iters)""".stripMargin)
    sb.toString
  }

  /** C = ⌈√N⌉ as a SQL scalar subquery — the oracle-side twin of
    * [[scaledCellCount]]. `sqrt` is correctly rounded IEEE in both
    * engines, so the two ceils agree for every N. */
  private val SqrtKExpr =
    "(SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT) FROM n)"

  /** IVF search SQL, parameterized on the probe-id predicate (shared by
    * the direct and the partition-layout-backed variants — by design the
    * layout must not change any answer) and on the cell-count expression
    * (pinned IvfK for the probe gates, ⌈√N⌉ for the k-NN join). */
  private def ivfSearchSql(probePred: String,
      kExpr: String = IvfK.toString, trainCorpus: String = "n",
      preCtes: String = "", stridedSeed: Boolean = false): String =
    ivfSearchCtes(probePred, kExpr, trainCorpus, preCtes, stridedSeed) +
      """
      |SELECT query_id, neighbor_id, cell, cosine, CAST(rank AS INT) AS rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      |  FROM cand)
      |WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  /** The search chain up to the candidate set (`cand`), so composites
    * (the k-NN-graph dedup oracle) can keep building CTEs on top. */
  private def ivfSearchCtes(probePred: String,
      kExpr: String = IvfK.toString, trainCorpus: String = "n",
      preCtes: String = "", stridedSeed: Boolean = false): String =
    normCte + preCtes +
      ivfTrainingCtes(kExpr, IvfIters, trainCorpus, initCorpus = "n",
        stridedSeed = stridedSeed) +
      s"""
      |, scored AS (
      |  SELECT n.vec_id, n.v, n.nrm, cent_id,
      |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * cv[i]), (a, b) -> a + b)
      |      / (nrm * cn) AS ccos
      |  FROM n, cent),
      |assigned AS (
      |  SELECT vec_id, v, nrm, cent_id AS cell,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
      |  FROM scored),
      |corpus AS (SELECT vec_id, v, nrm, cell FROM assigned WHERE crank = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cell AS qcell
      |  FROM assigned WHERE crank <= 2 AND ($probePred)),
      |cand AS (
      |  SELECT query_id, corpus.vec_id AS neighbor_id, cell,
      |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * qv[i]), (a, b) -> a + b)
      |      / (nrm * qn) AS cosine
      |  FROM corpus JOIN probes ON cell = qcell AND corpus.vec_id <> query_id)""".stripMargin

  private val annIvfSql = ivfSearchSql("vec_id < 10")

  // -------------------------------------------------------------------
  // ann_recall_ivf — RECALL INSTRUMENTATION as a first-class operator:
  // an ANN index without a measured recall is a guess, and at 100 TB
  // the ground-truth pass (exact top-k for a FIXED probe panel, O(P·N)
  // map-side dots — linear in the corpus, constant in the panel) is
  // exactly how production vector stores audit their indexes after
  // every build. The gate scores ann_ivf_topk's nprobe=2 / C=8 answers
  // against the exact top-3 of the same probe panel (ids 0-9, the
  // gate's own probes) and emits per-query hit counts: the number the
  // nprobe/C tradeoff is tuned against. Counts, not ratios — the
  // oracle must land hash-exact, and hits/k as a double invites
  // representation drift. The oracle replays BOTH paths: the IVF CTE
  // chain (training included) and the brute-force window.
  private def annRecallIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    // exact ground truth: all N scored against the 10-probe broadcast,
    // same ordering key as the index path (cosine desc, id asc)
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(dotVQ) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val approx = annIvf(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
    probes.select(col("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).cast("long").as("hits_top3"),
        lit(3L).cast("long").as("k"))
      .orderBy(col("query_id"))
  }

  private val annRecallIvfSql =
    ivfSearchCtes("vec_id < 10") +
      s"""
      |, ivf AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      |      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      |    FROM cand)
      |  WHERE rank <= 3),
      |pp AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
      |ex AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT pp.query_id, c.vec_id AS neighbor_id, ROW_NUMBER() OVER (
      |      PARTITION BY pp.query_id ORDER BY
      |        list_reduce(list_transform(range(1, len(c.v)+1), i -> c.v[i] * pp.qv[i]), (a, b) -> a + b)
      |          / (c.nrm * pp.qn) DESC, c.vec_id) AS rank
      |    FROM n c JOIN pp ON c.vec_id <> pp.query_id)
      |  WHERE rank <= 3),
      |h AS (
      |  SELECT ex.query_id, COUNT(*) AS h
      |  FROM ex JOIN ivf ON ex.query_id = ivf.query_id
      |    AND ex.neighbor_id = ivf.neighbor_id
      |  GROUP BY ex.query_id)
      |SELECT pp.query_id, CAST(COALESCE(h.h, 0) AS BIGINT) AS hits_top3,
      |  CAST(3 AS BIGINT) AS k
      |FROM pp LEFT JOIN h ON pp.query_id = h.query_id
      |ORDER BY pp.query_id""".stripMargin

  // -------------------------------------------------------------------
  // ann_ivf_sampled — the quantizer trained on a HASH-SAMPLE, serving
  // the FULL corpus (VERDICT r9 #6): every other ann gate trains on all
  // N vectors, which at sf10 was the family's dominant cold-build cost
  // (376.7 s, O(N·C·iters) assignment work per Lloyd round). The 100 TB
  // story has always been "train on a sample" — this gate REGISTERS it.
  // The sample is the doc_sample_hash idiom (md5(vec_id) first byte
  // < 0x40 — deterministic 25%, no rand(), task retries can't change
  // membership); the seed stays the full corpus's k lowest ids so the
  // init is sample-independent (Lloyd seeds need not be training
  // members); serving assigns and probes the WHOLE corpus against the
  // sample-trained cells, exactly like the full gate. The oracle
  // replays sampling, training, and search CTE-for-CTE, so "sampled
  // training changes only the centroids, never the serving contract"
  // is hash-proven. Probe set 20-29 keeps this gate's answers
  // independent of ann_ivf_topk (0-9) and ann_ivf_bucketed (10-19).
  private def sampledCentroids(spark: SparkSession, dir: String): DataFrame =
    graft.T.readCached(spark, centMemo.computeIfAbsent((spark, s"$dir#sampled"), _ => {
      val fp = graft.ops.IncrementalDedup
        .sourceFingerprint(spark, s"$dir/embeddings.parquet")
      val tag = s"ivf_cent_samp_${IvfK}x${IvfIters}_${dir}_$fp"
        .replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"${sys.props("java.io.tmpdir")}/graft-ivf/$tag"
      val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(success)) graft.ops.BuildLedger.timed(tag) {
        val e = vecs(spark, dir)
        val samp = e.filter(
          substring(md5(col("vec_id").cast("string")), 1, 2) < "40")
        graft.ops.KMeans.train(
          samp.select(col("vec_id"), col("v"), col("nrm")), IvfK, IvfIters,
          init = Some(e.filter(col("vec_id") < IvfK)))
          .write.mode("overwrite").parquet(path)
      }
      path
    }))

  private def annIvfSampled(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = sampledCentroids(spark, dir)
      .select(col("cent_id"), col("cv").as("qv"), col("cn"))
    val scored = e.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
    val corpus = scored.groupBy(col("vec_id"))
      .agg(
        max_by(col("cent_id"), struct(col("ccos"), (-col("cent_id")).as("nc")))
          .as("cell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val probes = scored.filter(col("vec_id") >= 20 && col("vec_id") < 30)
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") <= 2)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cent_id").as("qcell"))
    val cand = corpus.join(broadcast(probes),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(dotVQ) / (col("nrm") * col("qn")))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cell"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val sampCte =
    """
      |, samp AS (
      |  SELECT vec_id, v, nrm FROM n
      |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) < '40')""".stripMargin

  private val annIvfSampledSql = ivfSearchSql(
    "vec_id >= 20 AND vec_id < 30", IvfK.toString,
    trainCorpus = "samp", preCtes = sampCte)

  // -------------------------------------------------------------------
  // ann_ivf_bucketed — the IVF index AS A STORAGE LAYOUT: the assigned
  // corpus is persisted once, Hive-partitioned by cell (one directory
  // per coarse-quantizer cell, memoized on the source fingerprint like
  // every graft mirror), and probe serving reads it back joined on the
  // partition column. With the probe side broadcast, Catalyst inserts a
  // DYNAMIC PARTITION PRUNING subquery on the scan — only the nprobe
  // cells the probes hash to are read from disk, which is the actual
  // serving economics of an IVF index at 100 TB: query cost scales with
  // cells touched, not corpus size (PlanSpec pins `dynamicpruning` in
  // the scan). Same answers as the in-memory plan, different probe set
  // than ann_ivf_topk so the two gates stay independent.
  /** The cell-partitioned serving layout (one Hive partition per coarse
    * cell) at the pinned IvfK, memoized on the source fingerprint — the
    * bucketed probe gate's index (the k-NN join builds its own at
    * C = ⌈√N⌉). `scored` is the N×C centroid scoring frame (caller
    * builds it once and reuses it for probes). */
  private def ivfMirror(spark: SparkSession, dir: String,
      scored: DataFrame): String =
    graft.ops.PartitionedLayout.ensureDerived(
      spark, s"$dir/embeddings.parquet", s"emb_ivf${IvfK}x${IvfIters}_$dir",
      "cell") {
      scored.groupBy(col("vec_id"))
        .agg(
          max_by(col("cent_id"), struct(col("ccos"), (-col("cent_id")).as("nc")))
            .as("cell"),
          first(col("v")).as("v"), first(col("nrm")).as("nrm"))
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    }

  private def annIvfBucketed(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = trainedCentroids(spark, dir)
      .select(col("cent_id"), col("cv").as("qv"), col("cn"))
    val scored = e.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
    val mirror = ivfMirror(spark, dir, scored)
    // partition-column values 0..k-1 are inferred as INT on read; keep
    // the JOIN on the raw partition column (so pruning sees it) and cast
    // only in the output projection
    val corpus = graft.T.readCached(spark, mirror)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val probes = scored.filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") <= 2)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cent_id").cast("int").as("qcell"))
    val cand = corpus.join(broadcast(probes),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(dotVQ) / (col("nrm") * col("qn")))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cell").cast("long").as("cell"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val annIvfBucketedSql = ivfSearchSql("vec_id >= 10 AND vec_id < 20")

  // -------------------------------------------------------------------
  // ann_knn_join — the k-NN JOIN: top-3 neighbors for EVERY corpus
  // vector, not a 10-probe set. This is the shape semantic dedup and
  // clustering actually consume at 100 TB ("for each document, its
  // nearest neighbors"), and the all-pairs spelling is Θ(N²) — the
  // linear-regime plan is IVF-restricted: every vector searches its
  // nprobe=2 nearest cells, so candidates are Σ|cell|·|probes in
  // cell| ≈ N·(2N/C) instead of N². THE CELL COUNT SCALES: C = ⌈√N⌉
  // (derived from the corpus count, not pinned), which puts the join
  // in its linear regime O(N^1.5)·(1/√N cell-mates each) — the round-8
  // lesson was that the pinned C=8 gate was Θ(N²/C) and timed out at
  // 200k vectors while the identical plan at C=√N finished sf10 in
  // 31.5 s. The oracle replays the SAME training at the SAME derived C
  // (a scalar subquery ⌈√COUNT(*)⌉ in the cent0 CTE), so the scale-
  // correct parameterization is now the oracle-checked one. Both join
  // sides shuffle ON THE CELL KEY (the corpus side reads a
  // cell-partitioned serving mirror — the stored index IS the join
  // input), with a shuffle_hash hint so the wide vector payloads are
  // never sort-merged (the sf10 near-dup lesson: sorting array-widened
  // rows is the hidden quadratic of this family). Top-3 per vector goes
  // through the row_number≤k pattern the WindowTopKRewrite turns into
  // a bounded heap. At C=√N cells ≫ executors, so the cell shuffle
  // balances; a mega-cell is the documented salting case.
  private def annKnnJoin(spark: SparkSession, dir: String): DataFrame =
    knnFrame(spark, dir).orderBy(col("query_id"), col("rank"))

  /** C = ⌈√N⌉ for the k-NN join's coarse quantizer — one count per
    * (session, corpus), memoized. The Spark-side twin of [[SqrtKExpr]]. */
  private val vecCountMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), java.lang.Long]()

  /** |corpus| — one count per (session, corpus), memoized; feeds both
    * C = ⌈√N⌉ and the strided-seed stride ⌊N/C⌋. */
  private def vecCount(spark: SparkSession, dir: String): Long =
    vecCountMemo.computeIfAbsent((spark, dir), _ =>
      vecs(spark, dir).count())

  private val scaledCMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Integer]()

  private def scaledCellCount(spark: SparkSession, dir: String): Int =
    scaledCMemo.computeIfAbsent((spark, dir), _ =>
      math.ceil(math.sqrt(vecCount(spark, dir).toDouble)).toInt)

  /** Quantizer trained at C = ⌈√N⌉ — same deterministic Lloyd loop and
    * fingerprint-keyed sidecar lifecycle as [[trainedCentroids]], keyed
    * separately so the pinned-C probe gates and the scaled k-NN join
    * never share an index. TRAINS ON THE 25% HASH-SAMPLE (round 10):
    * the √N-cell regime is exactly where full-corpus training is the
    * family's dominant cold-build cost (O(N^1.5·iters) assignment work
    * — sf10 measured 208.8 s full vs 11.8 s sampled at C=448), and the
    * seed stays the FULL corpus's C lowest ids so init is
    * sample-independent. Serving (assignment of all N vectors, probe
    * search) is unchanged — only the Lloyd rounds ride the sample, and
    * the oracle replays sampling + training + search identically. */
  private val centScaledMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def trainedCentroidsScaled(spark: SparkSession, dir: String): DataFrame =
    graft.T.readCached(spark, centScaledMemo.computeIfAbsent((spark, dir), _ => {
      val c = scaledCellCount(spark, dir)
      val fp = graft.ops.IncrementalDedup
        .sourceFingerprint(spark, s"$dir/embeddings.parquet")
      // "st" = strided-seed quantizer generation — a NEW tag so a
      // sidecar trained under the old lowest-C-ids seed is never served
      val tag = s"ivf_cent_sampst_${c}x${IvfIters}_${dir}_$fp"
        .replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"${sys.props("java.io.tmpdir")}/graft-ivf/$tag"
      val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(success)) graft.ops.BuildLedger.timed(tag) {
        val e = vecs(spark, dir)
        val samp = e.filter(
          substring(md5(col("vec_id").cast("string")), 1, 2) < "40")
        // STRIDED seed — ids ≡ 0 (mod ⌊N/C⌋): C near-distinct base
        // vectors across the whole id range. The lowest-C-ids window is
        // pathological at data-derived C on replica-structured corpora
        // (duplicate seeds → duplicate centroids → cell collapse:
        // sf30 measured 192 live cells of C=775, 4× the contract's
        // candidate volume). The oracle replays the same stride.
        val s = math.max(1L, vecCount(spark, dir) / c)
        graft.ops.KMeans.train(
          samp.select(col("vec_id"), col("v"), col("nrm")), c, IvfIters,
          init = Some(e.filter(
            col("vec_id") % s === 0 && col("vec_id") < s * c)))
          .write.mode("overwrite").parquet(path)
      }
      path
    }))

  /** The k-NN join's ranked frame (shared with the k-NN-graph semantic
    * dedup, which consumes its edges instead of its ranking). Cell
    * count C = ⌈√N⌉ — the linear-regime operating point.
    *
    * The serving mirror STORES each vector's top-2 probe cells next to
    * its own cell: assignment is computed once at index-build time as a
    * slim aggregate (collect the ≤C (ccos, cent_id) pairs per vector
    * map-side — the broadcast cross join keeps each vector's C rows in
    * one partition — sort in-row, keep 2; a row_number window here
    * would shuffle+sort all N·√N scored rows WITH the 0.5 KB vector
    * payload, the measured sf10 killer), and a warm query then touches
    * ONLY the mirror: no re-scoring pass, which is how a deployed IVF
    * index works — the stored index carries its assignments. Ordering
    * key struct(ccos, -cent_id) desc ≡ (ccos desc, cent_id asc). */
  /** tools.CcProbe's stage-timing handle — not query surface. */
  private[graft] def knnFrameForProbe(spark: SparkSession, dir: String): DataFrame =
    knnFrame(spark, dir)


  /** Bucket count for the k-NN serving tables: ~50k vectors per bucket
    * so the ZERO-EXCHANGE bucketed join still runs wide at scale
    * (bucket count = join task count), pow2 for stable re-derivation,
    * floor 8, cap 512. Derived from the same memoized corpus count as
    * C = ⌈√N⌉ (N ≈ C²) — no extra count job. */
  private def knnBuckets(spark: SparkSession, dir: String): Int = {
    val c = scaledCellCount(spark, dir).toLong
    var b = 8
    while (b < c * c / 50000 && b < 512) b <<= 1
    b
  }

  /** The k-NN join's serving layout — TWO co-bucketed catalog tables
    * built once per corpus fingerprint: the corpus bucketed on its
    * `cell` and the probe set (every vector exploded to its top-2 probe
    * cells) bucketed on `qcell`, SAME bucket count. This is the round-12
    * verify design rule taken to its limit for vectors: instead of
    * slimming the ~520 B/row payload the candidate join ships through
    * the cell-key exchange (VERDICT r12 #1 measured it at 11.7×/decade;
    * geometric/ADC bounds cannot prune rotation-decorrelated embeddings
    * — see SCALE.md round 13), the query-time exchange is REMOVED:
    * both join inputs are read already living on their join key, so no
    * vector byte crosses a shuffle at query time. The one-time bucketing
    * shuffle is paid at index build — exactly where a deployed IVF
    * index pays its layout cost — and every knn/semantic-dedup query
    * reads co-located buckets (1 file per bucket, never the
    * tasks×cells small-file fan the old dir-partitioned mirror paid).
    *
    * The assignment itself is computed SLIM: score rows carry only
    * (vec_id, cent_id, ccos) into the top-2-per-vector window — the
    * row_number≤k spelling the WindowTopKRewrite turns into the bounded
    * partial heap — and the vectors join back once at the end. The old
    * collect_list-of-all-C-structs aggregate buffered C·16 B per vector
    * in the partial hash map (≈1.4 GB per task at sf100 — the measured
    * 23-minute warm spill of r12). */
  private def knnServingTables(spark: SparkSession, dir: String)
      : (String, String) = {
    val c = scaledCellCount(spark, dir)
    val b = knnBuckets(spark, dir)
    val fp = graft.ops.IncrementalDedup
      .sourceFingerprint(spark, s"$dir/embeddings.parquet")
    def nm(base: String) = // "st" = strided-seed quantizer generation
      s"${base}_st_${c}x${IvfIters}_b${b}_${dir}_$fp".replaceAll("[^A-Za-z0-9_]", "_")
    val corpusT = graft.ops.Bucketing.ensureTable(spark, nm("knn_corpus"),
        "cell", b) {
      val e = vecs(spark, dir)
      val cent = trainedCentroidsScaled(spark, dir)
        .select(col("cent_id"), col("cv").as("qv"), col("cn"))
      val scored = e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cent_id"),
          (expr(dotVQ) / (col("nrm") * col("cn"))).as("ccos"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id"))
      val top2 = scored.withColumn("rk", row_number().over(wAssign))
        .filter(col("rk") <= 2)
      val cells = top2.groupBy(col("vec_id")).agg(
        max(when(col("rk") === 1, col("cent_id"))).cast("int").as("cell"),
        max(when(col("rk") === 2, col("cent_id"))).cast("int").as("cell2"))
      e.join(cells, "vec_id")
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"), col("cell2"))
    }
    val probeT = graft.ops.Bucketing.ensureTable(spark, nm("knn_probes"),
        "qcell", b) {
      spark.table(corpusT).select(col("vec_id").as("query_id"),
          col("v").as("qv"), col("nrm").as("qn"),
          explode(array(col("cell"), col("cell2"))).as("qcell"))
        .filter(col("qcell").isNotNull) // C=1 corpus: no second probe cell
    }
    (corpusT, probeT)
  }

  /** tools.KnnStageProbe's layout handle — not query surface. */
  private[graft] def knnServingTablesForProbe(spark: SparkSession,
      dir: String): (String, String) = knnServingTables(spark, dir)

  private def knnFrame(spark: SparkSession, dir: String): DataFrame = {
    val (corpusT, probeT) = knnServingTables(spark, dir)
    val corpus = spark.table(corpusT)
    val probes = spark.table(probeT)
    // bucketed-on-the-key scans both sides: the shuffle_hash join plans
    // with NO exchange under it (PlanSpec pins it) — the candidate
    // enumeration and the per-candidate exact cosine are the O(N^1.5)
    // contract cost, and they run where the data already sits
    val cand = corpus.hint("shuffle_hash").join(probes,
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(dotVQ) / (col("nrm") * col("qn")))
      .select(col("query_id"), col("vec_id"),
        col("cell").cast("long").as("cell"), col("cosine"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cell"), col("cosine"), col("rank"))
  }

  // every vector is a probe: the shared search SQL with a TRUE pred,
  // trained at the same derived C = ⌈√N⌉ the Spark plan uses
  private val annKnnJoinSql = ivfSearchSql("TRUE", SqrtKExpr,
    trainCorpus = "samp", preCtes = sampCte, stridedSeed = true)

  // -------------------------------------------------------------------
  // dedup_semantic_knn — semantic deduplication in the LINEAR regime:
  // the k-NN graph (every vector's IVF-restricted top-3, the exact
  // edges ann_knn_join emits) thresholded at cosine ≥ 0.45, symmetric
  // closure, connected components, one survivor per component (min
  // vec_id). This is the composition a 100 TB curation run actually
  // executes — emb_neardup_pairs' exact all-pairs spelling at the same
  // threshold is Θ(N²) BY CONTRACT, while this plan's candidate volume
  // is the k-NN join's Σ|cell|·|probes in cell| ≈ N·(2N/C) at the
  // C = ⌈√N⌉ operating point the frame now trains at, and the
  // component step is [[graft.ops.Graph.connectedComponents]]'s
  // partition-local contraction + pointer-doubling propagation — the
  // same machinery under the text near-dup family. Recall relative to
  // all-pairs is the IVF + top-k contract (a pair in an unprobed cell
  // or past rank 3 is not an edge) — which is precisely what the gate
  // proves semantics of: the oracle replays the SAME graph (search
  // CTEs + recursive reachability), so survivors match bit-for-bit.
  // Output: every vector with its component rep and survivor flag —
  // singletons survive trivially via the left join's coalesce.
  private def dedupSemanticKnn(spark: SparkSession, dir: String): DataFrame = {
    val edges = knnFrame(spark, dir)
      .filter(col("cosine") >= 0.45)
      .select(
        least(col("query_id"), col("neighbor_id")).as("doc_a"),
        greatest(col("query_id"), col("neighbor_id")).as("doc_b"))
      .distinct()
    // size-gated driver union-find with the alternating-star fallback:
    // the k-NN edge set is k·N rows — under the driver gate through the
    // tested SFs, and past it the fallback is large-star/small-star,
    // NOT min-label propagation (the k-NN graph's components can be
    // chain-shaped with ids in adversarial order; measured at sf10 the
    // propagation loop exhausted its 40-round cap, while alt-star is
    // O(log² n) rounds regardless of diameter)
    val labels = graft.ops.Graph.componentsSizeGated(edges)
    val e = vecs(spark, dir).select(col("vec_id"))
    e.join(labels, e("vec_id") === labels("id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("cluster_rep"),
        (coalesce(col("label"), col("vec_id")) === col("vec_id"))
          .cast("int").as("is_survivor"))
      .orderBy(col("vec_id"))
  }

  private val dedupSemanticKnnSql =
    ("WITH RECURSIVE" + ivfSearchCtes("TRUE", SqrtKExpr,
      trainCorpus = "samp", preCtes = sampCte, stridedSeed = true)
      .stripPrefix("WITH")) +
      """
      |, knn AS (
      |  SELECT query_id, neighbor_id, cosine FROM (
      |    SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      |    FROM cand)
      |  WHERE rank <= 3),
      |p2 AS (
      |  SELECT DISTINCT LEAST(query_id, neighbor_id) AS doc_a,
      |    GREATEST(query_id, neighbor_id) AS doc_b
      |  FROM knn WHERE cosine >= 0.45),
      |eedges AS (SELECT doc_a, doc_b FROM p2
      |           UNION ALL SELECT doc_b, doc_a FROM p2),
      |reach(src, dst) AS (
      |  SELECT DISTINCT doc_a, doc_a FROM eedges
      |  UNION
      |  SELECT r.src, e.doc_b FROM reach r JOIN eedges e ON r.dst = e.doc_a),
      |labels AS (SELECT src, MIN(dst) AS lab FROM reach GROUP BY src)
      |SELECT n.vec_id, COALESCE(lab, n.vec_id) AS cluster_rep,
      |  CAST(CASE WHEN COALESCE(lab, n.vec_id) = n.vec_id
      |       THEN 1 ELSE 0 END AS INT) AS is_survivor
      |FROM n LEFT JOIN labels ON n.vec_id = labels.src
      |ORDER BY vec_id""".stripMargin

  // -------------------------------------------------------------------
  // ann_ivf_incremental — the index lifecycle UNDER INGEST: new vectors
  // keep arriving, and retraining the quantizer + rebuilding the layout
  // per batch is exactly what a 100 TB serving index cannot afford. The
  // real protocol (IVF as deployed everywhere): train the coarse
  // quantizer ONCE on the base corpus and FREEZE it; an arriving delta
  // batch is assigned to its nearest frozen cell map-side (O(delta·C)
  // dots against broadcast centroids — never touches the base) and lands
  // as its own cell-partitioned segment next to the base layout; serving
  // reads base ∪ delta, still pruned to the probes' nprobe cells on BOTH
  // segments. The base mirror is never rewritten by an append
  // (IvfIncrementalSpec pins its files byte-stable across the delta
  // build) — merging delta segments into the base layout is a
  // compaction-time job ([[graft.ops.ManifestLake.compactSmall]] is that
  // machinery), not a query-time one. The oracle replays the base-only
  // training (note `nb`), assigns ALL vectors to the frozen cells, and
  // must agree exactly — proving the frozen-quantizer append changes no
  // answer vs. an oracle that saw the whole corpus through the same
  // frozen index.
  private val centIncMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  /** Quantizer trained on the BASE corpus only (vec_id % 10 != 3),
    * frozen thereafter — same fingerprint-keyed sidecar lifecycle as
    * [[trainedCentroids]]. */
  private def frozenBaseCentroids(spark: SparkSession, dir: String): DataFrame =
    graft.T.readCached(spark, centIncMemo.computeIfAbsent((spark, dir), _ => {
      val fp = graft.ops.IncrementalDedup
        .sourceFingerprint(spark, s"$dir/embeddings.parquet")
      val tag = s"ivf_cent_base_${IvfK}x${IvfIters}_${dir}_$fp"
        .replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"${sys.props("java.io.tmpdir")}/graft-ivf/$tag"
      val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(success)) graft.ops.BuildLedger.timed(tag) {
        val base = vecs(spark, dir).filter(col("vec_id") % 10 =!= 3)
        graft.ops.KMeans.train(
          base.select(col("vec_id"), col("v"), col("nrm")), IvfK, IvfIters)
          .write.mode("overwrite").parquet(path)
      }
      path
    }))

  /** Cell-partitioned segment paths for the incremental index: (base,
    * delta). Exposed to the spec so it can pin the base segment's
    * byte-stability across the delta append. */
  private[graft] def ivfIncrementalSegments(spark: SparkSession,
      dir: String): (String, String) = {
    val e = vecs(spark, dir)
    val cent = frozenBaseCentroids(spark, dir)
      .select(col("cent_id"), col("cv").as("qv"), col("cn"))
    def assign(part: DataFrame): DataFrame = part
      .crossJoin(broadcast(cent))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cent_id"), struct(col("ccos"), (-col("cent_id")).as("nc")))
          .as("cell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val src = s"$dir/embeddings.parquet"
    val base = graft.ops.PartitionedLayout.ensureDerived(
      spark, src, s"emb_ivfinc_base_$dir", "cell") {
      assign(e.filter(col("vec_id") % 10 =!= 3))
    }
    val delta = graft.ops.PartitionedLayout.ensureDerived(
      spark, src, s"emb_ivfinc_delta_$dir", "cell") {
      assign(e.filter(col("vec_id") % 10 === 3))
    }
    (base, delta)
  }

  private def annIvfIncremental(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = frozenBaseCentroids(spark, dir)
      .select(col("cent_id"), col("cv").as("qv"), col("cn"))
    val (baseMirror, deltaMirror) = ivfIncrementalSegments(spark, dir)
    val corpus = graft.T.readCached(spark, baseMirror)
      .unionByName(graft.T.readCached(spark, deltaMirror))
    // probes ride the same frozen quantizer (nprobe=2 nearest cells)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val probes = e.filter(col("vec_id") >= 20 && col("vec_id") < 30)
      .crossJoin(broadcast(cent))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") <= 2)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cent_id").cast("int").as("qcell"))
    val cand = corpus.join(broadcast(probes),
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(dotVQ) / (col("nrm") * col("qn")))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cell").cast("long").as("cell"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val annIvfIncrementalSql = normCte +
    "\n, nb AS (SELECT * FROM n WHERE vec_id % 10 <> 3)" +
    ivfTrainingCtes(IvfK.toString, IvfIters, "nb") +
    s"""
      |, scored AS (
      |  SELECT n.vec_id, n.v, n.nrm, cent_id,
      |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * cv[i]), (a, b) -> a + b)
      |      / (nrm * cn) AS ccos
      |  FROM n, cent),
      |assigned AS (
      |  SELECT vec_id, v, nrm, cent_id AS cell,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
      |  FROM scored),
      |corpus AS (SELECT vec_id, v, nrm, cell FROM assigned WHERE crank = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cell AS qcell
      |  FROM assigned WHERE crank <= 2 AND vec_id >= 20 AND vec_id < 30),
      |cand AS (
      |  SELECT query_id, corpus.vec_id AS neighbor_id, cell,
      |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * qv[i]), (a, b) -> a + b)
      |      / (nrm * qn) AS cosine
      |  FROM corpus JOIN probes ON cell = qcell AND corpus.vec_id <> query_id)
      |SELECT query_id, neighbor_id, cell, cosine, CAST(rank AS INT) AS rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      |  FROM cand)
      |WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------------
  // dedup_semantic_incremental — the semantic-dedup INGEST TICK: the
  // embedding twin of dedup_incremental/dedup_stream_ingest and the
  // incremental closure of dedup_semantic_knn. The already-accepted
  // corpus (vec_id % 10 ≠ 3, ann_ivf_incremental's split contract) owns
  // a FROZEN coarse quantizer at the k-NN join's linear-regime operating
  // point C = ⌈√N_base⌉ (Lloyd on the 25% hash-sample of the base, seed
  // = the base's sub-C ids — train once, freeze, never retrain per
  // batch) plus a cell-partitioned base segment; an arriving delta
  // (≡ 3 mod 10) is assigned to its nearest frozen cell map-side
  // (O(delta·C) dots against broadcast centroids) and lands as its own
  // cell-partitioned segment — the exact index lifecycle
  // ann_ivf_incremental serves queries from, now serving the dedup tick.
  //
  // Tick rules mirror streaming/DedupStream (first-writer-wins):
  //  1. a delta vector with ANY accepted-corpus neighbor at cosine ≥
  //     0.45 (dedup_semantic_knn's threshold) inside its nprobe=2
  //     frozen cells is a duplicate of the corpus — dup_of = the
  //     minimum matching base vec_id; the corpus is NEVER self-joined;
  //  2. among the rest, within-delta matches form a delta-sized graph;
  //     min id survives its component (size-gated driver union-find —
  //     corpus-rejected docs do not mediate batch merges, same as the
  //     text stream's rule 2).
  // Candidate volume is O(delta·√N): 2 probe cells per delta vector ×
  // ~N/C = √N corpus rows per cell — the tick scales with the batch,
  // not the corpus², and a SMALL batch's distinct probe-cell set prunes
  // the cell-partitioned base scan before any vector is read. The
  // oracle replays base-sampled training, frozen assignment, probing,
  // verification, and both rules end-to-end.
  private val semIncNMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), java.lang.Long]()

  /** |base corpus| (vec_id % 10 ≠ 3) — memoized; feeds C and the seed
    * stride. */
  private def semIncBaseCount(spark: SparkSession, dir: String): Long =
    semIncNMemo.computeIfAbsent((spark, dir), _ =>
      vecs(spark, dir).filter(col("vec_id") % 10 =!= 3).count())

  private def semIncCellCount(spark: SparkSession, dir: String): Int =
    math.ceil(math.sqrt(semIncBaseCount(spark, dir).toDouble)).toInt

  private val semIncCentMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  /** Frozen quantizer for the semantic-dedup tick: trained on the BASE
    * corpus's 25% hash-sample at C = ⌈√N_base⌉, STRIDED seed (base ids
    * ≡ 0 mod ⌊N_base/C⌋ — the lowest-C-ids window collapses cells on
    * replica-structured corpora, see [[trainedCentroidsScaled]]) —
    * [[trainedCentroidsScaled]]'s training economics under
    * [[frozenBaseCentroids]]'s freeze-on-base lifecycle.
    *
    * The memo holds only the materialized PATH (ADVICE r11): the old
    * localCheckpoint'ed-DataFrame memo pinned checkpoint blocks and the
    * session for the JVM lifetime AND made the tick non-recoverable on
    * executor loss (checkpoint blocks have no lineage). A parquet
    * re-read of ⌈√N⌉ centroid rows is scan-trivial, recomputable on any
    * executor, and lets this gate join the resilience battery. */
  private def semIncCentroids(spark: SparkSession, dir: String): DataFrame = {
    val path = semIncCentMemo.computeIfAbsent((spark, dir), _ => {
      val c = semIncCellCount(spark, dir)
      val fp = graft.ops.IncrementalDedup
        .sourceFingerprint(spark, s"$dir/embeddings.parquet")
      // "st" = strided-seed generation (never serve an old-seed sidecar)
      val tag = s"ivf_cent_semincst_${c}x${IvfIters}_${dir}_$fp"
        .replaceAll("[^A-Za-z0-9._-]", "_")
      val p = s"${sys.props("java.io.tmpdir")}/graft-ivf/$tag"
      val success = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(success)) graft.ops.BuildLedger.timed(tag) {
        val base = vecs(spark, dir).filter(col("vec_id") % 10 =!= 3)
        val samp = base.filter(
          substring(md5(col("vec_id").cast("string")), 1, 2) < "40")
        val s = math.max(1L, semIncBaseCount(spark, dir) / c)
        graft.ops.KMeans.train(
          samp.select(col("vec_id"), col("v"), col("nrm")), c, IvfIters,
          init = Some(base.filter(
            col("vec_id") % s === 0 && col("vec_id") < s * c)))
          .write.mode("overwrite").parquet(p)
      }
      p
    })
    graft.T.readCached(spark, path)
  }

  /** Cell-partitioned (base, delta) segment paths for the tick's index —
    * the base segment is built once and never rewritten by a delta
    * append (the [[ivfIncrementalSegments]] contract at the scaled C). */
  private[graft] def semIncSegments(spark: SparkSession,
      dir: String): (String, String) = {
    val e = vecs(spark, dir)
    val cent = semIncCentroids(spark, dir)
      .select(col("cent_id"), col("cv").as("qv"), col("cn"))
    def assign(part: DataFrame): DataFrame = part
      .crossJoin(broadcast(cent))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cent_id"), struct(col("ccos"), (-col("cent_id")).as("nc")))
          .as("cell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val src = s"$dir/embeddings.parquet"
    // "st" tags: assignments follow the strided-seed quantizer
    val base = graft.ops.PartitionedLayout.ensureDerived(
      spark, src, s"emb_semincst_base_$dir", "cell") {
      assign(e.filter(col("vec_id") % 10 =!= 3))
    }
    val delta = graft.ops.PartitionedLayout.ensureDerived(
      spark, src, s"emb_semincst_delta_$dir", "cell") {
      assign(e.filter(col("vec_id") % 10 === 3))
    }
    (base, delta)
  }

  /** The tick's verified match set (query_id = delta doc, nb_id = the
    * corpus-or-delta neighbor at cosine ≥ 0.45 inside a probed cell) —
    * exposed so the spec can pin NON-VACUOUSLY that a corpus-rejected
    * delta doc's within-batch edges exist and still don't mediate. */
  private[graft] def semIncVerifiedEdges(spark: SparkSession,
      dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = semIncCentroids(spark, dir)
      .select(col("cent_id"), col("cv").as("qv"), col("cn"))
    val (baseMirror, deltaMirror) = semIncSegments(spark, dir)
    // delta probes its nprobe=2 nearest frozen cells — the knnFrame slim
    // aggregate (top-2 kept map-side; a window here would shuffle the
    // delta·C scored rows WITH their vector payloads)
    val probes = e.filter(col("vec_id") % 10 === 3)
      .crossJoin(broadcast(cent))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
      .groupBy(col("vec_id"))
      .agg(slice(sort_array(collect_list(
        struct(col("ccos"), (-col("cent_id")).as("nc"))), asc = false),
        1, 2).as("cs"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"),
        explode(array((-col("cs")(0)("nc")).cast("int"),
          (-element_at(col("cs"), 2)("nc")).cast("int"))).as("qcell"))
      .filter(col("qcell").isNotNull) // C=1 corpus: no second probe cell
    // the batch's distinct probe cells prune the partitioned base scan
    // (broadcastable cell-id list → partition-dir pruning) — a small
    // tick reads only the cells it probes, never the whole base segment
    val probeCells = probes.select(col("qcell").as("pc")).distinct()
    val corpus = graft.T.readCached(spark, baseMirror)
      .join(broadcast(probeCells), col("cell") === col("pc"), "left_semi")
      .unionByName(graft.T.readCached(spark, deltaMirror))
    corpus.hint("shuffle_hash").join(probes,
        col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(dotVQ) / (col("nrm") * col("qn")))
      .filter(col("cosine") >= 0.45)
      .select(col("query_id"), col("vec_id").as("nb_id"))
  }

  private[graft] def dedupSemanticIncremental(spark: SparkSession,
      dir: String): DataFrame = {
    val e = vecs(spark, dir)
    // delta-sized; feeds both rules. persist (NOT localCheckpoint):
    // a lost cache block recomputes through lineage on a replacement
    // executor, where a lost checkpoint block fails the job — this is
    // what lets the tick join the ClusterProbe kill battery (VERDICT
    // r12 #9). The plan is static (no iterative lineage growth), so
    // checkpoint truncation buys nothing here.
    val verified = semIncVerifiedEdges(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // rule 1: first-writer-wins vs the accepted corpus
    val dupc = verified.filter(col("nb_id") % 10 =!= 3)
      .groupBy(col("query_id")).agg(min(col("nb_id")).as("dup_base"))
    val delta = e.filter(col("vec_id") % 10 === 3).select(col("vec_id"))
    val stillIn = delta.join(
      dupc.select(col("query_id").as("vec_id")), Seq("vec_id"), "left_anti")
    // rule 2: min id survives its within-batch component
    val inner = verified.filter(col("nb_id") % 10 === 3)
      .select(least(col("query_id"), col("nb_id")).as("doc_a"),
        greatest(col("query_id"), col("nb_id")).as("doc_b"))
      .join(stillIn.select(col("vec_id").as("doc_a")), Seq("doc_a"))
      .join(stillIn.select(col("vec_id").as("doc_b")), Seq("doc_b"))
      .distinct()
    val labels = graft.ops.Graph.componentsSizeGated(inner)
    delta
      .join(dupc.withColumnRenamed("query_id", "vec_id"), Seq("vec_id"), "left")
      .join(labels.select(col("id").as("vec_id"), col("label")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        (coalesce(col("dup_base"), col("label"), col("vec_id"))
          === col("vec_id")).cast("int").as("accepted"),
        coalesce(col("dup_base"), col("label"), col("vec_id")).as("dup_of"))
      .orderBy(col("vec_id"))
  }

  /** C = ⌈√N_base⌉ as the oracle's scalar subquery (base corpus only). */
  private val SemIncKExpr =
    "(SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT) FROM nb)"

  private val dedupSemanticIncrementalSql =
    "WITH RECURSIVE" + (normCte +
      "\n, nb AS (SELECT * FROM n WHERE vec_id % 10 <> 3)" +
      """
        |, sampb AS (
        |  SELECT vec_id, v, nrm FROM nb
        |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) < '40')""".stripMargin +
      ivfTrainingCtes(SemIncKExpr, IvfIters, corpus = "sampb",
        initCorpus = "nb", stridedSeed = true) +
      """
        |, scored AS (
        |  SELECT n.vec_id, n.v, n.nrm, cent_id,
        |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * cv[i]), (a, b) -> a + b)
        |      / (nrm * cn) AS ccos
        |  FROM n, cent),
        |assigned AS (
        |  SELECT vec_id, v, nrm, cent_id AS cell,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
        |  FROM scored),
        |corpus AS (SELECT vec_id, v, nrm, cell FROM assigned WHERE crank = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cell AS qcell
        |  FROM assigned WHERE crank <= 2 AND vec_id % 10 = 3),
        |ver AS (
        |  SELECT DISTINCT query_id, corpus.vec_id AS nb_id
        |  FROM corpus JOIN probes ON cell = qcell AND corpus.vec_id <> query_id
        |  WHERE list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * qv[i]), (a, b) -> a + b)
        |      / (nrm * qn) >= 0.45),
        |dupc AS (
        |  SELECT query_id, MIN(nb_id) AS dup_base
        |  FROM ver WHERE nb_id % 10 <> 3 GROUP BY query_id),
        |still AS (
        |  SELECT vec_id FROM n WHERE vec_id % 10 = 3
        |    AND vec_id NOT IN (SELECT query_id FROM dupc)),
        |ie AS (
        |  SELECT DISTINCT LEAST(query_id, nb_id) AS doc_a,
        |    GREATEST(query_id, nb_id) AS doc_b
        |  FROM ver WHERE nb_id % 10 = 3
        |    AND query_id IN (SELECT vec_id FROM still)
        |    AND nb_id IN (SELECT vec_id FROM still)),
        |iedges AS (SELECT doc_a, doc_b FROM ie
        |           UNION ALL SELECT doc_b, doc_a FROM ie),
        |reach(src, dst) AS (
        |  SELECT DISTINCT doc_a, doc_a FROM iedges
        |  UNION
        |  SELECT r.src, e.doc_b FROM reach r JOIN iedges e ON r.dst = e.doc_a),
        |lab AS (SELECT src, MIN(dst) AS lab FROM reach GROUP BY src)
        |SELECT d.vec_id,
        |  CAST(CASE WHEN COALESCE(dupc.dup_base, lab.lab, d.vec_id) = d.vec_id
        |       THEN 1 ELSE 0 END AS INT) AS accepted,
        |  COALESCE(dupc.dup_base, lab.lab, d.vec_id) AS dup_of
        |FROM (SELECT vec_id FROM n WHERE vec_id % 10 = 3) d
        |LEFT JOIN dupc ON d.vec_id = dupc.query_id
        |LEFT JOIN lab ON d.vec_id = lab.src
        |ORDER BY d.vec_id""".stripMargin).stripPrefix("WITH")

  // -------------------------------------------------------------------
  // ann_pq_topk — product quantization (Jégou et al., "Product
  // Quantization for Nearest Neighbor Search", TPAMI 2011): the MEMORY
  // economics of embedding serving at 100 TB. The 64-dim vector is cut
  // into M=4 16-dim subvectors; each subspace gets its own k=8-codeword
  // codebook (deterministic Lloyd's under SQUARED L2 — fixed seed init
  // of the k lowest-id subvectors, fixed 2 rounds, ties to lowest
  // codeword, DECIMAL(28,12)-exact component means, so the oracle
  // re-derives identical codebooks CTE-by-CTE). A corpus vector is then
  // M small ints (here 4×3 bits vs 64×8 bytes — ~170× smaller), and
  // search is ASYMMETRIC DISTANCE COMPUTATION: the uncompressed probe
  // precomputes a M×k distance table, and each candidate's approximate
  // distance is M table lookups — no vector math per candidate.
  //
  // All M subspaces train SIMULTANEOUSLY in one frame keyed by `m`
  // (one Lloyd loop, shuffle volume N·dim scalars partial-aggregated —
  // not M sequential jobs), and the ADC sum is floor-quantized to
  // 1e-12 units per (subspace, codeword) and summed as int64, so the
  // M-way fold is EXACT and order-independent (the float-determinism
  // ladder, rung 2). Squared-L2 spelled dot(s,s)+dot(c,c)-2·dot(s,c)
  // through the codegen'd vec_dot — same IEEE op order as the oracle's
  // list_reduce spelling.
  private val PqM = 4
  private val PqSubDim = 16
  private val PqK = 8
  private val PqIters = 2
  private val PqUnit = 1e12

  /** (vec_id, m, sv): the corpus cut into M subvectors per vector. */
  private def subvecs(e: DataFrame): DataFrame = e
    .select(col("vec_id"), explode(expr(
      s"transform(sequence(0, ${PqM - 1}), m -> " +
        s"struct(m AS m, slice(v, m * $PqSubDim + 1, $PqSubDim) AS sv))")).as("p"))
    .select(col("vec_id"), col("p.m").as("m"), col("p.sv").as("sv"))

  private val pqD2 = "vec_dot(sv, sv) + vec_dot(cv, cv) - 2 * vec_dot(sv, cv)"

  /** Per-subspace codebooks (m, cent_id, cv) — Lloyd's over all M
    * subspaces at once, same determinism discipline as [[graft.ops.KMeans]]
    * but under squared L2 (the PQ objective; cosine is meaningless on
    * subvectors). Persisted as a fingerprint-keyed parquet sidecar like
    * the IVF centroids: train once per corpus build, serve forever. */
  private val pqMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def trainedCodebooks(spark: SparkSession, dir: String): DataFrame =
    graft.T.readCached(spark, pqMemo.computeIfAbsent((spark, dir), _ => {
      val fp = graft.ops.IncrementalDedup
        .sourceFingerprint(spark, s"$dir/embeddings.parquet")
      val tag = s"pq_cent_${PqM}x${PqK}x${PqIters}_${dir}_$fp"
        .replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"${sys.props("java.io.tmpdir")}/graft-ivf/$tag"
      val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(success)) graft.ops.BuildLedger.timed(tag) {
        val sub = subvecs(vecs(spark, dir))
        var cent = sub.filter(col("vec_id") < PqK)
          .select(col("m"), col("vec_id").as("cent_id"), col("sv").as("cv"))
        for (_ <- 1 to PqIters) {
          val assigned = sub.join(broadcast(cent), "m")
            .withColumn("d2", expr(pqD2))
            .groupBy(col("vec_id"), col("m"))
            .agg(
              min_by(col("cent_id"), struct(col("d2"), col("cent_id")))
                .as("cent_id"),
              first(col("sv")).as("sv"))
          val comp = assigned
            .selectExpr("m", "cent_id", "posexplode(sv) AS (pos, x)")
            .groupBy(col("m"), col("cent_id"), col("pos"))
            .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double") /
              count(lit(1))).as("mm"))
          cent = comp.groupBy(col("m"), col("cent_id"))
            .agg(expr(
              "transform(sort_array(collect_list(struct(pos, mm))), s -> s.mm)")
              .as("cv"))
        }
        cent.write.mode("overwrite").parquet(path)
      }
      path
    }))

  // ann_recall_pq — the recall audit for the compressed index: PQ's
  // whole bargain is ~170× less memory for SOME recall loss, and the
  // loss is only a number if the exact pass runs. Ground truth here is
  // exact SQUARED L2 (the metric PQ approximates — not cosine, which
  // is ann_recall_ivf's axis), spelled dot(v,v)+dot(q,q)-2·dot(v,q)
  // through the same codegen'd vec_dot / list_reduce op order on both
  // engines so the top-3 ordering (d2 asc, id asc) is replayable.
  // Output shape matches ann_recall_ivf: per-query hit counts.
  private def annRecallPq(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("vec_id"))
    val exact = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d2",
        expr("vec_dot(v, v)") + expr("vec_dot(qv, qv)") -
          lit(2.0) * expr(dotVQ))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val approx = annPq(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
    probes.select(col("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).cast("long").as("hits_top3"),
        lit(3L).cast("long").as("k"))
      .orderBy(col("query_id"))
  }

  private def annRecallPqSql: String = {
    val dotvv = "list_reduce(list_transform(range(1, len(c.v)+1), i -> c.v[i] * c.v[i]), (a, b) -> a + b)"
    val dotqq = "list_reduce(list_transform(range(1, len(pp.qv)+1), i -> pp.qv[i] * pp.qv[i]), (a, b) -> a + b)"
    val dotvq = "list_reduce(list_transform(range(1, len(c.v)+1), i -> c.v[i] * pp.qv[i]), (a, b) -> a + b)"
    annPqCtes +
      s"""
      |, pq AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      |      PARTITION BY query_id ORDER BY u, neighbor_id) AS rank
      |    FROM adist)
      |  WHERE rank <= 3),
      |pp AS (SELECT vec_id AS query_id, v AS qv FROM n WHERE vec_id < 10),
      |ex AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT pp.query_id, c.vec_id AS neighbor_id, ROW_NUMBER() OVER (
      |      PARTITION BY pp.query_id ORDER BY
      |        $dotvv + $dotqq - 2 * $dotvq, c.vec_id) AS rank
      |    FROM n c JOIN pp ON c.vec_id <> pp.query_id)
      |  WHERE rank <= 3),
      |h AS (
      |  SELECT ex.query_id, COUNT(*) AS h
      |  FROM ex JOIN pq ON ex.query_id = pq.query_id
      |    AND ex.neighbor_id = pq.neighbor_id
      |  GROUP BY ex.query_id)
      |SELECT pp.query_id, CAST(COALESCE(h.h, 0) AS BIGINT) AS hits_top3,
      |  CAST(3 AS BIGINT) AS k
      |FROM pp LEFT JOIN h ON pp.query_id = h.query_id
      |ORDER BY pp.query_id""".stripMargin
  }

  private def annPq(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = trainedCodebooks(spark, dir)
    val scored = subvecs(e).join(broadcast(cent), "m")
      .withColumn("d2", expr(pqD2))
    // encode: each (vector, subspace) → nearest codeword, N·M small ints
    val codes = scored.groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("cent_id"), struct(col("d2"), col("cent_id"))).as("code"))
    // ADC tables for the probes: Q·M·k quantized distances, broadcast
    val dt = scored.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("m").as("qm"),
        col("cent_id"),
        floor(col("d2") * lit(PqUnit)).cast("long").as("units"))
    val adist = codes.join(broadcast(dt),
        col("m") === col("qm") && col("code") === col("cent_id") &&
          col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("units")).as("u"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("u"), col("vec_id"))
    adist.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (col("u").cast("double") / lit(PqUnit)).as("adist"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The PQ trainer unrolled to CTEs — one block per Lloyd round over
    * the (vec_id, m, sv) subvector frame, then encode + ADC search. */
  private def annPqCtes: String = {
    val dot = (a: String, b: String) =>
      s"list_reduce(list_transform(range(1, len(sv)+1), i -> $a[i] * $b[i]), (a, b) -> a + b)"
    val d2 = s"${dot("sv", "sv")} + ${dot("cv", "cv")} - 2 * ${dot("sv", "cv")}"
    val sb = new StringBuilder
    sb.append(normCte)
    sb.append(s"""
      |, sub AS (
      |  SELECT vec_id, r.m AS m,
      |    list_slice(v, r.m * $PqSubDim + 1, r.m * $PqSubDim + $PqSubDim) AS sv
      |  FROM n, (SELECT unnest(range(0, $PqM)) AS m) r),
      |pcent0 AS (SELECT m, vec_id AS cent_id, sv AS cv FROM sub WHERE vec_id < $PqK)""".stripMargin)
    for (t <- 1 to PqIters) {
      val prev = s"pcent${t - 1}"
      val cur = s"pcent$t"
      sb.append(s"""
        |, ${cur}_assign AS (
        |  SELECT s.vec_id, s.m, s.sv, c.cent_id,
        |    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
        |      $d2 ASC, c.cent_id) AS r
        |  FROM sub s JOIN $prev c ON s.m = c.m),
        |${cur}_comp AS (
        |  SELECT m, cent_id, unnest(range(1, len(sv)+1)) AS pos, unnest(sv) AS x
        |  FROM ${cur}_assign WHERE r = 1),
        |$cur AS (
        |  SELECT m, cent_id, list(mm ORDER BY pos) AS cv FROM (
        |    SELECT m, cent_id, pos,
        |      CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mm
        |    FROM ${cur}_comp GROUP BY m, cent_id, pos)
        |  GROUP BY m, cent_id)""".stripMargin)
    }
    sb.append(s"""
      |, scored AS (
      |  SELECT s.vec_id, s.m, c.cent_id, $d2 AS d2
      |  FROM sub s JOIN pcent$PqIters c ON s.m = c.m),
      |codes AS (
      |  SELECT vec_id, m, cent_id AS code FROM (
      |    SELECT vec_id, m, cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, cent_id) AS r
      |    FROM scored) WHERE r = 1),
      |dt AS (
      |  SELECT vec_id AS query_id, m AS qm, cent_id,
      |    CAST(floor(d2 * 1e12) AS BIGINT) AS units
      |  FROM scored WHERE vec_id < 10),
      |adist AS (
      |  SELECT query_id, codes.vec_id AS neighbor_id, SUM(units) AS u
      |  FROM codes JOIN dt ON codes.m = dt.qm AND codes.code = dt.cent_id
      |  WHERE codes.vec_id <> query_id
      |  GROUP BY query_id, codes.vec_id)""".stripMargin)
    sb.toString
  }

  private def annPqSqlFinal: String = annPqCtes +
    """
    |SELECT query_id, neighbor_id,
    |  CAST(u AS DOUBLE) / 1e12 AS adist, CAST(rank AS INT) AS rank FROM (
    |  SELECT *, ROW_NUMBER() OVER (
    |    PARTITION BY query_id ORDER BY u, neighbor_id) AS rank
    |  FROM adist)
    |WHERE rank <= 3
    |ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------------
  // ann_ivfpq_topk — IVFADC (Jégou et al., TPAMI 2011 §IV): the two
  // index structures composed the way a production ANN index actually
  // ships. The coarse quantizer (the SAME memoized IVF centroids as
  // ann_ivf_topk — one training per corpus build serves every index
  // variant) restricts the search to nprobe=2 cells; product
  // quantization then compresses what's INSIDE each cell — but trained
  // on RESIDUALS (v − centroid(cell)), not raw vectors, because after
  // coarse assignment the residual energy is what's left to encode and
  // a codebook over residuals spends its 8 codewords on a much tighter
  // distribution (the paper's central point). Search: the probe
  // computes its own residual PER PROBED CELL, builds the M×k ADC
  // table from that residual, and each candidate costs M int64 table
  // lookups. Distances ride as floor(d2·1e12) units summed exactly
  // (the float-determinism ladder, rung 2), so the M-way fold is
  // order-independent and the oracle can replay coarse training,
  // residuals, codebook training, encode, and ADC bit-for-bit.
  //
  // 100 TB: corpus memory is N·(cell id + M codes) ≈ N·5 bytes vs
  // N·512 raw — the difference between an index that fits executor
  // memory and one that doesn't; scan cost is O(Q·nprobe·N/C) lookups
  // with no vector math per candidate. Probes 10–19 (disjoint from
  // ann_ivf_topk's 0–9) keep the two gates' answers independent.
  private val IvfPqProbeLo = 10
  private val IvfPqProbeHi = 20

  /** Corpus coarse assignment + residuals (vec_id, cell, rv). */
  private def ivfResiduals(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = trainedCentroids(spark, dir)
    val scored = e.crossJoin(broadcast(
        cent.select(col("cent_id"), col("cv").as("qv"), col("cn"))))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
    val corpus = scored.groupBy(col("vec_id"))
      .agg(
        max_by(col("cent_id"), struct(col("ccos"), (-col("cent_id")).as("nc")))
          .as("cell"),
        first(col("v")).as("v"))
    corpus.join(broadcast(cent.select(col("cent_id"), col("cv"))),
        col("cell") === col("cent_id"))
      .select(col("vec_id"), col("cell"),
        expr("zip_with(v, cv, (a, b) -> a - b)").as("rv"))
  }

  /** Cut a residual frame into M subvectors, carrying `idCols`. */
  private def residSub(r: DataFrame, idCols: String*): DataFrame = r
    .select(idCols.map(col) :+ explode(expr(
      s"transform(sequence(0, ${PqM - 1}), m -> " +
        s"struct(m AS m, slice(rv, m * $PqSubDim + 1, $PqSubDim) AS sv))"))
      .as("p"): _*)
    .select(idCols.map(col) :+ col("p.m").as("m") :+ col("p.sv").as("sv"): _*)

  /** Residual codebooks (m, cent_id, cv) — the PQ Lloyd loop of
    * [[trainedCodebooks]] but over coarse-assignment residuals, as
    * IVFADC requires. Sidecar-persisted per corpus fingerprint like
    * every trained index component. */
  private val ivfPqMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  private def trainedResidualCodebooks(spark: SparkSession, dir: String)
      : DataFrame =
    graft.T.readCached(spark, ivfPqMemo.computeIfAbsent((spark, dir), _ => {
      val fp = graft.ops.IncrementalDedup
        .sourceFingerprint(spark, s"$dir/embeddings.parquet")
      val tag = (s"ivfpq_cent_${IvfK}x${IvfIters}_" +
        s"${PqM}x${PqK}x${PqIters}_${dir}_$fp")
        .replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"${sys.props("java.io.tmpdir")}/graft-ivf/$tag"
      val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(success)) graft.ops.BuildLedger.timed(tag) {
        val sub = residSub(ivfResiduals(spark, dir), "vec_id")
        var cent = sub.filter(col("vec_id") < PqK)
          .select(col("m"), col("vec_id").as("cent_id"), col("sv").as("cv"))
        for (_ <- 1 to PqIters) {
          val assigned = sub.join(broadcast(cent), "m")
            .withColumn("d2", expr(pqD2))
            .groupBy(col("vec_id"), col("m"))
            .agg(
              min_by(col("cent_id"), struct(col("d2"), col("cent_id")))
                .as("cent_id"),
              first(col("sv")).as("sv"))
          val comp = assigned
            .selectExpr("m", "cent_id", "posexplode(sv) AS (pos, x)")
            .groupBy(col("m"), col("cent_id"), col("pos"))
            .agg((sum(col("x").cast(DecimalType(28, 12))).cast("double") /
              count(lit(1))).as("mm"))
          cent = comp.groupBy(col("m"), col("cent_id"))
            .agg(expr(
              "transform(sort_array(collect_list(struct(pos, mm))), s -> s.mm)")
              .as("cv"))
        }
        cent.write.mode("overwrite").parquet(path)
      }
      path
    }))

  private def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = trainedCentroids(spark, dir)
    val rcent = trainedResidualCodebooks(spark, dir)
    // encode: every corpus vector → (cell, M codes) — the stored index
    val codes = residSub(ivfResiduals(spark, dir), "vec_id", "cell")
      .join(broadcast(rcent), "m")
      .withColumn("d2", expr(pqD2))
      .groupBy(col("vec_id"), col("m"))
      .agg(
        min_by(col("cent_id"), struct(col("d2"), col("cent_id"))).as("code"),
        min(col("cell")).as("cell"))
    // probes: nprobe=2 nearest cells, then a residual PER PROBED CELL
    val probeScored = e
      .filter(col("vec_id") >= IvfPqProbeLo && col("vec_id") < IvfPqProbeHi)
      .crossJoin(broadcast(
        cent.select(col("cent_id"), col("cv").as("qv"), col("cn"))))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
    val wA = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id"))
    val qres = probeScored.withColumn("crank", row_number().over(wA))
      .filter(col("crank") <= 2)
      .select(col("vec_id").as("query_id"), col("cent_id").as("qcell"),
        expr("zip_with(v, qv, (a, b) -> a - b)").as("rv"))
    // ADC tables: Q·nprobe·M·k quantized distances, broadcast
    val dt = residSub(qres, "query_id", "qcell")
      .join(broadcast(rcent), "m")
      .withColumn("d2", expr(pqD2))
      .select(col("query_id"), col("qcell"), col("m").as("qm"),
        col("cent_id").as("qcode"),
        floor(col("d2") * lit(PqUnit)).cast("long").as("units"))
    val adist = codes.join(broadcast(dt),
        col("cell") === col("qcell") && col("m") === col("qm") &&
          col("code") === col("qcode") && col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(min(col("cell")).as("cell"), sum(col("units")).as("u"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("u"), col("vec_id"))
    adist.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cell"),
        (col("u").cast("double") / lit(PqUnit)).as("adist"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVFADC replayed end-to-end: coarse Lloyd training (shared CTEs),
    * assignment, residuals, the residual-codebook Lloyd loop, encode,
    * per-(probe, cell) ADC tables, exact int64 fold. */
  private def annIvfPqSql: String = {
    val dot = (a: String, b: String) =>
      s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i] * $b[i]), (a, b) -> a + b)"
    val d2 = s"${dot("sv", "sv")} + ${dot("cv", "cv")} - 2 * ${dot("sv", "cv")}"
    val dotVC = dot("v", "cv")
    val sb = new StringBuilder
    sb.append(normCte)
    sb.append(ivfTrainingCtes(IvfK.toString, IvfIters))
    sb.append(s"""
      |, scoredc AS (
      |  SELECT n.vec_id, n.v, n.nrm, cent_id,
      |    $dotVC / (nrm * cn) AS ccos
      |  FROM n, cent),
      |assignedc AS (
      |  SELECT vec_id, v, cent_id AS cell,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
      |  FROM scoredc),
      |resid AS (
      |  SELECT vec_id, cell,
      |    list_transform(range(1, len(v)+1), i -> v[i] - cv[i]) AS rv
      |  FROM assignedc JOIN cent ON cell = cent_id
      |  WHERE crank = 1),
      |rsub AS (
      |  SELECT vec_id, cell, r.m AS m,
      |    list_slice(rv, r.m * $PqSubDim + 1, r.m * $PqSubDim + $PqSubDim) AS sv
      |  FROM resid, (SELECT unnest(range(0, $PqM)) AS m) r),
      |rcent0 AS (SELECT m, vec_id AS cent_id, sv AS cv FROM rsub WHERE vec_id < $PqK)""".stripMargin)
    for (t <- 1 to PqIters) {
      val prev = s"rcent${t - 1}"
      val cur = s"rcent$t"
      sb.append(s"""
        |, ${cur}_assign AS (
        |  SELECT s.vec_id, s.m, s.sv, c.cent_id,
        |    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
        |      $d2 ASC, c.cent_id) AS r
        |  FROM rsub s JOIN $prev c ON s.m = c.m),
        |${cur}_comp AS (
        |  SELECT m, cent_id, unnest(range(1, len(sv)+1)) AS pos, unnest(sv) AS x
        |  FROM ${cur}_assign WHERE r = 1),
        |$cur AS (
        |  SELECT m, cent_id, list(mm ORDER BY pos) AS cv FROM (
        |    SELECT m, cent_id, pos,
        |      CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mm
        |    FROM ${cur}_comp GROUP BY m, cent_id, pos)
        |  GROUP BY m, cent_id)""".stripMargin)
    }
    sb.append(s"""
      |, rscored AS (
      |  SELECT s.vec_id, s.cell, s.m, c.cent_id, $d2 AS d2
      |  FROM rsub s JOIN rcent$PqIters c ON s.m = c.m),
      |codes AS (
      |  SELECT vec_id, cell, m, cent_id AS code FROM (
      |    SELECT vec_id, cell, m, cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, cent_id) AS r
      |    FROM rscored) WHERE r = 1),
      |qres AS (
      |  SELECT vec_id AS query_id, cell AS qcell,
      |    list_transform(range(1, len(v)+1), i -> v[i] - cv[i]) AS rv
      |  FROM assignedc JOIN cent ON cell = cent_id
      |  WHERE crank <= 2 AND vec_id >= $IvfPqProbeLo AND vec_id < $IvfPqProbeHi),
      |qsub AS (
      |  SELECT query_id, qcell, r.m AS m,
      |    list_slice(rv, r.m * $PqSubDim + 1, r.m * $PqSubDim + $PqSubDim) AS sv
      |  FROM qres, (SELECT unnest(range(0, $PqM)) AS m) r),
      |dt AS (
      |  SELECT query_id, qcell, s.m AS qm, c.cent_id AS qcode,
      |    CAST(floor(($d2) * 1e12) AS BIGINT) AS units
      |  FROM qsub s JOIN rcent$PqIters c ON s.m = c.m),
      |adist AS (
      |  SELECT query_id, codes.vec_id AS neighbor_id, MIN(codes.cell) AS cell,
      |    SUM(units) AS u
      |  FROM codes JOIN dt ON codes.cell = dt.qcell AND codes.m = dt.qm
      |    AND codes.code = dt.qcode
      |  WHERE codes.vec_id <> query_id
      |  GROUP BY query_id, codes.vec_id)
      |SELECT query_id, neighbor_id, cell,
      |  CAST(u AS DOUBLE) / 1e12 AS adist, CAST(rank AS INT) AS rank FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY query_id ORDER BY u, neighbor_id) AS rank
      |  FROM adist)
      |WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin)
    sb.toString
  }

  // -------------------------------------------------------------------
  // emb_label_stats — per-label stats. Row-order-independent avg: each
  // norm is snapped to a 12-dp decimal (deterministic per row), summed
  // exactly, divided as double.
  private def labelStats(spark: SparkSession, dir: String): DataFrame =
    vecs(spark, dir)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"),
        (sum(col("nrm").cast(DecimalType(28, 12))).cast("double") / count(lit(1)))
          .as("avg_norm"))
      .orderBy(col("label"))

  private val labelStatsSql = normCte +
    """
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
      |  CAST(SUM(CAST(nrm AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS avg_norm
      |FROM n GROUP BY label ORDER BY label""".stripMargin

  // -------------------------------------------------------------------
  // emb_neardup_pairs — embedding-cosine near-duplicate mining: all pairs
  // above threshold, exact.
  //
  // Plan shape (the round-1 scale-killer fix): a block-partitioned pair
  // join — the Okcan & Riedewald SIGMOD'11 theta-join partitioning — not
  // a whole-corpus broadcast BNLJ. Vectors land in B blocks by key hash;
  // a row in block p is shipped to the B-p block-pair cells (p,q), q>=p,
  // on the left and the p+1 cells (i,p), i<=p, on the right, and the join
  // is an EQUI-join on the (kx,ky) cell id. Every unordered pair meets in
  // exactly one cell (the lower-block row arrives on the left); diagonal
  // cells dedup with id order. Memory per task is 2N/B rows — bounded by
  // choosing B ~ N / rowsPerTask — shuffle volume is N*(B+1)/2 rows per
  // side, and the quadratic compare work is spread evenly over B(B+1)/2
  // cells instead of concentrated behind one driver-sized broadcast.
  //
  // Why not LSH candidate generation here: this query's threshold is
  // cosine >= 0.45 ⇒ angle up to 63.3°, where a random hyperplane agrees
  // on a pair with probability only 1-θ/π ≈ 0.65 per bit. Reaching the
  // recall an EXACT oracle demands (miss probability ~0 across every
  // qualifying pair) needs so many OR'd hash tables that the candidate
  // volume exceeds the N²/2 exact comparisons — LSH prunes nothing at
  // low thresholds; it only pays off in the true near-dup regime
  // (cos >= ~0.8, agreement >= 0.8/bit), which is what ann_lsh_topk
  // above implements. Exact low-threshold all-pairs is inherently
  // Θ(N²) compare work; the scale contract is bounded memory + even
  // distribution, which the block join delivers.
  private val NearDupBlocks = 8
  private def nearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val B = NearDupBlocks
    val l = e.select(col("vec_id").as("id_l"), col("v").as("qv"),
        col("nrm").as("qn"))
      .withColumn("kx", pmod(col("id_l"), lit(B)))
      .withColumn("ky", explode(sequence(col("kx"), lit(B - 1))))
    val r = e.select(col("vec_id").as("id_r"), col("v"), col("nrm"))
      .withColumn("ky", pmod(col("id_r"), lit(B)))
      .withColumn("kx", explode(sequence(lit(0), col("ky"))))
    l.join(r, Seq("kx", "ky"))
      // diagonal cells see both orientations of a same-block pair; keep one
      .filter(col("kx") < col("ky") || col("id_l") < col("id_r"))
      .withColumn("cosine", expr(dotVQ) / (col("nrm") * col("qn")))
      .filter(col("cosine") >= 0.45)
      .select(least(col("id_l"), col("id_r")).as("vec_a"),
        greatest(col("id_l"), col("id_r")).as("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  private val nearDupSql = normCte +
    """
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  list_reduce(list_transform(range(1, len(a.v)+1), i -> b.v[i] * a.v[i]), (x, y) -> x + y)
      |    / (b.nrm * a.nrm) AS cosine
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_reduce(list_transform(range(1, len(a.v)+1), i -> b.v[i] * a.v[i]), (x, y) -> x + y)
      |    / (b.nrm * a.nrm) >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin

  // -------------------------------------------------------------------
  // dedup_semantic — cluster-representative selection (semantic dedup /
  // coreset extraction): assign every embedding to its nearest TRAINED
  // k-means cell (same memoized quantizer as ann_ivf_topk — train once
  // per corpus, serve every downstream query), then keep one
  // representative per cell: the member closest to the centroid (ties
  // to lowest vec_id). This is the cheap end of the semantic-dedup
  // spectrum — O(N·C) map-side assignment after a centroid broadcast,
  // one partial-aggregated reduction per cell, no pairwise compares at
  // all — the right first pass before any within-cluster pair mining
  // at 100 TB. Output: per-cell survivor manifest with member counts.
  private def dedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = trainedCentroids(spark, dir)
      .select(col("cent_id"), col("cv").as("qv"), col("cn"))
    val scored = e.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
    // nearest cell per vector: map-side max_by partial aggregate (no
    // window shuffle over the N·C scored rows)
    val assigned = scored.groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id"), col("ccos")),
        struct(col("ccos"), (-col("cent_id")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.cent_id").as("cell"),
        col("best.ccos").as("ccos"))
    // manifest carries ids and counts only — NOT the centroid cosine:
    // rep_cos would expose a double that exists on the Spark side only
    // via the trained cv (whose components pass through a double→decimal
    // cast that Spark performs on the shortest-string form and DuckDB on
    // the exact binary expansion — last-ulp divergence), while the
    // argmax itself is insensitive to last-ulp noise
    assigned.groupBy(col("cell"))
      .agg(
        max_by(col("vec_id"), struct(col("ccos"), (-col("vec_id")).as("nv")))
          .as("rep_id"),
        count(lit(1)).as("n_members"))
      .orderBy(col("cell"))
  }

  private val dedupSemanticSql = normCte + ivfTrainingCtes(IvfK.toString, IvfIters) +
    """
      |, scored AS (
      |  SELECT n.vec_id, cent_id,
      |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * cv[i]), (a, b) -> a + b)
      |      / (nrm * cn) AS ccos
      |  FROM n, cent),
      |assigned AS (
      |  SELECT vec_id, cent_id AS cell, ccos,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
      |  FROM scored),
      |cells AS (SELECT vec_id, cell, ccos FROM assigned WHERE crank = 1),
      |reps AS (
      |  SELECT cell, vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY ccos DESC, vec_id) AS r
      |  FROM cells),
      |counts AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members FROM cells GROUP BY cell)
      |SELECT counts.cell AS cell, reps.vec_id AS rep_id, n_members
      |FROM counts JOIN reps ON counts.cell = reps.cell AND reps.r = 1
      |ORDER BY cell""".stripMargin

  // -------------------------------------------------------------------
  // emb_quantize_int8 — per-vector scalar quantization audit: snap each
  // component to the 256-cell grid spanned by the vector's own
  // [min, max] (the int8 storage format — 4× smaller than float32, 8×
  // smaller than float64), reconstruct at cell midpoints, and report
  // per-label mean/max absolute reconstruction error. The per-element
  // work is an EXPLODE into codegen'd scalar projections + two
  // partial-aggregated reductions — the suite's no-interpreted-HOF
  // discipline (an aggregate(transform(...)) lambda fold here would pay
  // the 10-25× interpreter tax on every component of every vector, the
  // exact trap NOTES.md names). Error accounting is INTEGER-exact:
  // each |x-recon| is floor-quantized to 1e-12 units (pure IEEE
  // multiply + floor — identical on both engines, unlike a
  // double→decimal cast, which Spark performs on the shortest-string
  // form and DuckDB on the exact binary expansion — last-ulp
  // divergence), summed as int64, and surfaced through one final
  // double division chain; dim is 64 (constant) so the per-vector
  // mean divides by a constant.
  private def quantizeInt8(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val el = e
      .withColumn("lo", array_min(col("v")))
      .withColumn("scale", (array_max(col("v")) - array_min(col("v"))) / lit(255.0))
      .select(col("vec_id"), col("label"), col("lo"), col("scale"),
        explode(col("v")).as("x"))
    val err = el
      .withColumn("code",
        when(col("scale") === 0.0, lit(0.0))
          .otherwise(floor((col("x") - col("lo")) / col("scale"))))
      .withColumn("recon", col("lo") + (col("code") + lit(0.5)) * col("scale"))
      .withColumn("units", floor(abs(col("x") - col("recon")) * lit(1e12)))
    val perVec = err.groupBy(col("vec_id"), col("label"))
      .agg(sum(col("units")).as("vec_units"))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("vec_units")).cast("double") / count(lit(1)) / lit(64.0) /
          lit(1e12)).as("avg_abs_err"),
        (max(col("vec_units")).cast("double") / lit(64.0) / lit(1e12))
          .as("max_vec_err"))
      .orderBy(col("label"))
  }

  private val quantizeInt8Sql = normCte +
    """
      |, b AS (
      |  SELECT vec_id, label, list_min(v) AS lo,
      |    (list_max(v) - list_min(v)) / 255.0 AS scale, v
      |  FROM e),
      |el AS (SELECT vec_id, label, lo, scale, unnest(v) AS x FROM b),
      |err AS (
      |  SELECT vec_id, label,
      |    CAST(floor(abs(x - (lo + ((CASE WHEN scale = 0 THEN 0 ELSE floor((x - lo) / scale) END) + 0.5) * scale)) * 1e12) AS BIGINT) AS units
      |  FROM el),
      |pv AS (
      |  SELECT vec_id, label, CAST(SUM(units) AS BIGINT) AS vec_units
      |  FROM err GROUP BY vec_id, label)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  CAST(SUM(vec_units) AS DOUBLE) / COUNT(*) / 64.0 / 1e12 AS avg_abs_err,
      |  CAST(MAX(vec_units) AS DOUBLE) / 64.0 / 1e12 AS max_vec_err
      |FROM pv GROUP BY label ORDER BY label""".stripMargin

  // -------------------------------------------------------------------
  // emb_dim_stats — per-DIMENSION moment statistics over the corpus:
  // the calibration pass every quantization scheme runs first (int8
  // scale factors come from per-dim ranges/moments; dimension collapse
  // shows up as near-zero variance). posexplode fans each vector into
  // (dim, x) pairs — shuffle keyed on 16 dims, partial-aggregated
  // map-side, so the wire carries 16 rows per task regardless of
  // corpus size.
  //
  // Cross-engine float discipline (NOTES ladder, rung 2): x and x·x are
  // IEEE-identical on both engines (float→double cast is exact; one
  // multiply is correctly rounded), so floor-quantizing to int64 units
  // (1e6 for x, 1e9 for x²) gives identical integers whose SUM is
  // exact and order-independent; the final divisions and 6dp rounds
  // land identically.
  private def dimStats(spark: SparkSession, dir: String): DataFrame = {
    vecs(spark, dir)
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("dim"),
        expr("CAST(floor(x * 1e6) AS BIGINT)").as("ux"),
        expr("CAST(floor(x * x * 1e9) AS BIGINT)").as("qx"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("ux")).as("su"), sum(col("qx")).as("sq"))
      // m spelled once, squared by explicit multiply: pow(x, 2) is not
      // guaranteed ULP-identical across libms, x*x is
      .withColumn("m",
        col("su").cast("double") / (col("n").cast("double") * lit(1e6)))
      .select(col("dim"), col("n"),
        round(col("m"), 6).as("mean"),
        round(col("sq").cast("double") / (col("n").cast("double") * lit(1e9)) -
          col("m") * col("m"), 6).as("variance"))
      .orderBy(col("dim"))
  }

  private val dimStatsSql = normCte +
    """
      |, d AS (
      |  SELECT CAST(i - 1 AS INT) AS dim,
      |    CAST(floor(v[i] * 1e6) AS BIGINT) AS ux,
      |    CAST(floor(v[i] * v[i] * 1e9) AS BIGINT) AS qx
      |  FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r)
      |, g AS (
      |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(ux) AS DOUBLE) AS su, CAST(SUM(qx) AS DOUBLE) AS sq
      |  FROM d GROUP BY dim),
      |m AS (SELECT dim, n, su / (n * 1e6) AS m, sq FROM g)
      |SELECT dim, n, ROUND(m, 6) AS mean,
      |  ROUND(sq / (n * 1e9) - m * m, 6) AS variance
      |FROM m ORDER BY dim""".stripMargin

  // -------------------------------------------------------------------
  // emb_cluster_profile — population + fit quality per trained k-means
  // cell: the topic-balance diagnostic a curation pipeline reads before
  // sampling (an empty or bloated cell means the quantizer — and any
  // IVF serving on it — is miscalibrated for the corpus mix). Reuses
  // the SAME memoized trained centroids as ann_ivf_topk (train once,
  // profile/serve forever); assignment is the same broadcast N×C dot
  // pass, folded map-side. Mean fit rides int64-quantized cosines
  // (order-independent sum, ONE division sequence both engines); the
  // worst fit stays an exact integer. Oracle replays the Lloyd loop
  // CTE-by-CTE and re-derives identical cells.
  private def embClusterProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = trainedCentroids(spark, dir)
      .select(col("cent_id"), col("cv").as("qv"), col("cn"))
    val scored = e.crossJoin(broadcast(cent))
      .withColumn("ccos", expr(dotVQ) / (col("nrm") * col("cn")))
    val assigned = scored.groupBy(col("vec_id"))
      .agg(
        max_by(col("cent_id"), struct(col("ccos"), (-col("cent_id")).as("nc")))
          .as("cell"),
        max(col("ccos")).as("ccos"))
    // fit metrics round to 6dp: vec-to-CENTROID cosines can differ at
    // the ulp level across engines (the decimal-cast rounding inside the
    // k-means component means is engine-local half-case behavior — cell
    // ASSIGNMENTS are robust to it, raw cosine bits are not, caught at
    // sf0.1), so the profile reports at a grain 6 orders above the noise
    assigned
      .withColumn("units", floor(col("ccos") * lit(1e12)).cast("long"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("units")).cast("double") / count(lit(1)).cast("double") /
          lit(1e12), 6).as("mean_cos"),
        round(min(col("units")).cast("double") / lit(1e12), 6).as("min_cos"))
      .orderBy(col("cell"))
  }

  // max(ccos) is the best cell's cosine (ties share the value), so the
  // profile is well-defined under the same tie-break as the assignment
  private val embClusterProfileSql =
    normCte + ivfTrainingCtes(IvfK.toString, IvfIters) +
      s"""
      |, scored AS (
      |  SELECT n.vec_id, cent_id,
      |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * cv[i]), (a, b) -> a + b)
      |      / (nrm * cn) AS ccos
      |  FROM n, cent),
      |assigned AS (
      |  SELECT vec_id, cent_id AS cell, ccos,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crank
      |  FROM scored),
      |u AS (
      |  SELECT cell, CAST(floor(ccos * 1e12) AS BIGINT) AS units
      |  FROM assigned WHERE crank = 1)
      |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
      |  ROUND(CAST(SUM(units) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e12, 6) AS mean_cos,
      |  ROUND(CAST(MIN(units) AS DOUBLE) / 1e12, 6) AS min_cos
      |FROM u GROUP BY cell ORDER BY cell""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("emb_cluster_profile", embClusterProfile, Some(embClusterProfileSql)),
    QueryDef("emb_dim_stats", dimStats, Some(dimStatsSql)),
    QueryDef("ann_cosine_topk", annTopk, Some(annTopkSql)),
    QueryDef("ann_lsh_topk", annLsh, Some(annLshSql)),
    QueryDef("ann_ivf_topk", annIvf, Some(annIvfSql)),
    QueryDef("ann_recall_ivf", annRecallIvf, Some(annRecallIvfSql)),
    QueryDef("ann_ivf_sampled", annIvfSampled, Some(annIvfSampledSql)),
    QueryDef("ann_ivf_bucketed", annIvfBucketed, Some(annIvfBucketedSql)),
    QueryDef("ann_ivf_incremental", annIvfIncremental,
      Some(annIvfIncrementalSql)),
    QueryDef("ann_pq_topk", annPq, Some(annPqSqlFinal)),
    QueryDef("ann_recall_pq", annRecallPq, Some(annRecallPqSql)),
    QueryDef("ann_ivfpq_topk", annIvfPq,
      Some(graft.sql.DuckCte.materialized(annIvfPqSql))),
    QueryDef("ann_knn_join", annKnnJoin, Some(annKnnJoinSql)),
    QueryDef("dedup_semantic_knn", dedupSemanticKnn,
      Some(graft.sql.DuckCte.materialized(dedupSemanticKnnSql))),
    QueryDef("dedup_semantic_incremental", dedupSemanticIncremental,
      Some(graft.sql.DuckCte.materialized(dedupSemanticIncrementalSql))),
    QueryDef("emb_label_stats", labelStats, Some(labelStatsSql)),
    QueryDef("emb_neardup_pairs", nearDup, Some(nearDupSql),
      ceiling = Some(("embeddings", 20000L,
        "exact all-pairs cosine is Theta(N^2) BY CONTRACT (measured " +
          "9-15x/decade); linear-regime replacement: dedup_semantic_knn"))),
    QueryDef("dedup_semantic", dedupSemantic, Some(dedupSemanticSql)),
    QueryDef("emb_quantize_int8", quantizeInt8, Some(quantizeInt8Sql))
  )
}
