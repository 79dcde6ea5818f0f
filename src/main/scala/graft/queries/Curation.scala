package graft.queries

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation composites — the end-to-end shapes an LLM
  * data pipeline runs nightly, each built from the engine's primitives
  * and each with a scale story that survives 100 TB:
  *
  *  - '''decontamination''' — remove training docs that share n-grams
  *    with an evaluation set. The eval side is tiny relative to the
  *    corpus (benchmarks are KBs, corpora are TBs), so its distinct
  *    gram set BROADCASTS and the corpus-side probe is a map-side hash
  *    semi-join: zero shuffle of the 100 TB side.
  *  - '''shard packing''' — assign docs to fixed-token-budget training
  *    shards by running token count. Packing is per-source (PARTITION BY
  *    source), so the window sort parallelizes across sources instead of
  *    serializing the corpus through one global ordering.
  *  - '''domain mixing''' — downsample each source to a target token
  *    budget with a deterministic per-doc hash draw: join-free (the
  *    per-source totals ride a window over the same shuffle), retry-safe
  *    (re-running selects identical docs), and exact on both engines
  *    (pure integer multiplicative hash — no float RNG).
  *  - '''the curation funnel''' — dedup → quality gates → language
  *    allowlist → per-(source, lang) accounting: one linear plan, every
  *    stage a codegen'd projection/aggregate over one corpus scan.
  */
object Curation {

  /** tokens + 3-gram shingle set, same derivation as TextOps (split on
    * single space; codegen'd word_shingles3). */
  private def shingled(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    T.documents(spark, dir)
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingle_set", array_distinct(expr("word_shingles3(tokens)")))
  }

  private val shingleCte =
    """WITH sh AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_transform(range(1, len(tokens)-1),
      |      i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS s3
      |  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS tokens FROM documents)
      |  WHERE len(tokens) >= 3
      |)""".stripMargin

  // -------------------------------------------------------------------
  // curate_decontaminate — eval-overlap removal: docs sharing any
  // 3-shingle with the held-out set (doc_id ≡ 0 mod 13 plays the
  // benchmark suite). Inverted-index shape: explode corpus shingles,
  // equi-join the BROADCAST eval-gram set, count hits per doc. The
  // corpus side never shuffles; contaminated volume is bounded by
  // gram collisions, not N².
  private def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
    val evalGrams = sh.filter(col("doc_id") % 13 === 0)
      .select(explode(col("shingle_set")).as("g")).distinct()
    sh.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), explode(col("shingle_set")).as("g"))
      .join(broadcast(evalGrams), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  private val decontaminateSql = shingleCte +
    """
      |, ev AS (SELECT DISTINCT unnest(s3) AS g FROM sh WHERE doc_id % 13 = 0)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM (SELECT doc_id, unnest(s3) AS g FROM sh WHERE doc_id % 13 <> 0) t
      |JOIN ev USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // curate_decontaminate_exact — EXACT-SUBSTRING decontamination (the
  // GPT-3/Pile discipline): a verbatim eval quote of L tokens appears as
  // L−2 CONSECUTIVE matched 3-gram positions, so the longest run of
  // matched positions + 2 = the longest exact token overlap. The gram
  // filter above answers "shares anything?" — one incidental collision
  // and a 50-token verbatim quote look identical. This detector measures
  // the overlap and flags only runs ≥ 8 tokens, separating real
  // contamination from gram noise (CurationSpec plants both).
  //
  // Scale shape: posexplode is executor-side, candidate volume is
  // bounded by eval-gram collisions (the eval set rides a broadcast,
  // corpus never shuffles for the join), and the run detection is the
  // islands window — one shuffle on doc_id over MATCHED positions only,
  // not the corpus. Suffix-array overlap without building one.
  /** Core detector, reusable over any (doc_id, shingles) frame: longest
    * consecutive-position run of grams ∈ evalGrams, per doc, as token
    * length (run + 2). evalGrams must be distinct single-column "g". */
  private[graft] def exactOverlapRuns(corpus: DataFrame,
      evalGrams: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    corpus
      .select(col("doc_id"), posexplode(col("shingles")).as(Seq("pos", "g")))
      .join(broadcast(evalGrams), "g")
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg((count(lit(1)) + 2).as("overlap_tokens"))
      .groupBy(col("doc_id"))
      .agg(max(col("overlap_tokens")).cast("long").as("max_overlap_tokens"))
  }

  private def decontaminateExact(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    val docs = T.documents(spark, dir)
      .withColumn("tokens", split(col("text"), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shingles", expr("word_shingles3(tokens)"))
    val evalGrams = docs.filter(col("doc_id") % 13 === 0)
      .select(explode(col("shingles")).as("g")).distinct()
    exactOverlapRuns(docs.filter(col("doc_id") % 13 =!= 0), evalGrams)
      .filter(col("max_overlap_tokens") >= 8)
      .orderBy(col("doc_id"))
  }

  // Position bases differ (Spark posexplode 0-based, DuckDB range
  // 1-based) — irrelevant: islands are DELTAS of consecutive positions.
  private val decontaminateExactSql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
      |s AS (
      |  SELECT doc_id, r.i AS pos,
      |    tokens[r.i] || ' ' || tokens[r.i+1] || ' ' || tokens[r.i+2] AS g
      |  FROM t, LATERAL (SELECT unnest(range(1, len(tokens) - 1)) AS i) r
      |  WHERE len(tokens) >= 3),
      |ev AS (SELECT DISTINCT g FROM s WHERE doc_id % 13 = 0),
      |h AS (
      |  SELECT doc_id, pos,
      |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM s JOIN ev USING (g) WHERE doc_id % 13 <> 0),
      |runs AS (
      |  SELECT doc_id, island, COUNT(*) + 2 AS overlap_tokens
      |  FROM h GROUP BY doc_id, island)
      |SELECT doc_id, CAST(MAX(overlap_tokens) AS BIGINT) AS max_overlap_tokens
      |FROM runs GROUP BY doc_id HAVING MAX(overlap_tokens) >= 8
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // curate_shard_pack — sequential greedy packing into 2000-token
  // shards, independently per source: shard = which budget window the
  // doc's FIRST token lands in (floor of the exclusive running sum).
  // Per-source windows keep the sort width bounded by the largest
  // source, not the corpus; the output is the shard manifest a trainer
  // would mmap.
  private def shardPack(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("shard_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / lit(2000)))
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
      .orderBy(col("source"), col("shard_id"))
  }

  private val shardPackSql =
    """WITH t AS (
      |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents),
      |p AS (
      |  SELECT source, n_tokens,
      |    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - n_tokens) / 2000) AS BIGINT) AS shard_id
      |  FROM t)
      |SELECT source, shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
      |FROM p GROUP BY source, shard_id ORDER BY source, shard_id""".stripMargin

  // -------------------------------------------------------------------
  // curate_domain_mix — cap every source at a 500-token budget:
  // keep-fraction f_s = min(1, 500 / source_tokens), draw u(doc) from a
  // multiplicative integer hash (Knuth 2654435761 mod 1000003 — exact
  // int64 on both engines, no float RNG), keep u/1000003 < f_s. Both
  // factors are reduced mod 1000003 BEFORE multiplying (427799 =
  // 2654435761 mod 1000003), so the product stays < 2^39 for any int64
  // doc_id — the naive doc_id*2654435761 spelling overflows past
  // doc_id ≈ 3.5e9, where Spark (non-ANSI) wraps silently while DuckDB
  // raises; same residue by modular arithmetic where both are defined.
  // The per-source total rides a window over the grouping shuffle — no
  // second join against an aggregate.
  private def domainMix(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val bySource = Window.partitionBy(col("source"))
    T.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("src_tokens", sum(col("n_tokens")).over(bySource))
      .withColumn("f", least(lit(1.0), lit(500.0) / col("src_tokens")))
      .withColumn("u", ((col("doc_id") % lit(1000003L)) * lit(427799L)) % lit(1000003L))
      .filter(col("u").cast("double") / lit(1000003.0) < col("f"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tokens_kept"))
      .orderBy(col("source"))
  }

  private val domainMixSql =
    """WITH t AS (
      |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
      |  FROM documents),
      |s AS (
      |  SELECT source, doc_id, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source) AS src_tokens
      |  FROM t)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
      |FROM s
      |WHERE CAST(((doc_id % 1000003) * 427799) % 1000003 AS DOUBLE) / 1000003.0
      |      < LEAST(1.0, 500.0 / src_tokens)
      |GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // curate_corpus — the funnel: exact dedup (md5 keep-first) → quality
  // gates (length + type-token ratio) → language allowlist → per-cell
  // accounting with funnel-stage counts. One scan, one dedup shuffle,
  // one aggregate; every predicate is a codegen'd projection.
  private def corpusFunnel(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val w = Window.partitionBy(col("chash")).orderBy(col("doc_id"))
    T.documents(spark, dir)
      .withColumn("chash", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1) // exact dedup, deterministic keep-first
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("n_tokens", size(col("tokens")))
      .withColumn("ttr",
        size(array_distinct(col("tokens"))).cast("double") / col("n_tokens"))
      .filter(col("n_tokens").between(25, 90) && col("ttr") >= 0.35)
      .filter(col("lang").isin("en", "es", "de", "fr"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("source"), col("lang"))
  }

  private val corpusFunnelSql =
    """WITH d AS (
      |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents),
      |q AS (
      |  SELECT source, lang,
      |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS ttr
      |  FROM d WHERE rn = 1)
      |SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      |FROM q
      |WHERE n_tokens BETWEEN 25 AND 90 AND ttr >= 0.35
      |  AND lang IN ('en', 'es', 'de', 'fr')
      |GROUP BY source, lang ORDER BY source, lang""".stripMargin

  // -------------------------------------------------------------------
  // curate_sample_stratified — per-language deterministic sampling at
  // DIFFERENT rates (the corpus rebalancing move: oversample scarce
  // languages, downsample dominant ones). The per-doc draw is the
  // suite's content-addressed idiom (first md5 hex byte of doc_id,
  // uniform over 256 cells); each language's keep threshold is a
  // 2-hex-digit bound carried by a broadcast rates dim, so the corpus
  // scan stays map-side: one broadcast hash join, no shuffle, no
  // rand() — task retries and cluster size can't change membership,
  // and re-runs on a grown corpus keep history's sample intact.
  // Languages absent from the dim are dropped (inner join allowlist).
  private def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    import spark.implicits._
    // keep rates: en 192/256, de 128/256, fr 64/256, es 32/256
    val rates = Seq(("en", "c0"), ("de", "80"), ("fr", "40"), ("es", "20"))
      .toDF("lang", "thr")
    T.documents(spark, dir)
      .join(broadcast(rates), "lang")
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < col("thr"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  private val sampleStratifiedSql =
    """SELECT doc_id, lang, source FROM documents
      |WHERE lang IN ('en', 'de', 'fr', 'es')
      |  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |      CASE lang WHEN 'en' THEN 'c0' WHEN 'de' THEN '80'
      |                WHEN 'fr' THEN '40' WHEN 'es' THEN '20' END
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // scan_partition_pruned — the corpus mirrored ONCE into a
  // lang-partitioned directory layout (ops.PartitionedLayout,
  // fingerprint-memoized), then a language-selective aggregate that
  // prunes at PLANNING time: the excluded languages' directories
  // contribute zero read bytes — `PartitionFilters:` on the scan node,
  // pinned by PlanSpec. At 100 TB this is the first-line scan
  // optimization: "English + French only" reads |match| bytes, not the
  // corpus.
  private def partitionPruned(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val path = graft.ops.PartitionedLayout.ensure(spark, dir, "documents", "lang")
    graft.T.readCached(spark, path)
      .filter(col("lang").isin("en", "fr"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"), col("source"))
  }

  private val partitionPrunedSql =
    """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |WHERE lang IN ('en', 'fr')
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // -------------------------------------------------------------------
  // curate_pipeline_e2e — the whole curation DAG as ONE dataset-card
  // funnel: language gate → quality gate → exact dedup → near-dup dedup
  // → decontamination, each stage a PER-DOC boolean computed globally
  // (clusters and hash groups over the full corpus — the production
  // shape: dedup indexes are built once, filters compose by
  // conjunction), and the output is the funnel every dataset card
  // reports: docs and chars surviving each prefix of the pipeline.
  // Every stage reuses an already-gated operator's exact logic (stored
  // lang labels; text_quality's integer token folds; md5 exact groups;
  // dedup_clusters' simhash-CC survivors, absent docs trivially
  // surviving; curate_decontaminate's eval-gram hit set with the
  // held-out 1/13 removed from the corpus) — so the composite's oracle
  // is the same proven CTEs composed, and a pass here means the STAGES
  // AGREE end-to-end, not just individually. Scale shape: conjunction
  // of map-side flags + the stages' own bounded joins; the funnel
  // aggregate is 6 rows.
  private def pipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    val toks = T.documents(spark, dir)
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("n_tokens", size(col("tokens")))
      .withColumn("n_unique", size(array_distinct(col("tokens"))))
      .withColumn("sum_len",
        expr("aggregate(transform(tokens, x -> length(x)), 0, (a, b) -> a + b)"))
    val wExact = Window.partitionBy(col("h"))
    // quality: minimum length, bounded mean token length, and a
    // repetition gate (type-token ratio ≥ 1/3) — all integer-exact
    val base = toks.select(col("doc_id"), col("n_chars"),
        col("lang").isin("en", "fr", "de", "es").as("c_lang"),
        (col("n_tokens") >= 5 &&
          col("sum_len") < col("n_tokens") * 12 &&
          col("n_unique") * 3 >= col("n_tokens")).as("c_quality"),
        md5(col("text")).as("h"))
      .withColumn("c_exact", min(col("doc_id")).over(wExact) === col("doc_id"))
    val nd = TextOps.dedupClusters(spark, dir)
      .select(col("doc_id"), (col("is_survivor") === 1).as("surv"))
    val sh = shingled(spark, dir)
    val evalGrams = sh.filter(col("doc_id") % 13 === 0)
      .select(explode(col("shingle_set")).as("g")).distinct()
    val contaminated = sh.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), explode(col("shingle_set")).as("g"))
      .join(broadcast(evalGrams), "g")
      .select(col("doc_id")).distinct().withColumn("hit", lit(true))
    val flags = base
      .join(nd, Seq("doc_id"), "left")
      .withColumn("c_neardup", coalesce(col("surv"), lit(true)))
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("c_decontam",
        col("doc_id") % 13 =!= 0 && col("hit").isNull)
    flags.select(col("n_chars"), explode(array(
        struct(lit("0_input").as("stage"), lit(true).as("pass")),
        struct(lit("1_lang").as("stage"), col("c_lang").as("pass")),
        struct(lit("2_quality").as("stage"),
          (col("c_lang") && col("c_quality")).as("pass")),
        struct(lit("3_exact_dedup").as("stage"),
          (col("c_lang") && col("c_quality") && col("c_exact")).as("pass")),
        struct(lit("4_near_dedup").as("stage"),
          (col("c_lang") && col("c_quality") && col("c_exact") &&
            col("c_neardup")).as("pass")),
        struct(lit("5_decontam").as("stage"),
          (col("c_lang") && col("c_quality") && col("c_exact") &&
            col("c_neardup") && col("c_decontam")).as("pass"))
      )).as("s"))
      .filter(col("s.pass"))
      .groupBy(col("s.stage").as("stage"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"))
      .orderBy(col("stage"))
  }

  // Oracle: the proven per-stage CTEs composed under one WITH RECURSIVE
  // (shingleCte defines `sh`; TextOps.nearDupCcCte defines t/h/s/b/bb/
  // pairs/edges/reach — disjoint names, prefix-stripped to merge the
  // two WITH headers).
  private val pipelineE2eSql =
    "WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") + ",\n" +
      TextOps.nearDupCcCte.stripPrefix("WITH RECURSIVE") + ",\n" +
      """q AS (
        |  SELECT doc_id, n_chars,
        |    lang IN ('en','fr','de','es') AS c_lang,
        |    len(tokens) >= 5 AND
        |      list_reduce(list_transform(tokens, x -> length(x)), (a,b) -> a+b)
        |        < len(tokens) * 12 AND
        |      len(list_distinct(tokens)) * 3 >= len(tokens) AS c_quality,
        |    md5(text) AS hsh
        |  FROM (SELECT doc_id, n_chars, lang, text,
        |          string_split(text, ' ') AS tokens FROM documents)),
        |x AS (
        |  SELECT doc_id, n_chars, c_lang, c_quality,
        |    MIN(doc_id) OVER (PARTITION BY hsh) = doc_id AS c_exact
        |  FROM q),
        |nd AS (
        |  SELECT src AS doc_id, src = MIN(dst) AS surv
        |  FROM reach GROUP BY src),
        |ev AS (SELECT DISTINCT unnest(s3) AS g FROM sh WHERE doc_id % 13 = 0),
        |cont AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, unnest(s3) AS g FROM sh WHERE doc_id % 13 <> 0) c
        |  JOIN ev USING (g)),
        |f AS (
        |  SELECT x.doc_id, x.n_chars, x.c_lang, x.c_quality, x.c_exact,
        |    COALESCE(nd.surv, TRUE) AS c_neardup,
        |    (x.doc_id % 13 <> 0 AND cont.doc_id IS NULL) AS c_decontam
        |  FROM x LEFT JOIN nd USING (doc_id) LEFT JOIN cont USING (doc_id))
        |SELECT '0_input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total FROM f
        |UNION ALL SELECT '1_lang', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(n_chars) AS BIGINT) FROM f WHERE c_lang
        |UNION ALL SELECT '2_quality', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(n_chars) AS BIGINT) FROM f WHERE c_lang AND c_quality
        |UNION ALL SELECT '3_exact_dedup', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(n_chars) AS BIGINT) FROM f
        |  WHERE c_lang AND c_quality AND c_exact
        |UNION ALL SELECT '4_near_dedup', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(n_chars) AS BIGINT) FROM f
        |  WHERE c_lang AND c_quality AND c_exact AND c_neardup
        |UNION ALL SELECT '5_decontam', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(n_chars) AS BIGINT) FROM f
        |  WHERE c_lang AND c_quality AND c_exact AND c_neardup AND c_decontam
        |ORDER BY stage""".stripMargin

  // -------------------------------------------------------------------
  // scan_dpp_join — DYNAMIC partition pruning: the partition values to
  // keep are not in the query text (scan_partition_pruned's static
  // case) but come out of a JOIN — lineitem mirrored once partitioned
  // by ship month, joined to the months a filtered orders window
  // produces. Spark plants a dynamicpruning#N subquery into the fact
  // scan's PartitionFilters and reuses the dim side's broadcast to
  // evaluate it, so only the joined months' directories are read —
  // pinned by NewQueryPlanSpec. At 100 TB this is the star-join scan
  // contract: the fact table prunes on the DIM's predicate ("urgent
  // quarter", "audited sources") without anyone materializing the
  // partition list by hand.
  private def dppJoin(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val factPath = graft.ops.PartitionedLayout.ensureDerived(
      spark, s"$dir/lineitem.parquet", s"lineitem_month_$dir", "ship_month")(
      T.lineitem(spark, dir).withColumn("ship_month",
        date_format(col("l_shipdate"), "yyyy-MM")))
    val fact = graft.T.readCached(spark, factPath)
    val dim = T.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1995-04-01")))
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
      .distinct()
    fact.join(dim, Seq("ship_month"))
      .groupBy(col("ship_month"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
      .orderBy(col("ship_month"))
  }

  private val dppJoinSql =
    """WITH dim AS (
      |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate < TIMESTAMP '1995-04-01'),
      |fact AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, l_quantity
      |  FROM lineitem)
      |SELECT f.ship_month, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM fact f JOIN dim d ON f.ship_month = d.ship_month
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // curate_split_hash — reproducible train/val/test partition by
  // content-addressed draw: the first md5 byte of the doc id routes
  // each document to train (<0xcc ≈ 80%), val (<0xe6 ≈ 10%) or test —
  // deterministic (re-runs and backfills land every doc in the same
  // split, no rand()), disjoint and complete BY CONSTRUCTION (the three
  // ranges tile [00,ff]), stable under corpus growth (a new doc's split
  // never depends on other docs). Shuffle-free: the split label is a
  // map-side projection; only the per-split audit aggregate shuffles
  // 3 groups. The audit emits per-split doc/char counts — the numbers a
  // dataset card reports.
  private def splitHash(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val draw = substring(md5(col("doc_id").cast("string")), 1, 2)
    T.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        when(draw < "cc", "train").when(draw < "e6", "val")
          .otherwise("test").as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("split"))
  }

  private val splitHashSql =
    """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |            ELSE 'test' END AS split,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY split ORDER BY split""".stripMargin

  // -------------------------------------------------------------------
  // curate_split_leakfree — train/val/test split that is CLOSED OVER
  // NEAR-DUPLICATES: a per-document hash draw (curate_split_hash) leaks
  // evaluation signal whenever two near-identical docs straddle the
  // boundary — train memorizes the test doc's twin. The fix is to draw
  // per CLUSTER: connected components over the simhash near-dup edge
  // set (the same edges dedup_clusters resolves) give each doc its
  // cluster representative (singletons are their own rep), and the
  // md5 draw routes the REP, so a whole near-dup cluster lands in one
  // split by construction. Still deterministic, disjoint, complete, and
  // stable under corpus growth — a new doc can only join a cluster and
  // inherit its (unchanged) rep's draw. The leak audit is computed
  // HONESTLY, not assumed: near-dup pairs are joined against the
  // assignment and cross-split pairs counted — the gate proves 0 in
  // both engines. At 100 TB the marginal cost over the doc-level split
  // is the CC pass dedup already pays; the draw stays a map-side
  // projection.
  private def splitLeakfree(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    // the pairs are a fingerprint-memoized disk mirror (built by
    // whichever of this / dedup_clusters runs first) — both uses below
    // re-read a tiny parquet, no in-memory persist to leak across the
    // rest of a suite run
    val pairs = TextOps.nearDupPairs(spark, dir)
    val cc = graft.ops.Graph.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("label"))
    val asg = T.documents(spark, dir).select(col("doc_id"), col("n_chars"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("label"), col("doc_id")).as("cluster_rep"))
      .withColumn("split", {
        val draw = substring(md5(col("cluster_rep").cast("string")), 1, 2)
        when(draw < "cc", "train").when(draw < "e6", "val").otherwise("test")
      })
    val perSplit = asg.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_rep")).as("n_clusters"),
        sum(col("n_chars")).as("total_chars"))
    val leaks = pairs
      .join(asg.select(col("doc_id").as("doc_a"), col("split").as("split_a")),
        Seq("doc_a"))
      .join(asg.select(col("doc_id").as("doc_b"), col("split").as("split_b")),
        Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .groupBy(col("split_a").as("split"))
      .agg(count(lit(1)).as("leaked"))
    perSplit.join(leaks, Seq("split"), "left")
      .select(col("split"), col("n_docs"), col("n_clusters"),
        col("total_chars"),
        coalesce(col("leaked"), lit(0L)).as("leaked_pairs"))
      .orderBy(col("split"))
  }

  private val splitLeakfreeSql = TextOps.nearDupCcCte + """,
      |ccrep AS (SELECT src AS doc_id, MIN(dst) AS cluster_rep
      |          FROM reach GROUP BY src),
      |asg AS (
      |  SELECT d.doc_id, d.n_chars,
      |    COALESCE(c.cluster_rep, d.doc_id) AS cluster_rep,
      |    CASE WHEN substr(md5(CAST(COALESCE(c.cluster_rep, d.doc_id) AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
      |         WHEN substr(md5(CAST(COALESCE(c.cluster_rep, d.doc_id) AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents d LEFT JOIN ccrep c ON d.doc_id = c.doc_id),
      |agg AS (
      |  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(COUNT(DISTINCT cluster_rep) AS BIGINT) AS n_clusters,
      |    CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |  FROM asg GROUP BY split),
      |leaks AS (
      |  SELECT a.split AS split, CAST(COUNT(*) AS BIGINT) AS leaked
      |  FROM pairs p
      |  JOIN asg a ON p.doc_a = a.doc_id
      |  JOIN asg b2 ON p.doc_b = b2.doc_id
      |  WHERE a.split <> b2.split
      |  GROUP BY a.split)
      |SELECT g.split, g.n_docs, g.n_clusters, g.total_chars,
      |  CAST(COALESCE(l.leaked, 0) AS BIGINT) AS leaked_pairs
      |FROM agg g LEFT JOIN leaks l ON g.split = l.split
      |ORDER BY g.split""".stripMargin

  // -------------------------------------------------------------------
  // curate_length_buckets — padding-efficiency audit for batched
  // inference/training: docs bucketed by power-of-two length class
  // (the standard length-bucketing serving trick), and per bucket the
  // padding waste a naive pad-to-bucket-max batch would pay. The bucket
  // ceiling (smallest power of two >= n) is computed as
  // 1 << bitlen(n-1) — PURE INTEGER arithmetic via the binary-string
  // length, because ceil(log2(x)) through doubles can land on either
  // side of an exact power of two depending on the engine's ln (a
  // 1-ULP wobble that ceil amplifies into a 2x bucket error).
  // n_chars <= 1 is special-cased to bucket 1 (matching
  // profile_key_skew): bitlen(0) would give bucket 2 for n=1, and
  // bin(-1) for n=0 is 64 ones, whose shiftleft(1, 64) wraps to 1 in
  // Spark but evaluates as 1<<64 in DuckDB — an empty document would
  // break the oracle without the guard.
  private def lengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    T.documents(spark, dir)
      .select(col("n_chars"),
        when(col("n_chars") <= 1, lit(1L))
          .otherwise(expr("shiftleft(1L, length(bin(n_chars - 1)))"))
          .as("bucket_cap"))
      .groupBy(col("bucket_cap"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("payload_chars"),
        (sum(col("bucket_cap")) - sum(col("n_chars"))).as("padding_chars"))
      .orderBy(col("bucket_cap"))
  }

  private val lengthBucketsSql =
    """WITH b AS (
      |  SELECT n_chars,
      |    CASE WHEN n_chars <= 1 THEN CAST(1 AS BIGINT)
      |         ELSE CAST(1 << length(bin(n_chars - 1)) AS BIGINT) END AS bucket_cap
      |  FROM documents)
      |SELECT bucket_cap, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS payload_chars,
      |  CAST(SUM(bucket_cap) - SUM(n_chars) AS BIGINT) AS padding_chars
      |FROM b GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin

  // -------------------------------------------------------------------
  // curate_sample_weighted — probability-proportional-to-size (PPS)
  // SYSTEMATIC sampling: ~50 docs drawn with probability proportional to
  // n_chars, the draw a curation pipeline uses when "sample 1% of the
  // corpus" must mean 1% of the TOKENS, not 1% of the documents (doc
  // length varies 100×; uniform doc sampling under-represents long
  // docs' content). Classic survey-sampling PPS: lay all docs on the
  // cumulative-weight line in doc_id order, drop a grid of equally
  // spaced points (step = total div k), select every doc whose weight
  // interval contains a grid point. INTEGER-EXACT end to end — the
  // cumulative line, the step, and the containment test are all int64
  // arithmetic, so the oracle replays it with no float-draw to disagree
  // on (contrast hash-draw Bernoulli sampling in doc_sample_hash, which
  // is uniform per doc, not per char).
  //
  // Scale: the cumulative line is ops.PrefixSums — range-partition +
  // two-pass offsets, O(#partitions) driver state — NOT the
  // single-partition global window `SUM OVER (ORDER BY doc_id)` the
  // oracle spells (same spec/impl split as ids_dense_assign).
  private val PpsK = 50L

  private def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val d = T.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val withCum = graft.ops.PrefixSums.cumsum(d, "doc_id", "n_chars", "cum")
    val tot = withCum.agg(max(col("cum")).as("tot"))
    withCum.crossJoin(broadcast(tot))
      .withColumn("step", expr(s"tot div $PpsK"))
      // the doc's interval (cum - n_chars, cum] contains a grid point
      // iff the multiple-of-step count increases across it
      .filter(expr("cum div step > (cum - n_chars) div step"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val sampleWeightedSql =
    s"""WITH c AS (
      |  SELECT doc_id, lang, n_chars,
      |    SUM(n_chars) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM documents),
      |t AS (SELECT MAX(cum) AS tot FROM c)
      |SELECT doc_id, lang, n_chars
      |FROM c, t
      |WHERE cum // (tot // $PpsK) > (cum - n_chars) // (tot // $PpsK)
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // curate_shuffle_epoch — DETERMINISTIC global shuffle: every epoch a
  // training pipeline needs the corpus in a fresh pseudo-random order
  // that is (a) reproducible for restarts/debugging, (b) different per
  // epoch, (c) assigned WITHOUT a single-partition ROW_NUMBER window.
  // The draw is md5(epoch_salt ‖ doc_id) — a new permutation per salt,
  // the same permutation for the same salt forever — and the dense
  // 0-based shuffle position comes from the [[graft.ops.DenseIds]]
  // two-pass offset scheme over the draw order (range partition +
  // zipWithIndex, O(#partitions) driver state). The oracle spells the
  // specification (`ROW_NUMBER() OVER (ORDER BY draw)`), pinning the
  // scalable impl to the window semantics exactly like ids_dense_assign.
  private val ShuffleEpoch = "epoch1"

  private def shuffleEpoch(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val d = T.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        md5(concat(lit(s"$ShuffleEpoch:"), col("doc_id").cast("string")))
          .as("draw"))
    graft.ops.DenseIds.assign(d, "draw", "shuffle_pos")
      .select(col("shuffle_pos"), col("doc_id"), col("lang"))
      .orderBy(col("shuffle_pos"))
  }

  private val shuffleEpochSql =
    s"""SELECT
      |  CAST(ROW_NUMBER() OVER (
      |    ORDER BY md5('$ShuffleEpoch:' || CAST(doc_id AS VARCHAR))) - 1
      |    AS BIGINT) AS shuffle_pos,
      |  doc_id, lang
      |FROM documents
      |ORDER BY shuffle_pos""".stripMargin

  // -------------------------------------------------------------------
  // curate_token_budget — fill a global token budget (40% of the corpus)
  // with the highest-quality documents. The naive spelling is a single
  // global sort by quality + a corpus-wide running sum — one partition
  // owning 100 TB. The scalable shape is threshold selection over a
  // quality HISTOGRAM (the two-pass top-mass idiom): (1) quantize the
  // quality score (type-token ratio) onto a fixed 1001-cell grid and
  // aggregate token mass per cell — the histogram is bounded metadata,
  // its cumulative sweep is a window over ≤1001 rows; (2) every bucket
  // strictly inside the budget is kept whole with no per-doc ordering at
  // all, and only the single BOUNDARY bucket pays a doc-level running
  // sum — partitioned by bucket, so even that window never sees the
  // corpus through one ordering. All selection arithmetic is int64
  // (token counts, `div`), the only float op is the ttr division +
  // floor-quantize both engines execute identically (determinism
  // ladder rung 2). Greedy fill is strict: a doc is kept iff it fits
  // entirely (run ≤ rem), so the budget is never exceeded.
  private def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val d = T.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("qb",
        floor(size(array_distinct(col("toks"))).cast("double")
          / size(col("toks")) * 1000).cast("int"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("qb"))
    // Histogram sweep: ≤1001 rows, best-quality-first cumulative mass —
    // ONE partition BY DECLARATION (explicit constant key), bounded by
    // construction, so WindowExec's single-partition warning stays out
    // of the driver's bench tail
    // (column-derived constant key pmod(coalesce(qb,0), 1) ≡ 0: a lit(0)
    // or a non-nullable qb*0 is folded out of the partition spec by the
    // optimizer and the warning fires anyway; the coalesce keeps a
    // null-keyed row — pmod(null,1) is null — from landing in its own
    // partition and silently leaving the global aggregate)
    val oneQb = pmod(coalesce(col("qb").cast("long"), lit(0L)), lit(1L))
    val wDesc = Window.partitionBy(oneQb)
      .orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(oneQb).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val buckets = d.groupBy(col("qb")).agg(sum(col("n_tokens")).as("bmass"))
      .withColumn("cum", sum(col("bmass")).over(wDesc))
      .withColumn("total", sum(col("bmass")).over(wAll))
      .withColumn("budget", expr("(total * 2) div 5"))
      .withColumn("prev_cum", col("cum") - col("bmass"))
      .withColumn("status",
        when(col("cum") <= col("budget"), lit("full"))
          .when(col("prev_cum") < col("budget"), lit("part"))
          .otherwise(lit("drop")))
      .withColumn("rem", col("budget") - col("prev_cum"))
      .select(col("qb"), col("status"), col("rem"))
    // Doc pass: full buckets keep everything (no window effect); only
    // the boundary bucket's partition exercises the running sum.
    val wb = Window.partitionBy(col("qb")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(buckets.filter(col("status") =!= "drop")), Seq("qb"))
      .withColumn("run", sum(col("n_tokens")).over(wb))
      .filter(col("status") === "full" || col("run") <= col("rem"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tokens_kept"))
      .orderBy(col("source"))
  }

  private val tokenBudgetSql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(FLOOR(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) * 1000) AS INT) AS qb
      |  FROM documents),
      |b AS (SELECT qb, CAST(SUM(n_tokens) AS BIGINT) AS bmass FROM d GROUP BY qb),
      |c AS (
      |  SELECT qb, bmass,
      |    CAST(SUM(bmass) OVER (ORDER BY qb DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(SUM(bmass) OVER () AS BIGINT) AS total
      |  FROM b),
      |cls AS (
      |  SELECT qb,
      |    CASE WHEN cum <= (total * 2) // 5 THEN 'full'
      |         WHEN cum - bmass < (total * 2) // 5 THEN 'part'
      |         ELSE 'drop' END AS status,
      |    ((total * 2) // 5) - (cum - bmass) AS rem
      |  FROM c),
      |k AS (
      |  SELECT d.source, d.n_tokens, cls.status, cls.rem,
      |    SUM(d.n_tokens) OVER (PARTITION BY d.qb ORDER BY d.doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM d JOIN cls ON d.qb = cls.qb
      |  WHERE cls.status <> 'drop')
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
      |FROM k WHERE status = 'full' OR run <= rem
      |GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------------
  // curate_mix_temperature — temperature-scaled domain mixing (the
  // multilingual-LLM sampling law: p_s ∝ m_s^(1/T), here T = 2 so the
  // exponent is a SQUARE ROOT — deliberately, because IEEE-754 sqrt is
  // correctly rounded in every conforming engine while pow() is libm-
  // dependent; the determinism ladder picks the exponent you can prove).
  // Per-source mass m_s aggregates once; weights are sqrt(m_s) floor-
  // quantized to int64 micros, so shares, ppm, and per-source token
  // targets are all integer ratios (`div`) — bit-exact cross-engine.
  // The total budget (Σ m_s) is then REdistributed at temperature:
  // oversampled tails get target > mass (rate > 1, kept whole),
  // dominant sources get squeezed. Docs are drawn by the same
  // multiplicative-hash residue as curate_domain_mix (different
  // multiplier — the draws must be independent across operators), with
  // the keep test cross-multiplied to stay integer: u·m_s <
  // target·1000003. Aggregates-over-sources windows see |sources| rows.
  // Overflow GUARD (ADVICE r8): budget·sq < 2^63 holds through ~sf50
  // corpus mass (2.5e8 tokens · 1.6e10 micros ≈ 4e18) and u·m_s /
  // target·1000003 through ~9e12 tokens — past either bound non-ANSI
  // Spark would wrap silently while DuckDB raises. The per-source
  // assert_true below turns that divergence into a clean failure at
  // |sources| cost (the divide-before-multiply rewrite is the fix if a
  // real corpus ever trips it).
  private def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val d = T.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
    // one partition BY DECLARATION over the |sources|-row aggregate —
    // pmod(coalesce(c,0),1) ≡ 0 keeps the constant key out of the
    // optimizer's folding so WindowExec's single-partition warning stays
    // quiet, and never-null so a null key can't fork its own partition
    val wAll = Window.partitionBy(
      pmod(coalesce(col("src_tokens"), lit(0L)), lit(1L)))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lmax = lit(Long.MaxValue)
    val srcs = d.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("sq",
        floor(sqrt(col("src_tokens").cast("double")) * 1e6).cast("long"))
      .withColumn("w_total", sum(col("sq")).over(wAll))
      .withColumn("budget", sum(col("src_tokens")).over(wAll))
      // fail loudly (not wrap) if any int64 cross-product would overflow
      .filter(assert_true(
        col("budget") <= lmax / greatest(col("sq"), lit(1L)) &&
          col("budget") <= lmax / lit(1000003L),
        lit("curate_mix_temperature: token mass exceeds the int64 " +
          "cross-multiplication bound (~sf50) — apply the " +
          "divide-before-multiply rewrite")).isNull)
      .withColumn("target_tokens", expr("(budget * sq) div w_total"))
      .withColumn("w_ppm", expr("(sq * 1000000) div w_total"))
    val kept = d.join(broadcast(srcs), Seq("source"))
      .withColumn("u",
        ((col("doc_id") % lit(1000003L)) * lit(610639L)) % lit(1000003L))
      .filter(col("u") * col("src_tokens")
        < col("target_tokens") * lit(1000003L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("tokens_kept"))
    srcs.join(kept, Seq("source"), "left")
      .select(col("source"), col("src_tokens"), col("w_ppm"),
        col("target_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      .orderBy(col("source"))
  }

  private val mixTemperatureSql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |s AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
      |      FROM d GROUP BY source),
      |w AS (
      |  SELECT source, src_tokens,
      |    CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS sq,
      |    CAST(SUM(CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE)) * 1000000.0)
      |      AS BIGINT)) OVER () AS BIGINT) AS w_total,
      |    CAST(SUM(src_tokens) OVER () AS BIGINT) AS budget
      |  FROM s),
      |t AS (
      |  SELECT source, src_tokens, sq, w_total, budget,
      |    (budget * sq) // w_total AS target_tokens,
      |    (sq * 1000000) // w_total AS w_ppm
      |  FROM w),
      |k AS (
      |  SELECT d.source, COUNT(*) AS n_kept, SUM(d.n_tokens) AS tokens_kept
      |  FROM d JOIN t ON d.source = t.source
      |  WHERE (((d.doc_id % 1000003) * 610639) % 1000003) * t.src_tokens
      |        < t.target_tokens * 1000003
      |  GROUP BY d.source)
      |SELECT t.source, t.src_tokens, t.w_ppm, t.target_tokens,
      |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
      |FROM t LEFT JOIN k ON t.source = k.source
      |ORDER BY t.source""".stripMargin

  // -------------------------------------------------------------------
  // curate_dsir_resample — Data Selection via Importance Resampling
  // (Xie et al., NeurIPS'23) over hashed-bigram bag-of-ngrams models:
  // score every doc by how much more likely its bigrams are under a
  // TARGET distribution (here the lang='en' slice stands in for the
  // curated target) than under the raw corpus, then resample toward the
  // target with Gumbel-perturbed top-k. The whole feature space is
  // hashed into 1024 buckets, so both "models" are 1024-row aggregates:
  //   - bucket log-ratio weights lw[b] = ln p_t(b) − ln p_r(b) with
  //     add-one smoothing, floor-quantized to int64 millionths (the
  //     lm_score float discipline: ln's ULP wobble sits ~1e-10 from a
  //     quantization edge; everything downstream is exact int64 sums,
  //     partition-order independent);
  //   - per-doc score = Σ lw[bucket(bigram)] over bigram OCCURRENCES —
  //     one broadcast join of the 1024-row weight table onto the
  //     exploded bigram stream, one hash re-aggregate to doc grain. The
  //     corpus never shuffles by anything but doc_id;
  //   - selection: Gumbel-top-25% per source — the noise is a
  //     1024-level QUANTIZED Gumbel read from an integer quantile
  //     table (VERDICT r9 #7): the doc_id multiplicative-hash residue
  //     (deterministic, retry-safe, independent of the other curation
  //     draws by multiplier choice) range-scales to a table index by
  //     integer division, and the key is score_mu + table[idx] — two
  //     integer ops, NO float anywhere in the selection key path. The
  //     table constants are floor(−ln(−ln((i+.5)/1024))·1e6) authored
  //     ONCE at query-build time and pasted verbatim into BOTH
  //     engines' query texts, so no per-row libm evaluation exists for
  //     a rounding wobble to flip: the old construction's whole
  //     boundary-distance proof obligation (GumbelBoundarySpec's
  //     full-domain scan, which certified this corpus's residues but
  //     not the construction) is gone by construction, on any corpus.
  //     The rank window partitions by source so no global ordering
  //     ever sees the corpus.
  // Output is the per-source resampling ledger (docs, kept, Σ kept
  // score) — integer-only, no cross-engine division semantics in play.
  /** The 1024-level Gumbel quantile table, int64 millionths: entry i =
    * floor(−ln(−ln((i+.5)/1024))·1e6). Computed once here and embedded
    * as LITERALS in both engines' query texts — the selection key path
    * is then pure integer arithmetic (GumbelTableSpec pins shape and
    * monotonicity). */
  private[graft] val GumbelQ: IndexedSeq[Long] = (0 until 1024).map(i =>
    math.floor(-math.log(-math.log((i + 0.5) / 1024.0)) * 1e6).toLong)

  private def dsirResample(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val d = T.documents(spark, dir)
      .withColumn("tokens", split(col("text"), " "))
      .select(col("doc_id"), col("source"), col("lang"), col("tokens"))
    val bi = d.filter(size(col("tokens")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(tokens) - 1), " +
          "i -> array_join(slice(tokens, i, 2), ' '))")).as("g"))
      .withColumn("b",
        expr("cast(conv(substring(md5(g), 1, 4), 16, 10) as bigint) % 1024"))
    val rawCnt = bi.groupBy(col("b")).agg(count(lit(1)).as("c_r"))
    val tgtCnt = bi.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("c_t"))
    val nr = bi.agg(count(lit(1)).as("n_r"))
    val nt = bi.filter(col("lang") === "en").agg(count(lit(1)).as("n_t"))
    val lw = rawCnt.join(tgtCnt, Seq("b"), "left")
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("b"),
        (floor(log((coalesce(col("c_t"), lit(0L)).cast("double") + lit(1.0))
            / (col("n_t").cast("double") + lit(1024.0))) * lit(1e6))
          - floor(log((col("c_r").cast("double") + lit(1.0))
            / (col("n_r").cast("double") + lit(1024.0))) * lit(1e6)))
          .cast("long").as("lw_mu"))
    val score = bi.join(broadcast(lw), "b")
      .groupBy(col("doc_id")).agg(sum(col("lw_mu")).as("score_mu"))
    val scored = d.select(col("doc_id"), col("source"))
      .join(score, Seq("doc_id"), "left")
      .withColumn("score_mu", coalesce(col("score_mu"), lit(0L)))
      .withColumn("u", ((col("doc_id") % lit(1000003L)) * lit(999983L)) % lit(1000003L))
      // integer-only noise: range-scale the residue onto the quantile
      // table (each index gets 976-977 of the 1000003 residues) and
      // look the value up in the embedded literal array
      .withColumn("gb", expr("(u * 1024) div 1000003"))
      .withColumn("gumbel_mu",
        element_at(typedLit(GumbelQ.toArray), (col("gb") + 1).cast("int")))
      .withColumn("key", col("score_mu") + col("gumbel_mu"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("key").desc, col("doc_id"))
    val cw = Window.partitionBy(col("source"))
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(cw))
      .withColumn("keep", (col("rn") <= expr("cnt div 4")).cast("int"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_kept"),
        sum(when(col("keep") === 1, col("score_mu")).otherwise(lit(0L)))
          .as("kept_score_mu"))
      .orderBy(col("source"))
  }

  private val dsirResampleSql = (
    """WITH d AS (
      |  SELECT doc_id, source, lang, string_split(text, ' ') AS toks
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substr(md5(g), 1, 4) AS BIGINT) % 1024 AS b
      |  FROM (SELECT doc_id, lang,
      |          unnest(list_transform(range(1, len(toks)),
      |            i -> array_to_string(toks[i:i+1], ' '))) AS g
      |        FROM d WHERE len(toks) >= 2)),
      |rc AS (SELECT b, COUNT(*) AS c_r FROM bi GROUP BY b),
      |tc AS (SELECT b, COUNT(*) AS c_t FROM bi WHERE lang = 'en' GROUP BY b),
      |nr AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_r FROM bi),
      |nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_t FROM bi WHERE lang = 'en'),
      |lw AS (
      |  SELECT rc.b,
      |    CAST(FLOOR(LN((COALESCE(tc.c_t, 0) + 1.0) / (nt.n_t + 1024.0)) * 1e6)
      |      - FLOOR(LN((rc.c_r + 1.0) / (nr.n_r + 1024.0)) * 1e6) AS BIGINT)
      |      AS lw_mu
      |  FROM rc LEFT JOIN tc ON rc.b = tc.b, nr, nt),
      |sc AS (
      |  SELECT bi.doc_id, SUM(lw.lw_mu) AS score_mu
      |  FROM bi JOIN lw ON bi.b = lw.b GROUP BY bi.doc_id),
      |kd AS (
      |  SELECT d.doc_id, d.source,
      |    COALESCE(sc.score_mu, 0) AS score_mu,
      |    COALESCE(sc.score_mu, 0)
      |      + list_extract(GQ_TABLE,
      |          CAST((((d.doc_id % 1000003) * 999983) % 1000003) * 1024
      |            // 1000003 AS BIGINT) + 1) AS key
      |  FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id),
      |rk AS (
      |  SELECT source, score_mu,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY key DESC, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY source) AS cnt
      |  FROM kd)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN rn <= cnt // 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rn <= cnt // 4 THEN score_mu ELSE 0 END) AS BIGINT)
      |    AS kept_score_mu
      |FROM rk GROUP BY source ORDER BY source""".stripMargin
    ).replace("GQ_TABLE", GumbelQ.mkString("[", ", ", "]"))

  // -------------------------------------------------------------------
  // curate_pack_sizeclass — HARMONIC-k bin packing of documents into
  // B=2048-token training windows (Lee & Lee JACM'85). curate_shard_pack
  // packs greedily with a per-source RUNNING SUM — correct, but every
  // source serializes through one window ordering. Harmonic packing is
  // the zero-coordination alternative: docs are classed by
  // c = B div len (class c ⟺ len ∈ (B/(c+1), B/c], so c docs of class c
  // provably fit a bin: c·(B div c) ≤ B), and bins per class are pure
  // arithmetic — ceil(n_c / c). NO window, NO running state, ONE
  // hash aggregate at (source, class) grain: at 100 TB every partition
  // packs independently and the plan is a scan + aggregate, with the
  // classic 1.691-competitive waste bound as the price of parallelism.
  // Docs longer than B get class 0 — each stands alone and reports its
  // OVERFLOW as negative waste (the truncation queue, not a packing
  // failure). All arithmetic int64 (`div`), bit-exact cross-engine.
  private def packSizeclass(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val B = 2048L
    val K = 8L
    T.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("size_class",
        when(col("n_tokens") > B, lit(0L))
          .otherwise(least(lit(K), expr(s"$B div n_tokens"))))
      .groupBy(col("source"), col("size_class"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
      .withColumn("n_bins",
        when(col("size_class") === 0L, col("n_docs"))
          .otherwise(expr("(n_docs + size_class - 1) div size_class")))
      .withColumn("waste_tokens", col("n_bins") * lit(B) - col("tokens"))
      .orderBy(col("source"), col("size_class"))
  }

  private val packSizeclassSql =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT source, n_tokens,
      |    CASE WHEN n_tokens > 2048 THEN 0
      |         ELSE LEAST(8, 2048 // n_tokens) END AS size_class
      |  FROM d),
      |g AS (
      |  SELECT source, size_class, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_tokens) AS BIGINT) AS tokens
      |  FROM c GROUP BY source, size_class)
      |SELECT source, size_class, n_docs, tokens,
      |  CASE WHEN size_class = 0 THEN n_docs
      |       ELSE (n_docs + size_class - 1) // size_class END AS n_bins,
      |  (CASE WHEN size_class = 0 THEN n_docs
      |        ELSE (n_docs + size_class - 1) // size_class END) * 2048 - tokens
      |    AS waste_tokens
      |FROM g ORDER BY source, size_class""".stripMargin

  // -------------------------------------------------------------------
  // curate_ccnet_buckets — CCNet's head/middle/tail quality terciles,
  // computed PER LANGUAGE (Wenzek et al., LREC'20): a quality score is
  // only comparable within its language, so each language ranks its own
  // docs and splits into thirds — the head bucket feeds training, the
  // tail is dropped, the middle is the retrain pool. Quality proxy =
  // the same floor-quantized type-token ratio the token-budget gate
  // uses. Tercile boundaries are INTEGER arithmetic on the rank —
  // bucket = ((rn−1)·3) div n with a doc_id tiebreak — so there is no
  // float threshold to disagree at and re-runs are bit-stable. The
  // window partitions by lang: each language ranks independently, no
  // global ordering; at 100 TB the per-language sort is the honest cost
  // of exact terciles (the approximate alternative is a per-language
  // quality histogram + threshold, the curate_token_budget idiom).
  private def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val d = T.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("qb",
        floor(size(array_distinct(col("toks"))).cast("double")
          / size(col("toks")) * 1000).cast("int"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("qb"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("qb").desc, col("doc_id"))
    val cw = Window.partitionBy(col("lang"))
    d.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
      .withColumn("bucket", expr("((rn - 1) * 3) div n"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"),
        min(col("qb")).as("qb_min"), max(col("qb")).as("qb_max"))
      .orderBy(col("lang"), col("bucket"))
  }

  private val ccnetBucketsSql =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(FLOOR(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) * 1000) AS INT) AS qb
      |  FROM documents),
      |r AS (
      |  SELECT lang, n_tokens, qb,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY qb DESC, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM d)
      |SELECT lang, ((rn - 1) * 3) // n AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS tokens,
      |  MIN(qb) AS qb_min, MAX(qb) AS qb_max
      |FROM r GROUP BY lang, ((rn - 1) * 3) // n
      |ORDER BY lang, bucket""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("curate_ccnet_buckets", ccnetBuckets, Some(ccnetBucketsSql)),
    QueryDef("curate_pack_sizeclass", packSizeclass, Some(packSizeclassSql)),
    QueryDef("curate_dsir_resample", dsirResample, Some(dsirResampleSql)),
    QueryDef("curate_token_budget", tokenBudget, Some(tokenBudgetSql)),
    QueryDef("curate_mix_temperature", mixTemperature, Some(mixTemperatureSql)),
    QueryDef("curate_shuffle_epoch", shuffleEpoch, Some(shuffleEpochSql)),
    QueryDef("curate_sample_weighted", sampleWeighted, Some(sampleWeightedSql)),
    QueryDef("curate_split_hash", splitHash, Some(splitHashSql)),
    QueryDef("curate_split_leakfree", splitLeakfree,
      Some(graft.sql.DuckCte.materialized(splitLeakfreeSql))),
    QueryDef("curate_length_buckets", lengthBuckets, Some(lengthBucketsSql)),
    QueryDef("scan_partition_pruned", partitionPruned, Some(partitionPrunedSql)),
    QueryDef("scan_dpp_join", dppJoin, Some(dppJoinSql)),
    QueryDef("curate_pipeline_e2e", pipelineE2e,
      Some(graft.sql.DuckCte.materialized(pipelineE2eSql))),
    QueryDef("curate_decontaminate", decontaminate, Some(decontaminateSql)),
    QueryDef("curate_decontaminate_exact", decontaminateExact,
      Some(decontaminateExactSql)),
    QueryDef("curate_shard_pack", shardPack, Some(shardPackSql)),
    QueryDef("curate_domain_mix", domainMix, Some(domainMixSql)),
    QueryDef("curate_corpus", corpusFunnel, Some(corpusFunnelSql)),
    QueryDef("curate_sample_stratified", sampleStratified, Some(sampleStratifiedSql)))
}
