package graft.queries

import graft.{Ctx, QueryDef, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval scoring over the documents/embeddings corpus (SURVEY §2b
  * B13/B12 extension): BM25 lexical ranking and reciprocal-rank-fusion
  * hybrid search — the lexical+vector serving stack a training-data
  * curation pipeline uses for decontamination lookups, targeted corpus
  * probes, and hard-negative mining.
  *
  * Cross-engine float discipline (the text_lm_score ladder, NOTES.md):
  * each (doc, term) BM25 contribution is computed in ONE expression with
  * identical operand order in both engines, floor-quantized to int64
  * millionths, and the per-doc fold sums int64 exactly — partition- and
  * merge-order-independent where a double sum would not be. Ranking
  * compares the int64 totals, never raw doubles. RRF goes further: the
  * fused score is pure integer arithmetic (1e9 div (60+rank)), so the
  * hybrid ranking has no float anywhere.
  *
  * 100 TB shape: corpus stats (avgdl, n_docs) enter the plan as broadcast
  * one-row aggregates — never driver-side counts; per-term df is a
  * vocabulary-sized aggregate; the scoring join is a hash shuffle on the
  * (tiny) matched-posting subset only, because the `term IN (...)` filter
  * prunes the exploded token stream map-side. The vector arm broadcasts
  * one probe against the corpus (a map-side scan), exactly like
  * ann_cosine_topk. Every global ranking derives from
  * `orderBy().limit(k)` (TakeOrderedAndProject — bounded heaps, O(k)
  * memory) with row_number applied to the k survivors only; no
  * corpus-sized single-partition window anywhere.
  */
object Retrieval {

  /** Global top-k WITH a rank column, without the corpus-sized
    * single-partition window `row_number() OVER (ORDER BY …)` plans to
    * (the exact shape WindowTopKRewrite refuses to capture because no
    * partition key bounds it): `orderBy(…).limit(k)` plans as
    * TakeOrderedAndProject — per-partition bounded heaps merged on the
    * driver, O(k) memory anywhere — and the row_number window then runs
    * over exactly k rows. Identical output to rank-then-filter under
    * the same (unique-tie-break) total order. */
  private def topKRanked(df: DataFrame, k: Int, rankCol: String,
      order: org.apache.spark.sql.Column*): DataFrame =
    // declared single partition over the k survivors: pmod(hash(c),1)
    // ≡ 0 is deterministic and attribute-dependent, so the optimizer
    // can't fold the constant key away and WindowExec's
    // single-partition warning stays out of the bench tail
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol, row_number().over(
        Window.partitionBy(pmod(hash(col(df.columns.head)).cast("long"),
          lit(1L))).orderBy(order: _*)))

  /** Fixed query term set: one rare high-idf term ("dup", df≈25/500 at
    * sf0.01) plus two common terms — exercises the idf spread. */
  private val QueryTerms = Seq("dup", "data", "window")
  private def termInList: String = QueryTerms.map(t => s"'$t'").mkString(", ")

  // BM25 with k1=1.2, b=0.75, Robertson-style idf = ln(1 + (N-df+0.5)/(df+0.5)).
  // The expression TEXT is kept byte-identical between the Spark plan and
  // the DuckDB oracle — same operands, same order, same IEEE results —
  // then floor-quantized to int64 millionths. (Spark's floor(double)
  // already yields LONG; the explicit CAST is a no-op there and the
  // conversion DuckDB needs.)
  private val Bm25UnitsExpr =
    "CAST(floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * " +
      "((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) * 1e6) AS BIGINT)"

  /** doc_id, u (int64 micro-BM25 total), n_terms — the shared lexical
    * scoring core of text_bm25 and search_hybrid_rrf. */
  private def bm25Units(spark: SparkSession, dir: String): DataFrame = {
    Ctx.prep(spark)
    val tok = T.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // corpus stats as a broadcast one-row aggregate, in-plan (no driver count)
    val stats = dl.agg(
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"),
      count(lit(1)).as("n_docs"))
    val tf = tok.filter(col("term").isin(QueryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df_), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("units", expr(Bm25UnitsExpr))
      .groupBy(col("doc_id"))
      .agg(sum(col("units")).as("u"), count(lit(1)).as("n_terms"))
  }

  private val bm25UnitsCte =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
       |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok2 GROUP BY doc_id),
       |stats AS (
       |  SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl),
       |tf AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM tok2 WHERE term IN ($termInList) GROUP BY doc_id, term),
       |tdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT doc_id, $Bm25UnitsExpr AS units
       |  FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
       |bm AS (
       |  SELECT doc_id, CAST(SUM(units) AS BIGINT) AS u,
       |    CAST(COUNT(*) AS BIGINT) AS n_terms
       |  FROM scored GROUP BY doc_id)""".stripMargin

  // -------------------------------------------------------------------
  // text_bm25 — top-20 documents for the fixed query under BM25.
  private def bm25(spark: SparkSession, dir: String): DataFrame = {
    topKRanked(bm25Units(spark, dir), 20, "rank",
      col("u").desc, col("doc_id"))
      .select(col("doc_id"), col("n_terms"),
        round(col("u").cast("double") / lit(1e6), 6).as("bm25"), col("rank"))
      .orderBy(col("rank"))
  }

  private val bm25Sql = bm25UnitsCte +
    """
      |SELECT doc_id, n_terms, ROUND(CAST(u AS DOUBLE) / 1e6, 6) AS bm25,
      |  CAST(rank AS INT) AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY u DESC, doc_id) AS rank FROM bm)
      |WHERE rank <= 20 ORDER BY rank""".stripMargin

  // -------------------------------------------------------------------
  // search_hybrid_rrf — reciprocal-rank fusion of the BM25 lexical arm
  // and a cosine vector arm (probe = embedding of vec_id 0, the corpus
  // doc_id↔vec_id alignment): rrf_units = Σ 1e9 div (60 + rank) over the
  // arms that retrieved the doc (k=60, Cormode-standard). Integer
  // throughout — rank fusion needs no floats.
  private def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val lex = topKRanked(bm25Units(spark, dir), 50, "r_lex",
      col("u").desc, col("doc_id"))
      .select(col("doc_id"), col("r_lex"))
    val e = Similarity.vecs(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.crossJoin(broadcast(q))
      .withColumn("cosine", expr("vec_dot(v, qv)") / (col("nrm") * col("qn")))
    val vec = topKRanked(scored, 50, "r_vec",
      col("cosine").desc, col("vec_id"))
      .select(col("vec_id").as("doc_id"), col("r_vec"))
    // the fused frame holds ≤100 rows (two k=50 arms) — the plain
    // window is bounded here by construction
    val wr = Window.partitionBy(pmod(hash(col("doc_id")).cast("long"),
      lit(1L))).orderBy(col("rrf_units").desc, col("doc_id"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_units",
        expr("coalesce(1000000000 div (60 + r_lex), 0) + " +
          "coalesce(1000000000 div (60 + r_vec), 0)"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 20)
      .select(col("doc_id"), col("r_lex"), col("r_vec"), col("rrf_units"),
        round(col("rrf_units").cast("double") / lit(1e9), 9).as("rrf"),
        col("rank"))
      .orderBy(col("rank"))
  }

  private val hybridRrfSql = bm25UnitsCte +
    """,
      |lex AS (
      |  SELECT doc_id, CAST(r_lex AS INT) AS r_lex FROM (
      |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY u DESC, doc_id) AS r_lex
      |    FROM bm) WHERE r_lex <= 50),
      |e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, v,
      |    sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
      |  FROM e),
      |q AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = 0),
      |cos AS (
      |  SELECT vec_id AS doc_id,
      |    list_reduce(list_transform(range(1, len(v)+1), i -> v[i] * qv[i]), (a, b) -> a + b)
      |      / (nrm * qn) AS cosine
      |  FROM n, q),
      |vec AS (
      |  SELECT doc_id, CAST(r_vec AS INT) AS r_vec FROM (
      |    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r_vec
      |    FROM cos) WHERE r_vec <= 50),
      |fused AS (
      |  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, r_lex, r_vec,
      |    COALESCE(1000000000 // (60 + r_lex), 0) +
      |    COALESCE(1000000000 // (60 + r_vec), 0) AS rrf_units
      |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
      |SELECT doc_id, r_lex, r_vec, CAST(rrf_units AS BIGINT) AS rrf_units,
      |  ROUND(CAST(rrf_units AS DOUBLE) / 1e9, 9) AS rrf, CAST(rank AS INT) AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_units DESC, doc_id) AS rank
      |      FROM fused)
      |WHERE rank <= 20 ORDER BY rank""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("text_bm25", bm25, Some(bm25Sql)),
    QueryDef("search_hybrid_rrf", hybridRrf, Some(hybridRrfSql))
  )
}
