package graft.sql

import graft.{Ctx, T}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declarative entry surface: registers the star schema as temp views and
  * the engine's custom functions in the session function registry, so the
  * whole query set is reachable from plain SQL text (`spark.sql`) — no
  * harness map, no Scala API. This is the "switch your BI tool over"
  * surface: `Views.register(spark, dir)` once, then any ANSI query (plus
  * graft extensions: `vec_dot`, `word_shingles3`, `array_md5_sorted`,
  * `rabin_karp`) runs as-is.
  *
  * Temp views are plan aliases, not materializations — every view carries
  * the pruned parquet scan it wraps, so predicate pushdown / column
  * pruning / partition pruning behave exactly as in the DataFrame API.
  * Registration is idempotent (createOrReplaceTempView + idempotent
  * function registry) and per-session, so concurrent sessions on one
  * cluster each see their own catalog — the multi-tenant shape.
  */
object Views {

  /** The driver-generated tables (TESTDATA.md), in dependency-free order. */
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view + all custom functions.
    * `events` routes through [[graft.T.events]] so SQL users get the
    * same ns→µs timestamp normalization the typed API applies. */
  def register(spark: SparkSession, dir: String): SparkSession = {
    Ctx.prep(spark)
    graft.functions.VecExprs.register(spark)
    tables.foreach { n =>
      val df = if (n == "events") T.events(spark, dir) else T(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    spark
  }

  /** One-shot: register views, run a SQL string. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame =
    register(spark, dir).sql(query)
}
