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

  /** Sessions whose catalog already carries this dir's views: a repeat
    * registration of the SAME dir is a no-op (the views are immutable
    * plan aliases over immutable reads — re-creating them re-ran ten
    * parquet schema inferences, ~1 s, on EVERY `Views.sql` call;
    * measured by graft.tools.ReadProbe). A different dir re-registers
    * and re-points the memo; weak session keys so stopped test
    * sessions don't pin. The memo value folds in every table's
    * [[graft.T.datasetSig]] (ADVICE r14: keying on the dir STRING alone
    * served stale view plans after an in-session regeneration of the
    * tables under the same dir) — the views now invalidate exactly when
    * the underlying readCached entries do. */
  private val registeredDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private def regKey(dir: String): String =
    dir + "@" + tables.map(n => T.datasetSig(s"$dir/$n.parquet")).mkString("|")

  /** Register every table as a temp view + all custom functions.
    * `events` routes through [[graft.T.events]] so SQL users get the
    * same ns→µs timestamp normalization the typed API applies. */
  def register(spark: SparkSession, dir: String): SparkSession = {
    Ctx.prep(spark)
    val key = regKey(dir)
    if (registeredDir.get(spark) != key) {
      graft.functions.VecExprs.register(spark)
      tables.foreach { n =>
        val df = if (n == "events") T.events(spark, dir) else T(spark, dir, n)
        df.createOrReplaceTempView(n)
      }
      registeredDir.put(spark, key)
    }
    spark
  }

  /** One-shot: register views, run a SQL string. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame =
    register(spark, dir).sql(query)
}
