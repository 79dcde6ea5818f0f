package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-checkable query: a Spark builder plus (optionally) an
  * ANSI-SQL twin the driver runs in DuckDB over the same parquet tables.
  * Queries without an oracle get the driver's weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** Scale ceiling for BY-CONTRACT superlinear queries (VERDICT r8
      * #3): (driving table, max rows, why). A bench run on data past
      * the ceiling SKIPS the query with the recorded reason instead of
      * hanging the suite — the documented linear-regime replacement is
      * named in the reason. None = the query is expected to survive any
      * SF its plan was audited at. */
    ceiling: Option[(String, Long, String)] = None)

/** Session prep shared by every query builder.
  *
  * Spark 4.x defaults `spark.sql.ansi.enabled=true`, which makes CAST and
  * to_date THROW on malformed input. The reference's coerce semantics
  * (pandas `errors="coerce"`, reference src/transform.py:37-39) are
  * null-on-failure, and the DuckDB oracle uses TRY_CAST — so we pin ANSI
  * off for the session. Runtime conf, safe to set per-build.
  */
object Ctx {
  def prep(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}

/** Parquet table loaders for the driver-generated star schema (TESTDATA.md). */
object T {

  /** Per-session memo of base-table DataFrames, keyed on (path, dir
    * mtime, nanos-conf). Every `spark.read.parquet` pays ~90–120 ms of
    * parquet schema inference (a one-task Spark job reading footers —
    * measured by graft.tools.ReadProbe at sf0.1) and the suite's 267
    * query builders each call T 1–4 times, so repeated inference was
    * ~25–40% of the whole bench total. A catalog/metastore amortizes
    * exactly this metadata; the memo is the sessionless equivalent.
    * Plans only, never results: the cached object is an immutable
    * analyzed read, and the mtime in the key drops the entry the
    * moment the files under the path change (overwrite recreates the
    * directory). Sessions are weak keys so stopped test sessions don't
    * pin their plans. */
  private val frameCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]]())

  /** Staleness signature of a dataset path (r15, VERDICT r14 #6 /
    * ADVICE r14): the old key was the TOP directory's lastModified
    * alone, which misses (a) an in-place rewrite of an existing
    * part-file (same name ⇒ dir entry list unchanged ⇒ dir mtime
    * unchanged) and (b) any change inside nested partition subdirs.
    * The signature now folds in a bounded recursive walk — file count
    * and max mtime over every entry — so both cases mint a new key.
    * Mirror dirs are at most a few hundred entries; the walk is
    * microseconds against the ~100 ms schema inference it guards. */
  private def stalenessSig(f: java.io.File): String = {
    var n = 0
    var maxM = f.lastModified
    def walk(d: java.io.File, depth: Int): Unit = {
      val kids = Option(d.listFiles()).getOrElse(Array.empty)
      kids.foreach { k =>
        n += 1
        if (k.lastModified > maxM) maxM = k.lastModified
        if (k.isDirectory && depth < 6 && n < 100000) walk(k, depth + 1)
      }
    }
    if (f.isDirectory) walk(f, 0)
    s"${f.lastModified}:$n:$maxM"
  }

  /** Memoized parquet read of a LOCAL path (the bench/verify layout).
    * Non-local URIs fall through to a plain read, uncached. */
  def readCached(spark: SparkSession, path: String): DataFrame = {
    val local = if (path.startsWith("file:")) path.stripPrefix("file:") else path
    if (local.contains(":")) return spark.read.parquet(path) // hdfs://, s3://…
    val f = new java.io.File(local)
    val nanos = try spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
      catch { case _: Throwable => "false" }
    val sig = s"${stalenessSig(f)}:$nanos"
    val m = {
      var mm = frameCache.get(spark)
      if (mm == null) frameCache.synchronized {
        mm = frameCache.get(spark)
        if (mm == null) {
          mm = new java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]()
          frameCache.put(spark, mm)
        }
      }
      mm
    }
    // keyed by PATH with the signature in the value (ADVICE r14): an
    // always-rewritten path replaces its entry instead of accumulating
    // one dead analyzed plan per rewrite for the life of the session
    val entry = m.get(local)
    if (entry != null && entry._1 == sig) entry._2
    else {
      val df = spark.read.parquet(path)
      m.put(local, (sig, df))
      df
    }
  }

  /** Staleness signature of a dataset path, exposed for memos that must
    * invalidate exactly when [[readCached]] does (Views.register). */
  private[graft] def datasetSig(path: String): String =
    stalenessSig(new java.io.File(path))

  /** NOTE (ADVICE r14): repeated calls return the SAME analyzed
    * DataFrame object, so a same-table self-join disambiguated as
    * `df1("c") === df2("c")` hits Spark's ambiguous-self-join detection
    * (two independent reads used to carry distinct exprIds). Rename or
    * alias columns immediately (as q7's double nation read does), or
    * re-mint instances via LogicalRelation.newInstance() the way
    * SummaryRewrite does, when both sides must be the same table. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    readCached(spark, s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — we read nanos as raw long via the legacy
    * conf and truncate in long arithmetic; a double division would lose
    * precision above 2^53 ns) and, since the testdata regen, as
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (read as TIMESTAMP_NTZ).
    * The engine-facing contract is a single microsecond TimestampType
    * column regardless of the physical encoding, so branch on the type the
    * scan actually produced. The session is UTC-pinned (Ctx.prep), so an
    * NTZ→LTZ cast is a pure re-tag with identical micros — matching DuckDB,
    * whose TIMESTAMP is ntz and whose epoch_us() sees the same values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(
          s"events.ts arrived as unsupported type $other; expected long ns, timestamp_ntz, or timestamp")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
