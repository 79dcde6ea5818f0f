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
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
