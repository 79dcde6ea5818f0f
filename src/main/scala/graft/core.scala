package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, driver-checkable query: a Spark builder plus (optionally) an
  * ANSI-SQL twin the driver runs in DuckDB over the same parquet tables.
  * Queries without an oracle get the driver's weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read nanos as raw long (legacy conf) and convert to the
    * engine-native microsecond TimestampType (`ts div 1000` stays in long
    * arithmetic — a double division would lose precision above 2^53 ns).
    * DuckDB truncates ns→µs the same way via epoch_us().
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
