package graft.etl

import graft.sinks.{DbEnv, JdbcUpsert}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.slf4j.LoggerFactory

/** CLI twin of the reference's `python main.py` (main.py:139-140):
  * `graft.etl.Main <csv-path> [jdbc-url]` runs the full CSV→DB pipeline
  * against a real database. URL resolution mirrors the reference: an
  * explicit argument wins, otherwise the 5-env-var contract
  * ([[DbEnv.jdbcUrl]], reference src/load.py:8-22).
  *
  * Stage order is the reference's exactly (main.py:41-56): 0 schema
  * bootstrap → 1 ingest → 2 structural validation → 3 transform → 4 row
  * validation → 5 load, with every halt mapped to exit code 1 after a
  * context log (main.py's sys.exit(1) arms). Stages 1–4 live in
  * [[Runner.run]]; this object owns stage 0 and the production sink
  * wiring (upsert + dead-letter append with the reference's audit
  * columns).
  */
object Main {

  private val log = LoggerFactory.getLogger("graft.pipeline.main")

  private val CleanTable = "sales_transactions"
  private val RejectTable = "rejected_rows"
  private val Key = Seq("transaction_id")

  /** Reference DDL shape (src/load.py:34-53): 9 data columns + loaded_at
    * default on the clean table; identity id + rejected_at default on
    * the dead letter. */
  val CleanSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("customer_id", IntegerType),
    StructField("product_name", StringType),
    StructField("quantity", IntegerType),
    StructField("unit_price", DecimalType(10, 2)),
    StructField("transaction_date", DateType),
    StructField("region", StringType),
    StructField("status", StringType),
    StructField("total_sale", DecimalType(10, 2))))

  val RejectSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("raw_data", StringType),
    StructField("rejection_reason", StringType, nullable = false)))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.etl.Main <csv-path> [jdbc-url]")
    val url = if (args.length > 1) args(1) else DbEnv.jdbcUrl()
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    graft.Ctx.prep(spark)
    val code = runPipeline(spark, args(0), url)
    spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** Separated from main for tests; returns the process exit code. */
  def runPipeline(spark: SparkSession, path: String, url: String): Int = {
    val isPg = url.startsWith("jdbc:postgresql:")
    val dialect: JdbcUpsert.Dialect =
      if (isPg) JdbcUpsert.Postgres else JdbcUpsert.AnsiMerge()
    // STAGE 0 — schema bootstrap (main.py:66-71). A DB we cannot even
    // bootstrap against is a hard stop, same as the reference.
    try {
      JdbcUpsert.ensureTable(url, CleanTable, CleanSchema, Key,
        ifNotExistsSyntax = isPg,
        auditTimestampCol = Some("loaded_at"), dialect = dialect)
      JdbcUpsert.ensureTable(url, RejectTable, RejectSchema, Nil,
        ifNotExistsSyntax = isPg,
        identityCol = Some("id"), auditTimestampCol = Some("rejected_at"),
        dialect = dialect)
    } catch {
      case e: Throwable =>
        log.error(s"halt=schema_bootstrap url=$url", e)
        return 1
    }
    Runner.run(spark, path) { (clean, rejected) =>
      // P7 load projection: exactly the reference's bind columns, in
      // DDL order (src/load.py:78-96)
      val projected = clean.select(CleanSchema.fieldNames.map(col).toSeq: _*)
      JdbcUpsert.upsert(projected, url, CleanTable, Key, dialect,
        auditTimestampCol = Some("loaded_at"))
      JdbcUpsert.append(rejected, url, RejectTable)
    } match {
      case Right(summary) =>
        log.info(s"pipeline complete: $summary")
        0
      case Left(halt) =>
        log.error(s"pipeline halted: $halt retryable=${halt.retryable}")
        1
    }
  }
}
