package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.sinks.JdbcUpsert
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The Postgres upsert dialect, both pinned and EXECUTED.
  *
  * The reference's production statement is `INSERT INTO
  * sales_transactions (…) VALUES (…) ON CONFLICT (transaction_id) DO
  * UPDATE SET c = EXCLUDED.c, …` (reference src/load.py:77-96). Until
  * round 3 only the Derby AnsiMerge twin ever executed in tests; here
  * the Postgres dialect's exact SQL (1) is asserted byte-for-byte and
  * structurally against the reference text, and (2) runs for real on an
  * embedded engine that implements the Postgres ON CONFLICT semantics
  * (DuckDB via JDBC, from the pre-warmed cache), including the
  * idempotency property the reference's design hinges on.
  */
class PostgresDialectSpec extends SparkSpec {

  // reference table schema (src/load.py:34-45), minus the DB-stamped
  // loaded_at default the upsert never binds
  private val schema = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("customer_id", IntegerType, nullable = false),
    StructField("product_name", StringType, nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("unit_price", DecimalType(10, 2), nullable = false),
    StructField("transaction_date", DateType, nullable = false),
    StructField("region", StringType),
    StructField("status", StringType),
    StructField("total_sale", DecimalType(10, 2))))

  // the reference statement, verbatim (src/load.py:77-96; named params)
  private val referenceSql = """
    INSERT INTO sales_transactions (
        transaction_id, customer_id, product_name,
        quantity, unit_price, transaction_date,
        region, status, total_sale
    ) VALUES (
        :transaction_id, :customer_id, :product_name,
        :quantity, :unit_price, :transaction_date,
        :region, :status, :total_sale
    )
    ON CONFLICT (transaction_id) DO UPDATE SET
        customer_id      = EXCLUDED.customer_id,
        product_name     = EXCLUDED.product_name,
        quantity         = EXCLUDED.quantity,
        unit_price       = EXCLUDED.unit_price,
        transaction_date = EXCLUDED.transaction_date,
        region           = EXCLUDED.region,
        status           = EXCLUDED.status,
        total_sale       = EXCLUDED.total_sale;
    """

  private def generated: String =
    JdbcUpsert.Postgres.upsertSql("sales_transactions", schema,
      Seq("transaction_id"))

  test("byte-pin: the emitted statement is exactly the canonical form") {
    assert(generated ==
      """INSERT INTO sales_transactions (transaction_id, customer_id, product_name, quantity, unit_price, transaction_date, region, status, total_sale)
        |VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)
        |ON CONFLICT (transaction_id) DO UPDATE SET customer_id = EXCLUDED.customer_id, product_name = EXCLUDED.product_name, quantity = EXCLUDED.quantity, unit_price = EXCLUDED.unit_price, transaction_date = EXCLUDED.transaction_date, region = EXCLUDED.region, status = EXCLUDED.status, total_sale = EXCLUDED.total_sale""".stripMargin)
  }

  test("structural equivalence with the reference statement (load.py:77-96)") {
    // normalize both to (insert cols, value slots, conflict keys, SET pairs)
    def parse(sql: String): (Seq[String], Int, Seq[String], Seq[(String, String)]) = {
      val s = sql.replaceAll("\\s+", " ").trim.stripSuffix(";")
      val ins = "INSERT INTO sales_transactions \\(([^)]*)\\) VALUES \\(([^)]*)\\)".r
        .findFirstMatchIn(s).get
      val cols = ins.group(1).split(",").map(_.trim).toSeq
      val slots = ins.group(2).split(",").length
      val conflict = "ON CONFLICT \\(([^)]*)\\) DO UPDATE SET (.*)".r
        .findFirstMatchIn(s).get
      val keys = conflict.group(1).split(",").map(_.trim).toSeq
      val sets = conflict.group(2).split(",").map(_.trim).map { kv =>
        val Array(l, r) = kv.split("=").map(_.trim); (l, r)
      }.toSeq
      (cols, slots, keys, sets)
    }
    assert(parse(generated) == parse(referenceSql))
  }

  test("the statement EXECUTES on a real ON CONFLICT engine and is idempotent") {
    val available =
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: Throwable => false }
    assume(available, "duckdb_jdbc not on the test classpath")
    val dir = Files.createTempDirectory("graft-pgdialect")
    dir.toFile.deleteOnExit()
    val url = s"jdbc:duckdb:$dir/pg.duckdb"
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE sales_transactions (
          |  transaction_id VARCHAR PRIMARY KEY, customer_id INTEGER,
          |  product_name VARCHAR, quantity INTEGER, unit_price DECIMAL(10,2),
          |  transaction_date DATE, region VARCHAR, status VARCHAR,
          |  total_sale DECIMAL(10,2))""".stripMargin)
    } finally conn.close()

    def row(id: String, qty: Int, total: String) = Row(
      id, 7, "widget", qty, new java.math.BigDecimal("9.99"),
      java.sql.Date.valueOf("2024-03-01"), "north", "completed",
      new java.math.BigDecimal(total))
    def write(rows: Seq[Row]): Unit = JdbcUpsert.upsert(
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema).coalesce(1),
      url, "sales_transactions", Seq("transaction_id"))

    write(Seq(row("T1", 1, "9.99"), row("T2", 2, "19.98")))
    // rerun with T2 changed: count must stay 2, T2 must take the update
    write(Seq(row("T1", 1, "9.99"), row("T2", 5, "49.95")))

    val check = DriverManager.getConnection(url)
    try {
      val rs = check.createStatement().executeQuery(
        "SELECT COUNT(*), SUM(quantity) FROM sales_transactions")
      assert(rs.next())
      assert(rs.getInt(1) == 2, "rerun must not duplicate (idempotent upsert)")
      assert(rs.getInt(2) == 6, "conflicting row must take the EXCLUDED values")
    } finally check.close()
  }
}
